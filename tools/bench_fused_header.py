"""Compiled fused-TTA-header kernel: on-chip parity + timing.

Runs `ops.fused_header.fused_header_tta` at the production shape
(Bt=1, T=3, Hh=Wh=256, C=64, Cout=32, bf16, row_pad=1 input layout)
on the default backend, checks it against the XLA reference composition,
and times it with the chained-scan pattern (see bench.py notes: scalar
materialization, tunnel RTT subtracted, inputs perturbed per iteration).

Usage: python tools/bench_fused_header.py [--f32] [--iters K]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from streammos_tpu.ops.fused_header import (fused_header_reference,
                                                fused_header_tta)

    Bt, T, Hh, Wh, C, Cout = 1, 3, 256, 256, 64, 32
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    rng = np.random.default_rng(0)

    # phase-OUTER row_pad=1 layout (voxel_max_pool phase_split="outer")
    g = rng.uniform(0, 2, (Bt * T, 4, Hh + 2, Wh, 4 * C)).astype(np.float32)
    g[:, :, 0] = 0.0
    g[:, :, -1] = 0.0
    g = jnp.asarray(g, dt)
    k3 = jnp.asarray(rng.normal(0, 0.05, (3, 3, T * C, Cout)), dt)
    k1 = jnp.asarray(rng.normal(0, 0.05, (1, 1, T * C, Cout)), dt)
    ca = (jnp.asarray(rng.uniform(0.5, 1.5, Cout), jnp.float32),
          jnp.asarray(rng.normal(0, 0.1, Cout), jnp.float32))
    pa = (jnp.asarray(rng.uniform(-1.5, 1.5, Cout), jnp.float32),
          jnp.asarray(rng.normal(0, 0.1, Cout), jnp.float32))

    print(f"backend: {jax.default_backend()}  dtype: {dt.__name__}",
          flush=True)

    fused = jax.jit(lambda g_: fused_header_tta(g_, k3, k1, ca, pa, T))
    ref = jax.jit(lambda g_: fused_header_reference(g_, k3, k1, ca, pa, T))

    out = np.asarray(fused(g), np.float32)
    want = np.asarray(ref(g), np.float32)
    err = np.abs(out - want).max()
    scale = np.abs(want).max()
    print(f"parity: max|diff| = {err:.6f}  (peak {scale:.3f}, "
          f"rel {err / scale:.2e})", flush=True)
    assert err <= 0.05 * scale, "fused header diverges from reference"

    # chained timing: K iterations inside one jit, input perturbed by the
    # previous output's scalar so nothing folds or caches
    K = args.iters

    @jax.jit
    def chained(g_):
        def body(carry, _):
            gg, s = carry
            y = fused_header_tta(gg, k3, k1, ca, pa, T)
            s = s + y.astype(jnp.float32).sum()
            gg = gg + (s * 1e-20).astype(dt)
            return (gg, s), None

        (_, s), _ = jax.lax.scan(body, (g_, jnp.zeros((), jnp.float32)),
                                 None, length=K)
        return s

    float(chained(g))  # compile + warm

    trivial = jax.jit(lambda x: x.sum())
    float(trivial(ca[0]))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(ca[0]))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(chained(g))
        times.append(time.perf_counter() - t0)
    total = float(np.median(times))
    per = max(total - rtt, 0.0) / K * 1e3
    print(f"fused header: {per:.3f} ms/call  (K={K}, rtt {rtt*1e3:.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
