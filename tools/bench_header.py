"""Isolated shootout of DownSample2D header formulations at the production
shape: input 12 x 512^2 x 64-per-frame (V=4 TTA variants x Bt=1, T=3 frames),
output (12, 256, 256, 32).

  split   current production: per-frame kernel-slice convs at 512^2, summed
  concat  plain conv over the (12, 512, 512, 192) channel concat
  phase   space-to-depth: input pre-split into 2x2 phases at 256^2
          (as the scatter can emit directly); 3x3/s2 conv == sum of 4
          per-phase convs (2x2 / 1x2 / 2x1 / 1x1), maxpool == max of 4
          per-phase pools. No dense op ever touches a 512^2 layout.

Usage: python tools/bench_header.py [split concat phase]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    sel = sys.argv[1:]

    def want(name):
        return not sel or any(s in name for s in sel)

    trivial = jax.jit(lambda x: x.sum())
    z = jnp.zeros((8, 8))
    float(trivial(z))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(z))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    B, T, H, W, C0, CO = 4, 3, 512, 512, 64, 32
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C0)).astype(np.float32)
                    ).astype(dt)
    k3 = jnp.asarray(rng.normal(size=(3, 3, T * C0, CO)).astype(np.float32)
                     ).astype(dt) * 0.05
    k1 = jnp.asarray(rng.normal(size=(1, 1, T * C0, CO)).astype(np.float32)
                     ).astype(dt) * 0.05
    dn = ("NHWC", "HWIO", "NHWC")

    def timeit(name, fn, init, data, K=3, reps=2):
        # data rides as an argument: a closed-over array is baked into the
        # compile payload, which the tunnel caps (~HTTP 413 at 400 MB)
        if not want(name):
            return

        @jax.jit
        def chained(c, d):
            for _ in range(K):
                c = fn(c, d)
            return c.sum()

        float(chained(init, data))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(init, data))
            ts.append(time.perf_counter() - t0)
        t = (np.median(ts) - rtt) / K
        print(f"{name:42s} {t*1e3:8.2f} ms", flush=True)

    def maxpool3s2(v):
        return lax.reduce_window(v, -jnp.inf, lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))

    # ---- current production form: frame-split convs at 512^2
    def split_fn(c, x):
        xs = x + c.astype(dt) * 0
        conv_b = None
        pool_b = None
        for t in range(T):
            y = lax.conv_general_dilated(xs[:, t], k3[:, :, t*C0:(t+1)*C0],
                                         (2, 2), ((1, 1), (1, 1)),
                                         dimension_numbers=dn)
            conv_b = y if conv_b is None else conv_b + y
            y1 = lax.conv_general_dilated(xs[:, t], k1[:, :, t*C0:(t+1)*C0],
                                          (1, 1), ((0, 0), (0, 0)),
                                          dimension_numbers=dn)
            pool_b = y1 if pool_b is None else pool_b + y1
        out = jnp.maximum(conv_b + maxpool3s2(pool_b), 0)
        return c + out.mean().astype(jnp.float32) * 0 + 1
    timeit("split: per-frame convs @512^2", split_fn,
           jnp.zeros((), jnp.float32), x)

    # ---- plain channel concat at 512^2
    xc = jnp.asarray(rng.normal(size=(B, H, W, T * C0)).astype(np.float32)
                     ).astype(dt)

    def concat_fn(c, xc):
        xs = xc + c.astype(dt) * 0
        conv_b = lax.conv_general_dilated(xs, k3, (2, 2), ((1, 1), (1, 1)),
                                          dimension_numbers=dn)
        pool_b = lax.conv_general_dilated(xs, k1, (1, 1), ((0, 0), (0, 0)),
                                          dimension_numbers=dn)
        out = jnp.maximum(conv_b + maxpool3s2(pool_b), 0)
        return c + out.mean().astype(jnp.float32) * 0 + 1
    timeit("concat: one conv @512^2", concat_fn,
           jnp.zeros((), jnp.float32), xc)

    # ---- phase-split at 256^2: xp[(pi,pj)] = x512[2i+pi, 2j+pj]
    xp = jnp.asarray(rng.normal(size=(B, H // 2, W // 2, 4, T * C0)
                                ).astype(np.float32)).astype(dt)

    def phase_fn(c, xp):
        xs = xp + c.astype(dt) * 0
        x00, x01, x10, x11 = (xs[..., 0, :], xs[..., 1, :],
                              xs[..., 2, :], xs[..., 3, :])
        # 3x3/s2 conv at 512^2: tap m=2i-1+ki -> phase m&1, pos (m>>1)
        # ki=1 -> phase 0 at i; ki in {0,2} -> phase 1 at {i-1, i}
        k11 = k3[1:2, 1:2]                    # phase (0,0): 1x1
        k12 = k3[1:2, 0::2]                   # phase (0,1): 1x2
        k21 = k3[0::2, 1:2]                   # phase (1,0): 2x1
        k22 = k3[0::2, 0::2]                  # phase (1,1): 2x2
        conv_b = (
            lax.conv_general_dilated(x00, k11, (1, 1), ((0, 0), (0, 0)),
                                     dimension_numbers=dn)
            + lax.conv_general_dilated(x01, k12, (1, 1), ((0, 0), (1, 0)),
                                       dimension_numbers=dn)
            + lax.conv_general_dilated(x10, k21, (1, 1), ((1, 0), (0, 0)),
                                       dimension_numbers=dn)
            + lax.conv_general_dilated(x11, k22, (1, 1), ((1, 0), (1, 0)),
                                       dimension_numbers=dn))
        # 1x1 conv commutes with the phase split; maxpool = max over the
        # same 9 taps regrouped per phase
        zs = [lax.conv_general_dilated(v, k1, (1, 1), ((0, 0), (0, 0)),
                                       dimension_numbers=dn)
              for v in (x00, x01, x10, x11)]

        def pool(v, ph, pw):
            # window over pos {i-1, i} when the phase contributes 2 taps
            pads = ((1, 0) if ph else (0, 0), (1, 0) if pw else (0, 0))
            dims = (1, 2 if ph else 1, 2 if pw else 1, 1)
            return lax.reduce_window(v, -jnp.inf, lax.max, dims,
                                     (1, 1, 1, 1),
                                     ((0, 0),) + pads + ((0, 0),))

        pool_b = jnp.maximum(
            jnp.maximum(pool(zs[0], 0, 0), pool(zs[1], 0, 1)),
            jnp.maximum(pool(zs[2], 1, 0), pool(zs[3], 1, 1)))
        out = jnp.maximum(conv_b + pool_b, 0)
        return c + out.mean().astype(jnp.float32) * 0 + 1
    timeit("phase: 4 convs @256^2", phase_fn,
           jnp.zeros((), jnp.float32), xp)

    # numeric check: phase == concat on the same data
    if want("check"):
        x512 = np.asarray(xc, dtype=np.float32)
        xph = x512.reshape(B, H // 2, 2, W // 2, 2, T * C0).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4, T * C0)
        # phase index (pi, pj) -> 2*pi + pj must match xs[..., ph, :] order
        xp_arr = jnp.asarray(xph).astype(dt)

        @jax.jit
        def both(xcat, xphase):
            conv_a = lax.conv_general_dilated(xcat, k3, (2, 2),
                                              ((1, 1), (1, 1)),
                                              dimension_numbers=dn)
            xs = xphase
            x00, x01, x10, x11 = (xs[..., 0, :], xs[..., 1, :],
                                  xs[..., 2, :], xs[..., 3, :])
            k11 = k3[1:2, 1:2]; k12 = k3[1:2, 0::2]
            k21 = k3[0::2, 1:2]; k22 = k3[0::2, 0::2]
            conv_p = (
                lax.conv_general_dilated(x00, k11, (1, 1), ((0, 0), (0, 0)),
                                         dimension_numbers=dn)
                + lax.conv_general_dilated(x01, k12, (1, 1), ((0, 0), (1, 0)),
                                           dimension_numbers=dn)
                + lax.conv_general_dilated(x10, k21, (1, 1), ((1, 0), (0, 0)),
                                           dimension_numbers=dn)
                + lax.conv_general_dilated(x11, k22, (1, 1), ((1, 0), (1, 0)),
                                           dimension_numbers=dn))
            return jnp.abs(conv_a.astype(jnp.float32)
                           - conv_p.astype(jnp.float32)).max()
        print("phase-vs-concat conv max diff:",
              float(both(jnp.asarray(x512).astype(dt), xp_arr)), flush=True)


if __name__ == "__main__":
    main()


def main_dot():
    """Tap-matmul formulations: express the 3x3/s2 conv as 9 shifted
    dot_generals (strided slices feed the MXU directly, bypassing XLA's
    conv spatial-retiling)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    trivial = jax.jit(lambda x: x.sum())
    z = jnp.zeros((8, 8))
    float(trivial(z))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(trivial(z))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    B, T, H, W, C0, CO = 4, 3, 512, 512, 64, 32
    CI = T * C0
    dt = jnp.bfloat16
    k3 = jnp.asarray(rng.normal(size=(3, 3, CI, CO)).astype(np.float32)
                     ).astype(dt) * 0.05
    k1 = jnp.asarray(rng.normal(size=(1, 1, CI, CO)).astype(np.float32)
                     ).astype(dt) * 0.05
    xc = jnp.asarray(rng.normal(size=(B, H, W, CI)).astype(np.float32)
                     ).astype(dt)

    def timeit(name, fn, init, data, K=3, reps=2):
        @jax.jit
        def chained(c, d):
            for _ in range(K):
                c = fn(c, d)
            return c.sum()
        float(chained(init, data))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(chained(init, data))
            ts.append(time.perf_counter() - t0)
        print(f"{name:42s} {(np.median(ts)-rtt)/K*1e3:8.2f} ms", flush=True)

    def maxpool3s2(v):
        return lax.reduce_window(v, -jnp.inf, lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))

    def dotconv(c, xc):
        xs = xc + c.astype(dt) * 0
        xpad = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for ki in range(3):
            for kj in range(3):
                tap = lax.slice(xpad, (0, ki, kj, 0),
                                (B, ki + H, kj + W, CI), (1, 2, 2, 1))
                y = jnp.einsum("bhwc,co->bhwo", tap, k3[ki, kj],
                               preferred_element_type=jnp.float32)
                out = y if out is None else out + y
        z1 = jnp.einsum("bhwc,co->bhwo", xs, k1[0, 0],
                        preferred_element_type=jnp.float32).astype(dt)
        out = jnp.maximum(out.astype(dt) + maxpool3s2(z1), 0)
        return c + out.mean().astype(jnp.float32) * 0 + 1
    timeit("dotconv: 9 strided-tap matmuls @512^2", dotconv,
           jnp.zeros((), jnp.float32), xc)

    # correctness vs lax conv
    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def check(xc):
        a = lax.conv_general_dilated(xc, k3, (2, 2), ((1, 1), (1, 1)),
                                     dimension_numbers=dn)
        xpad = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
        b = None
        for ki in range(3):
            for kj in range(3):
                tap = lax.slice(xpad, (0, ki, kj, 0),
                                (B, ki + H, kj + W, CI), (1, 2, 2, 1))
                y = jnp.einsum("bhwc,co->bhwo", tap, k3[ki, kj],
                               preferred_element_type=jnp.float32)
                b = y if b is None else b + y
        return jnp.abs(a.astype(jnp.float32) - b).max()
    print("dotconv-vs-conv max diff:", float(check(xc)), flush=True)


if __name__ == "__main__" and "dot" in sys.argv:
    main_dot()
