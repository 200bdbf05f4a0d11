"""Why is the in-model full-grid scatter 10.2 ms when the same-shape
isolated lax.scatter_max runs at 2.15 ms? (round-3 trace: fusion.22)

Reproduces the EXACT production call (`models/stream_mos.py:173`):
`voxel_max_pool(folded(3,160k,256), coords, (512,512), 'auto', nonneg,
phase_split, row_pad=1)` and then peels the differences one by one:

  model     the exact voxel_max_pool call (id arithmetic in-graph)
  flatid    same scatter but with precomputed in-range ids (no id math,
            no sentinel drops)
  sentinel  precomputed ids with the production sentinel fraction
  window    2-D-index variant: scatter (cell-position, lane-offset)
            windows into a (B*Hh*Wh, P*VC) grid — the layout the fused
            header consumes, which would make the post-scatter reshape
            (1.25 ms retile) free

Usage: python tools/bench_modelscatter.py [case ...]
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
    from streammos_tpu.ops.voxel_pool import voxel_max_pool

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

    B, N, C = 3, 160000, 256
    H = W = 512
    NC = 258 * 256 * 4  # phase-split cells incl. row_pad=1

    feat = jnp.asarray(np.abs(rng.normal(size=(B, N, C))).astype(np.float32)
                       ).astype(jnp.bfloat16)
    # production-like coords: uniform over the grid with a small
    # out-of-range tail (bench.py's uniform bank keeps ~100% in range)
    coords = jnp.asarray(
        rng.uniform(-2, 514, size=(B, N, 2)).astype(np.float32))

    def timeit(name, fn, K=2, reps=2):
        if not want(name):
            return

        @jax.jit
        def chained(c):
            for _ in range(K):
                c = fn(c)
            return c.sum()

        init = jnp.zeros((), jnp.float32)
        float(chained(init))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(init))
            ts.append(time.perf_counter() - t0)
        t = (np.median(ts) - rtt) / K
        print(f"{name:46s} {t*1e3:8.2f} ms", flush=True)

    def mk_model(c):
        cc = coords + c.astype(coords.dtype) * 0
        out = voxel_max_pool(feat, cc, (H, W), (1.0, 1.0), "auto", True,
                             True, 1)
        return c + out[0, 0, 0, 0, 0].astype(c.dtype) * 0 + 1
    timeit("model: voxel_max_pool phase_split row_pad", mk_model)

    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))

    ids_in = jnp.asarray(
        rng.integers(0, B * NC, size=(B * N,)).astype(np.int32))

    def mk_flatid(c):
        i = (ids_in + c.astype(jnp.int32)) % (B * NC)
        out = lax.scatter_max(
            jnp.zeros((B * NC, C), feat.dtype), i[:, None],
            feat.reshape(-1, C), dnums, indices_are_sorted=False,
            unique_indices=False, mode=lax.GatherScatterMode.FILL_OR_DROP)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("flatid: precomputed in-range ids", mk_flatid)

    sent = rng.uniform(0, 1, B * N) < 0.05
    ids_sent = np.where(sent, B * NC,
                        rng.integers(0, B * NC, B * N)).astype(np.int32)
    ids_sent = jnp.asarray(ids_sent)

    def mk_sentinel(c):
        i = jnp.minimum(ids_sent + c.astype(jnp.int32) * 0, B * NC)
        out = lax.scatter_max(
            jnp.zeros((B * NC, C), feat.dtype), i[:, None],
            feat.reshape(-1, C), dnums, indices_are_sorted=False,
            unique_indices=False, mode=lax.GatherScatterMode.FILL_OR_DROP)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("sentinel: 5% dropped rows", mk_sentinel)

    # window: 2-D start indices (row, lane_start) writing a (1, C) window
    # into the (B*Hh*Wh, P*VC) header-layout grid
    PV = 4 * C
    ROWS = B * 258 * 256
    dnums2 = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1))
    pos = jnp.asarray(rng.integers(0, ROWS, size=(B * N,)).astype(np.int32))
    lane = jnp.asarray((rng.integers(0, 4, size=(B * N,)) * C)
                       .astype(np.int32))

    def mk_window(c):
        p = (pos + c.astype(jnp.int32)) % ROWS
        idx = jnp.stack([p, lane], axis=-1)
        out = lax.scatter_max(
            jnp.zeros((ROWS, PV), feat.dtype), idx, feat.reshape(-1, C),
            dnums2, indices_are_sorted=False, unique_indices=False,
            mode=lax.GatherScatterMode.FILL_OR_DROP)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("window: 2-D (row, lane) 256-wide windows", mk_window)


if __name__ == "__main__":
    main()


def sentinel_scaling():
    """Does the XLA zeros-scatter skip FILL_OR_DROP rows cheaply? Decides
    whether eval's sentinel padding (160k padded vs ~125k live points on
    real scans) should be reflected in the bench bank."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(1)
    trivial = jax.jit(lambda x: x.sum())
    float(trivial(jnp.zeros((8, 8))))
    import time as _t
    rtts = []
    for _ in range(5):
        t0 = _t.perf_counter()
        float(trivial(jnp.zeros((8, 8))))
        rtts.append(_t.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    R, C, CELLS = 480000, 256, 792576
    feat = jnp.asarray(np.abs(rng.normal(size=(R, C))).astype(np.float32)
                       ).astype(jnp.bfloat16)
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))
    for frac in (0.0, 0.25, 0.5, 0.9):
        live = rng.uniform(0, 1, R) >= frac
        base = rng.integers(0, CELLS, R).astype(np.int32)
        ids0 = jnp.asarray(np.where(live, base, -1).astype(np.int32))

        def fn(c):
            # perturb only live ids; dead rows stay out of range
            i = jnp.where(ids0 >= 0, (ids0 + c.astype(jnp.int32)) % CELLS,
                          CELLS)
            out = lax.scatter_max(
                jnp.zeros((CELLS, C), feat.dtype), i[:, None], feat, dnums,
                indices_are_sorted=False, unique_indices=False,
                mode=lax.GatherScatterMode.FILL_OR_DROP)
            return c + out[0, 0].astype(c.dtype) * 0 + 1

        @jax.jit
        def chained(c):
            for _ in range(4):
                c = fn(c)
            return c.sum()

        import time
        init = jnp.zeros((), jnp.float32)
        float(chained(init))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(chained(init))
            ts.append(time.perf_counter() - t0)
        t = (np.median(ts) - rtt) / 4
        print(f"dropped={frac:.2f}  {t*1e3:8.2f} ms", flush=True)


if "sentinel_scaling" in sys.argv:
    sentinel_scaling()
