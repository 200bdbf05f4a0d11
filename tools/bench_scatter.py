"""Scatter-max strategy shootout on the real chip, at the production shape
of the hot eval scatter (480k rows x 256 bf16 channels -> 3*512^2 cells).

Strategies:
  seg      jax.ops.segment_max + isfinite select (current prod path)
  zeros    lax.scatter_max into a zero grid (valid when features >= 0,
           which holds in-model: PointNet ends in ReLU)
  sort     lax.sort_key_val of the 480k cell ids (cost floor for any
           sorted-kernel path)
  gather   row gather into sorted order (the other sorted-path overhead)
  pallas   sort + gather + sorted_scatter_max kernel (ops/pallas_scatter.py)

Usage: python tools/bench_scatter.py [strategy ...]
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
    from streammos_tpu.ops import pallas_scatter

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

    R, C = 480000, 256
    CELLS = 3 * 512 * 512
    feat = jnp.asarray(np.abs(rng.normal(size=(R, C))).astype(np.float32)
                       ).astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, CELLS, size=(R,)).astype(np.int32))

    def timeit(name, fn, init, K=4, reps=2):
        if not want(name):
            return

        @jax.jit
        def chained(c):
            for _ in range(K):
                c = fn(c)
            return c.sum()

        float(chained(init))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(init))
            ts.append(time.perf_counter() - t0)
        t = (np.median(ts) - rtt) / K
        print(f"{name:40s} {t*1e3:8.2f} ms", flush=True)

    # ids perturbed per iteration via the carry so nothing caches
    def perturb_ids(c):
        return (ids + c.astype(jnp.int32)) % CELLS

    def mk_seg(c):
        i = perturb_ids(c)
        out = jax.ops.segment_max(feat, i, num_segments=CELLS + 1)[:-1]
        out = jnp.where(jnp.isfinite(out), out, jnp.zeros((), feat.dtype))
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("seg: segment_max + select", mk_seg, jnp.zeros((), jnp.float32))

    def mk_zeros(c):
        i = perturb_ids(c)
        zeros = jnp.zeros((CELLS, C), feat.dtype)
        dnums = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        out = lax.scatter_max(zeros, i[:, None], feat, dnums,
                              indices_are_sorted=False, unique_indices=False,
                              mode=lax.GatherScatterMode.FILL_OR_DROP)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("zeros: scatter_max into zeros", mk_zeros, jnp.zeros((), jnp.float32))

    def mk_sort(c):
        i = perturb_ids(c)
        sk, sv = lax.sort_key_val(i, jnp.arange(R, dtype=jnp.int32))
        return c + (sk[0] + sv[0]).astype(c.dtype) * 0 + 1
    timeit("sort: sort_key_val 480k", mk_sort, jnp.zeros((), jnp.float32))

    def mk_gather(c):
        perm = (ids + c.astype(jnp.int32)) % R
        rows = jnp.take(feat, perm, axis=0)
        return c + rows[0, 0].astype(c.dtype) * 0 + 1
    timeit("gather: 480k x 256 bf16 rows", mk_gather, jnp.zeros((), jnp.float32))

    def mk_pallas(c):
        i = perturb_ids(c)
        out = pallas_scatter.scatter_max_pallas(feat, i, CELLS)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("pallas: sort+gather+kernel", mk_pallas, jnp.zeros((), jnp.float32))

    # kernel alone on pre-sorted rows (upper bound if binning were free)
    ids_sorted = jnp.sort(ids)

    def mk_kernel(c):
        f = feat + c.astype(feat.dtype) * 0
        out = pallas_scatter.sorted_scatter_max(f, ids_sorted, CELLS)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("kernel alone (pre-sorted)", mk_kernel, jnp.zeros((), jnp.float32))


if __name__ == "__main__":
    main()


def main_sorted():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
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

    R, C = 480000, 256
    CELLS = 3 * 512 * 512
    feat = jnp.asarray(np.abs(rng.normal(size=(R, C))).astype(np.float32)
                       ).astype(jnp.bfloat16)
    ids = jnp.asarray(np.sort(rng.integers(0, CELLS, size=(R,))).astype(np.int32))

    def timeit(name, fn, init, K=4, reps=2):
        @jax.jit
        def chained(c):
            for _ in range(K):
                c = fn(c)
            return c.sum()

        float(chained(init))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(init))
            ts.append(time.perf_counter() - t0)
        t = (np.median(ts) - rtt) / K
        print(f"{name:44s} {t*1e3:8.2f} ms", flush=True)

    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))

    def mk_zsorted(c):
        i = jnp.minimum(ids + c.astype(jnp.int32) * 0, CELLS - 1)
        zeros = jnp.zeros((CELLS, C), feat.dtype)
        f = feat + c.astype(feat.dtype) * 0
        out = lax.scatter_max(zeros, i[:, None], f, dnums,
                              indices_are_sorted=True, unique_indices=False,
                              mode=lax.GatherScatterMode.FILL_OR_DROP)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("zeros sorted ids (hint True)", mk_zsorted,
           jnp.zeros((), jnp.float32))

    def mk_zsorted_nohint(c):
        i = jnp.minimum(ids + c.astype(jnp.int32) * 0, CELLS - 1)
        zeros = jnp.zeros((CELLS, C), feat.dtype)
        f = feat + c.astype(feat.dtype) * 0
        out = lax.scatter_max(zeros, i[:, None], f, dnums,
                              indices_are_sorted=False, unique_indices=False,
                              mode=lax.GatherScatterMode.FILL_OR_DROP)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("zeros sorted ids (hint False)", mk_zsorted_nohint,
           jnp.zeros((), jnp.float32))

    # dedup on XLA side: run-end rows only (at most one row per cell) with
    # unique_indices=True — placement should become a fast unique scatter
    def mk_unique(c):
        i = jnp.minimum(ids + c.astype(jnp.int32) * 0, CELLS - 1)
        f = feat + c.astype(feat.dtype) * 0
        # segmented max via log-stride combine (ids sorted): 19 rounds over
        # 480k rows... too slow; instead just measure the unique scatter cost
        is_end = jnp.concatenate([i[1:] != i[:-1], jnp.ones((1,), bool)])
        iu = jnp.where(is_end, i, CELLS)  # drop non-ends
        out = lax.scatter_max(jnp.zeros((CELLS, C), feat.dtype), iu[:, None],
                              f, dnums, indices_are_sorted=True,
                              unique_indices=True,
                              mode=lax.GatherScatterMode.FILL_OR_DROP)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("unique run-end scatter (no reduce)", mk_unique,
           jnp.zeros((), jnp.float32))


if __name__ == "__main__" and "sorted" in sys.argv:
    main_sorted()
