"""Full-grid (512^2, phase-split) scatter strategy shootout on the real
chip — the last big eval bucket (~20.5 ms of a ~72 ms frame).

Production op (`models/stream_mos.py:173`, fused-header eval path):
480k rows (3 frame-batches x 160k points) x 256 bf16 channels scattered
into 3 x 258x256x4 phase-split cells (~135 MB/batch grid).

Observed round 3: XLA scatters 160k rows into cascade-sized grids
(4-16 MB) at ~11-17 ns/row but the same rows into the full grid at
~43 ns/row — a grid-size cliff. This tool maps the cliff and measures the
candidate decompositions that exploit it:

  sweep     480k rows into {1/16..1/1} of the grid (rows scaled too)
  cliff     FIXED 480k rows into grids of 48k..786k cells
  phase     4 passes, each scatter-max over ALL 480k rows with
            out-of-phase rows dropped (FILL_OR_DROP sentinel) into the
            33 MB single-phase grid — no sort, no gather
  sorthint  flat scatter with ids pre-sorted (locality + hint)
  batch     3 separate per-frame scatters (135 MB grids)

Usage: python tools/bench_fullgrid.py [name ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

R, C = 480000, 256
CELLS = 3 * 258 * 256 * 4  # 792,576 phase-split cells + row_pad


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

    feat = jnp.asarray(np.abs(rng.normal(size=(R, C))).astype(np.float32)
                       ).astype(jnp.bfloat16)
    ids_np = rng.integers(0, CELLS, size=(R,)).astype(np.int32)
    ids = jnp.asarray(ids_np)

    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))

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
        print(f"{name:44s} {t*1e3:8.2f} ms", flush=True)

    def zscatter(f, i, cells, sorted_hint=False):
        return lax.scatter_max(
            jnp.zeros((cells, C), f.dtype), i[:, None], f, dnums,
            indices_are_sorted=sorted_hint, unique_indices=False,
            mode=lax.GatherScatterMode.FILL_OR_DROP)

    # --- cliff: fixed 480k rows, shrinking grid (ids mod cells) ---
    for cells in (98304, 196608, 792576):
        def mk(c, cells=cells):
            i = (ids + c.astype(jnp.int32)) % cells
            out = zscatter(feat, i, cells)
            return c + out[0, 0].astype(c.dtype) * 0 + 1
        timeit(f"cliff: 480k rows -> {cells//1000}k cells", mk)

    # --- phase: 4 drop-passes into single-phase grids (no sort/gather) ---
    PCELLS = CELLS // 4  # 198,144 cells x 256ch = 97 MB... per-batch: 33 MB

    def mk_phase(c):
        i = ids + c.astype(jnp.int32) * 0
        outs = []
        for p in range(4):
            ip = jnp.where((i & 3) == p, i >> 2, PCELLS)
            outs.append(zscatter(feat, ip, PCELLS))
        return c + sum(o[0, 0].astype(c.dtype) for o in outs) * 0 + 1
    timeit("phase: 4x drop-pass (33MB/batch grids)", mk_phase)

    def mk_phase2(c):
        i = ids + c.astype(jnp.int32) * 0
        outs = []
        for p in range(2):
            ip = jnp.where((i & 1) == p, i >> 1, CELLS // 2)
            outs.append(zscatter(feat, ip, CELLS // 2))
        return c + sum(o[0, 0].astype(c.dtype) for o in outs) * 0 + 1
    timeit("phase2: 2x drop-pass (67MB/batch grids)", mk_phase2)

    # --- sorthint: pre-sorted ids (sort cost excluded; locality probe) ---
    ids_sorted = jnp.asarray(np.sort(ids_np))

    def mk_sorthint(c):
        f = feat + c.astype(feat.dtype) * 0
        out = zscatter(f, ids_sorted, CELLS, sorted_hint=True)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("sorthint: sorted ids, hint=True", mk_sorthint)

    def mk_sortnohint(c):
        f = feat + c.astype(feat.dtype) * 0
        out = zscatter(f, ids_sorted, CELLS, sorted_hint=False)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("sortloc: sorted ids, hint=False", mk_sortnohint)

    # --- batch: 3 per-frame scatters (vmap) ---
    BCELLS = CELLS // 3

    def mk_batch(c):
        i = (ids.reshape(3, -1) + c.astype(jnp.int32)) % BCELLS
        f = feat.reshape(3, -1, C)
        out = jax.vmap(lambda ff, ii: zscatter(ff, ii, BCELLS))(f, i)
        return c + out[0, 0, 0].astype(c.dtype) * 0 + 1
    timeit("batch: 3x 160k -> 264k cells (vmap)", mk_batch)

    # --- banded: sorted ids + per-band drop-passes over the sorted rows.
    # Probes whether sorted locality + small grids compound; gather cost
    # to produce the sorted rows is excluded (measured separately: 5.7ms).
    NB = 8
    BAND = -(-CELLS // NB)

    def mk_banded(c):
        f = feat + c.astype(feat.dtype) * 0
        outs = []
        for b in range(NB):
            lo = b * BAND
            ib = jnp.where((ids_sorted >= lo) & (ids_sorted < lo + BAND),
                           ids_sorted - lo, BAND)
            outs.append(zscatter(f, ib, BAND, sorted_hint=False))
        return c + sum(o[0, 0].astype(c.dtype) for o in outs) * 0 + 1
    timeit("banded: sorted + 8x drop-pass 12MB grids", mk_banded)


if __name__ == "__main__":
    main()
