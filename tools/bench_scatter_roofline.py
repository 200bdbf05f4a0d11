"""Scatter roofline: decompose every known route to the full-grid scatter-max
into its machine primitives and measure each on the chip, so "the ~19 ns/row
XLA scatter is the architectural floor" is a table, not a claim.

Production shape (`models/stream_mos.py` full-grid scatter, VERDICT r3 #1):
R = 3x160k = 480k point rows, C = 256 bf16 lanes (TTA-folded), 792,576
phase-split output cells (258*256*4 cells x 3 frames).

Routes and their primitive decompositions:

  A. XLA scatter-max (production)          = [scatter_max]
  B. sort-based (r2 kernel)                = [sort_kv] + [gather_rows]
                                             + [presorted_consume]
  C. radix-binned (DESIGN sketch)          = [rank_mxu] + (apply permutation:
        either [narrow_scatter] to invert + [gather_rows], or direct
        in-kernel row placement whose floor is [hbm_copy] x passes)
                                             + [presorted_consume or banded max]
  D. information floor                     = [hbm_copy] over in+out bytes

Every route that avoids [scatter_max] still needs (a) the permutation
applied to 245 MB of rows, floored by [hbm_copy]-class traffic, and (b) a
duplicate-combining consume, floored by [presorted_consume] — measured here
with the sort ALREADY PAID, i.e. the best case any binning scheme could
reach. If sorted-consume + movement floors >= [scatter_max], no two-pass
design wins on this chip.

Usage: python tools/bench_scatter_roofline.py [case ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

R, C = 480000, 256
N_CELLS = 792576  # 258*256*4 phase cells x 3 frames (row_pad=1 layout)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    sel = sys.argv[1:]

    def want(name):
        return not sel or any(s in name for s in sel)

    trivial = jax.jit(lambda x: x.sum())
    float(trivial(jnp.zeros((8, 8))))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(jnp.zeros((8, 8))))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    results = {}

    def timeit(name, fn, init, K=4, reps=3):
        if not want(name):
            return
        @jax.jit
        def chained(c):
            for _ in range(K):
                c = fn(c)
            return c
        c = chained(init)
        float(c)  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(init))
            ts.append(time.perf_counter() - t0)
        ms = (np.median(ts) - rtt) / K * 1e3
        results[name] = ms
        print(f"{name:34s} {ms:8.2f} ms   ({ms*1e6/R:6.1f} ns/row)",
              flush=True)
        return ms

    rng = np.random.default_rng(0)
    feat = jnp.asarray(np.abs(rng.normal(size=(R, C))).astype(np.float32)
                       ).astype(jnp.bfloat16)
    # production-like ids: skewed (near-range cells collect many points),
    # ~5% sentinel (out of range)
    raw = rng.zipf(1.35, R) % N_CELLS
    ids_np = ((raw * 2654435761) % N_CELLS).astype(np.int32)
    ids_np[rng.uniform(size=R) < 0.05] = N_CELLS
    ids = jnp.asarray(ids_np)

    # --- A. the production XLA scatter-max (zeros init, FILL_OR_DROP)
    def xla_scatter(c):
        f = feat + c.astype(feat.dtype) * 0
        i = (ids + c.astype(jnp.int32) * 0)
        out = jnp.zeros((N_CELLS + 1, C), feat.dtype)
        out = out.at[i].max(f, mode="drop")
        return c + out[0, 0].astype(jnp.float32) * 0 + 1
    timeit("A_xla_scatter_max", xla_scatter, jnp.zeros((), jnp.float32))

    # --- D. HBM traffic floor: stream in+out bytes once (copy kernel)
    nbytes = R * C * 2 + (N_CELLS + 1) * C * 2
    big = jnp.asarray(rng.normal(size=(nbytes // 512, 256)
                                 ).astype(np.float32)).astype(jnp.bfloat16)
    def hbm_copy(c):
        return c + (big + c.astype(big.dtype) * 0)[0, 0].astype(jnp.float32) * 0 + 1
    # the copy materializes `big + 0*c` = read + write of `nbytes`
    timeit("D_hbm_copy_inout_bytes", hbm_copy, jnp.zeros((), jnp.float32))

    # --- B/C movement primitives
    perm_np = rng.permutation(R).astype(np.int32)
    perm = jnp.asarray(perm_np)

    def gather_rows(c):
        p = perm + c.astype(jnp.int32) * 0
        out = jnp.take(feat + c.astype(feat.dtype) * 0, p, axis=0)
        return c + out[0, 0].astype(jnp.float32) * 0 + 1
    timeit("B_gather_rows_256L", gather_rows, jnp.zeros((), jnp.float32))

    def sort_kv(c):
        k = ids + c.astype(jnp.int32) * 0
        ks, vs = lax.sort_key_val(k, jnp.arange(R, dtype=jnp.int32))
        return c + (ks[0] + vs[0]).astype(jnp.float32) * 0 + 1
    timeit("B_sort_keys_480k", sort_kv, jnp.zeros((), jnp.float32))

    def narrow_scatter(c):
        # the permutation-invert primitive any binned design needs if it
        # scatters indices instead of sorting: 480k int32 single-lane rows
        p = perm + c.astype(jnp.int32) * 0
        out = jnp.zeros((R,), jnp.int32)
        out = out.at[p].set(jnp.arange(R, dtype=jnp.int32))
        return c + out[0].astype(jnp.float32) * 0 + 1
    timeit("C_narrow_scatter_int32", narrow_scatter,
           jnp.zeros((), jnp.float32))

    # --- B. pre-sorted Pallas consume (sort ALREADY PAID — the upper bound
    # for ANY scheme that groups duplicates before combining)
    from streammos_tpu.ops.pallas_scatter import sorted_scatter_max
    ids_sorted_np = np.sort(ids_np)
    feats_sorted = jnp.asarray(
        rng.normal(size=(R, C)).astype(np.float32)).astype(jnp.bfloat16)
    ids_sorted = jnp.asarray(ids_sorted_np)
    n_cells_pad = -(-(N_CELLS + 1) // 1024) * 1024

    def presorted_consume(c):
        f = feats_sorted + c.astype(feats_sorted.dtype) * 0
        out = sorted_scatter_max(f, ids_sorted, n_cells_pad)
        return c + out[0, 0].astype(jnp.float32) * 0 + 1
    timeit("B_presorted_pallas_consume", presorted_consume,
           jnp.zeros((), jnp.float32))

    # XLA segment-max over PRE-SORTED ids (XLA's own consume on grouped
    # input — does sortedness help its scatter lowering?)
    def presorted_xla(c):
        f = feats_sorted + c.astype(feats_sorted.dtype) * 0
        out = jnp.zeros((N_CELLS + 1, C), f.dtype)
        out = out.at[ids_sorted].max(f, mode="drop")
        return c + out[0, 0].astype(jnp.float32) * 0 + 1
    timeit("B_presorted_xla_scatter", presorted_xla,
           jnp.zeros((), jnp.float32))

    # --- C. MXU rank-within-bin pass (the radix-binning "histogram via
    # one-hot matmul" that would replace the sort): 512 bins, blocked
    # tile-local ranks via triangular matmul + cross-tile offset cumsum.
    BINS = 512
    TILE = 1024
    n_tiles = R // TILE
    tri = jnp.asarray(np.tril(np.ones((TILE, TILE), np.float32), -1)
                      ).astype(jnp.bfloat16)

    def rank_mxu(c):
        b = ((ids + c.astype(jnp.int32) * 0) % BINS).reshape(n_tiles, TILE)
        onehot = (b[..., None] == jnp.arange(BINS)[None, None, :]
                  ).astype(jnp.bfloat16)
        # rank of each point within its bin inside the tile
        local = lax.dot_general(
            tri, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (TILE, n_tiles, BINS)? no:
        # dot_general(tri (T,T), onehot (nt,T,B)) contracting tri dim1 with
        # onehot dim1 -> (T, nt, B); select own bin
        own = jnp.take_along_axis(
            local.transpose(1, 0, 2), b[..., None], axis=-1)[..., 0]
        counts = onehot.sum(axis=1)  # (nt, BINS)
        offs = jnp.cumsum(counts, axis=0) - counts  # exclusive, per tile
        base = jnp.take_along_axis(offs, b, axis=-1)
        dst = (own + base).astype(jnp.int32)
        return c + dst[0, 0].astype(jnp.float32) * 0 + 1
    timeit("C_rank_within_bin_mxu", rank_mxu, jnp.zeros((), jnp.float32))

    print(json.dumps({"metric": "scatter_roofline_ms", "shape":
                      f"{R}x{C}bf16->{N_CELLS}", **{k: round(v, 2)
                      for k, v in results.items()}}))


if __name__ == "__main__":
    main()
