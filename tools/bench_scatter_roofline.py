"""Scatter roofline: decompose every known route to the full-grid scatter-max
into its machine primitives and measure each on the chip, so "the ~17-21
ns/row XLA scatter is the architectural floor" is a table, not a claim.

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

Measurement notes: all big operands are generated ON DEVICE and passed as
explicit jit ARGUMENTS — a closed-over device array is serialized into the
remotely-compiled HLO on this backend (a 650 MB constant upload hangs the
tunnel for tens of minutes).

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

    def timeit(name, fn, ops, K=4, reps=4):
        """fn(c, ops) -> c; ops is a dict of device arrays passed as REAL
        jit arguments (never closure constants — see module docstring)."""
        if not want(name):
            return
        @jax.jit
        def chained(c, ops):
            for _ in range(K):
                c = fn(c, ops)
            return c
        init = jnp.zeros((), jnp.float32)
        float(chained(init, ops))  # compile
        float(chained(init, ops))  # executable warmup
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(init, ops))
            ts.append(time.perf_counter() - t0)
        ms = (np.median(ts) - rtt) / K * 1e3
        results[name] = ms
        print(f"{name:34s} {ms:8.2f} ms   ({ms*1e6/R:6.1f} ns/row)",
              flush=True)
        return ms

    rng = np.random.default_rng(0)
    # bulk arrays on device (the tunnel moves ~10s of MB/s host->device)
    feat = jax.jit(lambda k: jnp.abs(
        jax.random.normal(k, (R, C), jnp.bfloat16)))(jax.random.key(0))
    # production-like ids: skewed (near-range cells collect many points),
    # ~5% sentinel (out of range)
    raw = rng.zipf(1.35, R) % N_CELLS
    ids_np = ((raw * 2654435761) % N_CELLS).astype(np.int32)
    ids_np[rng.uniform(size=R) < 0.05] = N_CELLS
    ids = jnp.asarray(ids_np)

    # --- A. the production XLA scatter-max (zeros init, FILL_OR_DROP)
    def xla_scatter(c, ops):
        # every iteration's operand depends on c, or XLA CSEs the K chained
        # copies of the op into one (measured: a K=32 chain of
        # c-independent gathers runs in ~0 ms)
        f = ops["feat"] + c.astype(jnp.bfloat16)
        out = jnp.zeros((N_CELLS + 1, C), jnp.bfloat16)
        out = out.at[ops["ids"]].max(f, mode="drop")
        return c + out[0, 0].astype(jnp.float32) * 1e-9 + 1
    timeit("A_xla_scatter_max", xla_scatter, {"feat": feat, "ids": ids})

    # --- D. HBM traffic reference: one full read+write pass over the
    # scatter's input bytes (the in+out floor is reported analytically from
    # the measured copy bandwidth)
    def hbm_read(c, ops):
        # add+mean fuse into ONE read pass over feat (no write) — a clean
        # single-pass streaming-read reference; nonlinearity prevents
        # algebraic shortcuts
        out = jnp.maximum(ops["feat"] + c.astype(jnp.bfloat16), 0.25)
        return c + out.astype(jnp.float32).mean() * 1e-6 + 1
    ms = timeit("D_hbm_read_feat", hbm_read, {"feat": feat}, K=64)
    if ms:
        bw = R * C * 2 / (ms * 1e-3) / 1e9
        total = (R * C * 2 + (N_CELLS + 1) * C * 2) * 2  # read+write in+out
        results["D_floor_inout_bytes_ms"] = total / (bw * 1e9) * 1e3
        print(f"  -> streaming BW {bw:.0f} GB/s; in+out floor "
              f"{results['D_floor_inout_bytes_ms']:.2f} ms", flush=True)

    # --- B/C movement primitives
    perm = jnp.asarray(rng.permutation(R).astype(np.int32))

    def gather_rows(c, ops):
        p = (ops["perm"] + c.astype(jnp.int32)) % R  # still a bijection
        out = jnp.take(ops["feat"], p, axis=0)
        # mean forces every gathered row to be fetched (fuses with the
        # gather: no output write, which is fine — we want the row-fetch cost)
        return c + out.astype(jnp.float32).mean() * 1e-6 + 1
    timeit("B_gather_rows_256L", gather_rows,
           {"feat": feat, "perm": perm}, K=32)

    def sort_kv(c, ops):
        k = ops["ids"] + c.astype(jnp.int32)
        ks, vs = lax.sort_key_val(k, jnp.arange(R, dtype=jnp.int32))
        # middle elements can only come from actually sorting
        return c + (ks[R // 2] + vs[R // 2]).astype(jnp.float32) * 1e-9 + 1
    timeit("B_sort_keys_480k", sort_kv, {"ids": ids}, K=32)

    def narrow_scatter(c, ops):
        # the permutation-invert primitive any binned design needs if it
        # scatters indices instead of sorting: 480k int32 single-lane rows
        p = (ops["perm"] + c.astype(jnp.int32)) % R
        out = jnp.zeros((R,), jnp.int32)
        out = out.at[p].set(jnp.arange(R, dtype=jnp.int32))
        return c + out[R // 2].astype(jnp.float32) * 1e-9 + 1
    timeit("C_narrow_scatter_int32", narrow_scatter, {"perm": perm},
           K=32)

    # --- B. pre-sorted consume (sort ALREADY PAID — the upper bound for ANY
    # scheme that groups duplicates before combining). Values need no
    # relation to ids for timing; reuse feat.
    from streammos_tpu.ops.pallas_scatter import sorted_scatter_max
    ids_sorted = jnp.asarray(np.sort(ids_np))
    n_cells_pad = -(-(N_CELLS + 1) // 1024) * 1024

    def presorted_consume(c, ops):
        f = ops["feat"] + c.astype(jnp.bfloat16)
        out = sorted_scatter_max(f, ops["ids_sorted"], n_cells_pad)
        return c + out[0, 0].astype(jnp.float32) * 1e-9 + 1
    timeit("B_presorted_pallas_consume", presorted_consume,
           {"feat": feat, "ids_sorted": ids_sorted})

    # XLA's own scatter over PRE-SORTED ids — does grouping help its
    # serialized lowering?
    def presorted_xla(c, ops):
        f = ops["feat"] + c.astype(jnp.bfloat16)
        out = jnp.zeros((N_CELLS + 1, C), jnp.bfloat16)
        out = out.at[ops["ids_sorted"]].max(f, mode="drop")
        return c + out[0, 0].astype(jnp.float32) * 1e-9 + 1
    timeit("B_presorted_xla_scatter", presorted_xla,
           {"feat": feat, "ids_sorted": ids_sorted})

    # --- C. MXU rank-within-bin pass (the radix-binning "histogram via
    # one-hot matmul" that would replace the sort): 512 bins, blocked
    # tile-local ranks via triangular matmul + cross-tile offset cumsum.
    BINS = 512
    TILE = 1024
    R_pad = -(-R // TILE) * TILE
    n_tiles = R_pad // TILE
    tri = jnp.asarray(np.tril(np.ones((TILE, TILE), np.float32), -1)
                      ).astype(jnp.bfloat16)

    def rank_mxu(c, ops):
        ids_pad = jnp.pad(ops["ids"], (0, R_pad - R))
        b = ((ids_pad + c.astype(jnp.int32)) % BINS
             ).reshape(n_tiles, TILE)
        onehot = (b[..., None] == jnp.arange(BINS)[None, None, :]
                  ).astype(jnp.bfloat16)
        # per-tile rank of each point within its bin: contract the strict
        # lower-triangle against the one-hot along the tile axis
        local = lax.dot_general(
            ops["tri"], onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (TILE, n_tiles, BINS)
        own = jnp.take_along_axis(
            local.transpose(1, 0, 2), b[..., None], axis=-1)[..., 0]
        counts = onehot.sum(axis=1)  # (n_tiles, BINS)
        offs = jnp.cumsum(counts, axis=0) - counts
        base = jnp.take_along_axis(offs, b, axis=-1)
        dst = (own + base).astype(jnp.int32)
        return c + dst.astype(jnp.float32).mean() * 1e-9 + 1
    timeit("C_rank_within_bin_mxu", rank_mxu, {"ids": ids, "tri": tri},
           K=16)

    print(json.dumps({"metric": "scatter_roofline_ms", "shape":
                      f"{R}x{C}bf16->{N_CELLS}", **{k: round(v, 2)
                      for k, v in results.items()}}))


if __name__ == "__main__":
    main()
