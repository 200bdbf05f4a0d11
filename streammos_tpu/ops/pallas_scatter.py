"""Pallas TPU kernel for sorted scatter-max — the fast path of
`voxel_max_pool`.

Why: XLA lowers a scatter-max over millions of non-unique rows to ~17 ns/row
serial updates (33-70 ms for the 1.92M-point full-grid scatter, measured on
v5e). The TPU-native formulation here:

1. XLA side: linearize cell ids, sort points by id (`lax.sort_key_val`,
   ~0.5 ms for 2M keys), gather rows into sorted order (row-count-bound
   gather), and compute per-output-tile point ranges with `searchsorted`.
2. Pallas kernel, sequential grid over output tiles of ``TILE_CELLS`` cells:
   stream the tile's (contiguous!) sorted rows chunk by chunk via async DMA;
   run a *segmented Hillis-Steele max-scan* over each chunk entirely in VMEM
   (log2(CHUNK) vectorized rounds — sortedness makes the segment test a
   simple id equality at distance s); then place each id-run's maximum into
   the output tile with a **one-hot matmul on the MXU** (at most one run-end
   per cell per chunk, so the sum-reduction of the matmul is exact), and
   max-combine across chunks for runs that straddle chunk boundaries.

Everything between HBM reads and the final tile write lives in VMEM; the MXU
does the placement instead of per-row scatter. Empty cells come out 0 and
negative maxima are preserved (cover/has masks, not max-with-0), matching the
CUDA reference semantics (`deep_point/src/point_deep_cuda_kernel.cu:56-99`).

Implementation notes:
* HBM DMA slices must be 128-lane aligned, so the feature row is padded to
  128 lanes and the point's cell id rides IN the row as exactly-representable
  float lanes (f32: the id value directly — exact below 2^24; bf16: three
  base-256 digits, each < 256 and exact in bf16). One DMA per chunk.
* ``pltpu.roll`` only accepts non-negative shifts; "next row" is a roll by
  CHUNK-1 with the wrapped row overridden by the chunk-end mask.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_CELLS = 1024
CHUNK = 1024


def _make_kernel(C: int, n_id_lanes: int, exact_f32: bool,
                 C_out: int | None = None):
    """C_out: output lane count. When C is already 128-aligned the output
    carries exactly C lanes (no id/pad lanes), halving output HBM traffic
    and removing the post-kernel slice copy."""
    C_out = C if C_out is None else C_out
    def kernel(starts_ref, packed_hbm, out_ref, vals, has, sem_f):
        t = pl.program_id(0)
        start = starts_ref[t]
        end = starts_ref[t + 1]
        base_cell = t * TILE_CELLS

        out_ref[:] = jnp.zeros_like(out_ref)
        has[:] = jnp.zeros_like(has)

        # DMA row offsets must be sublane-aligned (bf16 HBM tiling is
        # (8,128)); round the tile's start down and mask the borrowed rows —
        # they belong to the previous tile and their local ids are negative.
        astart = (start // 8) * 8
        n_chunks = pl.cdiv(end - astart, CHUNK)

        def get_dma(slot, k):
            off = astart + k * CHUNK
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(off, CHUNK), :], vals.at[slot],
                sem_f.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def body(k, _):
            off = astart + k * CHUNK
            slot = k % 2

            @pl.when(k + 1 < n_chunks)
            def _():
                get_dma((k + 1) % 2, k + 1).start()

            get_dma(slot, k).wait()

            row = vals[slot]
            if n_id_lanes == 1:
                ids_all = row[:, C:C + 1].astype(jnp.int32)
            else:
                hi = row[:, C:C + 1].astype(jnp.int32)
                mid = row[:, C + 1:C + 2].astype(jnp.int32)
                lo = row[:, C + 2:C + 3].astype(jnp.int32)
                ids_all = hi * 65536 + mid * 256 + lo

            idx = lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
            in_range = ((off + idx) < end) & ((off + idx) >= start)
            ids_local = jnp.where(in_range, ids_all - base_cell, -1)
            # Mosaic's rotate only supports 32-bit data; a f32 view is exact
            # for bf16 values and lives entirely in VMEM
            v = row.astype(jnp.float32)

            # segmented prefix-max: rows of one id-run are contiguous
            # (sorted), so combining at distance s is valid iff ids match
            s = 1
            while s < CHUNK:
                pv = pltpu.roll(v, s, axis=0)
                pid = pltpu.roll(ids_local, s, axis=0)
                ok = (ids_local == pid) & (idx >= s)
                v = jnp.where(ok, jnp.maximum(v, pv), v)
                s *= 2

            # a run's last row inside this chunk carries its partial maximum
            nid = pltpu.roll(ids_local, CHUNK - 1, axis=0)  # next row's id
            is_end = ((ids_local != nid) | (idx == CHUNK - 1)) & (ids_local >= 0)

            cell_iota = lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_CELLS), 1)
            onehot = ((ids_local == cell_iota) & is_end).astype(jnp.float32)
            # Precision.HIGHEST keeps genuinely-f32 rows exact on the MXU
            # (default precision rounds operands to bf16); rows that began as
            # bf16 are exact at default precision since one-hot factors are 0/1.
            precision = (lax.Precision.HIGHEST if exact_f32
                         else lax.Precision.DEFAULT)
            placed = lax.dot_general(onehot, v[:, :C_out],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)
            cover = lax.dot_general(onehot, jnp.ones((CHUNK, 1), jnp.float32),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

            placed = placed.astype(out_ref.dtype)
            prev = out_ref[:]
            combined = jnp.where(has[:] > 0, jnp.maximum(prev, placed), placed)
            out_ref[:] = jnp.where(cover > 0, combined, prev)
            has[:] = jnp.maximum(has[:], cover)
            return 0

        lax.fori_loop(0, n_chunks, body, 0, unroll=False)

    return kernel


def _id_lanes(ids: jax.Array, dtype) -> jax.Array:
    """Encode int32 ids exactly into float lanes of ``dtype``."""
    if dtype == jnp.float32:
        return ids[:, None].astype(jnp.float32)  # exact below 2^24
    assert dtype == jnp.bfloat16, dtype
    hi = (ids // 65536).astype(jnp.bfloat16)
    mid = ((ids // 256) % 256).astype(jnp.bfloat16)
    lo = (ids % 256).astype(jnp.bfloat16)
    return jnp.stack([hi, mid, lo], axis=-1)


@functools.partial(jax.jit, static_argnums=(2,))
def sorted_scatter_max(feats_sorted: jax.Array, ids_sorted: jax.Array,
                       n_cells: int) -> jax.Array:
    """feats_sorted (P, C) rows sorted by cell id; ids_sorted (P,) int32 in
    [0, n_cells] (n_cells = invalid sentinel, sorted to the end).
    Returns (n_cells, C) with per-cell maxima (empty cells 0)."""
    P, C = feats_sorted.shape
    assert n_cells % TILE_CELLS == 0, (n_cells, TILE_CELLS)
    n_tiles = n_cells // TILE_CELLS
    dtype = feats_sorted.dtype
    n_id = 1 if dtype == jnp.float32 else 3
    C_pad = max(128, -(-(C + n_id) // 128) * 128)
    # 128-aligned feature width: the output carries only the C feature lanes
    # (no id/pad lanes, no post-kernel slice copy)
    C_out = C if C % 128 == 0 else C_pad

    starts = jnp.searchsorted(
        ids_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_CELLS
    ).astype(jnp.int32)

    packed = jnp.concatenate(
        [feats_sorted, _id_lanes(ids_sorted, dtype)], axis=-1)
    # pad lanes to 128 alignment and rows so chunk DMA never overruns
    packed = jnp.pad(packed, ((0, CHUNK), (0, C_pad - C - n_id)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE_CELLS, C_out), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, C_pad), dtype),
            pltpu.VMEM((TILE_CELLS, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(C, n_id, dtype == jnp.float32, C_out),
        out_shape=jax.ShapeDtypeStruct((n_cells, C_out), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(starts, packed)
    return out if C_out == C else out[:, :C]


def scatter_max_pallas(feat: jax.Array, flat_ids: jax.Array,
                       n_cells_total: int) -> jax.Array:
    """Batched scatter-max front end: feat (R, C) unsorted rows, flat_ids (R,)
    int32 in [0, n_cells_total] (sentinel = invalid). Sorts, runs the kernel,
    returns (n_cells_total, C)."""
    R, C = feat.shape
    ids_sorted, perm = lax.sort_key_val(flat_ids.astype(jnp.int32),
                                        jnp.arange(R, dtype=jnp.int32))
    feats_sorted = jnp.take(feat, perm, axis=0)
    return sorted_scatter_max(feats_sorted, ids_sorted, n_cells_total)
