"""Scatter voxel max-pooling — the TPU-native equivalent of the reference's
`deep_point` CUDA extension.

Semantics (matching `/root/reference/deep_point/src/point_deep_cuda_kernel.cu`):

* per point, per grid dim: ``cell_d = int(float(ind_d) * scale_d)`` with
  truncation toward zero (`point_deep_cuda_kernel.cu:40`); a point is valid iff
  every ``cell_d`` lies in ``[0, out_size_d)`` (`:41-46`).
* forward: each valid point contributes to the max of its cell across all
  channels; empty cells are 0 (`:56-99` — init-then-atomic-max over a zeroed
  buffer, so empty cells keep the 0 fill while occupied cells take the true
  max even when it is negative).
* backward: the gradient of a cell flows to **every** point whose feature
  value equals the cell max (value-equality ties each receive the full
  gradient, `point_deep_cuda_kernel.cu:109-132`).

TPU formulation: linearize cell ids, route invalid points to a sentinel
segment, and reduce with ``jax.ops.segment_max`` — a single scatter-max that
XLA lowers natively; the backward pass is two gathers and a compare (no
scatter at all). A custom VJP pins the tie semantics above and avoids
re-running the forward scatter in the backward pass.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cell_ids(inds: jax.Array, out_size: Sequence[int],
              scale_rate: Sequence[float],
              phase_split: bool = False,
              row_pad: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Flattened cell id per point plus validity mask.

    inds: (..., N, D) float fractional grid coordinates.
    Returns (flat_id (..., N) int32 with invalid -> num_cells, valid (..., N)).

    phase_split (D == 2 only): linearize as
    ``((cx>>1)*(W/2) + (cy>>1))*4 + (cx&1)*2 + (cy&1)`` so the dense output
    reshapes to (H/2, W/2, 4, C) — the space-to-depth layout that lets the
    header's stride-2 convs run at half resolution without any dense
    rearrangement of the full grid (tools/bench_header.py: the same conv is
    1.7x faster in phase form, and all 512^2-layout copies disappear).

    phase_split="outer": the same cells PHASE-MAJOR —
    ``((phase*rows + (cx>>1)+row_pad)*(W/2) + (cy>>1))`` so the dense
    output reshapes to (4, rows, W/2, C). This is the layout the fused
    Pallas header DMAs per-phase row windows from; with phase outermost the
    scatter's flat (cells, C) output IS that layout bit-for-bit, removing
    the 1.25 ms tile-relayout reshape the phase-minor form paid between the
    scatter and the header (round-3 trace, reshape.223).

    row_pad (phase_split only): shift the half-res row index by ``row_pad``
    and emit ``2*row_pad`` extra (always-empty, zero-filled) rows, so that
    every row window a downstream row-tiled consumer needs — including the
    one-row halo above/below each tile — is a single in-bounds static-size
    DMA slice (ops/fused_header.py reads the grid this way).
    """
    D = len(out_size)
    num_cells = int(np.prod(out_size))
    cells = []
    valid = jnp.ones(inds.shape[:-1], dtype=bool)
    for d in range(D):
        # truncation toward zero, matching the CUDA int64(float * scale) cast
        cell = (inds[..., d].astype(jnp.float32) * np.float32(scale_rate[d])
                ).astype(jnp.int32)
        valid &= (cell >= 0) & (cell < out_size[d])
        cells.append(cell)
    if phase_split:
        assert D == 2 and out_size[0] % 2 == 0 and out_size[1] % 2 == 0
        cx, cy = cells
        rows = out_size[0] // 2 + 2 * row_pad
        if phase_split == "outer":
            phase = (cx & 1) * 2 + (cy & 1)
            flat = ((phase * rows + (cx >> 1) + row_pad)
                    * (out_size[1] // 2) + (cy >> 1))
        else:
            flat = ((((cx >> 1) + row_pad) * (out_size[1] // 2)
                     + (cy >> 1)) * 4 + (cx & 1) * 2 + (cy & 1))
        num_cells = rows * (out_size[1] // 2) * 4
    else:
        flat = jnp.zeros(inds.shape[:-1], dtype=jnp.int32)
        stride = num_cells
        for d in range(D):
            stride //= int(out_size[d])
            flat += cells[d] * stride
    flat = jnp.where(valid, flat, num_cells)
    return flat, valid


def _segment_max_2d(feat: jax.Array, flat: jax.Array, num_cells: int) -> jax.Array:
    """feat (N, C), flat (N,) -> (num_cells, C); empty cells are 0."""
    out = jax.ops.segment_max(feat, flat, num_segments=num_cells + 1,
                              indices_are_sorted=False, unique_indices=False)
    out = out[:num_cells]
    return jnp.where(jnp.isfinite(out), out, jnp.zeros((), feat.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def voxel_max_pool(feat: jax.Array, inds: jax.Array,
                   out_size: Tuple[int, ...],
                   scale_rate: Tuple[float, ...],
                   impl: str = "auto",
                   nonneg: bool = False,
                   phase_split: bool = False,
                   row_pad: int = 0) -> jax.Array:
    """Scatter-max N point features into a dense grid.

    Args:
      feat: (B, N, C) per-point features.
      inds: (B, N, D) fractional grid coordinates (e.g. D=2 for BEV / RV).
      out_size: grid extent per index dim, e.g. (512, 512).
      scale_rate: multiplier applied to each index dim before truncation.
      impl: 'auto' (the XLA scatter — measured fastest on v5e at every
        in-model shape, docs/DESIGN.md), 'xla', or the opt-in Pallas
        ablation kernels 'pallas' (sorted) / 'vmem' (VMEM-resident).
      nonneg: promise that ``feat >= 0`` everywhere (true for every in-model
        call — point features are post-ReLU and labels are non-negative).
        Enables the fast path: `lax.scatter_max` straight into a zero grid,
        skipping segment_max's -inf init + isfinite select (2 extra passes
        over the full grid; measured 1.9x slower on v5e, tools/bench_scatter).
        Semantics are identical for non-negative input: empty cells 0,
        occupied cells the true max.

    Returns:
      (B, *out_size, C) dense grid; cell value = max over points mapping to
      the cell, 0 for empty cells. With ``phase_split=True`` the same cells
      in space-to-depth layout (B, H/2 + 2*row_pad, W/2, 4, C), phase index
      = 2*(x&1)+(y&1); with ``phase_split="outer"`` the phase-MAJOR layout
      (B, 4, H/2 + 2*row_pad, W/2, C) the fused header DMAs from (see
      `_cell_ids`). ``row_pad`` adds that many always-empty half-res rows
      above and below each (phase) plane.
    """
    out, _ = _fwd_impl(feat, inds, out_size, scale_rate, impl, nonneg,
                       phase_split, row_pad)
    return out


def _use_pallas(impl: str, total_cells: int) -> bool:
    from streammos_tpu.ops import pallas_scatter

    if impl == "pallas":
        return total_cells % pallas_scatter.TILE_CELLS == 0
    # 'auto' currently picks the XLA scatter: measured on v5e, the flat
    # segment_max (31 ms bf16 for 1.92M x 64ch -> 12x512^2) still beats the
    # sorted Pallas kernel (68 ms — the XLA sort alone costs ~20 ms and the
    # in-kernel sublane rolls dominate the rest). The kernel remains opt-in
    # for further tuning.
    return False


def _use_vmem(impl: str, num_cells: int, C: int, itemsize: int,
              nonneg: bool) -> bool:
    # VMEM-resident scatter (ops/pallas_scatter_vmem.py): OPT-IN ONLY.
    # Measured on v5e (round 3, in-file _bench, bf16, all four in-model
    # cascade shapes): the kernel LOSES to the XLA scatter everywhere —
    # 0.61x (stage0_bev, K=2), 0.33x (stage0_rv, K=8), 0.85x (stage1_bev),
    # 0.59x (stage1_rv). The masked-window RMW costs ~18-38 ns/update
    # against XLA's ~11-17 ns/row at these grid sizes, and K-copy
    # interleaving does not close the gap (the update is vector-work-bound:
    # ~12 (8,128)-ops to modify one 8-row window). Round-2's default-on
    # routing was based on an unmeasured claim; 'auto' now stays on XLA
    # (docs/DESIGN.md "VMEM scatter ablation").
    if impl != "vmem":
        return False
    if not nonneg:
        raise ValueError(
            "impl='vmem' requires nonneg=True (the kernel zero-inits "
            "its grid copies)")
    from streammos_tpu.ops import pallas_scatter_vmem

    if not pallas_scatter_vmem.fits_vmem(num_cells, C, itemsize):
        raise ValueError(
            f"impl='vmem' rejected: grid ({num_cells} cells x {C} ch, "
            f"itemsize {itemsize}) fails fits_vmem — needs C % 128 == 0 "
            "and >=2 grid copies inside the VMEM budget")
    if jax.default_backend() != "tpu":
        raise ValueError(
            "impl='vmem' rejected: the VMEM-resident kernel only runs "
            "on the TPU backend (interpret-mode tests should call "
            "scatter_max_vmem directly)")
    return True


def _fwd_impl(feat, inds, out_size, scale_rate, impl, nonneg=False,
              phase_split=False, row_pad=0):
    B, N, C = feat.shape
    flat, valid = _cell_ids(inds, out_size, scale_rate, phase_split, row_pad)
    if phase_split:
        H, W = out_size
        rows = H // 2 + 2 * row_pad
        grid_shape = ((4, rows, W // 2) if phase_split == "outer"
                      else (rows, W // 2, 4))
    else:
        grid_shape = tuple(out_size)
    num_cells = int(np.prod(grid_shape))
    offsets = (jnp.arange(B, dtype=jnp.int32) * num_cells)[:, None]
    flat_global = jnp.where(valid, flat + offsets, B * num_cells)
    if _use_vmem(impl, num_cells, C, feat.dtype.itemsize, nonneg):
        from streammos_tpu.ops import pallas_scatter_vmem

        pooled = pallas_scatter_vmem.scatter_max_vmem(feat, flat, num_cells)
        out = pooled.reshape((B,) + grid_shape + (C,))
    elif _use_pallas(impl, B * num_cells):
        from streammos_tpu.ops import pallas_scatter

        pooled = pallas_scatter.scatter_max_pallas(
            feat.reshape(-1, C), flat_global.reshape(-1), B * num_cells)
        out = pooled.reshape((B,) + grid_shape + (C,))
    elif nonneg:
        # feat >= 0: scatter-max straight into zeros — empty cells keep the
        # 0 fill; no -inf sentinel pass, no isfinite select.
        #
        # Lane-pad the feature width to 128 when the flat grid is large:
        # at C < 128 and B*num_cells >= 2^20, XLA's layout assignment flips
        # the scatter operand/result to the TRANSPOSED {0,1} layout (to
        # dodge the 2x lane padding of the row-major form) and every row
        # update becomes strided — measured 187 ns/row vs 15 ns/row on v5e
        # (round 4; this was the whole bs2 train-step superlinearity,
        # 3 x 140 ms of a 1.10 s step). Scatters are row-count bound, so
        # the wider rows are free; the zero columns scatter onto zeros.
        C_pad = 128 if (C < 128 and B * num_cells >= 1 << 20) else C
        f = feat.reshape(-1, C)
        if C_pad != C:
            f = jnp.pad(f, ((0, 0), (0, C_pad - C)))
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        pooled = jax.lax.scatter_max(
            jnp.zeros((B * num_cells, C_pad), feat.dtype),
            flat_global.reshape(-1, 1), f, dnums,
            indices_are_sorted=False, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
        if C_pad != C:
            pooled = pooled[:, :C]
        out = pooled.reshape((B,) + grid_shape + (C,))
    else:
        # one flat segment_max over all batches (the vmap'd form lowers to
        # the same scatter but the flat ids let XLA fuse the offset math).
        # Same large-grid lane-padding guard as the nonneg path (see above).
        C_pad = 128 if (C < 128 and B * num_cells >= 1 << 20) else C
        f = feat.reshape(-1, C)
        if C_pad != C:
            f = jnp.pad(f, ((0, 0), (0, C_pad - C)))
        pooled = jax.ops.segment_max(f,
                                     flat_global.reshape(-1),
                                     num_segments=B * num_cells + 1,
                                     indices_are_sorted=False,
                                     unique_indices=False)[:-1]
        if C_pad != C:
            pooled = pooled[:, :C]
        pooled = jnp.where(jnp.isfinite(pooled), pooled,
                           jnp.zeros((), feat.dtype))
        out = pooled.reshape((B,) + grid_shape + (C,))
    return out, (feat, flat, valid, out)


def _bwd(out_size, scale_rate, impl, nonneg, phase_split, row_pad, res, g):
    feat, flat, valid, out = res
    B, N, C = feat.shape
    num_cells = int(np.prod(out.shape[1:-1]))
    out_flat = out.reshape(B, num_cells, C)
    g_flat = g.reshape(B, num_cells, C).astype(out.dtype)
    safe = jnp.minimum(flat, num_cells - 1)
    # gather each point's cell max and cell grad as ONE fused 2C-wide row:
    # TPU gathers are row-count bound (ns/row ~flat up to 128 lanes), so one
    # [max | grad] fetch halves the dominant backward cost vs two C-wide
    # gathers — 4.51 -> 2.22 ms at the big-grid train shape, the concat
    # fusing into the gather (tools/bench_train_roofline.py, round 5; this
    # was 32 ms/step of the bs1 train profile across all pool sites).
    both = jnp.concatenate([out_flat, g_flat], axis=-1)
    rows = jnp.take_along_axis(both, safe[..., None], axis=1)
    cell_max = rows[..., :C]
    cell_grad = rows[..., C:]
    is_max = valid[..., None] & (feat == cell_max)
    grad_feat = jnp.where(is_max, cell_grad, jnp.zeros((), g.dtype))
    return grad_feat.astype(feat.dtype), None


voxel_max_pool.defvjp(_fwd_impl, _bwd)


def voxel_max_pool_ref(feat: np.ndarray, inds: np.ndarray,
                       out_size: Sequence[int],
                       scale_rate: Sequence[float]) -> np.ndarray:
    """Slow, obviously-correct NumPy reference (for parity tests), mirroring
    the CPU fallback `deep_point/src/point_deep.cpp:18-132`."""
    B, N, C = feat.shape
    out = np.zeros((B,) + tuple(out_size) + (C,), dtype=feat.dtype)
    filled = np.zeros((B,) + tuple(out_size), dtype=bool)
    D = len(out_size)
    for b in range(B):
        for n in range(N):
            cell = []
            ok = True
            for d in range(D):
                c = int(np.float32(inds[b, n, d]) * np.float32(scale_rate[d]))
                if 0 <= c < out_size[d]:
                    cell.append(c)
                else:
                    ok = False
                    break
            if not ok:
                continue
            idx = (b,) + tuple(cell)
            if filled[idx]:
                out[idx] = np.maximum(out[idx], feat[b, n])
            else:
                out[idx] = feat[b, n]
                filled[idx] = True
    return out
