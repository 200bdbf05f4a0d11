"""Folded test-time-augmentation scatter/gather.

The reference's eval TTA runs the four (x, y) sign-flip variants of every
scan as a batch of 4 (`/root/reference/datasets/data_StreamMOS.py:495-513`).
On TPU the scatter and gather ops that mediate the point<->grid exchange are
*row-count bound* (see docs/DESIGN.md), so running 4 variants as batch slabs
quadruples the cost of the most expensive ops in the frame.

But the flips are structure-preserving bijections of the grid index space:

* BEV (`geometry.quantize`): ``x' = -x  =>  cx' = X - cx`` (fractional), so
  the flipped cell id is an exact axis REVERSAL ``X-1-cell`` (up to the
  measure-zero set of points whose fractional coordinate is exactly integral).
* RV (`geometry.sphere_quantize`, phi = pi - atan2(x, y), full 360deg span):
  - flip x:  phi' = 2pi - phi          => column REVERSAL  ``W-1-c``
  - flip y:  phi' = (pi - phi) mod 2pi => REVERSAL + ROLL   ``(W/2-1-c) % W``
  - flip xy: phi' = (pi + phi) mod 2pi => pure ROLL         ``(c + W/2) % W``
  - theta rows are invariant (z and the range are unchanged).

So all four variants share one collision structure: we scatter ONCE with the
variant-0 cell ids carrying the 4 variants' features side by side in the
channel dimension (4x fewer scatter rows — the dominant cost), then expand
to per-variant grids by applying each variant's (involutive) axis
permutation to the dense output. Gathers fold the same way: per-variant
grids are aligned back to canonical coordinates with the same permutations,
stacked along channels, and every point fetches ONE wide patch row covering
all variants' bilinear taps (a reversed axis shifts the tap window from
{x0, x0+1} to {x0-1, x0}, so a 3-wide window serves every variant).

Exactness: identical to running the variants independently, except (a) on
the measure-zero set of exactly-integral fractional coordinates and (b) the
bilinear fractions enter as ``1-f`` instead of ``frac(W - p)`` (equal up to
1 ulp of the coordinate). Dense compute (convs, BN, attention) still runs
per-variant — only the point-mediated index structure is shared.

Variant order matches `models.stream_mos.tta_expand`:
(+x,+y), (+x,-y), (-x,+y), (-x,-y).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streammos_tpu.ops.voxel_pool import voxel_max_pool

V_TTA = 4

# per-variant axis transforms, in tta_expand order.
# BEV grid axes are (x_cell, y_cell) (voxel_pool dim order = coord order).
_BEV_TRANSFORMS = (("id", "id"), ("id", "rev"), ("rev", "id"), ("rev", "rev"))
# RV grid axes are (theta_row, phi_col); theta is flip-invariant.
_RV_TRANSFORMS = (("id", "id"), ("id", "revroll"), ("id", "rev"), ("id", "roll"))


def _transforms(kind: str):
    if kind == "bev":
        return _BEV_TRANSFORMS
    if kind == "rv":
        return _RV_TRANSFORMS
    raise ValueError(f"unknown grid kind {kind!r}")


def _cell_map(transform: str, size: int) -> np.ndarray:
    """The involution T mapping a variant-0 cell to the variant's cell (and
    back). Derived from the flip algebra above; the truncation cast commutes
    with the flip for non-integral fractional coords."""
    c = np.arange(size)
    if transform == "id":
        return c
    if transform == "rev":
        return size - 1 - c
    if transform == "revroll":
        return (size // 2 - 1 - c) % size
    if transform == "roll":
        return (c + size // 2) % size
    raise ValueError(transform)


def _perm_ext(transform: str, size: int, shift: int = 0) -> np.ndarray:
    """T over the extended tap window [-1, size] pre-shifted by `shift`
    canonical positions (slab slot j holds T(j - 1 + shift)), with
    out-of-range targets routed to the zero slot `size` (rolled transforms
    never leave range — their seam taps are masked by the per-variant
    weights instead)."""
    pos = np.arange(-1, size + 1) + shift
    if transform == "id":
        t = pos
    elif transform == "rev":
        t = size - 1 - pos
    elif transform == "revroll":
        t = (size // 2 - 1 - pos) % size
    elif transform == "roll":
        t = (pos + size // 2) % size
    else:
        raise ValueError(transform)
    return np.where((t >= 0) & (t < size), t, size).astype(np.int32)


def _orient_axis(grid: jax.Array, tr: str, axis: int) -> jax.Array:
    """out[..., i, ...] = grid[..., T(i), ...] for the involution T of
    `_cell_map`, built from reverse/roll primitives instead of a gather
    (a `jnp.take` by these index maps lowers to a row-gather that costs
    ~6x a plain reversal copy on the full 512^2 grid; `lax.rev` and the
    slice+concat of `jnp.roll` run at stream speed)."""
    size = grid.shape[axis]
    if tr == "id":
        return grid
    if tr == "rev":
        return jax.lax.rev(grid, (axis,))
    if tr == "roll":
        # T(i) = (i + size/2) % size  ->  out = grid rolled by -size/2 == +size/2
        return jnp.roll(grid, size // 2, axis=axis)
    if tr == "revroll":
        # T(i) = (size/2 - 1 - i) % size = roll_{size/2}(rev)(i)
        return jnp.roll(jax.lax.rev(grid, (axis,)), size // 2, axis=axis)
    raise ValueError(tr)


def orient_grid(grid: jax.Array, v: int, kind: str,
                axes: Tuple[int, int]) -> jax.Array:
    """Map a canonical-cell dense grid to variant v's orientation (or back —
    the permutations are involutions). grid[..., T(c), ...] per axis."""
    for axis, tr in zip(axes, _transforms(kind)[v]):
        grid = _orient_axis(grid, tr, axis)
    return grid


def orient_grid_phase(grid: jax.Array, v: int, axes: Tuple[int, int],
                      phase_axis: int) -> jax.Array:
    """`orient_grid` for a BEV grid in space-to-depth (phase-split) layout
    (B, H/2, W/2, 4, ...), phase index 2*(x&1)+(y&1).

    An axis reversal at full resolution, x' = X-1-x with x = 2h+p, is
    h' = H/2-1-h and p' = 1-p: a reversal of the HALVED axis plus a swap of
    the phase bit — exact for every cell (X even), so orientation never
    needs the full-resolution layout."""
    trs = _BEV_TRANSFORMS[v]
    pperm = np.arange(4)
    for axis, tr, bit in zip(axes, trs, (2, 1)):
        if tr == "id":
            continue
        assert tr == "rev", tr  # BEV variants are pure sign flips
        grid = jax.lax.rev(grid, (axis,))
        pperm = pperm ^ bit
    if (pperm != np.arange(4)).any():
        grid = jnp.take(grid, jnp.asarray(pperm), axis=phase_axis)
    return grid


def voxel_max_pool_tta(feat: jax.Array, coords0: jax.Array,
                       out_size: Tuple[int, int],
                       scale_rate: Tuple[float, float],
                       kind: str, nonneg: bool = False,
                       phase_split: bool = False) -> jax.Array:
    """Scatter all V_TTA variants in ONE max-pool.

    feat:    (B, N, V*C) per-variant point features FOLDED as v-major lane
             blocks — the end-to-end folded point-side layout (round 3:
             carrying (N, V, C) dims instead costs a ~1.4 ms relayout copy
             per rearrangement at production shapes, ~7 ms/frame total).
    coords0: (B, N, >=2) variant-0 fractional grid coords (shared structure).
    Returns (V, B, H, W, C) — each variant's grid in its OWN orientation,
    exactly as per-variant `voxel_max_pool` calls would produce (the dense
    conv side wants variants on the batch axis).
    """
    B, N, VC = feat.shape
    V = V_TTA
    assert VC % V == 0
    C = VC // V
    grid = voxel_max_pool(feat, coords0[..., :2], out_size, scale_rate,
                          "auto", nonneg, phase_split)
    H, W = out_size
    if phase_split:
        # (V, B, H/2, W/2, 4, C), each variant oriented in phase space
        assert kind == "bev", kind
        grid = grid.reshape(B, H // 2, W // 2, 4, V, C)
        return jnp.stack([orient_grid_phase(grid[..., v, :], v, (1, 2), 3)
                          for v in range(V)])
    grid = grid.reshape(B, H, W, V, C)
    outs = []
    for v in range(V):
        outs.append(orient_grid(grid[..., v, :], v, kind, (1, 2)))
    return jnp.stack(outs)


def _ext_table(grid: jax.Array, tr: str, axis: int) -> jax.Array:
    """Extended tap table along `axis`: slot j holds the variant's value at
    canonical ext position (j - 1) + s_tr (s = -1 for reversed transforms,
    0 otherwise), with out-of-range slots zero — the same result as padding
    with a zero row and gathering by `_perm_ext(tr, size, s_tr)`, but built
    from reverse/roll/concat primitives that run at stream speed instead of
    a full-grid row gather."""
    size = grid.shape[axis]
    zshape = list(grid.shape)
    zshape[axis] = 1
    zero = jnp.zeros(zshape, grid.dtype)
    if tr == "id":
        return jnp.concatenate([zero, grid, zero], axis=axis)
    if tr == "rev":
        return jnp.concatenate([zero, zero, jax.lax.rev(grid, (axis,))],
                               axis=axis)
    if tr == "roll":
        r = jnp.roll(grid, 1 - size // 2, axis=axis)
        head = jax.lax.slice_in_dim(r, 0, 2, axis=axis)
        return jnp.concatenate([r, head], axis=axis)
    if tr == "revroll":
        r = jnp.roll(jax.lax.rev(grid, (axis,)), 2 - size // 2, axis=axis)
        head = jax.lax.slice_in_dim(r, 0, 2, axis=axis)
        return jnp.concatenate([r, head], axis=axis)
    raise ValueError(tr)


def _axis_weights(transform: str, size: int, p: jax.Array, dtype):
    """Per-tap (weight, centered offset index) for one axis of one variant.

    p: canonical (variant-0) fractional pixel coordinate, any shape.
    Returns (offsets, weights): offsets a tuple of ints in {-1, 0, 1};
    weights a list of arrays like p. Weights already fold the zeros-padding
    validity of the variant's TRUE tap index (grid_sample 'zeros' semantics,
    reference backbone.py:469-474) including the wrap seam of rolled axes.
    """
    x0 = jnp.floor(p)
    f = (p - x0).astype(dtype)
    x0i = x0.astype(jnp.int32)
    inb = (x0i >= 0) & (x0i <= size - 1)
    if transform == "id":
        return ((0, 1), [(1 - f) * inb.astype(dtype),
                         f * ((x0i >= -1) & (x0i <= size - 2)).astype(dtype)])
    if transform == "rev":
        # true taps: off 0 -> size-1-x0; off -1 -> size-x0
        return ((-1, 0), [(1 - f) * ((x0i >= 1) & (x0i <= size)).astype(dtype),
                          f * inb.astype(dtype)])
    if transform == "revroll":
        # always in range via the wrap, except the seam at x0 == size/2
        return ((-1, 0), [(1 - f) * (inb & (x0i != size // 2)).astype(dtype),
                          f * inb.astype(dtype)])
    if transform == "roll":
        return ((0, 1), [(1 - f) * inb.astype(dtype),
                         f * (inb & (x0i != size // 2 - 1)).astype(dtype)])
    raise ValueError(transform)


def grid_to_point_tta(grids: jax.Array, coords0: jax.Array,
                      scale_rate: Sequence[float], kind: str) -> jax.Array:
    """Bilinear-sample all variants with ONE patch-row gather per point.

    grids:   (V, B, H, W, C) per-variant grids in their own orientations
             (as `voxel_max_pool_tta` / the per-variant convs produce them).
    coords0: (B, N, 2) variant-0 fractional coords in unscaled grid units.
    Returns (B, N, V*C) — per-variant samples matching per-variant
    `grid_to_point` calls, FOLDED as v-major lane blocks (the end-to-end
    folded point-side layout). The per-variant bilinear weights apply as a
    lane-select broadcast — weight of lane l is the variant l // C's scalar
    weight — so the whole tap sum stays in the flat (B, N, V*C) layout and
    XLA fuses it into the gather consumers with zero relayout copies
    (round 3: the earlier (B, N, V, C) unfold cost ~0.25 ms per tap per
    gather, ~3.7 ms/frame)."""
    V, B, H, W, C = grids.shape
    assert V == V_TTA
    dt = grids.dtype
    trs = _transforms(kind)

    py = coords0[..., 0].astype(jnp.float32) * np.float32(scale_rate[0])
    px = coords0[..., 1].astype(jnp.float32) * np.float32(scale_rate[1])

    # Each variant's two taps per axis sit at offsets (s, s+1) with s in
    # {-1, 0} depending on its transform. Pre-shifting every variant's slab
    # by its own s while aligning it to canonical coordinates puts ALL
    # variants' bilinear windows on the SAME 2x2 taps — 4 wide-row gathers
    # total. (TPU gathers are row-count bound at ~1.5 ns/row for rows
    # <= 512 B; materializing a union 3x3 patch slab instead costs HBM copy
    # traffic that dwarfs the gather itself.)
    shifts = [(_axis_weights(trs[v][0], H, jnp.zeros((), jnp.float32), dt)[0][0],
               _axis_weights(trs[v][1], W, jnp.zeros((), jnp.float32), dt)[0][0])
              for v in range(V)]

    # ---- align every variant's grid back to canonical coordinates over the
    # extended tap window [-1, size] (zero slot for out-of-range), shifted by
    # its per-axis tap base, then stack variants along channels. The tap base
    # is determined by the transform (reversed axes tap at (-1, 0)), which
    # `_ext_table` builds in; assert it matches the weights' offsets.
    for v in range(V):
        assert shifts[v] == ({"id": 0, "roll": 0, "rev": -1, "revroll": -1}
                             [trs[v][0]],
                             {"id": 0, "roll": 0, "rev": -1, "revroll": -1}
                             [trs[v][1]]), (v, trs[v], shifts[v])
    aligned = []
    for v in range(V):
        g = _ext_table(grids[v], trs[v][0], axis=1)
        g = _ext_table(g, trs[v][1], axis=2)
        aligned.append(g)
    gal = jnp.stack(aligned, axis=-2)  # (B, H+2, W+2, V, C)

    # slab slot j holds the variant's value at canonical ext position
    # (j-1) + s_v; a point with canonical floor y0 needs tap k at position
    # y0 + s_v + k, i.e. slot y0 + k + 1 — variant-independent.
    gflat = gal.reshape(B * (H + 2) * (W + 2), V * C)
    Wp = W + 2

    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    yc = jnp.clip(y0, -1, H) + 1
    xc = jnp.clip(x0, -1, W) + 1
    base = (yc * Wp + xc
            + (jnp.arange(B, dtype=jnp.int32) * (H + 2) * Wp)[:, None])
    # tap (1,1) for a point at slot (H+1, W+1) indexes the next row's slot 0
    # wide of the table end only at the very last flat slot; its weight is 0
    # (the clamp guard) but the index must stay in range.
    last = B * (H + 2) * Wp - 1

    # far-out-of-range canonical points: the clamp moved the window; kill all
    # taps (their per-axis validity already excludes everything representable,
    # but the clamp guard keeps the weights exact for |coord| >> grid).
    guard = ((yc - 1 == y0) & (xc - 1 == x0)).astype(dt)

    # ---- per-variant separable weights over the shared 2x2 window; the
    # k-th tap weight is _axis_weights' k-th entry (its offsets are exactly
    # (s_v, s_v + 1), matching the slab pre-shift).
    wy_all = [jnp.stack(_axis_weights(trs[v][0], H, py, dt)[1], axis=-1)
              for v in range(V)]  # each (B, N, 2)
    wx_all = [jnp.stack(_axis_weights(trs[v][1], W, px, dt)[1], axis=-1)
              for v in range(V)]

    # per-tap fused multiply-accumulate (no stacked tap buffer: each gather
    # feeds an elementwise FMA that XLA fuses, so nothing ty*tx-wide ever
    # hits HBM). The per-variant weight reaches its lane block through a
    # constant lane mask, keeping every tensor in the flat (B, N, V*C)
    # layout (no (N, V, C) unfold copies).
    lane_masks = [jnp.asarray((np.arange(V * C) // C) == v, dtype=dt)
                  for v in range(V)]
    out = None
    for dy in range(2):
        for dx in range(2):
            idx = jnp.minimum(base + (dy * Wp + dx), last)
            t = jnp.take(gflat, idx, axis=0)  # (B, N, V*C)
            wk = sum((wy_all[v][..., dy] * wx_all[v][..., dx])[..., None]
                     * lane_masks[v] for v in range(V))  # (B, N, V*C)
            term = t * wk
            out = term if out is None else out + term
    return out * guard[..., None]  # (B, N, V*C)
