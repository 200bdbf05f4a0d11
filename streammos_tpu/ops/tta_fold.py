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


def _perm_ext(transform: str, size: int) -> np.ndarray:
    """T over the extended tap window [-1, size], with out-of-range targets
    routed to the zero slot `size` (rolled transforms never leave range —
    their seam taps are masked by the per-variant weights instead)."""
    pos = np.arange(-1, size + 1)
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


def orient_grid(grid: jax.Array, v: int, kind: str,
                axes: Tuple[int, int]) -> jax.Array:
    """Map a canonical-cell dense grid to variant v's orientation (or back —
    the permutations are involutions). grid[..., T(c), ...] per axis."""
    for axis, tr in zip(axes, _transforms(kind)[v]):
        if tr != "id":
            grid = jnp.take(grid, _cell_map(tr, grid.shape[axis]), axis=axis)
    return grid


def voxel_max_pool_tta(feat: jax.Array, coords0: jax.Array,
                       out_size: Tuple[int, int],
                       scale_rate: Tuple[float, float],
                       kind: str) -> jax.Array:
    """Scatter all V_TTA variants in ONE max-pool.

    feat:    (V, B, N, C) per-variant point features.
    coords0: (B, N, >=2) variant-0 fractional grid coords (shared structure).
    Returns (V, B, H, W, C) — each variant's grid in its OWN orientation,
    exactly as per-variant `voxel_max_pool` calls would produce.
    """
    V, B, N, C = feat.shape
    assert V == V_TTA
    folded = jnp.moveaxis(feat, 0, 2).reshape(B, N, V * C)
    grid = voxel_max_pool(folded, coords0[..., :2], out_size, scale_rate)
    H, W = out_size
    grid = grid.reshape(B, H, W, V, C)
    outs = []
    for v in range(V):
        outs.append(orient_grid(grid[..., v, :], v, kind, (1, 2)))
    return jnp.stack(outs)


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
    Returns (V, B, N, C) — per-variant samples, matching per-variant
    `grid_to_point` calls.
    """
    V, B, H, W, C = grids.shape
    assert V == V_TTA
    dt = grids.dtype
    trs = _transforms(kind)
    tap_y = 3 if any(t[0] != "id" for t in trs) else 2
    tap_x = 3 if any(t[1] != "id" for t in trs) else 2

    py = coords0[..., 0].astype(jnp.float32) * np.float32(scale_rate[0])
    px = coords0[..., 1].astype(jnp.float32) * np.float32(scale_rate[1])

    # ---- align every variant's grid back to canonical coordinates over the
    # extended tap window [-1, size] (zero slot for out-of-range), then stack
    # variants along channels.
    aligned = []
    for v in range(V):
        g = jnp.pad(grids[v], ((0, 0), (0, 1), (0, 1), (0, 0)))
        g = jnp.take(g, _perm_ext(trs[v][0], H), axis=1)
        g = jnp.take(g, _perm_ext(trs[v][1], W), axis=2)
        aligned.append(g)
    gal = jnp.stack(aligned, axis=-2)  # (B, H+2, W+2, V, C)
    gal = gal.reshape(B, H + 2, W + 2, V * C)

    # ---- tap-window concat: one row per center holds the whole
    # tap_y x tap_x neighborhood (row-count-bound gathers: fetch wide rows).
    # center slot c corresponds to canonical floor position c-1; window
    # offsets start at -1 when the axis has 3 taps, else 0.
    off_y0 = -1 if tap_y == 3 else 0
    off_x0 = -1 if tap_x == 3 else 0
    # gext index j holds ext position j-2; center c's tap dy sits at ext
    # position (c-1) + off_y0 + dy, i.e. gext index c + off_y0 + dy + 1.
    gext = jnp.pad(gal, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for dy in range(tap_y):
        cols = []
        for dx in range(tap_x):
            ys = off_y0 + dy + 1
            xs = off_x0 + dx + 1
            cols.append(gext[:, ys:ys + H + 2, xs:xs + W + 2])
        rows.append(jnp.concatenate(cols, axis=-1))
    patch = jnp.concatenate(rows, axis=-1)  # (B, H+2, W+2, ty*tx*V*C)

    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    yc = jnp.clip(y0, -1, H) + 1
    xc = jnp.clip(x0, -1, W) + 1
    Hp, Wp = H + 2, W + 2
    flat_idx = (yc * Wp + xc
                + (jnp.arange(B, dtype=jnp.int32) * Hp * Wp)[:, None])
    fetched = jnp.take(patch.reshape(B * Hp * Wp, -1), flat_idx, axis=0)
    fetched = fetched.reshape(B, -1, tap_y, tap_x, V, C)

    # far-out-of-range canonical points: the clamp moved the window; kill all
    # taps (their per-axis validity already excludes everything representable,
    # but the clamp guard keeps the weights exact for |coord| >> grid).
    guard = ((yc - 1 == y0) & (xc - 1 == x0)).astype(dt)

    # ---- per-variant separable weights over the shared window
    wyx = []
    for v in range(V):
        offs_y, wy = _axis_weights(trs[v][0], H, py, dt)
        offs_x, wx = _axis_weights(trs[v][1], W, px, dt)
        wy_full = [jnp.zeros_like(wy[0])] * tap_y
        for o, w in zip(offs_y, wy):
            wy_full[o - off_y0] = w
        wx_full = [jnp.zeros_like(wx[0])] * tap_x
        for o, w in zip(offs_x, wx):
            wx_full[o - off_x0] = w
        wy_s = jnp.stack(wy_full, axis=-1)  # (B, N, ty)
        wx_s = jnp.stack(wx_full, axis=-1)  # (B, N, tx)
        wyx.append(wy_s[..., :, None] * wx_s[..., None, :] * guard[..., None, None])
    w = jnp.stack(wyx)  # (V, B, N, ty, tx)

    out = jnp.einsum("vbnyx,bnyxvc->vbnc", w, fetched)
    return out
