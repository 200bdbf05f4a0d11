"""Grid -> point bilinear gather (the reference's `BilinearSample`,
`/root/reference/networks/backbone.py:453-475`).

The reference normalizes integer grid coordinates by ``scale_rate`` and calls
``F.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=True)``.
With align_corners=True the normalized coordinate round-trip reduces to plain
pixel-space sampling at ``p = coord * scale_rate`` — so we implement it
directly as 4 masked gathers + lerp, which XLA fuses into a single
bandwidth-bound gather kernel on TPU (no normalization detour).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_at_pixels(grid: jax.Array, py: jax.Array, px: jax.Array) -> jax.Array:
    """Sample grid (B, H, W, C) at float pixel coords py/px (B, N).

    Zeros padding: any of the four taps falling outside [0, H-1] x [0, W-1]
    contributes 0 (torch grid_sample 'zeros' semantics).
    Returns (B, N, C).

    TPU formulation: gathers on TPU are row-count bound (~4 ns/row measured on
    v5e regardless of row width up to ~512 B), so instead of 4 narrow gathers
    per point we build a *patch grid* P[h, w] = (G[h, w], G[h, w+1],
    G[h+1, w], G[h+1, w+1]) — a cheap dense concat — and fetch each point's
    whole 2x2 neighborhood as ONE 4C-wide row, then mix the four C-blocks with
    the bilinear weights. ~4x fewer gather rows = ~4x faster than the naive
    4-tap form.
    """
    B, H, W, C = grid.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0).astype(grid.dtype)
    fx = (px - x0).astype(grid.dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # zero-pad one row/col at each border so every in-range tap of an
    # in-range-or-adjacent point reads real zeros; clamp indices for the rest
    # (their weights are masked to 0 below).
    gpad = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patch = jnp.concatenate(
        [gpad[:, :-1, :-1], gpad[:, :-1, 1:], gpad[:, 1:, :-1], gpad[:, 1:, 1:]],
        axis=-1)  # (B, H+1, W+1, 4C); patch[y, x] = 2x2 block at (y-1, x-1)+1

    Hp, Wp = H + 1, W + 1
    yy = jnp.clip(y0i + 1, 0, Hp - 1)
    xx = jnp.clip(x0i + 1, 0, Wp - 1)
    rows = jnp.take(patch.reshape(B * Hp * Wp, 4 * C),
                    (yy * Wp + xx).reshape(B, -1)
                    + (jnp.arange(B, dtype=jnp.int32) * Hp * Wp)[:, None],
                    axis=0).reshape(B, -1, 4, C)

    # per-tap validity (outside [0, H-1]x[0, W-1] contributes 0); also kill
    # everything when the clamp above moved the patch (point far outside).
    def ok(y, x):
        return ((y >= 0) & (y < H) & (x >= 0) & (x < W)
                & (y0i + 1 == yy) & (x0i + 1 == xx))

    w00 = ((1 - fy) * (1 - fx) * ok(y0i, x0i)).astype(grid.dtype)
    w01 = ((1 - fy) * fx * ok(y0i, x0i + 1)).astype(grid.dtype)
    w10 = (fy * (1 - fx) * ok(y0i + 1, x0i)).astype(grid.dtype)
    w11 = (fy * fx * ok(y0i + 1, x0i + 1)).astype(grid.dtype)
    w = jnp.stack([w00, w01, w10, w11], axis=-1)  # (B, N, 4)
    return jnp.einsum("bnt,bntc->bnc", w, rows)


def grid_to_point(grid: jax.Array, coords: jax.Array,
                  scale_rate: Sequence[float]) -> jax.Array:
    """Bilinearly sample a (B, H, W, C) grid at per-point fractional coords.

    coords: (B, N, 2) where channel 0 is the row (H) coordinate and channel 1
    the column (W) coordinate in *unscaled* grid units; they are multiplied by
    ``scale_rate`` to land in this grid's resolution (backbone.py:469-470).
    Returns (B, N, C).
    """
    py = coords[..., 0].astype(grid.dtype) * np.float32(scale_rate[0])
    px = coords[..., 1].astype(grid.dtype) * np.float32(scale_rate[1])
    return bilinear_at_pixels(grid, py, px)


def grid_to_point_ref(grid: np.ndarray, coords: np.ndarray,
                      scale_rate: Sequence[float]) -> np.ndarray:
    """NumPy reference implementation for parity tests."""
    B, H, W, C = grid.shape
    N = coords.shape[1]
    out = np.zeros((B, N, C), dtype=grid.dtype)
    for b in range(B):
        for n in range(N):
            py = coords[b, n, 0] * scale_rate[0]
            px = coords[b, n, 1] * scale_rate[1]
            y0 = int(np.floor(py))
            x0 = int(np.floor(px))
            fy = py - y0
            fx = px - x0
            acc = np.zeros(C, dtype=np.float64)
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        acc += wy * wx * grid[b, yy, xx]
            out[b, n] = acc.astype(grid.dtype)
    return out
