"""Deformable-attention sampling — TPU equivalent of the reference's
`deformattn` CUDA extension (`/root/reference/deformattn/src/cuda/
ms_deform_im2col_cuda.cuh:33-86,238-300`).

Exact math contract (verified against the reference's own pure check impl,
`deformattn/functions/ms_deform_attn_func.py:41-61`): sampling locations are
normalized to [0, 1]; the kernel samples with grid_sample semantics
``align_corners=False`` + zeros padding, i.e. pixel coords
``px = loc_x * W - 0.5``, ``py = loc_y * H - 0.5``, with out-of-range taps
contributing 0; per-(query, head) the P sampled vectors are mixed by the
attention weights and heads are concatenated.

The shipped configuration is tiny by TPU standards — 1 level, a 64x64 value
map, 4 heads x 4 points, d_head 32, 4096 queries — so a fused-gather XLA
formulation is already HBM-bandwidth bound (the whole value map is ~8 MB and
effectively VMEM-resident after fusion). Autodiff through the gathers yields
exactly the scatter-free backward the CUDA ext hand-writes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def deform_attn_sample(value: jax.Array, loc: jax.Array,
                       weights: jax.Array) -> jax.Array:
    """Single-level deformable attention sampling.

    Args:
      value:   (B, H, W, M, Dh) per-head value map.
      loc:     (B, Lq, M, P, 2) sampling locations in [0, 1], channel order
               (x, y) like the reference.
      weights: (B, Lq, M, P) attention weights (already softmaxed over P).

    Returns:
      (B, Lq, M * Dh)
    """
    B, H, W, M, Dh = value.shape
    _, Lq, _, P, _ = loc.shape

    px = loc[..., 0] * W - 0.5  # (B, Lq, M, P)
    py = loc[..., 1] * H - 0.5

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0)
    fx = (px - x0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # (B, M, HW, Dh) so each head gathers from its own flattened map
    vflat = value.transpose(0, 3, 1, 2, 4).reshape(B, M, H * W, Dh)

    def gather_head(vh, ids):
        # vh (HW, Dh), ids (Lq*P,) -> (Lq*P, Dh)
        return jnp.take(vh, ids, axis=0)

    acc = None
    for dy in (0, 1):
        for dx in (0, 1):
            yy = y0i + dy
            xx = x0i + dx
            ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            ids = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
            # (B, M, Lq*P)
            ids_bm = ids.transpose(0, 2, 1, 3).reshape(B, M, Lq * P)
            tap = jax.vmap(jax.vmap(gather_head))(vflat, ids_bm)
            tap = tap.reshape(B, M, Lq, P, Dh)
            wy = fy if dy else 1.0 - fy
            wx = fx if dx else 1.0 - fx
            w = (wy * wx * ok).astype(value.dtype)  # (B, Lq, M, P)
            w = w.transpose(0, 2, 1, 3)[..., None]  # (B, M, Lq, P, 1)
            acc = tap * w if acc is None else acc + tap * w

    wmix = weights.transpose(0, 2, 1, 3)[..., None].astype(value.dtype)
    out = (acc * wmix).sum(axis=3)  # (B, M, Lq, Dh)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, M * Dh)


def deform_attn_sample_ref(value: np.ndarray, loc: np.ndarray,
                           weights: np.ndarray) -> np.ndarray:
    """NumPy reference mirroring `ms_deform_attn_core_pytorch`
    (deformattn/functions/ms_deform_attn_func.py:41-61)."""
    B, H, W, M, Dh = value.shape
    _, Lq, _, P, _ = loc.shape
    out = np.zeros((B, Lq, M, Dh), dtype=np.float64)
    for b in range(B):
        for q in range(Lq):
            for m in range(M):
                for p in range(P):
                    px = loc[b, q, m, p, 0] * W - 0.5
                    py = loc[b, q, m, p, 1] * H - 0.5
                    y0 = int(np.floor(py))
                    x0 = int(np.floor(px))
                    fy = py - y0
                    fx = px - x0
                    samp = np.zeros(Dh, dtype=np.float64)
                    for dy, wy in ((0, 1 - fy), (1, fy)):
                        for dx, wx in ((0, 1 - fx), (1, fx)):
                            yy, xx = y0 + dy, x0 + dx
                            if 0 <= yy < H and 0 <= xx < W:
                                samp += wy * wx * value[b, yy, xx, m]
                    out[b, q, m] += weights[b, q, m, p] * samp
    return out.reshape(B, Lq, M * Dh).astype(value.dtype)
