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
    fy = (py - y0).astype(value.dtype)
    fx = (px - x0).astype(value.dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # TPU gathers are row-count bound, so fetch each sample's whole 2x2
    # neighborhood as ONE 4*Dh-wide row from a per-head patch grid (same
    # trick as ops/sample.py): P[h, w] = (V[h,w], V[h,w+1], V[h+1,w],
    # V[h+1,w+1]) over a zero-padded map.
    vpad = jnp.pad(value, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    patch = jnp.concatenate(
        [vpad[:, :-1, :-1], vpad[:, :-1, 1:], vpad[:, 1:, :-1],
         vpad[:, 1:, 1:]], axis=-1)  # (B, H+1, W+1, M, 4*Dh)
    Hp, Wp = H + 1, W + 1
    pflat = patch.transpose(0, 3, 1, 2, 4).reshape(B * M * Hp * Wp, 4 * Dh)

    yy = jnp.clip(y0i + 1, 0, Hp - 1)
    xx = jnp.clip(x0i + 1, 0, Wp - 1)
    # one flat gather across (batch, head) tables — vmap'd per-table takes
    # lower to much slower batched gathers on TPU
    ids = (yy * Wp + xx).transpose(0, 2, 1, 3)  # (B, M, Lq, P)
    base = (jnp.arange(B * M, dtype=jnp.int32) * (Hp * Wp)).reshape(B, M, 1, 1)
    rows = jnp.take(pflat, (ids + base).reshape(-1), axis=0)
    # keep the gathered rows' 4*Dh lane axis FLAT: splitting it into
    # (4, Dh) dims costs a ~0.65 ms tile-relayout copy per attention layer
    # (round-3 trace, reshape.374/.392); the per-tap weights reach their
    # lane block through constant masks instead, and the tap sum runs as a
    # small constant matmul
    rows = rows.reshape(B, M, Lq, P, 4 * Dh)

    def ok(y, x):
        return ((y >= 0) & (y < H) & (x >= 0) & (x < W)
                & (y0i + 1 == yy) & (x0i + 1 == xx))

    w00 = ((1 - fy) * (1 - fx) * ok(y0i, x0i)).astype(value.dtype)
    w01 = ((1 - fy) * fx * ok(y0i, x0i + 1)).astype(value.dtype)
    w10 = (fy * (1 - fx) * ok(y0i + 1, x0i)).astype(value.dtype)
    w11 = (fy * fx * ok(y0i + 1, x0i + 1)).astype(value.dtype)
    # fold the bilinear tap weights and the attention weights together
    wtap = jnp.stack([w00, w01, w10, w11], axis=-1)  # (B, Lq, M, P, 4)
    wtap = wtap * weights[..., None].astype(value.dtype)
    wtap = wtap.transpose(0, 2, 1, 3, 4)  # (B, M, Lq, P, 4) (small)
    lane_masks = [jnp.asarray((np.arange(4 * Dh) // Dh) == t,
                              dtype=value.dtype) for t in range(4)]
    w_lane = sum(wtap[..., t, None] * lane_masks[t] for t in range(4))
    # contract the P axis AND the 4 tap blocks in ONE constant 0/1 matmul:
    # (B*M*Lq, P*4*Dh) @ (P*4*Dh, Dh). The weighted rows fuse into the dot's
    # operand, so the P-sum rides the MXU instead of a kLoop reduce fusion
    # (which measured ~5x over its HBM floor: 0.52 ms/layer at the
    # production eval shape — tools/bench_op_floors.py, round 5; the
    # (P, 4*Dh) -> P*4*Dh flatten is a bitcast of the two minor dims).
    wr = (rows * w_lane).reshape(B, M, Lq, P * 4 * Dh)
    taps_fold = jnp.asarray(np.tile(np.eye(Dh), (P * 4, 1)), value.dtype)
    out = jnp.einsum("bmqk,kd->bmqd", wr, taps_fold)
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
