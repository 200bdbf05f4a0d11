"""Deformable-attention temporal-fusion modules.

Functional re-design of the reference's `MSDeformAttn` module
(`/root/reference/deformattn/modules/ms_deform_attn.py:30-116`) and the
`DeformAttnLayer`/`DeformAttnModule` stack
(`/root/reference/networks/multi_view_encoder.py:245-321`), with the CUDA
sampling kernel replaced by the XLA gather formulation in
`streammos_tpu.ops.deform_attn`.

Kept for parity: the rotational sampling-offset bias init
(ms_deform_attn.py:62-76), softmax over levels*points, the per-pixel
reference-point meshgrid (multi_view_encoder.py:254-266), and the
cross-attn + LN + FFN layer structure (the reference's constructed-but-unused
`self_attn` is deliberately dropped — dead code, SURVEY.md §7.4).
"""
from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from streammos_tpu.ops import deform_attn_sample


def _rotational_offset_bias(n_heads: int, n_points: int) -> np.ndarray:
    """Directional grid bias for sampling offsets (ms_deform_attn.py:63-70)."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (M, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, :], (1, n_points, 1))  # (M, P, 2)
    for i in range(n_points):
        grid[:, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


def reference_points(hw: Tuple[int, int]) -> np.ndarray:
    """Per-pixel normalized reference points, (H*W, 2) as (x, y)
    (multi_view_encoder.py:254-266 with valid_ratios == 1)."""
    H, W = hw
    ys = (np.arange(H, dtype=np.float32) + 0.5) / H
    xs = (np.arange(W, dtype=np.float32) + 0.5) / W
    ref_y, ref_x = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([ref_x.reshape(-1), ref_y.reshape(-1)], axis=-1)


class MSDeformAttn(nn.Module):
    """Single-level deformable attention (n_levels=1 in the shipped config)."""

    d_model: int = 128
    n_heads: int = 4
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, ref_points, src, spatial_hw: Tuple[int, int],
                 train: bool):
        """query (B, Lq, C); ref_points (Lq, 2) in [0,1] (x, y);
        src (B, H*W, C) flattened value map."""
        B, Lq, C = query.shape
        H, W = spatial_hw
        M, P = self.n_heads, self.n_points
        Dh = C // M

        value = nn.Dense(self.d_model, use_bias=True, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="value_proj")(src)
        value = value.reshape(B, H, W, M, Dh)

        offsets = nn.Dense(
            M * P * 2, use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _rotational_offset_bias(M, P), dtype),
            name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Lq, M, P, 2)

        attn = nn.Dense(M * P, use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(B, Lq, M, P), axis=-1)

        normalizer = jnp.asarray([W, H], dtype=query.dtype)
        loc = ref_points[None, :, None, None, :] + offsets / normalizer

        out = deform_attn_sample(value, loc, attn)
        out = nn.Dense(self.d_model, use_bias=True, dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="output_proj")(out)
        return out


class DeformAttnLayer(nn.Module):
    """cross-attn + residual + LN + FFN (multi_view_encoder.py:285-321)."""

    d_model: int = 128
    d_ffn: int = 512
    dropout: float = 0.0
    n_heads: int = 4
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, ref_points, src, spatial_hw, train: bool):
        attn_out = MSDeformAttn(self.d_model, self.n_heads, self.n_points,
                                dtype=self.dtype,
                                name="cross_attn")(query, ref_points, src,
                                                   spatial_hw, train)
        attn_out = nn.Dropout(self.dropout, deterministic=not train)(attn_out)
        # LayerNorm statistics in float32 for stability
        query = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(
            (query + attn_out).astype(jnp.float32)).astype(self.dtype)

        ffn = nn.Dense(self.d_ffn, dtype=self.dtype)(query)
        ffn = nn.relu(ffn)
        ffn = nn.Dropout(self.dropout, deterministic=not train)(ffn)
        ffn = nn.Dense(self.d_model, dtype=self.dtype)(ffn)
        ffn = nn.Dropout(self.dropout, deterministic=not train)(ffn)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(
            (query + ffn).astype(jnp.float32)).astype(self.dtype)


class DeformAttnModule(nn.Module):
    """Stack of deformable cross-attention layers; the carried query is
    refined against the current frame's features (multi_view_encoder.py:245-273)."""

    num_layers: int = 2
    d_model: int = 128
    d_ffn: int = 512
    dropout: float = 0.0
    n_heads: int = 4
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, src, spatial_hw: Tuple[int, int], train: bool):
        refs = jnp.asarray(reference_points(spatial_hw), dtype=query.dtype)
        for i in range(self.num_layers):
            query = DeformAttnLayer(self.d_model, self.d_ffn, self.dropout,
                                    self.n_heads, self.n_points,
                                    dtype=self.dtype,
                                    name=f"layer{i}")(query, refs, src,
                                                      spatial_hw, train)
        return query
