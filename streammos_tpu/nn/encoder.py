"""Cascaded multi-view (BEV + range-view) encoder with deformable-attention
temporal fusion — the TPU re-design of the reference's `CENet_Transformer`
(`/root/reference/networks/multi_view_encoder.py:323-458`).

Structure (§3.3 of SURVEY.md):

* three strided BEV stages (`_make_layer` = DownSample2D + N residual blocks,
  the first block of stages 1-2 replaced by an asymmetric 7x3 / 5x3 block);
* after stages 1 and 2, a point-mediated cascade: BEV -> points (bilinear
  gather) -> range view (scatter max) -> RV conv stage -> points -> BEV
  (scatter max) -> channel concat;
* at 1/8 scale, deformable attention where the *query* is the previous
  frame's fused feature map (the short-term memory) and the value is the
  current frame's features; the fused map is both the decoder input and the
  next memory;
* a parameter-free multi-scale decoder (align-corners bilinear upsample +
  concat + two 3x3 convs) and three auxiliary BEV heads.

The `AttMerge` decoder modules the reference constructs but never calls
(multi_view_encoder.py:362-365) are dead code and omitted (SURVEY.md §7.4).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from streammos_tpu.config import ModelConfig
from streammos_tpu.nn.blocks import (BasicBlock, BasicConv2d, DownSample2D,
                                     UnbalanceBasicBlock)
from streammos_tpu.nn.deform import DeformAttnModule
from streammos_tpu.ops import (grid_to_point, grid_to_point_tta,
                               resize_bilinear_align_corners, voxel_max_pool,
                               voxel_max_pool_tta)


class ConvStage(nn.Module):
    """DownSample2D followed by residual blocks; mirrors `_make_layer`
    (multi_view_encoder.py:380-388): ``num_blocks`` attention-free blocks plus
    one channel-attention block, with block[0] optionally replaced by an
    asymmetric-kernel block."""

    out_planes: int
    num_blocks: int
    stride: int = 1
    unbalance_kernel: Tuple[int, int] | None = None  # e.g. (7, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, tta_phase_T: int = 0):
        x = DownSample2D(self.out_planes, stride=self.stride,
                         dtype=self.dtype)(x, train, tta_phase_T)
        for i in range(self.num_blocks):
            if i == 0 and self.unbalance_kernel is not None:
                k0, k1 = self.unbalance_kernel
                x = UnbalanceBasicBlock(self.out_planes, (k0, k1),
                                        (k0 // 2, k1 // 2),
                                        dtype=self.dtype)(x, train)
            else:
                x = BasicBlock(self.out_planes, use_att=False,
                               dtype=self.dtype)(x, train)
        x = BasicBlock(self.out_planes, use_att=True, dtype=self.dtype)(x, train)
        return x


class MultiViewEncoder(nn.Module):
    """Inputs:
      bev_in:     (B, T, H, W, C0) multi-frame BEV features in the
                  frame-split layout (H, W = full grid); the header's
                  DownSample2D consumes it as the T*C0 channel concat
                  without materializing the transpose. (Also accepts the
                  space-to-depth (B, T, H/2, W/2, 4, C0) phase layout —
                  kept opt-in; slower end-to-end on v5e, docs/DESIGN.md)
      bev_coord:  (B, N, 2) current-frame fractional BEV coords
      rv_coord:   (B, N, 2) current-frame fractional RV coords
      memory:     (B, Hq, Wq, D) previous fused map (short-term memory)
      use_memory: scalar bool — False selects the learned query embedding
                  (first frame of a stream), True the carried memory. Both
                  paths live in one graph via `jnp.where`, so streaming does
                  not recompile between the first and later frames.

    With ``tta_fold=True`` (eval-only) the batch is the reference's TTA fan —
    B = 4*Bt in `tta_expand` variant-major order — and every point-mediated
    cascade op runs ONCE over the shared index structure with the variants
    riding the channel axis (ops/tta_fold.py): 4x fewer scatter/gather rows,
    the dominant eval cost. Dense convs/attention still run per-variant.

    Returns (bev_feat, point_feat_1, aux0, aux1, aux2, new_memory).
    """

    cfg: ModelConfig
    tta_fold: bool = False

    @nn.compact
    def __call__(self, bev_in, bev_coord, rv_coord, memory, use_memory,
                 train: bool, header_phase_T: int = 0):
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        c_in, c1, c2, c3 = cfg.context_layers  # (64, 32, 64, 128)
        n1, n2, n3 = cfg.layers  # (2, 3, 4)
        rv_h, rv_w = cfg.voxel.rv_shape

        # In tta_fold mode the coord inputs are already canonical (variant-0)
        # with leading Bt = B // 4; gathered point tensors stay in the FLAT
        # folded (Bt, N, V*C) lane layout between gather and scatter — the
        # interchange format of the whole folded point side — so the cascade
        # pays no variant transposes and no (N, V, C) unfold copies.
        def cascade_gather(grid, coords, scale, kind):
            if not self.tta_fold:
                return grid_to_point(grid, coords, scale)
            g = grid.reshape(4, B // 4, *grid.shape[1:])
            return grid_to_point_tta(g, coords, scale, kind)

        def cascade_scatter(pts, coords, out_size, scale, kind):
            # gathered features are bilinear blends of post-ReLU grids with
            # zero padding -> non-negative: take the zero-fill scatter path
            if not self.tta_fold:
                return voxel_max_pool(pts, coords, out_size, scale,
                                      "auto", True)
            out = voxel_max_pool_tta(pts, coords, out_size, scale, kind,
                                     nonneg=True)
            return out.reshape(B, *out.shape[2:])

        # ---- stage 0: full grid -> 1/2, asymmetric 7x3 block
        x0 = ConvStage(c1, n1, stride=2, unbalance_kernel=(7, 3), dtype=dt,
                       name="header_bev")(bev_in.astype(dt), train,
                                          header_phase_T)
        B = x0.shape[0]  # fused header re-expands (Bt*T, ...) -> (V*Bt, ...)

        # cascade A through the range view at 1/2 scale
        x0_point = cascade_gather(x0, bev_coord, (0.5, 0.5), "bev")
        x0_rv = cascade_scatter(x0_point, rv_coord, (rv_h // 2, rv_w // 2),
                                (0.5, 0.5), "rv")
        x0_rv = ConvStage(c1, n1 - 1, stride=1, dtype=dt,
                          name="header_rv")(x0_rv, train)
        x0_point = cascade_gather(x0_rv, rv_coord, (0.5, 0.5), "rv")
        h0, w0 = x0.shape[1], x0.shape[2]
        x0_bev = cascade_scatter(x0_point, bev_coord, (h0, w0), (0.5, 0.5),
                                 "bev")
        x0 = jnp.concatenate([x0, x0_bev], axis=-1)  # 2*c1 channels

        # ---- stage 1: 1/2 -> 1/4, asymmetric 5x3 block
        x1 = ConvStage(c2, n2, stride=2, unbalance_kernel=(5, 3), dtype=dt,
                       name="res1_bev")(x0, train)

        x1_point = cascade_gather(x1, bev_coord, (0.25, 0.25), "bev")
        x1_rv = cascade_scatter(x1_point, rv_coord, (rv_h // 4, rv_w // 4),
                                (0.25, 0.25), "rv")
        x1_rv = ConvStage(c2, n2 - 1, stride=1, dtype=dt,
                          name="res1_rv")(x1_rv, train)
        x1_point = cascade_gather(x1_rv, rv_coord, (0.25, 0.25), "rv")
        h1, w1 = x1.shape[1], x1.shape[2]
        x1_bev = cascade_scatter(x1_point, bev_coord, (h1, w1), (0.25, 0.25),
                                 "bev")
        x1 = jnp.concatenate([x1, x1_bev], axis=-1)  # 2*c2 channels

        # ---- stage 2: 1/4 -> 1/8
        x2 = ConvStage(c3, n3, stride=2, dtype=dt, name="res2")(x1, train)
        B, hq, wq, d = x2.shape

        # ---- deformable-attention temporal fusion at 1/8
        learned_query = self.param(
            "query_embed", nn.initializers.normal(stddev=1.0),
            (hq * wq, d), jnp.float32)
        query = jnp.where(
            use_memory,
            memory.reshape(B, hq * wq, d),
            jnp.broadcast_to(learned_query[None].astype(memory.dtype),
                             (B, hq * wq, d)))
        src = x2.reshape(B, hq * wq, d)
        fused = DeformAttnModule(cfg.n_attn_layers, cfg.d_model, cfg.ffn_dim,
                                 cfg.attn_dropout, cfg.n_heads, cfg.n_points,
                                 dtype=dt, name="deformattn")(
                                     query.astype(dt), src, (hq, wq), train)
        x2 = fused.reshape(B, hq, wq, d)
        new_memory = x2.astype(jnp.float32)

        # ---- parameter-free multi-scale decoder at 1/2 resolution
        res_0 = x0  # already (h0, w0)
        res_1 = resize_bilinear_align_corners(x1, (h0, w0))
        res_2 = resize_bilinear_align_corners(x2, (h0, w0))
        out = jnp.concatenate([res_0, res_1, res_2], axis=-1)
        out = BasicConv2d(128, kernel_size=3, padding=1, dtype=dt,
                          name="conv_1")(out, train)
        out_channels = (c3 + c2) // 2 + c1  # fusion_channels1
        out = BasicConv2d(out_channels // 2, kernel_size=3, padding=1,
                          dtype=dt, name="conv_2")(out, train)

        # ---- auxiliary BEV heads (1x1, bias like torch nn.Conv2d default)
        aux0 = nn.Conv(cfg.class_num, (1, 1), dtype=dt, name="aux_head1")(res_0)
        aux1 = nn.Conv(cfg.class_num, (1, 1), dtype=dt, name="aux_head2")(res_1)
        aux2 = nn.Conv(cfg.class_num, (1, 1), dtype=dt, name="aux_head3")(res_2)

        return out, x1_point, aux0, aux1, aux2, new_memory

    @staticmethod
    def out_channels(cfg: ModelConfig) -> int:
        _, c1, c2, c3 = cfg.context_layers
        return ((c3 + c2) // 2 + c1) // 2
