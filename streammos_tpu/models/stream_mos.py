"""The StreamMOS network: per-point encoder, multi-view BEV/RV encoder with
deformable-attention temporal fusion, point-level fusion head — plus the
stage-2 movable-object refine branch.

TPU re-design of `/root/reference/models/StreamMOS.py` (AttNet) and
`/root/reference/models/StreamMOS_seg.py` (AttNet + Refine):

* one flax module covers both stages — `with_refine=True` adds the refine
  branch (`StreamMOS_seg.py:21-30,96`), whose parameter tree is a strict
  superset of stage 1's, so stage-2 init can graft stage-1 weights
  (`train_StreamMOS_seg.py:165-167` strict=False load);
* the whole per-frame forward is one jittable function with the short-term
  memory as an explicit carry; the first-frame (learned query) and
  streaming (carried memory) paths share a single graph via a traced
  `use_memory` flag, so streaming never recompiles;
* the per-window BEV label rasterization the reference does on CPU workers
  (`datasets/data_StreamMOS.py:284-290`) is folded into the jitted loss
  (`bev_label_from_points`) — the host pipeline only ships points + labels.

Shapes (reference documents torch NCHW at `StreamMOS_seg.py:119-129`; here
channels-last):
  points        (B, T, N, 7)   (x, y, z, intensity, dist, diff_x, diff_y)
  bev_coord     (B, T, N, 3)   fractional coords in the full BEV grid
  rv_coord      (B, T, N, 2)   fractional coords in the full RV grid
  memory        (B, Hq, Wq, D) previous fused 1/8-scale map
  pred          (B, N, class_num)
  aux_i         (B, H/2, W/2, class_num)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from streammos_tpu.config import ModelConfig
from streammos_tpu.losses import lovasz_softmax, make_criterion
from streammos_tpu.nn.blocks import (CatFusion, PointNetStacker,
                                     PredBranch, make_fusion)
from streammos_tpu.nn.encoder import MultiViewEncoder
from streammos_tpu.ops import (grid_to_point, grid_to_point_tta,
                               voxel_max_pool, voxel_max_pool_tta)


def memory_shape(cfg: ModelConfig, batch: int) -> Tuple[int, int, int, int]:
    hq, wq = cfg.query_hw
    return (batch, hq, wq, cfg.d_model)


def featurize(xyzi: jax.Array, cfg: ModelConfig) -> Dict[str, jax.Array]:
    """In-graph per-frame preprocessing: raw (…, N, 4) xyzi -> the network's
    7-channel point features and fractional BEV / RV coordinates.

    The reference computes this on CPU dataloader workers
    (`datasets/data_StreamMOS.py:159-184` form_batch -> Quantize /
    SphereQuantize / make_point_feat); here it is trivially-fused elementwise
    device work, so the host pipeline ships only raw float32 points.
    """
    from streammos_tpu import geometry

    v = cfg.voxel
    bev_coord = geometry.quantize(xyzi, v.range_x, v.range_y, v.range_z,
                                  v.bev_shape)
    rv_coord = geometry.sphere_quantize(xyzi, (-180.0, 180.0), v.rv_theta,
                                        v.rv_shape)
    points = geometry.make_point_feat(xyzi, bev_coord)
    return {"points": points, "bev_coord": bev_coord, "rv_coord": rv_coord}


def tta_expand(xyzi: jax.Array) -> jax.Array:
    """(B, T, N, 4) -> (B*4, T, N, 4): the reference's eval-time TTA — the
    four (x, y) sign-flip combinations stacked on the batch axis
    (`datasets/data_StreamMOS.py:495-513`), generated on device."""
    outs = []
    for x_sign in (1.0, -1.0):
        for y_sign in (1.0, -1.0):
            sign = jnp.asarray([x_sign, y_sign, 1.0, 1.0], xyzi.dtype)
            outs.append(xyzi * sign)
    return jnp.concatenate(outs, axis=0)


def tta_scores(pred_folded: jax.Array, class_num: int,
               v: int = 4) -> jax.Array:
    """TTA-mean class scores from FOLDED logits (Bt, N, V*classes):
    softmax over classes per variant, mean over variants — the reference's
    `val_StreamMOS.py:97-98` reduction.

    Computed with N on the LANE axis: reducing over the narrow trailing
    (V, classes) dims directly makes XLA pick (2,128)-tiled layouts whose
    elementwise/reduce chain costs ~10 ms/frame at 160k points (round-3
    trace); two tiny (N x 12)-sized transposes around lane-major compute
    bring it to noise level. Returns (Bt, N, classes) float32."""
    bt, n, vc = pred_folded.shape
    assert vc == v * class_num, (vc, v, class_num)
    x = pred_folded.transpose(0, 2, 1).reshape(bt, v, class_num, n)
    s = jax.nn.softmax(x, axis=2).mean(axis=1)  # lane-major (N on lanes)
    return s.transpose(0, 2, 1)


def tta_expand_folded(xyzi: jax.Array) -> jax.Array:
    """(B, T, N, 4) -> (B, T, N, 4, 4): the same four flip variants stacked
    on a MINOR axis — the layout `StreamMOSNet(tta_fold=True)` consumes
    (variants ride channels through the point side, so the scatter fold
    needs no transpose). Variant order matches `tta_expand`."""
    signs = jnp.asarray([[x, y, 1.0, 1.0]
                         for x in (1.0, -1.0) for y in (1.0, -1.0)],
                        xyzi.dtype)  # (V, 4)
    return xyzi[..., None, :] * signs


class RefineBranch(nn.Module):
    """Stage-2 movable-object head over the same three point-feature inputs
    (StreamMOS_seg.py:21-30)."""

    cfg: ModelConfig
    fold: int = 1

    @nn.compact
    def __call__(self, feats, train: bool):
        dt = jnp.dtype(self.cfg.compute_dtype)
        x = make_fusion(self.cfg.fusion_mode,
                        self.cfg.point_feat_out_channels,
                        self.cfg.dropout_rate, dt,
                        name="bf_point_post", fold=self.fold)(feats, train)
        return PredBranch(self.cfg.class_num, self.cfg.dropout_rate, dtype=dt,
                          fold=self.fold, name="bf_pred_layer")(x, train)


class StreamMOSNet(nn.Module):
    """``tta_fold=True`` (eval-only) runs the reference's 4-variant TTA fan
    with the variants FOLDED onto a minor axis on the point side and onto the
    batch axis on the dense grid side:

      points     (Bt, T, N, V=4, 7)  per-variant point features
      bev_coord  (Bt, T, N, V, 3)    per-variant coords (only variant 0 — the
      rv_coord   (Bt, T, N, V, 2)    canonical orientation — indexes ops)
      memory     (4*Bt, Hq, Wq, D)   dense side: variants on the batch axis
      pred       (Bt, N, V, classes)

    Every scatter/gather runs once over the variants' shared index structure
    (ops/tta_fold.py: 4x fewer rows on the row-count-bound hot ops), per-point
    heads broadcast over V (1x1 convs are axis-agnostic), and only the dense
    convs/attention run per-variant. No variant transpose is ever paid."""

    cfg: ModelConfig
    with_refine: bool = False
    tta_fold: bool = False

    @nn.compact
    def __call__(self, points, bev_coord, rv_coord, memory, use_memory,
                 train: bool = False):
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        H, W = cfg.voxel.bev_wl
        c0 = cfg.context_layers[0]
        if self.tta_fold:
            Bt, T, N, V, C = points.shape
            B = V * Bt  # dense-side batch
        else:
            B, T, N, C = points.shape

        # point-wise MLP over all T frames at once (StreamMOS.py:101); in
        # folded mode the variants ride the lane axis END TO END: the MLP
        # applies its shared weights per v-major lane block (FoldedDense /
        # folded BN), so the (N, V, C) <-> (N, V*C) relayout copies that a
        # dims-based fold pays (~2.7 ms/frame at the scatter boundary,
        # round-3 trace) never exist.
        if self.tta_fold:
            pts = points.reshape(Bt * T, N, V * C).astype(dt)
            point_feat = PointNetStacker(c0, pre_bn=True, stack_num=2,
                                         dtype=dt, fold=V,
                                         name="point_pre")(pts, train)
        else:
            pts = points.reshape(B * T, N, C).astype(dt)
            point_feat = PointNetStacker(c0, pre_bn=True, stack_num=2,
                                         dtype=dt, name="point_pre")(pts,
                                                                     train)

        # scatter every frame into the full BEV grid, then stack frames along
        # channels, frame-major (StreamMOS.py:102-103). The frame stack stays
        # in the (B, T, H, W, c0) frame-split layout — the encoder header's
        # DownSample2D consumes it as per-frame kernel-slice convs summed,
        # which equals the conv over the T*c0 channel concat without ever
        # materializing the transpose. (A space-to-depth variant of this
        # boundary exists — phase_split scatter + DownSample2D phase path —
        # but measured SLOWER end-to-end on v5e despite winning in isolation:
        # docs/DESIGN.md "phase-split postmortem".)
        if self.tta_fold:
            coords0 = bev_coord[..., 0, :].reshape(Bt * T, N, 3)
            header_phase_T = 0
            if not train and cfg.fused_header:
                # fused Pallas header: scatter straight into the phase-split
                # half-res layout (free cell-id relabel); the header kernel
                # consumes it canonically and re-expands to (V*Bt, ...)
                # without ever materializing the 512^2 grid. point_feat is
                # ALREADY the folded (Bt*T, N, V*c0) lane layout.
                # row_pad=1: one empty half-res row above/below so the
                # header kernel's halo windows are single static DMAs;
                # phase-outer: the scatter's flat output IS the header's
                # (BtT, P, Hp, Wh, V*C) DMA layout (no retile)
                bev = voxel_max_pool(point_feat, coords0[..., :2], (H, W),
                                     (1.0, 1.0), "auto", True, "outer", 1)
                header_phase_T = T
            else:
                # point features are post-ReLU -> zero-fill scatter fast path
                bev = voxel_max_pool_tta(point_feat, coords0, (H, W),
                                         (1.0, 1.0), "bev", nonneg=True)
                bev = bev.reshape(B, T, H, W, c0)  # (V, Bt, T, ...)
            cur_bev = bev_coord[:, 0, :, 0, :2]  # (Bt, N, 2) canonical
            cur_rv = rv_coord[:, 0, :, 0]
        else:
            header_phase_T = 0
            bev = voxel_max_pool(point_feat,
                                 bev_coord.reshape(B * T, N, 3)[..., :2],
                                 (H, W), (1.0, 1.0), "auto", True)
            bev = bev.reshape(B, T, H, W, c0)
            cur_bev = bev_coord[:, 0, :, :2]
            cur_rv = rv_coord[:, 0]

        (bev_feat, point_feat_1, aux0, aux1, aux2,
         new_memory) = MultiViewEncoder(cfg, tta_fold=self.tta_fold,
                                        name="bev_net")(
             bev, cur_bev, cur_rv, memory, use_memory, train,
             header_phase_T)

        fold = V if self.tta_fold else 1
        if self.tta_fold:
            point_bev_feat = grid_to_point_tta(
                bev_feat.reshape(4, Bt, *bev_feat.shape[1:]), cur_bev,
                cfg.grid2point_scale, "bev")  # (Bt, N, V*C) folded lanes
            point_feat_cur = point_feat.reshape(Bt, T, N, V * c0)[:, 0]
        else:
            point_bev_feat = grid_to_point(bev_feat, cur_bev,
                                           cfg.grid2point_scale)
            point_feat_cur = point_feat.reshape(B, T, N, c0)[:, 0]

        fused = make_fusion(cfg.fusion_mode, cfg.point_feat_out_channels,
                            cfg.dropout_rate, dt, name="point_post",
                            fold=fold)(
                                [point_feat_cur, point_bev_feat, point_feat_1],
                                train)
        pred = PredBranch(cfg.class_num, cfg.dropout_rate, dtype=dt,
                          fold=fold, name="pred_layer")(fused, train)

        out = {}
        if self.tta_fold:
            # the folded (Bt, N, V*classes) logits are the layout eval
            # consumers should reduce from (`tta_scores`); the unfolded
            # "pred" view is kept for the output contract and is dead code
            # (free) when only the scores are consumed — reducing over the
            # narrow (N, V, 3) dims directly cost ~10 ms/frame in XLA's
            # chosen layouts (round-3 trace)
            out["pred_folded"] = pred.astype(jnp.float32)
            pred = pred.reshape(Bt, N, V, cfg.class_num)

        out.update({
            "pred": pred.astype(jnp.float32),
            "aux0": aux0.astype(jnp.float32),
            "aux1": aux1.astype(jnp.float32),
            "aux2": aux2.astype(jnp.float32),
            "memory": new_memory,
        })
        if self.with_refine:
            bf = RefineBranch(cfg, fold=fold, name="refine")(
                [point_feat_cur, point_bev_feat, point_feat_1], train)
            if self.tta_fold:
                out["bf_pred_folded"] = bf.astype(jnp.float32)
                bf = bf.reshape(Bt, N, V, cfg.class_num)
            out["bf_pred"] = bf.astype(jnp.float32)
        return out


def init_model(rng: jax.Array, cfg: ModelConfig, batch: int = 1,
               num_points: int = 1024, with_refine: bool = False,
               tta_fold: bool = False):
    """Initialize (params, batch_stats) with dummy shapes. The parameter
    tree is identical with/without `tta_fold` (it only reroutes the
    point-mediated index ops), so checkpoints are interchangeable."""
    model = StreamMOSNet(cfg, with_refine=with_refine, tta_fold=tta_fold)
    T = cfg.seq_num
    if tta_fold:
        # `batch` is the dense-side batch (the 4-variant TTA fan x Bt)
        bt = batch // 4
        dummy = {
            "points": jnp.zeros((bt, T, num_points, 4, 7), jnp.float32),
            "bev_coord": jnp.zeros((bt, T, num_points, 4, 3), jnp.float32),
            "rv_coord": jnp.zeros((bt, T, num_points, 4, 2), jnp.float32),
        }
    else:
        dummy = {
            "points": jnp.zeros((batch, T, num_points, 7), jnp.float32),
            "bev_coord": jnp.zeros((batch, T, num_points, 3), jnp.float32),
            "rv_coord": jnp.zeros((batch, T, num_points, 2), jnp.float32),
        }
    mem = jnp.zeros(memory_shape(cfg, batch), jnp.float32)
    variables = model.init({"params": rng}, dummy["points"], dummy["bev_coord"],
                           dummy["rv_coord"], mem, jnp.asarray(False),
                           train=False)
    return model, variables


def stage_forward(model: StreamMOSNet, variables, batch: Dict[str, jax.Array],
                  memory: jax.Array, use_memory, train: bool,
                  dropout_rng: Optional[jax.Array] = None):
    """One frame forward (StreamMOS.py:86-113). Returns (outputs, new_vars)
    where new_vars carries updated batch statistics when training."""
    mutable = ["batch_stats"] if train else False
    rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
    out = model.apply(variables, batch["points"], batch["bev_coord"],
                      batch["rv_coord"], memory, use_memory, train=train,
                      rngs=rngs, mutable=mutable)
    if train:
        return out  # (outputs, mutated_vars)
    return out, None


def bev_label_from_points(labels: jax.Array, bev_coord: jax.Array,
                          out_hw: Tuple[int, int],
                          scale: Tuple[float, float] = (0.5, 0.5)) -> jax.Array:
    """Rasterize per-point labels to a BEV label map by per-cell max
    (data_StreamMOS.py:284-290: VoxelMaxPool of the label values — 'moving'
    wins over 'static' wins over 'unlabeled'). In-graph; labels (B, N)."""
    lab = labels.astype(jnp.float32)[..., None]
    grid = voxel_max_pool(lab, bev_coord, out_hw, scale, "auto", True)
    return grid[..., 0].astype(jnp.int32)


def single_frame_loss(cfg: ModelConfig, outputs: Dict[str, jax.Array],
                      targets: jax.Array, bev_targets: jax.Array,
                      criterion=None) -> jax.Array:
    """Point loss + mean of 3 aux BEV losses, each CE(+OHEM) + 3*lovasz
    (StreamMOS.py:147-152)."""
    if criterion is None:
        criterion = make_criterion(cfg.loss_mode, cfg.class_num)
    B = targets.shape[0]

    def seg_loss(logits, tgt):
        return criterion(logits, tgt) + 3.0 * lovasz_softmax(logits, tgt, 0)

    loss1 = seg_loss(outputs["pred"], targets)
    aux_losses = []
    for key in ("aux0", "aux1", "aux2"):
        a = outputs[key].reshape(B, -1, cfg.class_num)
        aux_losses.append(seg_loss(a, bev_targets.reshape(B, -1)))
    return loss1 + sum(aux_losses) / 3.0


def refine_loss(cfg: ModelConfig, outputs: Dict[str, jax.Array],
                bf_targets: jax.Array, criterion=None) -> jax.Array:
    """Stage-2 loss: only the movable head (StreamMOS_seg.py:169)."""
    if criterion is None:
        criterion = make_criterion(cfg.loss_mode, cfg.class_num)
    return (criterion(outputs["bf_pred"], bf_targets)
            + 3.0 * lovasz_softmax(outputs["bf_pred"], bf_targets, 0))


def streaming_loss(model: StreamMOSNet, variables, windows: Dict[str, jax.Array],
                   cfg: ModelConfig, dropout_rng: jax.Array,
                   stage2: bool = False, remat: bool = False):
    """Streaming training objective over the 3 sliding windows of one sample
    (StreamMOS.py:155-179): the memory carry threads through all windows and
    gradients flow through the whole chain (BPTT over the stream).

    windows: dict of arrays with a leading window axis S=3 — either raw
      xyzi (S, B, T, N, 4) (featurized in-graph) or precomputed
      points/bev_coord/rv_coord — plus targets (S, B, N)
      [+ bf_targets (S, B, N) for stage 2].
    Returns (loss, new_variables).
    """
    key = "xyzi" if "xyzi" in windows else "points"
    S = windows[key].shape[0]
    B = windows[key].shape[1]
    criterion = make_criterion(cfg.loss_mode, cfg.class_num)
    memory = jnp.zeros(memory_shape(cfg, B), jnp.float32)
    vars_now = variables
    total = 0.0
    def one_window(vars_now, batch, memory, use_memory, rng_i):
        return stage_forward(model, vars_now, batch, memory, use_memory,
                             train=True, dropout_rng=rng_i)

    if remat:
        # rematerialize each window's forward: the 3-window BPTT chain
        # (StreamMOS.py:155-179) otherwise holds 3x activations
        one_window = jax.checkpoint(one_window, static_argnums=())

    for i in range(S):
        if "xyzi" in windows:
            batch = featurize(windows["xyzi"][i], cfg)
        else:
            batch = {
                "points": windows["points"][i],
                "bev_coord": windows["bev_coord"][i],
                "rv_coord": windows["rv_coord"][i],
            }
        rng_i = jax.random.fold_in(dropout_rng, i)
        out, mutated = one_window(vars_now, batch, memory,
                                  jnp.asarray(i > 0), rng_i)
        vars_now = {**vars_now, **mutated}
        memory = out["memory"]
        if stage2:
            total = total + refine_loss(cfg, out, windows["bf_targets"][i],
                                        criterion)
        else:
            hw = (cfg.voxel.bev_wl[0] // 2, cfg.voxel.bev_wl[1] // 2)
            bev_tgt = bev_label_from_points(windows["targets"][i],
                                            batch["bev_coord"][:, 0, :, :2],
                                            hw, (0.5, 0.5))
            total = total + single_frame_loss(cfg, out, windows["targets"][i],
                                              bev_tgt, criterion)
    return total / S, vars_now
