"""Network building blocks (flax.linen, NHWC), re-designing the reference's
`networks/backbone.py` modules TPU-first.

Parity notes
------------
* BatchNorm matches torch defaults: eps 1e-5, running-stat momentum 0.1
  (flax ``momentum=0.9``). When the training step is jitted over a batch that
  is sharded across a device mesh, the batch statistics are computed over the
  *global* batch — XLA inserts the cross-replica reductions — which is exactly
  the reference's SyncBatchNorm (`train_StreamMOS.py:170`) without a separate
  wrapper.
* Point features live as (B, N, C); the reference's 1x1 Conv2d over
  (B, C, N, 1) tensors is a per-point Dense layer here (same math, and on TPU
  a (B*N, C) x (C, C') matmul drives the MXU directly).
* Grids are NHWC; convs use ``bias=False`` exactly where the reference does.

Mixed precision: every block takes a ``dtype`` (the compute dtype — bfloat16
in the production config). Parameters stay float32; BatchNorm statistics are
always accumulated in float32 (the cast is elementwise and fuses into the
surrounding conv epilogue).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from streammos_tpu.ops import grid_to_point

Dtype = Any


class FoldedBatchNorm(nn.Module):
    """Eval-only stand-in for `nn.BatchNorm` over TTA-FOLDED lanes.

    The folded eval layout carries the 4 TTA variants side by side on the
    channel axis (x: (..., N, fold*C)); reference semantics put the variants
    on the batch axis, so every variant must normalize with the SAME (C,)
    statistics. This module declares variables byte-identical to
    `nn.BatchNorm` (params scale/bias, batch_stats mean/var, all (C,)) —
    checkpoints are interchangeable with the unfolded path — and applies
    them tiled across the fold, replicating flax's eval arithmetic exactly
    (tile first, then cast to the compute dtype, then
    (x - mean) * rsqrt(var + eps) * scale + bias)."""

    fold: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1] // self.fold
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((C,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        dt = jnp.dtype(self.dtype)
        m = jnp.tile(mean.value, self.fold).astype(dt)
        v = jnp.tile(var.value, self.fold).astype(dt)
        s = jnp.tile(scale, self.fold).astype(dt)
        b = jnp.tile(bias, self.fold).astype(dt)
        return (x.astype(dt) - m) * jax.lax.rsqrt(v + jnp.asarray(
            1e-5, dt)) * s + b


class BN(nn.Module):
    """BatchNorm with torch-parity defaults; float32 statistics.

    Training runs the normalization in float32 (batch statistics must not
    accumulate in bf16). Eval is a pure per-channel scale/shift from the f32
    running stats, so it runs in the compute dtype — casting every activation
    to f32 and back costs two full-tensor copies per BN at the memory-bound
    copy speed this chip sustains, for no accuracy the bf16 convs around it
    could use.

    ``fold > 1`` (eval-only): the input carries fold TTA variants on the
    channel axis; the shared (C,) statistics apply per lane block."""

    dtype: Dtype = jnp.float32
    fold: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        if self.fold > 1:
            assert not train, "folded BN is an eval-only layout"
            return FoldedBatchNorm(self.fold, self.dtype,
                                   name="BatchNorm_0")(x)
        comp = jnp.float32 if train else jnp.dtype(self.dtype)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=comp)(x.astype(comp))
        return y.astype(self.dtype)


class FoldedDense(nn.Module):
    """Eval-only stand-in for `nn.Dense` over TTA-FOLDED lanes.

    Declares the same (in_features, features) kernel as `nn.Dense` and
    applies it per variant block as ONE dense matmul against the
    block-diagonal expansion of the shared weight: variant v's lane block
    [v*C_in, (v+1)*C_in) maps through the SAME matrix to lane block
    [v*C_out, (v+1)*C_out), with zero data-layout movement. The off-block
    zeros cost fold x FLOPs on matmuls that are tiny next to the layout
    copies they remove (measured round 3: a feature_group_count grouped
    conv lowers to (…, V, C)-split layouts + ~6 ms of copies at production
    shapes — the dense block-diagonal form keeps the flat lane layout).

    Takes a LIST of folded inputs: a per-variant channel concat across
    sources (the reference CatFusion input) equals the SUM of per-source
    matmuls with the matching kernel ROW slice, so the folded path never
    materializes the variant-interleaved concat."""

    features: int      # unfolded output width
    in_features: int   # unfolded total input width (sum over sources)
    fold: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array]):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        dt = jnp.dtype(self.dtype)
        out = None
        row = 0
        for x in xs:
            x = x.astype(dt)
            assert x.shape[-1] % self.fold == 0, (
                f"folded input width {x.shape[-1]} not divisible by "
                f"fold={self.fold}")
            cin = x.shape[-1] // self.fold
            k = kernel[row:row + cin].astype(dt)
            row += cin
            bd = jnp.zeros((self.fold * cin, self.fold * self.features), dt)
            for v in range(self.fold):
                bd = bd.at[v * cin:(v + 1) * cin,
                           v * self.features:(v + 1) * self.features].set(k)
            y = jnp.einsum("...c,cd->...d", x, bd)
            out = y if out is None else out + y
        assert row == self.in_features, (row, self.in_features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + jnp.tile(bias, self.fold).astype(dt)
        return out


def maxpool3x3(x: jax.Array, stride: int) -> jax.Array:
    """3x3 max-pool, padding 1, via SEPARABLE shifted-slice maxima.

    Exactly `nn.max_pool(x, (3, 3), strides, padding=((1,1),(1,1)))` (max
    is associative and -inf-padded), but XLA's reduce-window lowering runs
    ~25x below stream speed at small channel counts (1.27 ms for a 4 MB
    32-channel map on v5e, round-3 trace); four shifted elementwise maxima
    run at stream speed."""
    neg = jnp.asarray(-np.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    m = jnp.maximum(jnp.maximum(xp[:, :, :-2], xp[:, :, 1:-1]), xp[:, :, 2:])
    m = jnp.maximum(jnp.maximum(m[:, :-2], m[:, 1:-1]), m[:, 2:])
    return m[:, ::stride, ::stride]


def conv3x3(out_planes: int, stride: int = 1, dilation: int = 1,
            bias: bool = False, dtype: Dtype = jnp.float32) -> nn.Conv:
    """3x3 conv with 'same-ish' torch padding (backbone.py:9-11)."""
    return nn.Conv(out_planes, (3, 3), strides=(stride, stride),
                   padding=((dilation, dilation), (dilation, dilation)),
                   kernel_dilation=(dilation, dilation), use_bias=bias,
                   dtype=dtype)


class DownSample2D(nn.Module):
    """Dual-branch strided downsample (backbone.py:14-34):
    3x3 conv+BN in parallel with 1x1 conv+BN+3x3 maxpool, sum, ReLU.

    Accepts either (B, H, W, C) or the frame-split layout (B, T, H, W, C/T):
    a conv over T channel-concatenated frames equals the sum of per-frame
    convs with the matching kernel slice, so the multi-frame BEV stack never
    pays the (B, T, H, W, c0) -> (B, H, W, T*c0) transpose (a ~400 MB copy
    that measured 15 ms/frame on v5e — layout moves there run far below HBM
    speed)."""

    out_planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, tta_phase_T: int = 0):
        x = x.astype(self.dtype)
        split = x.ndim >= 5 and not tta_phase_T
        phase = x.ndim == 6 and not tta_phase_T
        T = tta_phase_T or (x.shape[1] if split else 1)
        c_in = (T * (x.shape[-1] // 4) if tta_phase_T
                else T * x.shape[-1])
        k3 = self.param("conv3_kernel", nn.initializers.lecun_normal(),
                        (3, 3, c_in, self.out_planes), jnp.float32)
        k1 = self.param("conv1_kernel", nn.initializers.lecun_normal(),
                        (1, 1, c_in, self.out_planes), jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")
        if tta_phase_T:
            # eval-only fused TTA header: x is the phase-split scatter
            # output (Bt*T, Hh, Wh, P, V*C), canonical orientation; one
            # Pallas kernel per variant runs both branches + eval BN +
            # pool + relu at half resolution (ops/fused_header.py), and
            # the outputs are re-oriented at 1/16 the full-grid bytes
            return self._tta_phase_fused(x, k3, k1, tta_phase_T, train)
        if phase:
            return self._phase_forward(x, k3, k1, train)

        def apply(kernel, strides, padding):
            kernel = kernel.astype(self.dtype)
            if not split:
                return jax.lax.conv_general_dilated(
                    x, kernel, strides, padding, dimension_numbers=dn)
            cs = x.shape[-1]
            out = None
            for t in range(T):
                y = jax.lax.conv_general_dilated(
                    x[:, t], kernel[:, :, t * cs:(t + 1) * cs], strides,
                    padding, dimension_numbers=dn)
                out = y if out is None else out + y
            return out

        conv_b = apply(k3, (self.stride, self.stride), ((1, 1), (1, 1)))
        conv_b = BN(self.dtype)(conv_b, train)

        pool_b = apply(k1, (1, 1), ((0, 0), (0, 0)))
        pool_b = BN(self.dtype)(pool_b, train)
        pool_b = maxpool3x3(pool_b, self.stride)
        return nn.relu(conv_b + pool_b)

    def _phase_forward(self, x, k3, k1, train: bool):
        """Stride-2 DownSample2D on a space-to-depth input
        (B, T, H/2, W/2, 4, C), phase index 2*(x&1)+(y&1) — the layout the
        BEV scatter emits directly (`voxel_max_pool(phase_split=True)`).

        The 3x3/s2 conv over the full grid is computed as ONE 2x2 conv per
        frame over the P*C phase-merged channels: output pixel i reads
        full-res rows 2i-1+ki, which in halved space is position i-1 (window
        slot 0) for tap ki=0, and position i (slot 1) for ki in {1, 2} —
        phase-0 channels use slot 1 only (their slot-0 weights are zero).
        This keeps every dense op at half resolution with NO per-phase
        slicing of the big tensor (a sliced-phase formulation re-introduced
        ~10 ms of strided-slice copies at production shapes). The 4/9 unused
        kernel entries cost 1.78x FLOPs on a conv that is memory-bound
        anyway. The maxpool window decomposes the same way per phase over
        the (cheap, 32-channel) pre-pool maps."""
        assert self.stride == 2, "phase layout implies a stride-2 downsample"
        dn = ("NHWC", "HWIO", "NHWC")
        B, T, Hh, Wh, P, cs = x.shape
        out = self.out_planes
        k3 = k3.astype(self.dtype)
        k1 = k1.astype(self.dtype)

        # phase-merged 2x2 kernel: K[di, dj, p*cs + c, o] = k3[ki, kj, c', o]
        # where for phase bit b: slot 0 is valid only when b == 1 (full-res
        # tap ki=0), slot 1 maps to ki = 1 + b (phase 0 -> center tap ki=1,
        # phase 1 -> tap ki=2).
        def tap(di, b):
            # returns k3 spatial index or None (zero block)
            if di == 0:
                return 0 if b == 1 else None
            return 1 + b

        conv_b = None
        for t in range(T):
            kt = k3[:, :, t * cs:(t + 1) * cs]  # (3, 3, cs, out)
            blocks = []
            for di in range(2):
                row = []
                for dj in range(2):
                    phases = []
                    for p in range(P):
                        bi, bj = p >> 1, p & 1
                        ki, kj = tap(di, bi), tap(dj, bj)
                        if ki is None or kj is None:
                            phases.append(jnp.zeros((cs, out), self.dtype))
                        else:
                            phases.append(kt[ki, kj])
                    row.append(jnp.concatenate(phases, axis=0))  # (P*cs, out)
                blocks.append(jnp.stack(row))  # (2, P*cs, out)
            K = jnp.stack(blocks)  # (2, 2, P*cs, out)
            xt = x[:, t].reshape(B, Hh, Wh, P * cs)
            y = jax.lax.conv_general_dilated(xt, K, (1, 1), ((1, 0), (1, 0)),
                                             dimension_numbers=dn)
            conv_b = y if conv_b is None else conv_b + y
        conv_b = BN(self.dtype)(conv_b, train)

        # pool branch: per-phase 1x1 conv via a P-grouped conv (k1 replicated
        # across groups), frame kernel slices summed
        zs = None
        for t in range(T):
            k1t = k1[:, :, t * cs:(t + 1) * cs]  # (1, 1, cs, out)
            k1g = jnp.concatenate([k1t] * P, axis=-1)  # (1, 1, cs, P*out)
            xt = x[:, t].reshape(B, Hh, Wh, P * cs)
            z = jax.lax.conv_general_dilated(xt, k1g, (1, 1),
                                             ((0, 0), (0, 0)),
                                             dimension_numbers=dn,
                                             feature_group_count=P)
            zs = z if zs is None else zs + z
        # ONE BatchNorm over the per-output-channel statistics of all phases
        # (reshape puts phase on a spatial-like axis; same element set as the
        # full-resolution map, so identical statistics)
        zs = BN(self.dtype)(zs.reshape(B, Hh, Wh * P, out), train)
        zs = zs.reshape(B, Hh, Wh, P, out)

        pool_b = None
        for p in range(P):
            bi, bj = p >> 1, p & 1
            win = (1, 2 if bi else 1, 2 if bj else 1, 1)
            pad = ((0, 0), (1, 0) if bi else (0, 0),
                   (1, 0) if bj else (0, 0), (0, 0))
            m = jax.lax.reduce_window(zs[..., p, :], -jnp.inf, jax.lax.max,
                                      win, (1, 1, 1, 1), pad)
            pool_b = m if pool_b is None else jnp.maximum(pool_b, m)
        return nn.relu(conv_b + pool_b)


    def _tta_phase_fused(self, g_phase, k3, k1, T: int, train: bool):
        """Fused TTA header (eval only): phase-OUTER scatter output
        (Bt*T, P, Hh+2, Wh, V*C) -> oriented per-variant DownSample2D
        outputs (V*Bt, Hh, Wh, out_planes). See ops/fused_header.py."""
        import jax as _jax

        from streammos_tpu.ops.fused_header import (V_TTA, fused_header_tta,
                                                    fused_header_reference)
        from streammos_tpu.ops.tta_fold import orient_grid

        assert not train, "fused TTA header is an eval-only path"
        # eval BatchNorm is a per-channel affine; extract it through the
        # same BN submodules the standard path creates (same param tree):
        # BN(0) = bias_eff, BN(1) - BN(0) = scale_eff
        bn_conv = BN(self.dtype)  # auto-named BN_0 (conv branch)
        bn_pool = BN(self.dtype)  # BN_1 (pool branch)
        probe = jnp.stack([jnp.zeros(self.out_planes, jnp.float32),
                           jnp.ones(self.out_planes, jnp.float32)])

        def affine(bn):
            y = bn(probe, train=False).astype(jnp.float32)
            return y[1] - y[0], y[0]

        conv_aff = affine(bn_conv)
        pool_aff = affine(bn_pool)
        k3 = k3.astype(self.dtype)
        k1 = k1.astype(self.dtype)
        if _jax.default_backend() == "tpu":
            y = fused_header_tta(g_phase, k3, k1, conv_aff, pool_aff, T)
        else:  # CPU tests / fallback: same math, XLA composition
            y = fused_header_reference(g_phase, k3, k1, conv_aff, pool_aff, T)
        # canonical-anchored -> each variant's own orientation, stacked on
        # the batch axis in tta_expand order (B = V * Bt)
        y = jnp.stack([orient_grid(y[v], v, "bev", (1, 2))
                       for v in range(V_TTA)])
        V, Bt, Hh, Wh, C = y.shape
        return y.reshape(V * Bt, Hh, Wh, C)


class ChannelAtt(nn.Module):
    """SE-style channel attention (backbone.py:87-102)."""

    channels: int
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        ca = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                      keepdims=True).astype(self.dtype)
        ca = nn.Conv(self.channels // self.reduction, (1, 1),
                     dtype=self.dtype)(ca)
        ca = nn.relu(ca)
        ca = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(ca)
        ca = jax.nn.sigmoid(ca)
        return x * ca


class SpatialAtt(nn.Module):
    """Spatial attention map: 3x3 -> 4ch -> 3x3 -> 1ch sigmoid gate
    (backbone.py:105-120)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        sa = conv3x3(4, dtype=self.dtype)(x)
        sa = nn.relu(BN(self.dtype)(sa, train))
        sa = conv3x3(1, bias=True, dtype=self.dtype)(sa)
        return x * jax.nn.sigmoid(sa)


class CSAtt(nn.Module):
    """Channel attention followed by spatial attention (backbone.py:123-133)."""

    channels: int
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = ChannelAtt(self.channels, self.reduction, dtype=self.dtype)(x, train)
        return SpatialAtt(dtype=self.dtype)(x, train)


class BasicBlock(nn.Module):
    """Residual 3x3-3x3 block, optional channel attention before the residual
    add (backbone.py:136-159)."""

    planes: int
    dilation: int = 1
    use_att: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        out = conv3x3(self.planes, dtype=self.dtype)(x)
        out = BN(self.dtype)(out, train)
        out = nn.relu(out)
        out = conv3x3(self.planes, dilation=self.dilation,
                      dtype=self.dtype)(out)
        out = BN(self.dtype)(out, train)
        if self.use_att:
            out = ChannelAtt(self.planes, dtype=self.dtype)(out, train)
        return nn.relu(out + x)


class BasicBlockV2(nn.Module):
    """BasicBlock with channel+spatial (CS) attention instead of channel-only
    (backbone.py:162-185). Unused by the shipped configs; kept selectable."""

    planes: int
    dilation: int = 1
    use_att: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        out = conv3x3(self.planes, dtype=self.dtype)(x)
        out = nn.relu(BN(self.dtype)(out, train))
        out = conv3x3(self.planes, dilation=self.dilation,
                      dtype=self.dtype)(out)
        out = BN(self.dtype)(out, train)
        if self.use_att:
            out = CSAtt(self.planes, dtype=self.dtype)(out, train)
        return nn.relu(out + x)


class UnbalanceBasicBlock(nn.Module):
    """Asymmetric-convolution residual block (multi_view_encoder.py:478-497):
    parallel (k0 x k1) and (k1 x k0) convs, concat, 3x3 fuse, residual ReLU."""

    planes: int
    kernel_size: Tuple[int, int]  # e.g. (7, 3)
    padding: Tuple[int, int]  # e.g. (3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        k0, k1 = self.kernel_size
        p0, p1 = self.padding
        a = nn.Conv(self.planes, (k0, k1), padding=((p0, p0), (p1, p1)),
                    use_bias=False, dtype=self.dtype)(x)
        a = nn.relu(BN(self.dtype)(a, train))
        b = nn.Conv(self.planes, (k1, k0), padding=((p1, p1), (p0, p0)),
                    use_bias=False, dtype=self.dtype)(x)
        b = nn.relu(BN(self.dtype)(b, train))
        out = jnp.concatenate([a, b], axis=-1)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype)(out)
        out = BN(self.dtype)(out, train)
        return nn.relu(out + x)


class BasicConv2d(nn.Module):
    """conv + BN + LeakyReLU (multi_view_encoder.py:460-476)."""

    out_planes: int
    kernel_size: int = 3
    padding: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        k = self.kernel_size
        p = self.padding
        x = nn.Conv(self.out_planes, (k, k), padding=((p, p), (p, p)),
                    use_bias=False, dtype=self.dtype)(x)
        x = BN(self.dtype)(x, train)
        if self.relu:
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class PointNet(nn.Module):
    """Per-point MLP layer: (pre-BN) + Dense + BN (+ ReLU)
    (backbone.py:199-230). Operates on (..., N, C).

    ``fold > 1`` (eval-only): input/output carry fold TTA variants as lane
    blocks (..., N, fold*C); the shared weights apply per block with no
    layout movement (FoldedDense / folded BN)."""

    cout: int
    pre_bn: bool = False
    post_act: bool = True
    dtype: Dtype = jnp.float32
    fold: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        if self.pre_bn:
            x = BN(self.dtype, fold=self.fold)(x, train)
        if self.fold > 1:
            x = FoldedDense(self.cout, x.shape[-1] // self.fold, self.fold,
                            use_bias=False, dtype=self.dtype,
                            name="Dense_0")([x])
        else:
            x = nn.Dense(self.cout, use_bias=False, dtype=self.dtype)(x)
        x = BN(self.dtype, fold=self.fold)(x, train)
        if self.post_act:
            x = nn.relu(x)
        return x


class PointNetStacker(nn.Module):
    """Stacked per-point MLP (backbone.py:233-250)."""

    cout: int
    pre_bn: bool = False
    post_act: bool = True
    stack_num: int = 1
    dtype: Dtype = jnp.float32
    fold: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        if self.stack_num == 1:
            return PointNet(self.cout, self.pre_bn, self.post_act,
                            self.dtype, self.fold)(x, train)
        x = PointNet(self.cout, self.pre_bn, True, self.dtype,
                     self.fold)(x, train)
        for _ in range(1, self.stack_num - 1):
            x = PointNet(self.cout, False, True, self.dtype,
                         self.fold)(x, train)
        return PointNet(self.cout, False, self.post_act, self.dtype,
                        self.fold)(x, train)


class CatFusion(nn.Module):
    """Point-level fusion (backbone.py:387-413): concat, dropout 0.2, two
    1x1 conv+BN+ReLU stages (sum -> sum/2 -> out).

    ``fold > 1`` (eval-only): inputs are folded (..., N, fold*C_i); the
    per-variant concat never materializes — the first Dense consumes the
    sources directly as per-source kernel row slices (see FoldedDense)."""

    out_channel: int
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32
    fold: int = 1

    @nn.compact
    def __call__(self, x_list: Sequence[jax.Array], train: bool):
        if self.fold > 1:
            assert not train, "folded CatFusion is an eval-only layout"
            xs = [v.astype(self.dtype) for v in x_list]
            s = sum(v.shape[-1] for v in xs) // self.fold
            x = FoldedDense(s // 2, s, self.fold, use_bias=False,
                            dtype=self.dtype, name="Dense_0")(xs)
            x = nn.relu(BN(self.dtype, fold=self.fold)(x, train))
            x = FoldedDense(self.out_channel, s // 2, self.fold,
                            use_bias=False, dtype=self.dtype,
                            name="Dense_1")([x])
            x = nn.relu(BN(self.dtype, fold=self.fold)(x, train))
            return x
        x = jnp.concatenate([v.astype(self.dtype) for v in x_list], axis=-1)
        s = x.shape[-1]
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(s // 2, use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(BN(self.dtype)(x, train))
        x = nn.Dense(self.out_channel, use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(BN(self.dtype)(x, train))
        return x


class BranchAttFusion(nn.Module):
    """Learned-scalar weighted fusion (backbone.py:364-384): per-branch
    PointNet projections mixed by softmaxed global weights. Selectable via
    ``fusion_mode='branch_att'`` (the shipped config uses CatFusion)."""

    out_channel: int
    n_branches: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_list: Sequence[jax.Array], train: bool):
        weights = self.param("weights", nn.initializers.ones,
                             (len(x_list),), jnp.float32)
        w = jax.nn.softmax(weights).astype(self.dtype)
        out = None
        for i, x in enumerate(x_list):
            proj = PointNet(self.out_channel, pre_bn=False, dtype=self.dtype,
                            name=f"feat_model{i}")(x, train)
            out = proj * w[i] if out is None else out + proj * w[i]
        return out


class PointAttFusion(nn.Module):
    """Per-point attention-weighted fusion (backbone.py:416-450): branch
    projections scored by a softmax over branches per point. Selectable via
    ``fusion_mode='point_att'``."""

    out_channel: int
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_list: Sequence[jax.Array], train: bool):
        feats = [PointNet(self.out_channel, pre_bn=False, dtype=self.dtype,
                          name=f"feat_model{i}")(x, train)
                 for i, x in enumerate(x_list)]
        stacked = jnp.stack(feats, axis=-2)  # (..., N, S, C)
        stacked = nn.Dropout(self.dropout_rate,
                             deterministic=not train)(stacked)
        S = len(x_list)
        flat = stacked.reshape(*stacked.shape[:-2], S * self.out_channel)
        att = nn.Dense(self.out_channel, use_bias=False,
                       dtype=self.dtype)(flat)
        att = nn.relu(BN(self.dtype)(att, train))
        att = nn.Dense(S, use_bias=True, dtype=self.dtype)(att)
        att = jax.nn.softmax(att, axis=-1)[..., None]  # (..., N, S, 1)
        return (stacked * att).sum(axis=-2)


def make_fusion(mode: str, out_channel: int, dropout_rate: float,
                dtype: Dtype, name: str, fold: int = 1):
    """Fusion-mode registry replacing the reference's
    ``eval('backbone.{}'.format(fusion_mode))`` (models/StreamMOS.py:82)."""
    if mode in ("cat", "CatFusion"):
        return CatFusion(out_channel, dropout_rate, dtype=dtype, name=name,
                         fold=fold)
    if fold > 1:
        raise NotImplementedError(
            f"fusion_mode {mode!r} has no folded-TTA lane path; run eval "
            "with tta_fold=False (the shipped configs use CatFusion)")
    if mode in ("point_att", "PointAttFusion"):
        return PointAttFusion(out_channel, dropout_rate, dtype=dtype,
                              name=name)
    if mode in ("branch_att", "BranchAttFusion"):
        return BranchAttFusion(out_channel, dtype=dtype, name=name)
    raise KeyError(f"unknown fusion_mode {mode!r}")


class PredBranch(nn.Module):
    """Dropout + 1x1 classifier head (backbone.py:188-196)."""

    cout: int
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32
    fold: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        if self.fold > 1:
            assert not train, "folded PredBranch is an eval-only layout"
            return FoldedDense(self.cout, x.shape[-1] // self.fold,
                               self.fold, use_bias=True, dtype=self.dtype,
                               name="Dense_0")([x.astype(self.dtype)])
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(
            x.astype(self.dtype))
        return nn.Dense(self.cout, use_bias=True, dtype=self.dtype)(x)


class BilinearSampleModule(nn.Module):
    """Parameter-free grid->point sampler (backbone.py:453-475)."""

    scale_rate: Tuple[float, float]

    def __call__(self, grid, coords):
        return grid_to_point(grid, coords, self.scale_rate)
