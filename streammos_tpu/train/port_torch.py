"""Port reference (PyTorch) StreamMOS checkpoints into StreamMOS-TPU params.

The reference trains `models/StreamMOS.AttNet` / `models/StreamMOS_seg.AttNet`
(`/root/reference/models/StreamMOS.py:22`, `StreamMOS_seg.py:32`) and saves
plain `state_dict()` files per epoch (`train_StreamMOS.py:196-197`). This
module maps that state_dict — as a flat ``{name: numpy array}`` dict — onto
the flax parameter/batch-stats tree of `StreamMOSNet`, converting layouts:

  torch Conv2d  (O, I, kh, kw)  ->  flax nn.Conv kernel (kh, kw, I, O)
  torch 1x1 Conv2d over points  ->  flax Dense kernel (I, O)
  torch Linear  (O, I)          ->  flax Dense kernel (I, O)
  torch BN weight/bias/running_{mean,var} -> scale/bias + batch_stats

Dead reference parameters are skipped: `up1`/`up2` AttMerge decoders
(constructed, never called — `multi_view_encoder.py:362-365`), each
`DeformAttnLayer.self_attn`/`normx` (`multi_view_encoder.py:288-302`, unused
in forward `:313-321`), and the `header_unbalance_conv`/`res1_unbalance_conv`
aliases (the same module objects as `header_bev.1`/`res1_bev.1`, duplicated
in the state_dict because they are assigned twice).

This is the bridge that lets reference users bring their trained checkpoints
(including the published pretrained model, README.md:120-123) to the TPU
engine, and the basis of the full-model numerical-parity test
(`tests/test_model_parity.py`).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import numpy as np

from streammos_tpu.config import ModelConfig

Array = np.ndarray
PathT = Tuple[str, ...]

# state_dict name patterns that carry no live compute (see module docstring)
DEAD_KEY_MARKERS = (
    ".up1.", ".up2.", ".self_attn.", ".normx.",
    "header_unbalance_conv.", "res1_unbalance_conv.",
    "num_batches_tracked",
)


def _conv(w: Array) -> Array:
    """torch Conv2d (O, I, kh, kw) -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dense_from_1x1(w: Array) -> Array:
    """torch 1x1 Conv2d (O, I, 1, 1) -> flax Dense (I, O)."""
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def _dense_from_linear(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def _identity(w: Array) -> Array:
    return np.ascontiguousarray(w)


class _Mapping:
    """Accumulates (flax path -> torch key + converter) rules for both the
    params and batch_stats collections."""

    def __init__(self) -> None:
        self.params: List[Tuple[PathT, str, Callable[[Array], Array]]] = []
        self.stats: List[Tuple[PathT, str, Callable[[Array], Array]]] = []

    def p(self, path: PathT, key: str, fn: Callable[[Array], Array]) -> None:
        self.params.append((path, key, fn))

    def bn(self, path: PathT, key: str) -> None:
        """`path` names the streammos BN wrapper; the inner flax BatchNorm is
        always its first (only) submodule."""
        inner = path + ("BatchNorm_0",)
        self.p(inner + ("scale",), key + ".weight", _identity)
        self.p(inner + ("bias",), key + ".bias", _identity)
        self.stats.append((inner + ("mean",), key + ".running_mean", _identity))
        self.stats.append((inner + ("var",), key + ".running_var", _identity))

    # ---- composite reference modules -------------------------------------
    def pointnet(self, fp: PathT, tp: str, pre_bn: bool) -> None:
        """backbone.PointNet (backbone.py:199-230): Sequential of
        [BN,] Conv1x1(no bias), BN [, ReLU]."""
        if pre_bn:
            self.bn(fp + ("BN_0",), tp + ".layer.0")
            self.p(fp + ("Dense_0", "kernel"), tp + ".layer.1.weight",
                   _dense_from_1x1)
            self.bn(fp + ("BN_1",), tp + ".layer.2")
        else:
            self.p(fp + ("Dense_0", "kernel"), tp + ".layer.0.weight",
                   _dense_from_1x1)
            self.bn(fp + ("BN_0",), tp + ".layer.1")

    def downsample(self, fp: PathT, tp: str) -> None:
        """backbone.DownSample2D (backbone.py:14-34)."""
        self.p(fp + ("conv3_kernel",), tp + ".conv_branch.0.weight", _conv)
        self.bn(fp + ("BN_0",), tp + ".conv_branch.1")
        self.p(fp + ("conv1_kernel",), tp + ".pool_branch.0.weight", _conv)
        self.bn(fp + ("BN_1",), tp + ".pool_branch.1")

    def channel_att(self, fp: PathT, tp: str) -> None:
        """backbone.ChannelAtt (backbone.py:87-102): cnet = [pool, conv1x1,
        relu, conv1x1, sigmoid] — 1x1 convs stay nn.Conv in flax (4D)."""
        self.p(fp + ("Conv_0", "kernel"), tp + ".cnet.1.weight", _conv)
        self.p(fp + ("Conv_0", "bias"), tp + ".cnet.1.bias", _identity)
        self.p(fp + ("Conv_1", "kernel"), tp + ".cnet.3.weight", _conv)
        self.p(fp + ("Conv_1", "bias"), tp + ".cnet.3.bias", _identity)

    def basic_block(self, fp: PathT, tp: str, att: bool) -> None:
        """backbone.BasicBlock (backbone.py:136-159): layer = [conv, BN,
        relu, conv, BN] + optional channel_att."""
        self.p(fp + ("Conv_0", "kernel"), tp + ".layer.0.weight", _conv)
        self.bn(fp + ("BN_0",), tp + ".layer.1")
        self.p(fp + ("Conv_1", "kernel"), tp + ".layer.3.weight", _conv)
        self.bn(fp + ("BN_1",), tp + ".layer.4")
        if att:
            self.channel_att(fp + ("ChannelAtt_0",), tp + ".channel_att")

    def unbalance(self, fp: PathT, tp: str) -> None:
        """Unbalance_BasicBlock (multi_view_encoder.py:478-497)."""
        self.p(fp + ("Conv_0", "kernel"), tp + ".layer7x3.0.weight", _conv)
        self.bn(fp + ("BN_0",), tp + ".layer7x3.1")
        self.p(fp + ("Conv_1", "kernel"), tp + ".layer3x7.0.weight", _conv)
        self.bn(fp + ("BN_1",), tp + ".layer3x7.1")
        self.p(fp + ("Conv_2", "kernel"), tp + ".layer3x3.0.weight", _conv)
        self.bn(fp + ("BN_2",), tp + ".layer3x3.1")

    def conv_stage(self, fp: PathT, tp: str, num_blocks: int,
                   unbalance: bool) -> None:
        """CENet_Transformer._make_layer (multi_view_encoder.py:380-388):
        [DownSample2D, num_blocks x block(no att), block(att)], with block[0]
        swapped for the asymmetric block when `unbalance`."""
        self.downsample(fp + ("DownSample2D_0",), tp + ".0")
        bb = 0
        for i in range(num_blocks):
            if i == 0 and unbalance:
                self.unbalance(fp + ("UnbalanceBasicBlock_0",), tp + f".{1 + i}")
            else:
                self.basic_block(fp + (f"BasicBlock_{bb}",), tp + f".{1 + i}",
                                 att=False)
                bb += 1
        self.basic_block(fp + (f"BasicBlock_{bb}",), tp + f".{1 + num_blocks}",
                         att=True)

    def cat_fusion(self, fp: PathT, tp: str) -> None:
        """backbone.CatFusion (backbone.py:387-413)."""
        self.p(fp + ("Dense_0", "kernel"), tp + ".merge_layer.0.weight",
               _dense_from_1x1)
        self.bn(fp + ("BN_0",), tp + ".merge_layer.1")
        self.p(fp + ("Dense_1", "kernel"), tp + ".merge_layer.3.weight",
               _dense_from_1x1)
        self.bn(fp + ("BN_1",), tp + ".merge_layer.4")

    def pred_branch(self, fp: PathT, tp: str) -> None:
        """backbone.PredBranch (backbone.py:188-196)."""
        self.p(fp + ("Dense_0", "kernel"), tp + ".pred_layer.0.weight",
               _dense_from_1x1)
        self.p(fp + ("Dense_0", "bias"), tp + ".pred_layer.0.bias", _identity)

    def ms_deform_attn(self, fp: PathT, tp: str) -> None:
        """deformattn MSDeformAttn linears (ms_deform_attn.py:55-58)."""
        for nm in ("value_proj", "sampling_offsets", "attention_weights",
                   "output_proj"):
            self.p(fp + (nm, "kernel"), f"{tp}.{nm}.weight",
                   _dense_from_linear)
            self.p(fp + (nm, "bias"), f"{tp}.{nm}.bias", _identity)

    def deform_layer(self, fp: PathT, tp: str) -> None:
        """DeformAttnLayer (multi_view_encoder.py:285-321): cross_attn +
        norm1 + FFN(linear1, linear2) + norm2 (self_attn/normx dead)."""
        self.ms_deform_attn(fp + ("cross_attn",), tp + ".cross_attn")
        self.p(fp + ("LayerNorm_0", "scale"), tp + ".norm1.weight", _identity)
        self.p(fp + ("LayerNorm_0", "bias"), tp + ".norm1.bias", _identity)
        self.p(fp + ("Dense_0", "kernel"), tp + ".linear1.weight",
               _dense_from_linear)
        self.p(fp + ("Dense_0", "bias"), tp + ".linear1.bias", _identity)
        self.p(fp + ("Dense_1", "kernel"), tp + ".linear2.weight",
               _dense_from_linear)
        self.p(fp + ("Dense_1", "bias"), tp + ".linear2.bias", _identity)
        self.p(fp + ("LayerNorm_1", "scale"), tp + ".norm2.weight", _identity)
        self.p(fp + ("LayerNorm_1", "bias"), tp + ".norm2.bias", _identity)

    def basic_conv2d(self, fp: PathT, tp: str) -> None:
        """multi_view_encoder.BasicConv2d (multi_view_encoder.py:460-476)."""
        self.p(fp + ("Conv_0", "kernel"), tp + ".conv.weight", _conv)
        self.bn(fp + ("BN_0",), tp + ".bn")


def build_mapping(cfg: ModelConfig, with_refine: bool = False) -> _Mapping:
    """The complete AttNet -> StreamMOSNet rule set.

    Layer counts follow `CENet_Transformer.__init__`
    (multi_view_encoder.py:344-356) with `layers = cfg.layers`.
    """
    n1, n2, n3 = cfg.layers
    m = _Mapping()

    # point encoder: PointNetStacker(7 -> c0, pre_bn=True, stack_num=2)
    m.pointnet(("point_pre", "PointNet_0"), "point_pre.layer.0", pre_bn=True)
    m.pointnet(("point_pre", "PointNet_1"), "point_pre.layer.1", pre_bn=False)

    # multi-view encoder stages
    m.conv_stage(("bev_net", "header_bev"), "bev_net.header_bev", n1, True)
    m.conv_stage(("bev_net", "header_rv"), "bev_net.header_rv", n1 - 1, False)
    m.conv_stage(("bev_net", "res1_bev"), "bev_net.res1_bev", n2, True)
    m.conv_stage(("bev_net", "res1_rv"), "bev_net.res1_rv", n2 - 1, False)
    m.conv_stage(("bev_net", "res2"), "bev_net.res2", n3, False)

    # temporal fusion
    m.p(("bev_net", "query_embed"), "bev_net.query_embed.weight", _identity)
    for i in range(cfg.n_attn_layers):
        m.deform_layer(("bev_net", "deformattn", f"layer{i}"),
                       f"bev_net.deformattn_module.deformattn_layers.{i}")

    # decoder + aux heads
    m.basic_conv2d(("bev_net", "conv_1"), "bev_net.conv_1")
    m.basic_conv2d(("bev_net", "conv_2"), "bev_net.conv_2")
    for i in (1, 2, 3):
        m.p(("bev_net", f"aux_head{i}", "kernel"),
            f"bev_net.aux_head{i}.weight", _conv)
        m.p(("bev_net", f"aux_head{i}", "bias"),
            f"bev_net.aux_head{i}.bias", _identity)

    # point-level fusion + head
    m.cat_fusion(("point_post",), "point_post")
    m.pred_branch(("pred_layer",), "pred_layer")

    if with_refine:
        m.cat_fusion(("refine", "bf_point_post"), "refine.bf_point_post")
        m.pred_branch(("refine", "bf_pred_layer"), "refine.bf_pred_layer")
    return m


def _set(tree: Dict[str, Any], path: PathT, value: Array) -> None:
    node = tree
    for name in path[:-1]:
        node = node.setdefault(name, {})
    if path[-1] in node:
        raise ValueError(f"duplicate flax path {'/'.join(path)}")
    node[path[-1]] = value


def torch_state_dict_to_flax(state_dict: Dict[str, Array], cfg: ModelConfig,
                             with_refine: bool = False,
                             dtype: Any = np.float32,
                             strict: bool = True) -> Dict[str, Any]:
    """Convert a reference `AttNet.state_dict()` (values already numpy) into
    ``{"params": ..., "batch_stats": ...}`` for `StreamMOSNet`.

    With ``strict`` every live torch key must be consumed and every rule must
    find its key; dead keys (DEAD_KEY_MARKERS) are always ignored.
    """
    mapping = build_mapping(cfg, with_refine)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    consumed = set()
    missing = []
    for tree, rules in ((params, mapping.params), (stats, mapping.stats)):
        for path, key, fn in rules:
            if key not in state_dict:
                missing.append(key)
                continue
            _set(tree, path, fn(np.asarray(state_dict[key])).astype(dtype))
            consumed.add(key)
    if strict:
        if missing:
            raise KeyError(f"torch state_dict missing {len(missing)} keys, "
                           f"e.g. {missing[:5]}")
        leftover = [k for k in state_dict
                    if k not in consumed
                    and not any(mk in k for mk in DEAD_KEY_MARKERS)
                    and not (with_refine is False and k.startswith("refine."))]
        if leftover:
            raise KeyError(f"unconsumed live torch keys ({len(leftover)}): "
                           f"{leftover[:8]}")
    return {"params": params, "batch_stats": stats}


_INVERSE: Dict[Any, Callable[[Array], Array]] = {
    _conv: lambda w: np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1))),
    _dense_from_1x1: lambda w: np.ascontiguousarray(w.T)[:, :, None, None],
    _dense_from_linear: lambda w: np.ascontiguousarray(w.T),
    _identity: np.ascontiguousarray,
}


def _get(tree: Dict[str, Any], path: PathT) -> Array:
    node: Any = tree
    for name in path:
        node = node[name]
    return node


def flax_to_torch_state_dict(variables: Dict[str, Any], cfg: ModelConfig,
                             with_refine: bool = False,
                             dtype: Any = np.float32) -> Dict[str, Array]:
    """Inverse port: a `StreamMOSNet` variables tree -> a reference
    `AttNet.state_dict()`-shaped dict of numpy arrays (every live key the
    forward port consumes; `num_batches_tracked` and dead modules are absent,
    so load with ``strict=False``). Used to transplant OUR trained weights
    into the torch reference for behavioral checks (e.g. the trained-weight
    long-horizon drift harness, tests/test_long_horizon_parity.py)."""
    mapping = build_mapping(cfg, with_refine)
    out: Dict[str, Array] = {}
    for tree_name, rules in (("params", mapping.params),
                             ("batch_stats", mapping.stats)):
        tree = variables[tree_name]
        for path, key, fn in rules:
            val = np.asarray(_get(tree, path), dtype=np.float32)
            out[key] = _INVERSE[fn](val).astype(dtype)
    return out


def check_against_template(ported: Dict[str, Any], template: Dict[str, Any],
                           prefix: str = "") -> List[str]:
    """Compare the ported tree's structure/shapes against a flax-initialized
    variables tree; returns a list of human-readable mismatches (empty = ok)."""
    problems: List[str] = []

    def walk(p: Any, t: Any, path: str) -> None:
        if isinstance(t, dict):
            if not isinstance(p, dict):
                problems.append(f"{path}: expected subtree, got leaf")
                return
            for k in t:
                if k not in p:
                    problems.append(f"{path}/{k}: missing in ported tree")
                else:
                    walk(p[k], t[k], f"{path}/{k}")
            for k in p:
                if k not in t:
                    problems.append(f"{path}/{k}: not in flax template")
        else:
            t_sh = getattr(t, "shape", None)
            p_sh = getattr(p, "shape", None)
            ts = tuple(t_sh) if t_sh is not None else tuple(np.shape(t))
            ps = tuple(p_sh) if p_sh is not None else tuple(np.shape(p))
            if ts != ps:
                problems.append(f"{path}: shape {ps} != template {ts}")

    walk(ported, template, prefix)
    return problems
