"""Import the reference PyTorch StreamMOS (`/root/reference/`) on CPU for
numerical-parity testing.

The reference depends on two compiled CUDA extensions; both are replaced
with pure-torch equivalents BEFORE importing the reference packages:

* ``deep_point`` (scatter max-pool, `deep_point/src/point_deep_cuda_kernel.cu`)
  -> `voxel_max_pool_torch` below: the same index math (float multiply by
  scale_rate, C-style truncation toward zero, per-dim bounds check) with
  `scatter_reduce(amax, include_self=False)` over a zero-initialized grid —
  exactly the CUDA kernel's init-then-atomicMax contract.
* ``MultiScaleDeformableAttention`` (`deformattn/src/`) -> the reference's own
  pure-PyTorch check implementation `ms_deform_attn_core_pytorch`
  (`deformattn/functions/ms_deform_attn_func.py:41-61`), which the reference's
  own `deformattn/test.py` treats as ground truth.

Nothing from the reference is copied into the repo; its modules are imported
read-only at test time to validate that our independently-built network
computes the same function.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import torch

REFERENCE_ROOT = "/root/reference"


def voxel_max_pool_torch(pcds_feat: torch.Tensor, pcds_ind: torch.Tensor,
                         output_size, scale_rate) -> torch.Tensor:
    """Pure-torch scatter max-pool matching the reference CUDA op.

    pcds_feat (BS, C, N, 1); pcds_ind (BS, N, D, 1); returns
    (BS, C, *output_size). Index per dim: int64(float(ind) * scale) —
    truncation toward zero (point_deep_cuda_kernel.cu:40); a point
    contributes only if ALL dims are in range; cells with no contributor
    stay 0 (the zeros allocation in deep_point/__init__.py:24-31)."""
    BS, C, N, _ = pcds_feat.shape
    D = pcds_ind.shape[2]
    assert len(output_size) == D
    ind = pcds_ind[..., 0].float()  # (BS, N, D)
    total = 1
    flat = torch.zeros(BS, N, dtype=torch.int64)
    valid = torch.ones(BS, N, dtype=torch.bool)
    for d in range(D):
        idx = (ind[..., d] * float(scale_rate[d])).to(torch.int64)
        ok = (idx >= 0) & (idx < int(output_size[d]))
        valid &= ok
        flat = flat * int(output_size[d]) + idx.clamp(0, int(output_size[d]) - 1)
        total *= int(output_size[d])
    flat = torch.where(valid, flat, torch.full_like(flat, total))
    out = torch.zeros(BS, C, total + 1, dtype=pcds_feat.dtype)
    gather_idx = flat[:, None, :].expand(BS, C, N)
    out.scatter_reduce_(2, gather_idx, pcds_feat[..., 0], reduce="amax",
                        include_self=False)
    return out[:, :, :total].reshape(BS, C, *[int(s) for s in output_size])


def _install_stubs() -> None:
    if "deep_point" not in sys.modules:
        dp = types.ModuleType("deep_point")
        dp.VoxelMaxPool = lambda pcds_feat, pcds_ind, output_size, scale_rate: \
            voxel_max_pool_torch(pcds_feat, pcds_ind, output_size, scale_rate)
        sys.modules["deep_point"] = dp
    if "MultiScaleDeformableAttention" not in sys.modules:
        msda = types.ModuleType("MultiScaleDeformableAttention")

        def ms_deform_attn_forward(value, shapes, level_start_index,
                                   sampling_loc, attn_weight, im2col_step):
            # lazy import: ms_deform_attn_func defines the check impl after
            # importing this very stub module
            from deformattn.functions.ms_deform_attn_func import (
                ms_deform_attn_core_pytorch)
            return ms_deform_attn_core_pytorch(value, shapes, sampling_loc,
                                               attn_weight)

        msda.ms_deform_attn_forward = ms_deform_attn_forward
        sys.modules["MultiScaleDeformableAttention"] = msda
    if "pytz" not in sys.modules:  # utils/logger.py wants pytz; not installed
        pytz = types.ModuleType("pytz")
        pytz.utc = None
        pytz.timezone = lambda name: None
        sys.modules["pytz"] = pytz


def load_reference():
    """Returns (StreamMOS module, StreamMOS_seg module, pModel config) from
    the read-only reference checkout, CUDA extensions stubbed."""
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from config.StreamMOS import get_config  # noqa: reference config
    from models import StreamMOS, StreamMOS_seg  # noqa: reference models
    _, _, pModel, _ = get_config()
    return StreamMOS, StreamMOS_seg, pModel


def perturb_state(model: torch.nn.Module, seed: int = 0) -> None:
    """Make every ported quantity non-trivial: noise all params (BN/LN
    scale/bias included) and randomize BN running statistics, so the parity
    test actually exercises the full port."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0.0, 0.05, generator=g)
            elif name.endswith("running_var"):
                buf.uniform_(0.8, 1.2, generator=g)


def numpy_state_dict(model: torch.nn.Module):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
