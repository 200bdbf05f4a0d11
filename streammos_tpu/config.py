"""Declarative configuration for StreamMOS-TPU.

Mirrors the reference's nested-class config surface
(`/root/reference/config/StreamMOS.py:1-97`,
`/root/reference/config/StreamMOS_seg.py`) as frozen dataclasses, resolved
through a registry instead of `importlib`/`eval`
(`/root/reference/train_StreamMOS.py:142,163,211` uses `eval` — we do not).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class VoxelConfig:
    """Voxel geometry (reference `config/StreamMOS.py:13-20`)."""

    rv_theta: Tuple[float, float] = (-25.0, 3.0)
    range_x: Tuple[float, float] = (-50.0, 50.0)
    range_y: Tuple[float, float] = (-50.0, 50.0)
    range_z: Tuple[float, float] = (-4.0, 2.0)
    bev_shape: Tuple[int, int, int] = (512, 512, 30)
    rv_shape: Tuple[int, int] = (64, 2048)

    @property
    def bev_wl(self) -> Tuple[int, int]:
        return self.bev_shape[:2]


@dataclasses.dataclass(frozen=True)
class AugConfig:
    """Shared-draw augmentation ranges (reference `config/StreamMOS.py:35-40`)."""

    noise_mean: float = 0.0
    noise_std: float = 0.0001
    theta_range: Tuple[float, float] = (-180.0, 180.0)
    shift_range: Tuple[Tuple[float, float], ...] = ((-3, 3), (-3, 3), (-0.4, 0.4))
    size_range: Tuple[float, float] = (0.95, 1.05)


@dataclasses.dataclass(frozen=True)
class CopyPasteConfig:
    is_use: bool = True
    obj_bank_dir: str = "object_bank_semkitti"
    paste_max_obj_num: int = 20


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    seq_dir: str = "SemanticKITTI/dataset/sequences"
    frame_point_num: int = 130000
    seq_num: int = 3  # K + 1 consecutive aligned frames fed to the network
    voxel: VoxelConfig = VoxelConfig()
    aug: AugConfig = AugConfig()
    copy_paste: CopyPasteConfig = CopyPasteConfig()
    drop_few_static_frames: bool = True
    num_workers: int = 4
    # stage-2 datasets also produce movable-object ("bf") targets
    with_bf_labels: bool = False


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Network hyper-parameters (reference `config/StreamMOS.py:60-78` and the
    constants hard-coded in `networks/multi_view_encoder.py:326-341`)."""

    name: str = "stream_mos"  # registry key: stream_mos | stream_mos_seg
    class_num: int = 3  # {unlabeled, static, moving}
    seq_num: int = 3
    point_feat_out_channels: int = 64
    fusion_mode: str = "cat"  # CatFusion is the shipped fusion
    # encoder
    context_layers: Tuple[int, int, int, int] = (64, 32, 64, 128)
    layers: Tuple[int, int, int] = (2, 3, 4)
    grid2point_scale: Tuple[float, float] = (0.5, 0.5)
    # deformable temporal fusion (multi_view_encoder.py:326-341)
    query_hw: Tuple[int, int] = (64, 64)
    d_model: int = 128
    ffn_dim: int = 512
    n_heads: int = 4
    n_points: int = 4
    n_attn_layers: int = 2
    attn_dropout: float = 0.0
    dropout_rate: float = 0.2  # CatFusion / PredBranch dropout
    loss_mode: str = "ohem"  # ce | wce | ohem
    voxel: VoxelConfig = VoxelConfig()
    # numeric policy: compute dtype for conv/matmul heavy stages
    # (production runs bfloat16; parameters and BN/LN statistics stay fp32)
    compute_dtype: str = "bfloat16"
    # eval-only fused Pallas TTA header (ops/fused_header.py): the scatter
    # emits the phase-split layout and one kernel per TTA variant runs the
    # whole header DownSample2D without materializing the 512^2 grid
    fused_header: bool = True


@dataclasses.dataclass(frozen=True)
class OptimizeConfig:
    """Optimizer/schedule (reference `config/StreamMOS.py:80-95`)."""

    optimizer: str = "sgd"
    base_lr: float = 0.02
    momentum: float = 0.9
    nesterov: bool = True
    weight_decay: float = 1e-3
    schedule: str = "step"
    begin_epoch: int = 0
    end_epoch: int = 48
    pct_start: float = 0.01
    final_lr: float = 1e-6
    step_epochs: int = 10
    decay_factor: float = 0.1


@dataclasses.dataclass(frozen=True)
class Config:
    name: str = "StreamMOS"
    batch_size_per_device: int = 3
    log_frequency: int = 100
    category_list: Tuple[str, ...] = ("static", "moving")
    train: DatasetConfig = DatasetConfig()
    val: DatasetConfig = DatasetConfig(frame_point_num=160000,
                                       copy_paste=CopyPasteConfig(is_use=False))
    test: DatasetConfig = DatasetConfig(frame_point_num=160000,
                                        copy_paste=CopyPasteConfig(is_use=False))
    model: ModelConfig = ModelConfig()
    optimize: OptimizeConfig = OptimizeConfig()
    learning_map_inv: Tuple[Tuple[int, int], ...] = ((0, 0), (1, 9), (2, 251))
    # stage-2: freeze everything except the refine branch
    freeze_except: Optional[str] = None
    pretrain_epoch: int = 40
    seed: int = 50051


_REGISTRY: Dict[str, Callable[[], Config]] = {}


def register(name: str):
    def deco(fn: Callable[[], Config]):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_config(name: str, **overrides) -> Config:
    if name not in _REGISTRY:
        raise KeyError(f"unknown config '{name}'; known: {sorted(_REGISTRY)}")
    cfg = _REGISTRY[name]()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


def list_configs() -> Sequence[str]:
    return sorted(_REGISTRY)


@register("StreamMOS")
def _stream_mos() -> Config:
    """Stage-1 MOS training config (parity with `config/StreamMOS.py`)."""
    return Config()


@register("StreamMOS_seg")
def _stream_mos_seg() -> Config:
    """Stage-2 movable-segmentation config (parity with
    `config/StreamMOS_seg.py`: bs 4, `_seg` data source with bf labels, no
    frame dropping, 10 epochs, lr step every 2)."""
    base = Config()
    return dataclasses.replace(
        base,
        name="StreamMOS_seg",
        batch_size_per_device=4,
        train=dataclasses.replace(base.train, with_bf_labels=True,
                                  drop_few_static_frames=False),
        val=dataclasses.replace(base.val, with_bf_labels=True),
        model=dataclasses.replace(base.model, name="stream_mos_seg"),
        optimize=dataclasses.replace(base.optimize, end_epoch=10, step_epochs=2),
        freeze_except="refine",
    )


# Small configs used by tests / smoke runs: tiny grids so CPU tests are fast.
@register("StreamMOS_tiny")
def _stream_mos_tiny() -> Config:
    voxel = VoxelConfig(bev_shape=(64, 64, 30), rv_shape=(16, 256))
    # float32 compute: the tiny config runs on the CPU backend in tests
    model = ModelConfig(voxel=voxel, query_hw=(8, 8), compute_dtype="float32")
    base = Config()
    return dataclasses.replace(
        base,
        name="StreamMOS_tiny",
        batch_size_per_device=1,
        model=model,
        train=dataclasses.replace(base.train, frame_point_num=1024, voxel=voxel,
                                  copy_paste=CopyPasteConfig(is_use=False)),
        val=dataclasses.replace(base.val, frame_point_num=1024, voxel=voxel),
        test=dataclasses.replace(base.test, frame_point_num=1024, voxel=voxel),
    )
