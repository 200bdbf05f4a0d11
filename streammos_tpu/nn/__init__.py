from streammos_tpu.nn.blocks import (
    BasicConv2d,
    BasicBlock,
    BilinearSampleModule,
    CatFusion,
    ChannelAtt,
    DownSample2D,
    PointNetStacker,
    PredBranch,
    UnbalanceBasicBlock,
)
from streammos_tpu.nn.deform import DeformAttnModule, MSDeformAttn
from streammos_tpu.nn.encoder import MultiViewEncoder

__all__ = [
    "BasicConv2d",
    "BasicBlock",
    "BilinearSampleModule",
    "CatFusion",
    "ChannelAtt",
    "DownSample2D",
    "PointNetStacker",
    "PredBranch",
    "UnbalanceBasicBlock",
    "MSDeformAttn",
    "DeformAttnModule",
    "MultiViewEncoder",
]
