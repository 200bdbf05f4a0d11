from streammos_tpu.ops.voxel_pool import voxel_max_pool, voxel_max_pool_ref
from streammos_tpu.ops.sample import grid_to_point, grid_to_point_ref
from streammos_tpu.ops.resize import resize_bilinear_align_corners
from streammos_tpu.ops.deform_attn import deform_attn_sample, deform_attn_sample_ref
from streammos_tpu.ops.tta_fold import (grid_to_point_tta, orient_grid,
                                        voxel_max_pool_tta)

__all__ = [
    "grid_to_point_tta",
    "orient_grid",
    "voxel_max_pool_tta",
    "voxel_max_pool",
    "voxel_max_pool_ref",
    "grid_to_point",
    "grid_to_point_ref",
    "resize_bilinear_align_corners",
    "deform_attn_sample",
    "deform_attn_sample_ref",
]
