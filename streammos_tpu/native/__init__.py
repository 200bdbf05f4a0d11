from streammos_tpu.native.api import (available, load_scan, load_labels,
                                      transform, filter_points,
                                      resample_indices, assemble_eval_frame)

__all__ = [
    "available",
    "load_scan",
    "load_labels",
    "transform",
    "filter_points",
    "resample_indices",
    "assemble_eval_frame",
]
