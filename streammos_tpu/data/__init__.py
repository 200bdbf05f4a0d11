from streammos_tpu.data.semantic_kitti import (LEARNING_MAP, BF_LEARNING_MAP,
                                               LEARNING_MAP_INV, SPLITS,
                                               label_lut, relabel)

__all__ = [
    "LEARNING_MAP",
    "BF_LEARNING_MAP",
    "LEARNING_MAP_INV",
    "SPLITS",
    "label_lut",
    "relabel",
]
