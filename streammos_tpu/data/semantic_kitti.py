"""SemanticKITTI label taxonomy for moving-object segmentation.

Dataset metadata mirroring `/root/reference/datasets/semantic-kitti.yaml`:

* ``LEARNING_MAP``   — raw semantic label -> {0 unlabeled, 1 static, 2 moving}
  (yaml `learning_map`, lines 115-151): every `moving-*` class (251-259) is 2,
  every static thing/stuff class is 1, unlabeled/outlier is 0.
* ``BF_LEARNING_MAP`` — raw label -> {0 unlabeled, 1 background, 2 movable}
  (yaml `bf_learning_map`): *potentially movable* categories (vehicles,
  persons, cyclists — whether currently moving or not) are 2; ground /
  structure / vegetation are 1. Stage 2 trains on this.
* ``LEARNING_MAP_INV`` — {0:0, 1:9 static, 2:251 moving} for writing KITTI
  submission `.label` files (yaml lines 187-190).
* ``SPLITS`` — train {00-07, 09, 10}, valid {08}, test {11-21}.

Raw labels are 32-bit: low 16 bits semantic class, high 16 bits instance id.
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np

_MOVING = (251, 252, 253, 254, 255, 256, 257, 258, 259)
_STATIC = (9, 10, 11, 13, 15, 16, 18, 20, 30, 31, 32, 40, 44, 48, 49, 50, 51,
           52, 60, 70, 71, 72, 80, 81, 99)

LEARNING_MAP: Dict[int, int] = {0: 0, 1: 0}
LEARNING_MAP.update({k: 1 for k in _STATIC})
LEARNING_MAP.update({k: 2 for k in _MOVING})

_MOVABLE = (10, 11, 13, 15, 16, 18, 20, 30, 31, 32, 252, 253, 254, 255, 256,
            257, 258, 259)
_BACKGROUND = (40, 44, 48, 49, 50, 51, 52, 60, 70, 71, 72, 80, 81, 99)

BF_LEARNING_MAP: Dict[int, int] = {0: 0, 1: 0}
BF_LEARNING_MAP.update({k: 1 for k in _BACKGROUND})
BF_LEARNING_MAP.update({k: 2 for k in _MOVABLE})

LEARNING_MAP_INV: Dict[int, int] = {0: 0, 1: 9, 2: 251}

SPLITS: Dict[str, Sequence[int]] = {
    "train": (0, 1, 2, 3, 4, 5, 6, 7, 9, 10),
    "valid": (8,),
    "test": (11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21),
}

ROAD_LABEL = 40  # copy-paste augmentation ground support (data_StreamMOS.py:231)


def label_lut(mapping: Mapping[int, int], size: int = 260 + 100) -> np.ndarray:
    """Lookup table for vectorized relabeling (val_StreamMOS.py:31-54 uses the
    same +100 headroom hack for unknown labels)."""
    lut = np.zeros(size, dtype=np.int32)
    for k, v in mapping.items():
        lut[k] = v
    return lut


_LUT_CACHE: Dict[int, np.ndarray] = {}


def relabel(labels: np.ndarray, mapping: Mapping[int, int]) -> np.ndarray:
    key = id(mapping)
    lut = _LUT_CACHE.get(key)
    if lut is None:
        lut = label_lut(mapping)
        _LUT_CACHE[key] = lut
    return lut[labels]


def split_label(raw: np.ndarray):
    """32-bit KITTI label -> (semantic, instance)."""
    return (raw & 0xFFFF).astype(np.int32), (raw >> 16).astype(np.int32)
