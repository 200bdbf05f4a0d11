"""Segmentation metrics with on-device accumulators.

`MultiClassMetric` parity (`/root/reference/utils/metric.py:7-58`): per-class
TP / predicted / ground-truth counters over points with gt != 0, reduced to
IoU / precision / recall and mean IoU; ``moving_iou`` is the headline number.

The update is a pure function over an accumulator pytree so it can live
inside the jitted eval step (counters stay on device; a single `psum`-style
reduction — or host sum across processes — happens once at epoch end).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def init_state(num_classes: int) -> Dict[str, jax.Array]:
    """num_classes counts the *foreground* categories (reference passes
    ['static', 'moving'])."""
    z = jnp.zeros((num_classes,), dtype=jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    return {"tp": z, "pred_num": z, "gt_num": z}


def update(state: Dict[str, jax.Array], gt: jax.Array, pred_scores: jax.Array,
           valid: jax.Array | None = None) -> Dict[str, jax.Array]:
    """gt (M,) int labels in {0..K}; pred_scores (M, K+1) class scores.

    Points with gt == 0 are excluded (metric.py:24,30-31). `valid` optionally
    masks out padding points so the update works on static-shape batches.
    """
    K = state["tp"].shape[0]
    pred = jnp.argmax(pred_scores, axis=-1)
    mask = gt != 0
    if valid is not None:
        mask = mask & valid
    tps, preds, gts = [], [], []
    for i in range(K):
        cls = i + 1
        p = (pred == cls) & mask
        g = (gt == cls) & mask
        tps.append((p & g).sum())
        preds.append(p.sum())
        gts.append(g.sum())
    dt = state["tp"].dtype
    return {
        "tp": state["tp"] + jnp.stack(tps).astype(dt),
        "pred_num": state["pred_num"] + jnp.stack(preds).astype(dt),
        "gt_num": state["gt_num"] + jnp.stack(gts).astype(dt),
    }


def compute(state: Dict[str, jax.Array],
            categories: Sequence[str]) -> Dict[str, float]:
    tp = np.asarray(state["tp"], dtype=np.float64)
    pred_num = np.asarray(state["pred_num"], dtype=np.float64)
    gt_num = np.asarray(state["gt_num"], dtype=np.float64)
    iou = tp / (gt_num + pred_num - tp + 1e-12)
    pre = tp / (pred_num + 1e-12)
    rec = tp / (gt_num + 1e-12)
    out: Dict[str, float] = {}
    for i, cate in enumerate(categories):
        out[f"{cate}_iou"] = float(iou[i])
        out[f"{cate}_pre"] = float(pre[i])
        out[f"{cate}_rec"] = float(rec[i])
    out["mean_iou"] = float(iou.mean())
    return out


class MultiClassMetric:
    """Stateful convenience wrapper with the reference's interface."""

    def __init__(self, categories: Sequence[str]):
        self.categories = list(categories)
        self.reset()

    def reset(self):
        self.state = init_state(len(self.categories))

    def add_batch(self, gt, pred_scores, valid=None):
        self.state = update(self.state, jnp.asarray(gt), jnp.asarray(pred_scores),
                            None if valid is None else jnp.asarray(valid))

    def get_metric(self) -> Dict[str, float]:
        out = compute(self.state, self.categories)
        self.reset()
        return out
