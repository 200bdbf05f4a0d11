"""Long-term-memory refinement: voxel voting and instance voting.

Re-design of `/root/reference/voxel_voting.py` and
`/root/reference/voxel_instance_voting.py` (SURVEY.md §3.5):

* **voxel voting** — ego-align the last ``frames_num_max=8`` frames'
  *predictions* with the current frame, crop to the BEV field of view,
  quantize everything into a (512, 512, 30) grid, majority-vote per voxel
  (one-hot scatter-add + argmax, `voxel_voting.py:55-75`), and relabel the
  current frame's points from their voxel majorities (`:38-53`). The device
  path expresses the vote as a single `segment_sum` over linearized cells —
  one scatter-add and one gather, both HBM-bandwidth bound — with
  fixed-capacity padding so it jits once.
* **instance voting** — DBSCAN(eps=0.3, min_samples=5) over the points the
  stage-2 head called *movable* (`voxel_instance_voting.py:144-193`);
  clusters with > 30 points get an axis-aligned box (min/max corners, bottom
  lifted by 0.2 m, `:42-60,171-176`); all local-map points inside vote the
  whole cluster static vs dynamic. The reference counts votes via
  ``sum(pred[pred==c])`` which weights a dynamic vote 2x (it sums label
  *values*) — replicated here verbatim for parity, flagged by
  ``dynamic_vote_weight=2``.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

from streammos_tpu.config import VoxelConfig


def _quantize_int(points: np.ndarray, voxel: VoxelConfig) -> np.ndarray:
    """float xyz -> integer voxel coords (truncation like the reference's
    float->int64 casts)."""
    size = voxel.bev_shape
    dx = (voxel.range_x[1] - voxel.range_x[0]) / size[0]
    dy = (voxel.range_y[1] - voxel.range_y[0]) / size[1]
    dz = (voxel.range_z[1] - voxel.range_z[0]) / size[2]
    q = np.stack([(points[:, 0] - voxel.range_x[0]) / dx,
                  (points[:, 1] - voxel.range_y[0]) / dy,
                  (points[:, 2] - voxel.range_z[0]) / dz], axis=-1)
    return q.astype(np.int64)


def crop_mask(points: np.ndarray, voxel: VoxelConfig) -> np.ndarray:
    """FOV crop (utils/transforms.py Crop, voxel_voting.py:138-139,225-226)."""
    return ((points[:, 0] >= voxel.range_x[0]) & (points[:, 0] < voxel.range_x[1])
            & (points[:, 1] >= voxel.range_y[0]) & (points[:, 1] < voxel.range_y[1])
            & (points[:, 2] >= voxel.range_z[0]) & (points[:, 2] < voxel.range_z[1]))


def voxel_vote(local_points: np.ndarray, local_preds: np.ndarray,
               cur_points: np.ndarray, cur_preds: np.ndarray,
               voxel: VoxelConfig, num_classes: int = 3) -> np.ndarray:
    """NumPy voxel majority vote.

    ``local_points/preds``: all voting points *already cropped* to the FOV and
    ego-aligned with the current frame (history + current, like
    `voxel_voting.py:229-230`). ``cur_points/preds``: the cropped current
    frame. Returns refined current-frame predictions (argmax vote per voxel;
    ties resolve to the lowest class id, matching torch argmax).
    """
    size = voxel.bev_shape
    n_cells = size[0] * size[1] * size[2]
    coords = _quantize_int(local_points, voxel)
    lin = (coords[:, 0] * size[1] * size[2] + coords[:, 1] * size[2]
           + coords[:, 2])
    votes = np.zeros((n_cells, num_classes), np.int64)
    np.add.at(votes, (lin, local_preds.astype(np.int64)), 1)
    voxel_labels = votes.argmax(axis=-1)

    cur_coords = _quantize_int(cur_points, voxel)
    cur_lin = (cur_coords[:, 0] * size[1] * size[2]
               + cur_coords[:, 1] * size[2] + cur_coords[:, 2])
    ok = ((cur_coords >= 0).all(axis=1) & (cur_coords[:, 0] < size[0])
          & (cur_coords[:, 1] < size[1]) & (cur_coords[:, 2] < size[2]))
    out = cur_preds.copy()
    out[ok] = voxel_labels[cur_lin[ok]]
    return out


@functools.lru_cache(maxsize=4)
def _device_vote_fn(n_cells: int, num_classes: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn(lin, labels, valid, cur_lin, cur_valid, cur_preds):
        seg = jnp.where(valid, lin * num_classes + labels, n_cells * num_classes)
        votes = jax.ops.segment_sum(
            jnp.ones_like(seg, jnp.int32), seg,
            num_segments=n_cells * num_classes + 1)[:-1]
        voxel_labels = votes.reshape(n_cells, num_classes).argmax(axis=-1)
        picked = voxel_labels[jnp.clip(cur_lin, 0, n_cells - 1)]
        return jnp.where(cur_valid, picked, cur_preds)

    return fn


def voxel_vote_device(local_points: np.ndarray, local_preds: np.ndarray,
                      cur_points: np.ndarray, cur_preds: np.ndarray,
                      voxel: VoxelConfig, num_classes: int = 3,
                      capacity: int = 1 << 21) -> np.ndarray:
    """Device voxel vote: fixed-capacity padding so the scatter-add/argmax/
    gather pipeline compiles once and stays on-chip."""
    import jax.numpy as jnp

    size = voxel.bev_shape
    n_cells = size[0] * size[1] * size[2]
    P, K = local_points.shape[0], cur_points.shape[0]
    assert P <= capacity and K <= capacity, (P, K, capacity)

    coords = _quantize_int(local_points, voxel)
    lin = (coords[:, 0] * size[1] * size[2] + coords[:, 1] * size[2]
           + coords[:, 2])
    lin_pad = np.zeros(capacity, np.int32)
    lin_pad[:P] = lin
    lab_pad = np.zeros(capacity, np.int32)
    lab_pad[:P] = local_preds
    valid = np.zeros(capacity, bool)
    valid[:P] = True

    cur_coords = _quantize_int(cur_points, voxel)
    cur_lin = (cur_coords[:, 0] * size[1] * size[2]
               + cur_coords[:, 1] * size[2] + cur_coords[:, 2])
    ok = ((cur_coords >= 0).all(axis=1) & (cur_coords[:, 0] < size[0])
          & (cur_coords[:, 1] < size[1]) & (cur_coords[:, 2] < size[2]))
    cur_lin_pad = np.zeros(capacity, np.int32)
    cur_lin_pad[:K] = cur_lin
    cur_ok = np.zeros(capacity, bool)
    cur_ok[:K] = ok
    cur_pred_pad = np.zeros(capacity, np.int32)
    cur_pred_pad[:K] = cur_preds

    fn = _device_vote_fn(n_cells, num_classes)
    out = np.asarray(fn(jnp.asarray(lin_pad), jnp.asarray(lab_pad),
                        jnp.asarray(valid), jnp.asarray(cur_lin_pad),
                        jnp.asarray(cur_ok), jnp.asarray(cur_pred_pad)))
    return out[:K]


def _aabb_corners(points: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    lo = lo.copy()
    lo[2] += 0.2  # lift the box bottom off the ground (:171-176)
    return lo, hi


def instance_vote(cur_points: np.ndarray, cur_preds: np.ndarray,
                  cur_bf_preds: np.ndarray, local_points: np.ndarray,
                  local_preds: np.ndarray, eps: float = 0.3,
                  min_samples: int = 5, min_cluster: int = 30,
                  dynamic_vote_weight: int = 2) -> np.ndarray:
    """DBSCAN-cluster the stage-2 'movable' points; each big cluster is
    wholly relabeled by the local map's box vote
    (voxel_instance_voting.py:144-193)."""
    from sklearn.cluster import DBSCAN

    fg_idx = np.where(cur_bf_preds == 2)[0]
    out = cur_preds.copy()
    if len(fg_idx) == 0:
        return out
    fg_points = cur_points[fg_idx][:, :3]
    cluster_ids = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(fg_points)

    for cid in np.unique(cluster_ids):
        if cid == -1:
            continue
        member = cluster_ids == cid
        if member.sum() <= min_cluster:
            continue
        pts = fg_points[member]
        lo, hi = _aabb_corners(pts)
        inside = ((local_points[:, :3] >= lo) & (local_points[:, :3] <= hi)).all(axis=1)
        votes = local_preds[inside]
        n_static = (votes == 1).sum()
        n_dynamic = (votes == 2).sum() * dynamic_vote_weight
        label = 2 if n_dynamic > n_static else 1
        out[fg_idx[member]] = label
    return out


def gather_history(frame_id: int, num_frames: int, frames_num_max: int = 8
                   ) -> Sequence[int]:
    """History frame ids for voting (voxel_voting.py:176-213): the previous
    ``frames_num_max`` frames; for early frames, the first ``frames_num_max``
    frames excluding the current one."""
    if frame_id >= frames_num_max:
        return list(range(frame_id - 1, frame_id - frames_num_max - 1, -1))
    # clip to the actual sequence length (the reference assumes >8-frame
    # sequences; without the clip a short sequence indexes out of range)
    ids = list(range(min(frames_num_max, num_frames)))
    ids.remove(frame_id)
    return ids
