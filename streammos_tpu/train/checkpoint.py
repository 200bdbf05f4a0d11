"""Checkpoint save/restore (orbax), replacing the reference's per-epoch
`torch.save(state_dict)` (`/root/reference/train_StreamMOS.py:196-197`) and
its auto-resume (`:165-168`) / stage-2 strict=False grafting
(`train_StreamMOS_seg.py:165-167`).

Layout: ``<dir>/<epoch>/`` holds the full TrainState (params, batch_stats,
opt_state, step). Streaming memory is deliberately NOT checkpointed — it is
reset at the start of every eval stream, like the reference.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"{epoch:04d}")


def save(ckpt_dir: str, epoch: int, state: Any) -> str:
    path = _path(ckpt_dir, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def restore(ckpt_dir: str, epoch: int, template: Any) -> Any:
    path = _path(ckpt_dir, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = []
    for name in os.listdir(ckpt_dir):
        if name.isdigit() and os.path.isdir(os.path.join(ckpt_dir, name)):
            epochs.append(int(name))
    return max(epochs) if epochs else None


def graft_params(target_params: Any, source_params: Any) -> Any:
    """Load every matching leaf of ``source_params`` into ``target_params``
    (torch load_state_dict(strict=False) parity): leaves present only in the
    target (e.g. the stage-2 refine branch) keep their fresh init."""
    def merge(t, s):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                out[k] = merge(v, s[k]) if (isinstance(s, dict) and k in s) else v
            return out
        if s is not None and np.shape(t) == np.shape(s):
            return s
        return t

    return merge(target_params, source_params)
