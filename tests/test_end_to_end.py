"""End-to-end CLI smoke tests on a synthetic SemanticKITTI tree: train a few
steps (loss finite, checkpoint written), stream-evaluate (label files +
metrics), refine with voxel voting. Exercises the real entry points the way a
user runs them (SURVEY.md §4: the reference's only integration check is the
eval loop — we keep that plus actual train/ckpt/resume coverage)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.synthetic_kitti import make_sequence

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "sequences"
    data.mkdir()
    make_sequence(str(data), "00", n_frames=8, n_points=2600)
    make_sequence(str(data), "08", n_frames=8, n_points=2600)
    return root


def _run(cmd, cwd):
    env = dict(os.environ, STREAMMOS_BACKEND="cpu")
    res = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                         text=True, timeout=1500)
    if res.returncode != 0:
        raise AssertionError(
            f"cmd failed: {' '.join(cmd)}\nstdout:{res.stdout[-3000:]}\n"
            f"stderr:{res.stderr[-3000:]}")
    return res


@pytest.mark.slow
def test_train_then_eval_then_vote(workdir):
    data = str(workdir / "sequences")

    # --- train 1 epoch of stage 1 on the tiny config, with in-train
    # validation after the epoch (train_StreamMOS.py:199-200 parity)
    _run([sys.executable, os.path.join(REPO, "tools", "train.py"),
          "--config", "StreamMOS_tiny", "--tag", "e2e", "--data", data,
          "--epochs", "1", "--points", "4096", "--start-val-epoch", "0"],
         cwd=str(workdir))
    exp = workdir / "experiments" / "StreamMOS_tiny" / "e2e"
    ckpt_dir = exp / "checkpoint"
    assert (ckpt_dir / "0000").exists()
    scalars = exp / "scalars.jsonl"
    losses = [json.loads(l)["value"]
              for l in scalars.read_text().strip().splitlines()
              if json.loads(l)["tag"] == "loss"]
    assert losses and all(np.isfinite(losses))
    # in-train validation produced a metric line + val scalars
    assert "moving_iou" in (exp / "record_0.txt").read_text()
    assert any(json.loads(l)["tag"].startswith("val/")
               for l in scalars.read_text().strip().splitlines())
    # the auto-generated drop-list artifact exists and has the right format
    drop = (exp / "train_split_dynamic_pointnumber.txt").read_text().split()
    assert len(drop) % 3 == 0 and len(drop) > 0

    # --- streaming eval writes .label files + record
    _run([sys.executable, os.path.join(REPO, "tools", "val.py"),
          "--config", "StreamMOS_tiny", "--tag", "e2e", "--data", data,
          "--points", "4096"], cwd=str(workdir))
    pred_dir = (workdir / "experiments" / "StreamMOS_tiny" / "e2e" /
                "val_results" / "sequences" / "08" / "predictions")
    preds = sorted(os.listdir(pred_dir))
    assert len(preds) == 8
    lab = np.fromfile(pred_dir / preds[0], dtype=np.uint32)
    assert set(np.unique(lab)).issubset({0, 9, 251})
    record = (workdir / "experiments" / "StreamMOS_tiny" / "e2e" /
              "record_0.txt").read_text()
    assert "moving_iou" in record

    # --- voxel voting refinement over the saved predictions
    _run([sys.executable, os.path.join(REPO, "tools", "voting.py"),
          "--config", "StreamMOS_tiny", "--tag", "e2e", "--data", data,
          "--workers", "2"], cwd=str(workdir))
    refined = (workdir / "experiments" / "StreamMOS_tiny" / "e2e" /
               "refine_val_results" / "sequences" / "08" / "predictions")
    assert len(os.listdir(refined)) == 8
