"""Production-config dress rehearsal: the REAL two-stage + voting pipeline at
the REAL config, end-to-end on whatever backend is live (TPU by default) —
VERDICT r4 task 2.

Runs, in one working directory, exactly what a user runs
(`/root/reference/README.md:94-133` — the two training stages, streaming
eval, and voting as ONE flow), against a synthetic production-size
SemanticKITTI tree (125k-pt scans; the environment has no real dataset):

  1. tools/train.py  --config StreamMOS      (stage 1: 130k pts, copy-paste
     on, ~N optimizer steps, epoch-end checkpoint + in-train seq-08 val)
  2. tools/train.py  --config StreamMOS_seg  (stage 2: graft stage-1
     checkpoint, freeze all but refine)
  3. tools/val.py    --config StreamMOS_seg  (streaming eval, TTAx4,
     160k-pt padding, .label + bf label files)
  4. tools/voting.py --instance              (voxel + instance voting)
  5. metric recomputed over the refined labels

Prints one JSON line per phase (wall seconds + artifact paths) and a final
summary line. Default scale is ~20 stage-1 steps / 8 val frames, which is
enough to flush out any shape/VMEM/IO cliff in the assembled system without
claiming accuracy (the labels are synthetic).

Usage:
  python tools/dress_rehearsal.py [--root DIR] [--steps 20] [--frames 24]
      [--batch-size 1] [--keep]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def _make_bank(bank_dir, rng, n_objs=8):
    """Synthetic copy-paste object bank (tools/extract_objects.py layout)."""
    cate_dir = os.path.join(bank_dir, "car")
    os.makedirs(cate_dir, exist_ok=True)
    for k in range(n_objs):
        cx, cy = rng.uniform(6, 20), rng.uniform(-3, 3)
        pcds = np.stack([
            rng.uniform(cx - 1.2, cx + 1.2, 300),
            rng.uniform(cy - 0.9, cy + 0.9, 300),
            rng.uniform(-1.5, -0.4, 300),
            rng.uniform(0, 1, 300)], axis=-1).astype(np.float32)
        np.savez(os.path.join(cate_dir, f"00_{k:04d}.npz"), pcds=pcds,
                 cate="car", cate_id=10,
                 center=np.array([cx, cy, -1.0]),
                 size=np.array([2.5, 2.0, 1.2]), yaw=0.0)


def _run(tag, cmd, cwd, env_extra=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    t0 = time.time()
    res = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                         text=True)
    dt = time.time() - t0
    if res.returncode != 0:
        print(res.stdout[-4000:], file=sys.stderr)
        print(res.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"[{tag}] FAILED after {dt:.1f}s: {' '.join(cmd)}")
    print(json.dumps({"phase": tag, "wall_s": round(dt, 1)}), flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None,
                    help="working dir (default: a temp dir, removed unless "
                         "--keep)")
    ap.add_argument("--steps", type=int, default=20,
                    help="stage-1 optimizer steps")
    ap.add_argument("--steps2", type=int, default=8,
                    help="stage-2 optimizer steps")
    ap.add_argument("--frames", type=int, default=24,
                    help="train-sequence frames (>= steps + history margin)")
    ap.add_argument("--val-frames", type=int, default=8)
    ap.add_argument("--points-on-disk", type=int, default=125000,
                    help="synthetic scan size (real seq-08 frames hold "
                         "~120-125k in-range points)")
    ap.add_argument("--batch-size", type=int, default=1,
                    help="per-device train batch (1 = the production "
                         "deployment pick; 3 = the reference's bs3/GPU)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="smtpu_rehearsal_")
    os.makedirs(root, exist_ok=True)
    data = os.path.join(root, "sequences")
    bank = os.path.join(root, "object_bank")
    rng = np.random.default_rng(0)

    from bench_pipeline import make_big_sequence
    t0 = time.time()
    if not os.path.isdir(os.path.join(data, "00")):
        make_big_sequence(data, "00", n_frames=args.frames,
                          n_points=args.points_on_disk)
        make_big_sequence(data, "08", n_frames=args.val_frames,
                          n_points=args.points_on_disk, seed=1)
        _make_bank(bank, rng)
    print(json.dumps({"phase": "make_data", "wall_s": round(
        time.time() - t0, 1), "frames": args.frames + args.val_frames,
        "points": args.points_on_disk}), flush=True)

    py = sys.executable
    total0 = time.time()

    # the config's copy-paste bank dir is resolved relative to the parent of
    # --data (tools/train.py), so object_bank/ sits beside sequences/
    _run("stage1_train",
         [py, os.path.join(REPO, "tools", "train.py"),
          "--config", "StreamMOS", "--tag", "rehearsal", "--data", data,
          "--epochs", "1", "--max-steps", str(args.steps),
          "--batch-size", str(args.batch_size), "--start-val-epoch", "0"],
         cwd=root)
    ckpt1 = os.path.join(root, "experiments", "StreamMOS", "rehearsal",
                         "checkpoint")
    assert os.path.isdir(os.path.join(ckpt1, "0000")), "stage-1 ckpt missing"
    rec1 = os.path.join(root, "experiments", "StreamMOS", "rehearsal",
                        "record_0.txt")
    assert "moving_iou" in open(rec1).read(), "in-train val metric missing"

    _run("stage2_train",
         [py, os.path.join(REPO, "tools", "train.py"),
          "--config", "StreamMOS_seg", "--tag", "rehearsal", "--data", data,
          "--epochs", "1", "--max-steps", str(args.steps2),
          "--batch-size", str(args.batch_size),
          "--checkpoint", ckpt1, "--ckpt-epoch", "0", "--no-val"],
         cwd=root)

    _run("streaming_eval",
         [py, os.path.join(REPO, "tools", "val.py"),
          "--config", "StreamMOS_seg", "--tag", "rehearsal", "--data", data],
         cwd=root)
    exp2 = os.path.join(root, "experiments", "StreamMOS_seg", "rehearsal")
    preds = os.path.join(exp2, "val_results", "sequences", "08",
                         "predictions")
    n_preds = len(os.listdir(preds))
    assert n_preds == args.val_frames, f"eval wrote {n_preds} labels"
    bf = os.path.join(exp2, "val_bf_results", "sequences", "08",
                      "predictions")
    assert os.path.isdir(bf) and len(os.listdir(bf)) == args.val_frames, \
        "stage-2 bf labels missing"

    _run("voting_instance",
         [py, os.path.join(REPO, "tools", "voting.py"),
          "--config", "StreamMOS_seg", "--tag", "rehearsal", "--data", data,
          "--instance", "--workers", "4"],
         cwd=root)
    refined = os.path.join(exp2, "refine_val_results", "sequences", "08",
                           "predictions")
    assert len(os.listdir(refined)) == args.val_frames

    record = open(os.path.join(exp2, "record_0.txt")).read()
    total = time.time() - total0
    print(json.dumps({
        "metric": "dress_rehearsal",
        "ok": True,
        "total_wall_s": round(total, 1),
        "stage1_steps": args.steps,
        "stage2_steps": args.steps2,
        "batch_size_per_device": args.batch_size,
        "val_frames": args.val_frames,
        "artifacts": {
            "stage1_ckpt": ckpt1,
            "val_labels": preds,
            "bf_labels": bf,
            "refined_labels": refined,
        },
        "record_tail": record.strip().splitlines()[-1][:200]
        if record.strip() else "",
    }), flush=True)

    if not args.keep and args.root is None:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
