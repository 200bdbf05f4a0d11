"""Long-term-memory refinement CLI: voxel voting (+ optional instance voting)
over saved prediction files, then IoU recomputation.

TPU counterpart of `/root/reference/voxel_voting.py` and
`voxel_instance_voting.py`:

    python tools/voting.py --config StreamMOS --tag base --data /path/sequences
    python tools/voting.py ... --instance --bf-results <dir>   # stage 2

Reads `<save>/<split>_results/sequences/<seq>/predictions/*.label`, writes
`refine_<split>_results/...`, and (val split) prints the refined moving IoU.
"""
from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from streammos_tpu import geometry
from streammos_tpu.config import get_config
from streammos_tpu.data import semantic_kitti as sk
from streammos_tpu.metrics import MultiClassMetric
from streammos_tpu.postprocess.voting import (crop_mask, gather_history,
                                              instance_vote, voxel_vote,
                                              voxel_vote_device)


def _load_pred(path: str) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.uint32)
    return sk.relabel((raw & 0xFFFF).astype(np.int64), sk.LEARNING_MAP)


def _frame(data_dir: str, pred_dir: str, fid: str):
    pts = np.fromfile(os.path.join(data_dir, fid + ".bin"),
                      dtype=np.float32).reshape(-1, 4)
    pred = _load_pred(os.path.join(pred_dir, fid + ".label"))
    return pts, pred


def process_frame(task):
    (data_dir, pred_dir, bf_dir, save_dir, fids, fid_idx, poses, voxel,
     use_instance, use_device) = task
    fid = fids[fid_idx]
    cur_pts, cur_pred = _frame(data_dir, pred_dir, fid)
    inv = np.linalg.inv(poses[fid_idx])

    hist_pts, hist_pred = [], []
    for hid in gather_history(fid_idx, len(fids)):
        pts, pred = _frame(data_dir, pred_dir, fids[hid])
        pts = geometry.np_transform(pts, inv @ poses[hid])
        hist_pts.append(pts)
        hist_pred.append(pred)
    if hist_pts:
        hist_pts = np.concatenate(hist_pts)
        hist_pred = np.concatenate(hist_pred)
    else:
        # 1-frame sequence: no history — vote on the current frame alone
        hist_pts = np.zeros((0, cur_pts.shape[1]), cur_pts.dtype)
        hist_pred = np.zeros((0,), cur_pred.dtype)

    hmask = crop_mask(hist_pts, voxel)
    cmask = crop_mask(cur_pts, voxel)
    local_pts = np.concatenate([hist_pts[hmask], cur_pts[cmask]])
    local_pred = np.concatenate([hist_pred[hmask], cur_pred[cmask]])

    vote = voxel_vote_device if use_device else voxel_vote
    refined = vote(local_pts[:, :3], local_pred, cur_pts[cmask][:, :3],
                   cur_pred[cmask], voxel)
    out = cur_pred.copy()
    out[cmask] = refined

    if use_instance and bf_dir is not None:
        bf = np.fromfile(os.path.join(bf_dir, fid + ".label"),
                         dtype=np.uint32).astype(np.int64)
        out = instance_vote(cur_pts[:, :3], out, bf, local_pts[:, :3],
                            local_pred)

    os.makedirs(save_dir, exist_ok=True)
    inv_lut = sk.label_lut(sk.LEARNING_MAP_INV)
    inv_lut[out].astype(np.uint32).tofile(os.path.join(save_dir, fid + ".label"))
    return fid


def run_metric(data_root: str, refined_root: str, seq: str = "08"):
    label_dir = os.path.join(data_root, seq, "labels")
    pred_dir = os.path.join(refined_root, seq, "predictions")
    metric = MultiClassMetric(["static", "moving"])
    for name in sorted(os.listdir(label_dir)):
        fid = name.split(".")[0]
        raw = np.fromfile(os.path.join(label_dir, name), dtype=np.uint32)
        gt = sk.relabel((raw & 0xFFFF).astype(np.int64), sk.LEARNING_MAP)
        pred = _load_pred(os.path.join(pred_dir, fid + ".label"))
        scores = np.eye(3, dtype=np.float32)[pred]
        metric.add_batch(gt, scores)
    result = metric.get_metric()
    print("; ".join(f"{k}: {v}" for k, v in result.items()))
    return result


def resolve_vote_backend(vote: str) -> bool:
    """Map the --vote choice to use_device. 'auto' follows the measurement
    (BENCH_r04: device compute 0.413 s/frame vs numpy 0.376, before H2D):
    numpy."""
    return vote == "device"


def split_sequences(split: str):
    """Sequence dirs per split, zero-padded like the dataset paths
    (data/dataset.py uses rjust(2, '0') throughout)."""
    return (["08"] if split == "val"
            else [str(i).rjust(2, "0") for i in range(11, 22)])


def main():
    ap = argparse.ArgumentParser(description="voxel / instance voting")
    ap.add_argument("--config", default="StreamMOS")
    ap.add_argument("--tag", default="base")
    ap.add_argument("--data", required=True, help="sequences dir")
    ap.add_argument("--split", default="val", choices=["val", "test"])
    ap.add_argument("--instance", action="store_true")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--vote", default="auto",
                    choices=["auto", "numpy", "device"],
                    help="voxel-vote backend: 'numpy' (the measured default "
                         "behind 'auto') votes in a process pool like the "
                         "reference's Pool(8) (voxel_instance_voting.py:"
                         "351-352); 'device' runs the jitted segment-sum vote "
                         "(postprocess/voting.py:101-140) on the accelerator, "
                         "sharing ONE jax runtime across a thread pool. "
                         "Measured on the v5e (BENCH_r04): device compute "
                         "0.413 s/frame vs numpy 0.376 — numpy wins per frame "
                         "even before H2D transfer (which adds ~1 s over this "
                         "sandbox's RPC tunnel; a PCIe-attached host pays far "
                         "less but the compute still loses), and the process "
                         "pool parallelizes across frames where the device "
                         "path serializes through one runtime. 'auto' "
                         "therefore resolves to numpy; pass --vote device "
                         "only after measuring a win on your host.")
    args = ap.parse_args()

    use_device = resolve_vote_backend(args.vote)

    cfg = get_config(args.config)
    voxel = cfg.model.voxel
    save_path = os.path.join("experiments", cfg.name, args.tag)
    pred_root = os.path.join(save_path, f"{args.split}_results", "sequences")
    bf_root = os.path.join(save_path, f"{args.split}_bf_results", "sequences")
    refined_root = os.path.join(save_path, f"refine_{args.split}_results",
                                "sequences")

    seqs = split_sequences(args.split)
    for seq in seqs:
        data_dir = os.path.join(args.data, seq, "velodyne")
        pred_dir = os.path.join(pred_root, seq, "predictions")
        if not os.path.isdir(pred_dir):
            continue
        calib = geometry.parse_calibration(os.path.join(args.data, seq,
                                                        "calib.txt"))
        poses = geometry.parse_poses(os.path.join(args.data, seq, "poses.txt"),
                                     calib)
        fids = sorted(f.split(".")[0] for f in os.listdir(data_dir))
        bf_dir = os.path.join(bf_root, seq, "predictions")
        save_dir = os.path.join(refined_root, seq, "predictions")
        tasks = [(data_dir, pred_dir,
                  bf_dir if os.path.isdir(bf_dir) else None, save_dir, fids, i,
                  poses, voxel, args.instance, use_device)
                 for i in range(len(fids))]
        # device mode must share the single jax runtime -> thread pool
        # (threads overlap the numpy IO/align work with device execution);
        # numpy mode keeps the reference's process pool
        # (voxel_instance_voting.py:351-352)
        pool_cls = ThreadPoolExecutor if use_device else ProcessPoolExecutor
        with pool_cls(max_workers=args.workers) as pool:
            for i, _ in enumerate(pool.map(process_frame, tasks)):
                if i % 200 == 0:
                    print(f"seq {seq}: {i}/{len(tasks)}")

    if args.split == "val":
        run_metric(args.data, refined_root)


if __name__ == "__main__":
    main()
