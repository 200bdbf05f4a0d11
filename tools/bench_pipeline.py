"""Host input-pipeline benchmark: seconds per assembled training sample.

Builds a synthetic SemanticKITTI sequence at production point counts
(~125k points/frame) in a temp dir, then measures `TrainDataset.__getitem__`
throughput inline (num_workers=0) and with the forked `SampleWorkerPool`
(reference parity: 4 torch DataLoader workers/GPU,
`/root/reference/train_StreamMOS.py:143-150`).

    python tools/bench_pipeline.py [--workers 4] [--samples 12] [--points 125000]

The number to compare against is the device train-step time per sample
(tools/bench_train.py): host_s_per_sample * batch < step_s means the chip
never starves with one prefetched batch in flight.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_big_sequence(root: str, seq_id: str, n_frames: int, n_points: int,
                      seed: int = 0) -> None:
    """Production-size synthetic scans (real file formats)."""
    rng = np.random.default_rng(seed)
    seq = os.path.join(root, seq_id)
    os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
    os.makedirs(os.path.join(seq, "labels"), exist_ok=True)
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: 1 0 0 0 0 1 0 0 0 0 1 0\nTr: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    with open(os.path.join(seq, "poses.txt"), "w") as f:
        f.write("\n".join(f"1 0 0 {i * 1.0} 0 1 0 0 0 0 1 0"
                          for i in range(n_frames)) + "\n")
    n_road = n_points // 3
    for i in range(n_frames):
        pts = np.concatenate([
            np.stack([rng.uniform(-45, 45, n_road),
                      rng.uniform(-45, 45, n_road),
                      rng.uniform(-1.8, -1.6, n_road),
                      rng.uniform(0, 1, n_road)], -1),
            np.stack([rng.uniform(-45, 45, n_points - n_road),
                      rng.uniform(-45, 45, n_points - n_road),
                      rng.uniform(-1.5, 2.5, n_points - n_road),
                      rng.uniform(0, 1, n_points - n_road)], -1),
        ]).astype(np.float32)
        sem = np.concatenate([
            np.full(n_road, 40, np.uint32),
            np.where(rng.random(n_points - n_road) < 0.01, 252, 50
                     ).astype(np.uint32)])
        pts.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))
        sem.tofile(os.path.join(seq, "labels", f"{i:06d}.label"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--samples", type=int, default=12)
    ap.add_argument("--points", type=int, default=125000)
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()

    from streammos_tpu.config import get_config
    from streammos_tpu.data.dataset import TrainDataset
    from streammos_tpu.data.loader import SampleWorkerPool

    with tempfile.TemporaryDirectory() as root:
        make_big_sequence(root, "00", args.frames, args.points)
        cfg = dataclasses.replace(get_config("StreamMOS").train, seq_dir=root,
                                  drop_few_static_frames=False)
        ds = TrainDataset(cfg, seed=0)
        idx = [i % len(ds) for i in range(args.samples)]

        _ = ds[0]  # touch page cache so both modes see warm IO
        results = {}
        for workers in (0, args.workers):
            pool = SampleWorkerPool(ds, workers, seed=1)
            t0 = time.perf_counter()
            n = 0
            for _s in pool.map_ordered(idx):
                n += 1
            dt = (time.perf_counter() - t0) / n
            pool.close()
            results[workers] = dt

        print(json.dumps({
            "metric": "host_pipeline_s_per_sample",
            "value": round(results[args.workers], 4),
            "unit": f"s/sample ({args.points} pts/frame, 3 windows, "
                    f"{args.workers} workers)",
            "inline_s_per_sample": round(results[0], 4),
            "speedup": round(results[0] / results[args.workers], 2),
        }))


if __name__ == "__main__":
    main()
