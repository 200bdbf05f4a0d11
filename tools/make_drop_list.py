"""Generate the dynamic-point-count frame list used by
``drop_few_static_frames``.

The reference ships `config/train_split_dynamic_pointnumber.txt` — a
whitelist of (seq, frame, #dynamic-points) lines consumed by
`datasets/data_StreamMOS.py:239-282` to drop frames with few moving points
(mostly-static frames dominate training time without adding signal). This
tool regenerates an equivalent list directly from the labels:

    python tools/make_drop_list.py --data /path/sequences \
        --out config/train_split_dynamic_pointnumber.txt --min-dynamic 100
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from streammos_tpu.data import semantic_kitti as sk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", default="train_split_dynamic_pointnumber.txt")
    ap.add_argument("--min-dynamic", type=int, default=100,
                    help="keep frames with at least this many moving points")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    n_kept = n_total = 0
    with open(args.out, "w") as out:
        for seq in sk.SPLITS["train"]:
            seq_id = str(seq).rjust(2, "0")
            lab_dir = os.path.join(args.data, seq_id, "labels")
            if not os.path.isdir(lab_dir):
                continue
            for name in sorted(os.listdir(lab_dir)):
                fid = int(name.split(".")[0])
                raw = np.fromfile(os.path.join(lab_dir, name), dtype=np.uint32)
                sem = (raw & 0xFFFF).astype(np.int64)
                n_dyn = int(((sem >= 252) & (sem <= 259)).sum())
                n_total += 1
                if n_dyn >= args.min_dynamic:
                    out.write(f"{seq_id} {fid:06d} {n_dyn}\n")
                    n_kept += 1
    print(f"kept {n_kept}/{n_total} frames -> {args.out}")


if __name__ == "__main__":
    main()
