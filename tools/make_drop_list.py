"""Generate the dynamic-point-count frame list used by
``drop_few_static_frames``.

The reference ships `config/train_split_dynamic_pointnumber.txt` — a
whitelist of (seq, frame, #dynamic-points) lines consumed by
`datasets/data_StreamMOS.py:239-282` to drop frames with few moving points
(mostly-static frames dominate training time without adding signal). This
tool regenerates an equivalent list directly from the labels (the trainer
also does this automatically when no --drop-list is given):

    python tools/make_drop_list.py --data /path/sequences \
        --out config/train_split_dynamic_pointnumber.txt --min-dynamic 100
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from streammos_tpu.data.droplist import write_drop_list


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", default="train_split_dynamic_pointnumber.txt")
    ap.add_argument("--min-dynamic", type=int, default=100,
                    help="keep frames with at least this many moving points")
    args = ap.parse_args()

    n_kept, n_total = write_drop_list(args.data, args.out, args.min_dynamic)
    print(f"kept {n_kept}/{n_total} frames -> {args.out}")


if __name__ == "__main__":
    main()
