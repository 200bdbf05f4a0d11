"""Streaming evaluation CLI: runs seq-08 (or test seqs) in order with the
short-term memory carried across frames, TTA x4 on device, computes
moving-IoU, and writes KITTI `.label` prediction files.

TPU counterpart of `/root/reference/val_StreamMOS.py` / `val_StreamMOS_seg.py`
/ `test_StreamMOS.py`:

    python tools/val.py --config StreamMOS --tag base --data /path/sequences \
        --epoch 47
    python tools/val.py --config StreamMOS_seg --tag base --split test ...

Writes `<save>/val_results/sequences/<seq>/predictions/<frame>.label`
(+ `val_bf_results` for stage 2) and appends metrics to `record_0.txt`.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_eval(cfg, args, with_refine: bool, logger):
    import jax
    from streammos_tpu.data.dataset import EvalDataset
    from streammos_tpu.models import init_model
    from streammos_tpu.train import checkpoint as ckpt_lib
    from streammos_tpu.train.evaluate import TTA, record_metrics, stream_eval

    dcfg = cfg.test if args.split == "test" else cfg.val
    with_labels = args.split != "test"
    ds = EvalDataset(dcfg, split="valid" if args.split == "val" else args.split,
                     with_labels=with_labels)
    if len(ds) == 0:
        raise SystemExit(f"no eval frames under {dcfg.seq_dir}")

    # tta_fold: the 4 flip variants share one scatter/gather index structure
    # (ops/tta_fold.py) — same predictions, ~1.6x faster streaming eval
    model, variables = init_model(jax.random.key(0), cfg.model, batch=TTA,
                                  num_points=dcfg.frame_point_num,
                                  with_refine=with_refine, tta_fold=True)
    ckpt_dir = args.checkpoint or os.path.join("experiments", cfg.name,
                                               args.tag, "checkpoint")
    epoch = args.epoch if args.epoch is not None else ckpt_lib.latest_epoch(ckpt_dir)
    # parallel checkpoint eval (reference quirk val_StreamMOS.py:205
    # `epoch + rank`): each process evaluates a different epoch
    if epoch is not None and jax.process_count() > 1:
        epoch = epoch + jax.process_index()
    if epoch is not None:
        loaded = ckpt_lib.restore(ckpt_dir, epoch, None)
        src_params = loaded.get("params", loaded)
        variables = {"params": src_params,
                     "batch_stats": loaded.get("batch_stats",
                                               variables["batch_stats"])}
        logger.info("loaded checkpoint epoch %s from %s", epoch, ckpt_dir)
    else:
        logger.warning("no checkpoint found — evaluating fresh init")

    save_path = os.path.join("experiments", cfg.name, args.tag)
    save_root = os.path.join(save_path, f"{args.split}_results", "sequences")
    bf_root = os.path.join(save_path, f"{args.split}_bf_results", "sequences")

    result = stream_eval(cfg, dcfg, model, variables, with_refine=with_refine,
                         with_labels=with_labels, logger=logger, dataset=ds,
                         save_root=save_root,
                         bf_root=bf_root if with_refine else None,
                         carry_across_sequences=args.carry_across_sequences)
    if result is not None:
        record_metrics(result, epoch, save_path, logger)
    return result


def main():
    ap = argparse.ArgumentParser(description="StreamMOS-TPU streaming eval")
    ap.add_argument("--config", default="StreamMOS")
    ap.add_argument("--tag", default="base")
    ap.add_argument("--data", default=None)
    ap.add_argument("--split", default="val", choices=["val", "test"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--points", type=int, default=None,
                    help="override frame_point_num")
    ap.add_argument("--carry-across-sequences", action="store_true",
                    help="carry the short-term memory over sequence "
                         "boundaries (reference test-split behavior, "
                         "test_StreamMOS.py:66-71); default resets per "
                         "sequence")
    args = ap.parse_args()

    import jax
    backend = os.environ.get("STREAMMOS_BACKEND")
    if backend:
        jax.config.update("jax_platforms", backend)

    from streammos_tpu.config import get_config
    from streammos_tpu.utils.logging import config_logger

    cfg = get_config(args.config)
    if args.data:
        cfg = dataclasses.replace(
            cfg,
            val=dataclasses.replace(cfg.val, seq_dir=args.data),
            test=dataclasses.replace(cfg.test, seq_dir=args.data))
    if args.points:
        cfg = dataclasses.replace(
            cfg,
            val=dataclasses.replace(cfg.val, frame_point_num=args.points),
            test=dataclasses.replace(cfg.test, frame_point_num=args.points))
    with_refine = cfg.freeze_except is not None
    logger = config_logger(os.path.join("experiments", cfg.name, args.tag,
                                        "log_val.txt"))
    run_eval(cfg, args, with_refine, logger)


if __name__ == "__main__":
    main()
