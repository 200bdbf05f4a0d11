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
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_eval(cfg, args, with_refine: bool, logger):
    import jax
    import jax.numpy as jnp
    from streammos_tpu.data import semantic_kitti as sk
    from streammos_tpu.data.dataset import EvalDataset
    from streammos_tpu.data.loader import PrefetchLoader
    from streammos_tpu.metrics import MultiClassMetric
    from streammos_tpu.models import init_model, memory_shape
    from streammos_tpu.models.stream_mos import featurize, tta_expand_folded
    from streammos_tpu.train import checkpoint as ckpt_lib
    from streammos_tpu.train.trainer import make_eval_step
    from streammos_tpu.models.stream_mos import StreamMOSNet

    dcfg = cfg.test if args.split == "test" else cfg.val
    with_labels = args.split != "test"
    ds = EvalDataset(dcfg, split="valid" if args.split == "val" else args.split,
                     with_labels=with_labels)
    if len(ds) == 0:
        raise SystemExit(f"no eval frames under {dcfg.seq_dir}")

    TTA = 4
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

    eval_step = make_eval_step(model, cfg, with_refine=with_refine)

    @jax.jit
    def preprocess(xyzi):
        return featurize(tta_expand_folded(xyzi[None]), cfg.model)

    save_root = os.path.join("experiments", cfg.name, args.tag,
                             f"{args.split}_results", "sequences")
    bf_root = os.path.join("experiments", cfg.name, args.tag,
                           f"{args.split}_bf_results", "sequences")

    metric = MultiClassMetric(cfg.category_list)
    memory = jnp.zeros(memory_shape(cfg.model, TTA), jnp.float32)
    inv_lut = sk.label_lut(sk.LEARNING_MAP_INV)

    t0 = time.time()
    n_frames = 0
    prev_seq = None
    loader = PrefetchLoader((ds[i] for i in range(len(ds))), depth=4)
    for sample in loader:
        # a new sequence (or the stream start) resets the memory
        is_first = sample["seq_id"] != prev_seq
        prev_seq = sample["seq_id"]
        batch = preprocess(jnp.asarray(sample["xyzi"]))
        scores, bf_scores, memory = eval_step(variables, batch, memory,
                                              jnp.asarray(not is_first))
        n_frames += 1

        n_valid = dcfg.frame_point_num - sample["pad_length"]
        scores_np = np.asarray(scores)
        if with_labels:
            metric.add_batch(sample["targets"][:n_valid],
                             scores_np[:n_valid])

        pred = scores_np[:n_valid].argmax(axis=-1).astype(np.uint32)
        full = np.zeros(sample["valid_mask"].shape[0], np.uint32)
        full[sample["valid_mask"]] = pred
        out_dir = os.path.join(save_root, sample["seq_id"], "predictions")
        os.makedirs(out_dir, exist_ok=True)
        inv_lut[full].astype(np.uint32).tofile(
            os.path.join(out_dir, sample["file_id"] + ".label"))

        if with_refine and bf_scores is not None:
            bf_pred = np.asarray(bf_scores)[:n_valid].argmax(-1).astype(np.uint32)
            bf_full = np.zeros(sample["valid_mask"].shape[0], np.uint32)
            bf_full[sample["valid_mask"]] = bf_pred
            bf_dir = os.path.join(bf_root, sample["seq_id"], "predictions")
            os.makedirs(bf_dir, exist_ok=True)
            bf_full.tofile(os.path.join(bf_dir, sample["file_id"] + ".label"))

    dt = time.time() - t0
    logger.info("evaluated %d frames in %.1fs (%.2f fps)", n_frames, dt,
                n_frames / dt)
    if with_labels:
        result = metric.get_metric()
        line = f"Epoch {epoch}; " + "; ".join(
            f"{k}: {v}" for k, v in result.items())
        logger.info(line)
        rec = os.path.join("experiments", cfg.name, args.tag,
                           f"record_{jax.process_index()}.txt")
        os.makedirs(os.path.dirname(rec), exist_ok=True)
        with open(rec, "a") as f:
            f.write(line + "\n")
        return result
    return None


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
