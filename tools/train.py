"""Stage-1 / stage-2 trainer CLI.

TPU-native counterpart of `/root/reference/train_StreamMOS.py` and
`train_StreamMOS_seg.py`:

    python tools/train.py --config StreamMOS --tag base --data /path/sequences
    python tools/train.py --config StreamMOS_seg --tag base \
        --checkpoint experiments/StreamMOS/base/checkpoint --ckpt-epoch 47

One process per *host* (not per chip): the jitted train step runs over the
global device mesh; per-host dataset sharding mirrors DistributedSampler.
Stage 2 grafts the stage-1 checkpoint (strict=False parity) and freezes
everything but the refine branch via the optimizer mask.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="StreamMOS-TPU trainer")
    ap.add_argument("--config", default="StreamMOS")
    ap.add_argument("--tag", default="base")
    ap.add_argument("--data", default=None, help="SemanticKITTI sequences dir")
    ap.add_argument("--checkpoint", default=None,
                    help="stage-1 checkpoint dir to graft (stage 2)")
    ap.add_argument("--ckpt-epoch", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--drop-list", default=None,
                    help="train_split_dynamic_pointnumber.txt path "
                         "(auto-generated from the labels when omitted and "
                         "the config enables drop_few_static_frames)")
    ap.add_argument("--start-val-epoch", type=int, default=1,
                    help="run seq-08 validation at the end of every epoch "
                         ">= this (reference train_StreamMOS.py:199-208)")
    ap.add_argument("--no-val", action="store_true",
                    help="disable in-train validation")
    ap.add_argument("--points", type=int, default=None,
                    help="override frame_point_num")
    ap.add_argument("--max-steps", type=int, default=None,
                    help="cap optimizer steps per epoch (dress-rehearsal "
                         "runs at the production config; epoch-end "
                         "checkpoint/val still happen)")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="override batch_size_per_device (the production "
                         "deployment pick is bs1/chip — the reference's "
                         "bs3/GPU maps to 3 chips under data parallelism, "
                         "docs/DESIGN.md train campaign)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args()

    import jax
    # honor a backend override even though sitecustomize pre-imports jax
    # (JAX_PLATFORMS in the environment is too late there)
    backend = os.environ.get("STREAMMOS_BACKEND")
    if backend:
        jax.config.update("jax_platforms", backend)
    from streammos_tpu import parallel
    from streammos_tpu.config import get_config
    from streammos_tpu.data.copy_paste import SequenceCutPaste
    from streammos_tpu.data.dataset import EvalDataset, TrainDataset
    from streammos_tpu.data.droplist import write_drop_list
    from streammos_tpu.data.loader import PrefetchLoader, SampleWorkerPool
    from streammos_tpu.models import init_model
    from streammos_tpu.models.stream_mos import StreamMOSNet
    from streammos_tpu.train import (build_optimizer, create_train_state,
                                     make_train_step)
    from streammos_tpu.train import checkpoint as ckpt_lib
    from streammos_tpu.train.evaluate import record_metrics, stream_eval
    from streammos_tpu.utils.logging import ScalarWriter, config_logger

    parallel.initialize_distributed(args.coordinator, args.num_processes,
                                    args.process_id)

    cfg = get_config(args.config)
    if args.data:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, seq_dir=args.data),
            val=dataclasses.replace(cfg.val, seq_dir=args.data))
    if args.points:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           frame_point_num=args.points),
            val=dataclasses.replace(cfg.val, frame_point_num=args.points))
    if args.epochs:
        cfg = dataclasses.replace(
            cfg, optimize=dataclasses.replace(cfg.optimize,
                                              end_epoch=args.epochs))
    if args.batch_size:
        cfg = dataclasses.replace(cfg, batch_size_per_device=args.batch_size)
    stage2 = cfg.freeze_except is not None

    save_path = os.path.join("experiments", cfg.name, args.tag)
    ckpt_dir = os.path.join(save_path, "checkpoint")
    logger = config_logger(os.path.join(save_path, "log_train.txt"))
    writer = ScalarWriter(os.path.join(save_path, "scalars.jsonl"))

    mesh = parallel.data_mesh()
    n_dev = len(jax.devices())
    global_bs = cfg.batch_size_per_device * n_dev
    logger.info("devices=%d global_batch=%d stage2=%s", n_dev, global_bs, stage2)

    # dataset
    cp = None
    if cfg.train.copy_paste.is_use and args.data:
        bank = os.path.join(os.path.dirname(args.data.rstrip("/")),
                            cfg.train.copy_paste.obj_bank_dir)
        if os.path.isdir(bank):
            cp = SequenceCutPaste(bank, cfg.train.copy_paste.paste_max_obj_num)
    drop_list = args.drop_list
    if drop_list is None and cfg.train.drop_few_static_frames:
        # regenerate the reference's shipped whitelist artifact
        # (config/train_split_dynamic_pointnumber.txt, consumed at
        # data_StreamMOS.py:239-282) directly from the labels
        drop_list = os.path.join(save_path,
                                 "train_split_dynamic_pointnumber.txt")
        if not os.path.exists(drop_list):
            # deterministic from the labels, so every host generates the
            # same list (atomic write; no cross-host sync needed)
            n_kept, n_total = write_drop_list(cfg.train.seq_dir, drop_list)
            logger.info("drop list: kept %d/%d frames -> %s", n_kept, n_total,
                        drop_list)
    ds = TrainDataset(cfg.train, copy_paste=cp, drop_list_path=drop_list,
                      seed=cfg.seed + jax.process_index())
    if len(ds) == 0:
        raise SystemExit(f"no training samples under {cfg.train.seq_dir}")
    # every process sees ceil(len/global_bs) iterations: process_shard_indices
    # pads the shuffled order to a multiple of the global batch
    per_epoch_iters = max(-(-len(ds) // global_bs), 1)

    val_ds = None
    if not args.no_val and jax.process_index() == 0:
        val_ds = EvalDataset(cfg.val, split="valid", with_labels=True)
        if len(val_ds) == 0:
            logger.warning("no seq-08 frames under %s — in-train validation "
                           "disabled", cfg.val.seq_dir)
            val_ds = None
    eval_model = StreamMOSNet(cfg.model, with_refine=stage2, tta_fold=True)

    # model + optimizer
    model, variables = init_model(jax.random.key(cfg.seed), cfg.model,
                                  batch=global_bs,
                                  num_points=cfg.train.frame_point_num,
                                  with_refine=stage2)
    if stage2 and args.checkpoint:
        template = {"params": variables["params"],
                    "batch_stats": variables["batch_stats"]}
        epoch = args.ckpt_epoch or ckpt_lib.latest_epoch(args.checkpoint)
        loaded = ckpt_lib.restore(args.checkpoint, epoch, None)
        src = loaded.get("params", loaded) if isinstance(loaded, dict) else loaded
        variables["params"] = ckpt_lib.graft_params(variables["params"], src)
        logger.info("grafted stage-1 checkpoint epoch %s", epoch)

    tx, sched = build_optimizer(cfg.optimize, per_epoch_iters,
                                params=variables["params"],
                                freeze_except=cfg.freeze_except)
    state = create_train_state(variables, tx)

    # auto-resume (train_StreamMOS.py:165-168)
    resume = ckpt_lib.latest_epoch(ckpt_dir)
    start_epoch = 0
    if resume is not None:
        state = ckpt_lib.restore(ckpt_dir, resume, state)
        start_epoch = resume + 1
        logger.info("resumed from epoch %d", resume)

    state = parallel.replicate_state(mesh, state)
    step_fn = make_train_step(model, cfg, tx, stage2=stage2)

    n_params = sum(np.prod(l.shape) for l in
                   jax.tree_util.tree_leaves(state.params))
    logger.info("Total Parameters: %.2fM", n_params / 1e6)

    key = jax.random.key(cfg.seed + 1)
    # multi-process sample assembly (torch DataLoader workers parity,
    # train_StreamMOS.py:143-150); copy-paste + window filtering is the
    # host bottleneck at batch >= 2 otherwise
    pool = SampleWorkerPool(ds, cfg.train.num_workers,
                            seed=cfg.seed + 7919 * jax.process_index())
    for epoch in range(start_epoch, cfg.optimize.end_epoch):
        order = parallel.process_shard_indices(
            len(ds), np.random.default_rng(cfg.seed + epoch), global_bs)
        local_bs = global_bs // jax.process_count()
        t_epoch = time.time()

        loader = PrefetchLoader(
            pool.batches(order, local_bs, TrainDataset.collate), depth=2)
        for it, local in enumerate(loader):
            if args.max_steps is not None and it >= args.max_steps:
                break
            windows = parallel.host_local_to_global(
                mesh, {k: v for k, v in local.items()}, axis=1)
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, windows, sub)
            if it % cfg.log_frequency == 0:
                loss = float(metrics["loss"])
                gstep = int(jax.device_get(state.step))
                lr = float(sched(gstep))
                logger.info("epoch %d iter %d loss %.4f lr %.5f", epoch, it,
                            loss, lr)
                writer.add_scalars({"loss": loss, "lr": lr}, gstep)

        if jax.process_index() == 0:
            host_state = jax.device_get(state)
            ckpt_lib.save(ckpt_dir, epoch, host_state)
            # in-train per-epoch validation (train_StreamMOS.py:199-200)
            if val_ds is not None and epoch >= args.start_val_epoch:
                result = stream_eval(
                    cfg, cfg.val, eval_model,
                    {"params": host_state.params,
                     "batch_stats": host_state.batch_stats},
                    with_refine=stage2, with_labels=True, logger=logger,
                    dataset=val_ds)
                record_metrics(result, epoch, save_path, logger, writer)
        logger.info("epoch %d done in %.1fs", epoch, time.time() - t_epoch)
    pool.close()


if __name__ == "__main__":
    main()
