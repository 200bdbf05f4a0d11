"""Streaming evaluation loop (library form).

One implementation serves both entry points, mirroring the reference's two
val paths:

* `tools/val.py` — standalone evaluator that also writes KITTI `.label`
  prediction files (`/root/reference/val_StreamMOS.py:80-137`);
* in-train per-epoch validation from `tools/train.py` — metric only
  (`/root/reference/train_StreamMOS.py:80-108,199-200`).

The TTA x4 fan runs folded (ops/tta_fold.py) with each variant keeping its
own device-resident memory slot across frames, exactly like the reference's
4-variant batch (`val_StreamMOS.py:85,95`).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

TTA = 4


def stream_eval(cfg, dcfg, model, variables, *, with_refine: bool,
                with_labels: bool, logger, dataset=None,
                save_root: Optional[str] = None,
                bf_root: Optional[str] = None,
                carry_across_sequences: bool = False,
                ) -> Optional[Dict[str, float]]:
    """Run the streaming eval over ``dataset`` (or a fresh `EvalDataset`
    from ``dcfg``); returns the metric dict when ``with_labels``.

    `model` must be a tta_fold `StreamMOSNet`; `variables` its
    params/batch_stats (parameter trees are fold-agnostic). Label files are
    written only when ``save_root`` is given.

    ``carry_across_sequences``: the reference val/test loops thread the
    short-term memory across the WHOLE loader with only the very first frame
    fresh — i.e. memory carries over sequence boundaries on the 11-21 test
    split (`/root/reference/test_StreamMOS.py:66-71`, `val_StreamMOS.py:85`).
    The default here (False) resets the memory at every sequence boundary —
    a deliberate, documented deviation (a fresh sequence should not attend
    to another sequence's features); pass True for bit-for-bit reference
    boundary behavior (e.g. leaderboard-submission reproduction).
    """
    import jax
    import jax.numpy as jnp
    from streammos_tpu.data import semantic_kitti as sk
    from streammos_tpu.data.dataset import EvalDataset
    from streammos_tpu.data.loader import PrefetchLoader
    from streammos_tpu.metrics import MultiClassMetric
    from streammos_tpu.models import memory_shape
    from streammos_tpu.models.stream_mos import featurize, tta_expand_folded
    from streammos_tpu.train.trainer import make_eval_step

    ds = dataset
    if ds is None:
        ds = EvalDataset(dcfg, split="valid", with_labels=with_labels)
    if len(ds) == 0:
        raise ValueError(f"no eval frames under {dcfg.seq_dir}")

    eval_step = make_eval_step(model, cfg, with_refine=with_refine)

    @jax.jit
    def preprocess(xyzi):
        return featurize(tta_expand_folded(xyzi[None]), cfg.model)

    metric = MultiClassMetric(cfg.category_list)
    memory = jnp.zeros(memory_shape(cfg.model, TTA), jnp.float32)
    inv_lut = sk.label_lut(sk.LEARNING_MAP_INV)

    t0 = time.time()
    n_frames = 0
    prev_seq = None
    loader = PrefetchLoader((ds[i] for i in range(len(ds))), depth=4)
    for sample in loader:
        # a new sequence (or the stream start) resets the memory; with
        # carry_across_sequences only the stream start does (reference
        # test-split behavior, test_StreamMOS.py:66-71)
        if carry_across_sequences:
            is_first = n_frames == 0
        else:
            is_first = sample["seq_id"] != prev_seq
        prev_seq = sample["seq_id"]
        batch = preprocess(jnp.asarray(sample["xyzi"]))
        scores, bf_scores, memory = eval_step(variables, batch, memory,
                                              jnp.asarray(not is_first))
        n_frames += 1

        n_valid = dcfg.frame_point_num - sample["pad_length"]
        scores_np = np.asarray(scores[0])  # single-stream eval: Bt == 1
        if with_labels:
            metric.add_batch(sample["targets"][:n_valid], scores_np[:n_valid])

        if save_root is not None:
            pred = scores_np[:n_valid].argmax(axis=-1).astype(np.uint32)
            full = np.zeros(sample["valid_mask"].shape[0], np.uint32)
            full[sample["valid_mask"]] = pred
            out_dir = os.path.join(save_root, sample["seq_id"], "predictions")
            os.makedirs(out_dir, exist_ok=True)
            inv_lut[full].astype(np.uint32).tofile(
                os.path.join(out_dir, sample["file_id"] + ".label"))

        if with_refine and bf_scores is not None and bf_root is not None:
            bf_pred = np.asarray(
                bf_scores[0])[:n_valid].argmax(-1).astype(np.uint32)
            bf_full = np.zeros(sample["valid_mask"].shape[0], np.uint32)
            bf_full[sample["valid_mask"]] = bf_pred
            bf_dir = os.path.join(bf_root, sample["seq_id"], "predictions")
            os.makedirs(bf_dir, exist_ok=True)
            bf_full.tofile(os.path.join(bf_dir, sample["file_id"] + ".label"))

    dt = time.time() - t0
    logger.info("evaluated %d frames in %.1fs (%.2f fps)", n_frames, dt,
                max(n_frames, 1) / dt)
    if with_labels:
        return metric.get_metric()
    return None


def record_metrics(result: Dict[str, float], epoch, save_path: str,
                   logger, writer=None) -> str:
    """Append the reference's `record_{rank}.txt` line
    (`val_StreamMOS.py:129-137`) and optionally emit scalars."""
    import jax

    line = f"Epoch {epoch}; " + "; ".join(f"{k}: {v}"
                                          for k, v in result.items())
    logger.info(line)
    rec = os.path.join(save_path, f"record_{jax.process_index()}.txt")
    os.makedirs(os.path.dirname(rec), exist_ok=True)
    with open(rec, "a") as f:
        f.write(line + "\n")
    if writer is not None:
        step = epoch if isinstance(epoch, int) else 0
        writer.add_scalars({f"val/{k}": float(v) for k, v in result.items()
                            if isinstance(v, (int, float))}, step)
    return line
