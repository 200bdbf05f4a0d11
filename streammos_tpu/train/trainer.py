"""Jitted train / eval steps and the training state.

The whole streaming training objective — 3 sliding windows with the memory
carry and BPTT through it (`/root/reference/models/StreamMOS.py:155-179`) —
is one jitted function; data parallelism comes from sharding the batch axis
of its inputs over a mesh (see `streammos_tpu.parallel`), which also makes
BatchNorm statistics global (SyncBN parity, `train_StreamMOS.py:170`) and
gradient reduction automatic (DDP parity, `train_StreamMOS.py:171-174`).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from streammos_tpu import metrics as metrics_lib
from streammos_tpu.config import Config
from streammos_tpu.models import StreamMOSNet, memory_shape, streaming_loss
from streammos_tpu.models.stream_mos import stage_forward


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def create_train_state(variables, tx) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model: StreamMOSNet, cfg: Config, tx,
                    stage2: bool = False, donate: bool = True,
                    remat: bool = False):
    """Returns a jitted step: (state, windows, rng) -> (state, metrics).

    `windows` layout is documented at `streaming_loss`; per-iteration
    optimizer + scheduler stepping matches `train_StreamMOS.py:54-77`.

    Donation is speed-neutral here: measured side by side with FULL
    executable warmup (round 4, `tools/bench_train_campaign.py`: 0.2862
    donated vs 0.2878 undonated s/step at bs1/130k pts on the v5e — the
    apparent round-3 donate/no-donate gap was entirely the ~6-execution
    warmup of a fresh executable, 0.448 -> 0.289 s/step). donate=True stays
    the default for the params+opt-state memory it returns.
    """

    def step_fn(state: TrainState, windows: Dict[str, jax.Array],
                rng: jax.Array):
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def loss_fn(params):
            loss, new_vars = streaming_loss(
                model, {"params": params, "batch_stats": state.batch_stats},
                windows, cfg.model, rng, stage2=stage2, remat=remat)
            return loss, new_vars["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_bs, new_opt, state.step + 1)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model: StreamMOSNet, cfg: Config, with_refine: bool = False):
    """Streaming eval step with TTA (val_StreamMOS.py:95-109).

    The TTA variants ride the batch axis (B = #TTA); each keeps its own
    memory slot across frames — exactly the reference, where the 4-variant
    stack is squeezed into the model batch dim. The carried memory never
    leaves the device between frames.

    Returns jitted: (variables, batch, memory, use_memory) ->
      (scores (Bt, N, C) softmax-averaged over TTA — one row per parallel
      stream, Bt == 1 in the reference protocol —, bf_scores or None,
      new_memory)
    """

    def tta_mean(out, key):
        if model.tta_fold:
            # reduce from the FOLDED logits with N on lanes (tta_scores);
            # the narrow unfolded view stays dead code. Every stream's
            # scores are returned (a Bt>1 folded batch is the parallel-
            # stream eval layout, __graft_entry__.dryrun_multichip).
            from streammos_tpu.models.stream_mos import tta_scores

            return tta_scores(out[key + "_folded"], cfg.model.class_num)
        return jax.nn.softmax(out[key], axis=-1).mean(axis=0)[None]

    def eval_fn(variables, batch, memory, use_memory):
        out, _ = stage_forward(model, variables, batch, memory, use_memory,
                               train=False)
        scores = tta_mean(out, "pred")
        bf_scores = None
        if with_refine:
            bf_scores = tta_mean(out, "bf_pred")
        return scores, bf_scores, out["memory"]

    return jax.jit(eval_fn)


def make_metric_update():
    return jax.jit(metrics_lib.update)
