"""Optimizer / LR-schedule factory (optax), mirroring
`/root/reference/utils/builder.py`.

* SGD with Nesterov momentum and coupled weight decay, or AdamW
  (builder.py:49-63).
* 'step' schedule: linear warmup over ``pct_start`` of total iters, then
  step decay ``decay_factor ** (epoch // step)`` (builder.py:16-23) —
  evaluated per iteration like the reference's per-iter LambdaLR.
* 'OneCycle': cosine one-cycle with div_factor 25 (builder.py:28-33).
* stage-2 freezing: every parameter outside the refine branch gets a zero
  multiplier (`train_StreamMOS_seg.py:169-174`).
"""
from __future__ import annotations

from typing import Optional

import jax
import optax

from streammos_tpu.config import OptimizeConfig


def build_schedule(cfg: OptimizeConfig, per_epoch_iters: int):
    num_epochs = cfg.end_epoch - cfg.begin_epoch
    total_iters = max(num_epochs * per_epoch_iters, 1)
    if cfg.schedule == "step":
        warmup_iters = max(int(total_iters * cfg.pct_start), 1)

        def sched(count):
            import jax.numpy as jnp
            warm = (count + 1) / warmup_iters
            epoch = count // per_epoch_iters
            step_idx = epoch // cfg.step_epochs
            decay = cfg.decay_factor ** step_idx
            return cfg.base_lr * jnp.where(count < warmup_iters, warm, decay)

        return sched
    if cfg.schedule == "OneCycle":
        return optax.cosine_onecycle_schedule(
            transition_steps=total_iters, peak_value=cfg.base_lr,
            pct_start=cfg.pct_start, div_factor=25.0,
            final_div_factor=cfg.base_lr / cfg.final_lr)
    raise NotImplementedError(cfg.schedule)


def build_optimizer(cfg: OptimizeConfig, per_epoch_iters: int,
                    params=None, freeze_except: Optional[str] = None):
    sched = build_schedule(cfg, per_epoch_iters)
    if cfg.optimizer == "sgd":
        # torch SGD: weight decay folded into the gradient before momentum
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(learning_rate=sched, momentum=cfg.momentum,
                      nesterov=cfg.nesterov),
        )
    elif cfg.optimizer in ("adam", "adamw"):
        tx = optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay)
    else:
        raise NotImplementedError(cfg.optimizer)

    if freeze_except is not None:
        if params is None:
            raise ValueError("freezing needs the param tree")
        mask = _freeze_mask(params, freeze_except)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(),
                                          jax.tree_util.tree_map(
                                              lambda keep: not keep, mask)))
    return tx, sched


class TSEnsemble:
    """Temporal ensemble of variables: exponential moving average of a
    mean-teacher copy (`utils/builder.py:66-110`; unused by the shipped
    reference configs, kept for capability parity).

    Holds a pytree of averaged variables; ``update(new)`` applies
    ``mean = alpha * mean + (1 - alpha) * new`` leaf-wise.
    """

    def __init__(self, variables, alpha: float = 0.95):
        assert 0.0 <= alpha <= 1.0
        self.alpha = alpha
        self.mean_variables = jax.tree_util.tree_map(lambda x: x, variables)

    def update(self, new_variables):
        a = self.alpha
        self.mean_variables = jax.tree_util.tree_map(
            lambda old, new: old * a + new * (1.0 - a),
            self.mean_variables, new_variables)
        return self.mean_variables


def _freeze_mask(params, keep_substring: str):
    """True = trainable. Matches any path segment containing the substring."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    masks = {}
    for path, _ in flat:
        key = jax.tree_util.keystr(path)
        masks[key] = keep_substring in key
    def lookup(path, _):
        return masks[jax.tree_util.keystr(path)]
    return jax.tree_util.tree_map_with_path(lookup, params)
