import math

import numpy as np
import jax
import jax.numpy as jnp
import optax

from streammos_tpu.config import OptimizeConfig
from streammos_tpu.train.optim import build_optimizer, build_schedule


def _ref_schedule(k, num_epoch, per_epoch, pct_start, step, decay):
    """schedule_with_warmup (utils/builder.py:16-23): LR multiplier."""
    warmup_iters = int(num_epoch * per_epoch * pct_start)
    if k < warmup_iters:
        return (k + 1) / warmup_iters
    epoch = k // per_epoch
    return math.pow(decay, epoch // step)


def test_step_schedule_matches_reference():
    cfg = OptimizeConfig()  # 48 epochs, pct 0.01, step 10, decay 0.1, lr 0.02
    per_epoch = 50
    sched = build_schedule(cfg, per_epoch)
    for k in [0, 5, 23, 24, 100, 499, 500, 1200, 2399, 2400]:
        expect = cfg.base_lr * _ref_schedule(k, 48, per_epoch, 0.01, 10, 0.1)
        np.testing.assert_allclose(float(sched(jnp.asarray(k))), expect,
                                   rtol=1e-6)


def test_sgd_nesterov_matches_torch_formula():
    """One SGD step with coupled weight decay + Nesterov momentum must match
    torch.optim.SGD semantics (builder.py:55-61)."""
    import torch

    cfg = OptimizeConfig(pct_start=0.0)
    params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    grads = {"w": jnp.asarray([0.1, 0.2, -0.3])}
    tx, sched = build_optimizer(cfg, per_epoch_iters=1)
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.tensor([1.0, -2.0, 3.0]))
    opt = torch.optim.SGD([tw], lr=float(sched(0)), momentum=cfg.momentum,
                          weight_decay=cfg.weight_decay, nesterov=cfg.nesterov)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor([0.1, 0.2, -0.3])
        opt.step()
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=2e-5)


def test_freeze_except_refine():
    cfg = OptimizeConfig(pct_start=0.0)
    params = {"trunk": {"kernel": jnp.ones((3,))},
              "refine": {"kernel": jnp.ones((3,))}}
    grads = jax.tree_util.tree_map(lambda x: x * 0 + 0.5, params)
    tx, _ = build_optimizer(cfg, 1, params=params, freeze_except="refine")
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["trunk"]["kernel"]),
                                  np.ones(3))  # frozen
    assert not np.allclose(np.asarray(new["refine"]["kernel"]), np.ones(3))
