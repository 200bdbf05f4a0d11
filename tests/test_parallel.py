"""Multi-device data-parallel semantics on the 8-virtual-device CPU mesh:
the sharded global-batch train step must equal the single-device step bit-
for-bit-ish (global BatchNorm statistics = SyncBN parity; gradient reduction
= DDP parity), matching `train_StreamMOS.py:170-174`."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from streammos_tpu import parallel
from streammos_tpu.config import get_config
from streammos_tpu.models import init_model
from streammos_tpu.train import build_optimizer, create_train_state, \
    make_train_step
from streammos_tpu.utils.ioueval import IoUEval


def _windows(cfg, B, S=3, N=256, seed=0):
    rng = np.random.default_rng(seed)
    m = cfg.model
    H = m.voxel.bev_shape[0]
    return {
        "xyzi": rng.uniform(-40, 40, size=(S, B, m.seq_num, N, 4)).astype(np.float32),
        "targets": rng.integers(0, 3, size=(S, B, N)).astype(np.int32),
    }


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8
    cfg = get_config("StreamMOS_tiny")
    B = 8
    model, variables = init_model(jax.random.key(0), cfg.model, batch=B,
                                  num_points=256)
    tx, _ = build_optimizer(cfg.optimize, per_epoch_iters=10)
    step = make_train_step(model, cfg, tx, donate=False)
    windows_np = _windows(cfg, B)
    rngkey = jax.random.key(42)

    # single device
    state1 = create_train_state(variables, tx)
    _, metrics1 = step(state1, {k: jnp.asarray(v) for k, v in windows_np.items()},
                       rngkey)
    loss1 = float(metrics1["loss"])

    # 8-device mesh, batch sharded on axis 1
    mesh = parallel.data_mesh(jax.devices()[:8])
    state8 = parallel.replicate_state(mesh, create_train_state(variables, tx))
    sharded = parallel.shard_batch(
        mesh, {k: jnp.asarray(v) for k, v in windows_np.items()}, axis=1)
    new_state8, metrics8 = step(state8, sharded, rngkey)
    loss8 = float(metrics8["loss"])

    np.testing.assert_allclose(loss8, loss1, rtol=2e-4)
    # params after the update agree across the formats (tolerance covers
    # cross-device reduction order in the BN moments / gradient psum, which
    # shifts f32 rounding through the OHEM top-k and Lovasz sort boundaries)
    p1 = (jax.tree_util.tree_leaves(step(create_train_state(variables, tx),
          {k: jnp.asarray(v) for k, v in windows_np.items()}, rngkey)[0].params))
    p8 = jax.tree_util.tree_leaves(jax.device_get(new_state8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)


def test_process_shard_indices():
    idx = parallel.process_shard_indices(10, None, batch_size_global=4)
    # single process: padded to a multiple of 4, strided by process count (1)
    assert len(idx) == 12
    np.testing.assert_array_equal(idx[:10], np.arange(10))


def test_ioueval_basic():
    ev = IoUEval(3, ignore=[0])
    gt = np.array([1, 1, 2, 2, 0])
    pred = np.array([1, 2, 2, 2, 1])
    ev.add_batch(pred, gt)
    miou, iou = ev.get_iou()
    # class1: tp=1 fp=0(ignored gt=0 pred=1 is zeroed) fn=1 -> 0.5
    # class2: tp=2 fp=1 fn=0 -> 2/3
    np.testing.assert_allclose(iou[1], 0.5)
    np.testing.assert_allclose(iou[2], 2 / 3)
    np.testing.assert_allclose(miou, (0.5 + 2 / 3) / 2)
