"""Folded-lane building blocks (round 3): the eval-only TTA-folded
primitives must match their unfolded counterparts exactly (same params,
per-variant application), and maxpool3x3 must equal nn.max_pool."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammos_tpu.nn.blocks import (BN, CatFusion, FoldedBatchNorm,
                                     FoldedDense, PointNetStacker,
                                     PredBranch, maxpool3x3)

V = 4


def _fold(x):  # (B, N, V, C) -> (B, N, V*C)
    b, n, v, c = x.shape
    return x.reshape(b, n, v * c)


def test_folded_dense_matches_dense_per_variant():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, V, 24).astype(np.float32))
    dense = nn.Dense(16, use_bias=False)
    vars_ = dense.init(jax.random.key(1), x[:, :, 0])
    want = jnp.stack([dense.apply(vars_, x[:, :, v]) for v in range(V)],
                     axis=2)

    fd = FoldedDense(16, 24, V, use_bias=False)
    got = fd.apply({"params": {"kernel": vars_["params"]["kernel"]}},
                   [_fold(x)])
    np.testing.assert_allclose(np.asarray(got.reshape(2, 64, V, 16)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_folded_dense_multi_source_equals_concat():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(1, 32, V, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 32, V, 12).astype(np.float32))
    cat = jnp.concatenate([a, b], axis=-1)  # per-variant concat (…, V, 20)
    dense = nn.Dense(10, use_bias=True)
    vars_ = dense.init(jax.random.key(2), cat[:, :, 0])
    want = jnp.stack([dense.apply(vars_, cat[:, :, v]) for v in range(V)],
                     axis=2)

    fd = FoldedDense(10, 20, V, use_bias=True)
    got = fd.apply({"params": dict(vars_["params"])}, [_fold(a), _fold(b)])
    np.testing.assert_allclose(np.asarray(got.reshape(1, 32, V, 10)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_folded_batchnorm_matches_eval_bn():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 50, V, 6).astype(np.float32))
    stats = {"mean": jnp.asarray(rng.randn(6).astype(np.float32)),
             "var": jnp.asarray(rng.uniform(0.5, 2, 6).astype(np.float32))}
    params = {"scale": jnp.asarray(rng.uniform(0.5, 2, 6).astype(np.float32)),
              "bias": jnp.asarray(rng.randn(6).astype(np.float32))}
    bn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    want = jnp.stack([bn.apply({"params": params, "batch_stats": stats},
                               x[:, :, v]) for v in range(V)], axis=2)
    fbn = FoldedBatchNorm(V)
    got = fbn.apply({"params": params, "batch_stats": stats}, _fold(x))
    np.testing.assert_allclose(np.asarray(got.reshape(2, 50, V, 6)),
                               np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mod_cls,kwargs", [
    (PointNetStacker, dict(cout=16, pre_bn=True, stack_num=2)),
    (CatFusion, dict(out_channel=12)),
    (PredBranch, dict(cout=3)),
])
def test_folded_modules_match_unfolded(mod_cls, kwargs):
    """fold=V modules with the SAME param tree must equal running the
    unfolded module per variant (eval mode)."""
    rng = np.random.RandomState(3)
    if mod_cls is CatFusion:
        xs = [jnp.asarray(rng.randn(1, 40, V, c).astype(np.float32))
              for c in (6, 10, 6)]
        x_un = [jnp.concatenate([x[:, :, v] for x in xs], axis=-1)
                for v in range(V)]
        x_fold = [_fold(x) for x in xs]

        def apply_un(m, vars_, v):
            return m.apply(vars_, [x[:, :, v] for x in xs], False)

        def apply_fold(m, vars_):
            return m.apply(vars_, x_fold, False)

        init_arg = [x[:, :, 0] for x in xs]
    else:
        x = jnp.asarray(rng.randn(1, 40, V, 8).astype(np.float32))

        def apply_un(m, vars_, v):
            return m.apply(vars_, x[:, :, v], False)

        def apply_fold(m, vars_):
            return m.apply(vars_, _fold(x), False)

        init_arg = x[:, :, 0]

    un = mod_cls(**kwargs)
    vars_ = un.init(jax.random.key(4), init_arg, False)
    want = jnp.stack([apply_un(un, vars_, v) for v in range(V)], axis=2)

    folded = mod_cls(**kwargs, fold=V)
    # identical param tree must be directly loadable into the folded module
    got = apply_fold(folded, vars_)
    cout = want.shape[-1]
    np.testing.assert_allclose(
        np.asarray(got.reshape(*got.shape[:2], V, cout)), np.asarray(want),
        rtol=2e-5, atol=2e-5)


def test_folded_param_tree_identical():
    x = jnp.zeros((1, 16, V, 8))
    un = PointNetStacker(cout=16, pre_bn=True, stack_num=2)
    fo = PointNetStacker(cout=16, pre_bn=True, stack_num=2, fold=V)
    t_un = jax.tree_util.tree_structure(
        jax.tree.map(jnp.shape, un.init(jax.random.key(0), x[:, :, 0], False)))
    t_fo = jax.tree_util.tree_structure(
        jax.tree.map(jnp.shape, fo.init(jax.random.key(0), _fold(x), False)))
    assert t_un == t_fo


@pytest.mark.parametrize("stride", [1, 2])
def test_maxpool3x3_matches_reduce_window(stride):
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    want = nn.max_pool(x, (3, 3), strides=(stride, stride),
                       padding=((1, 1), (1, 1)))
    got = maxpool3x3(x, stride)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tta_scores_matches_naive():
    from streammos_tpu.models.stream_mos import tta_scores

    rng = np.random.RandomState(6)
    logits = jnp.asarray(rng.randn(2, 100, V, 3).astype(np.float32))
    want = jax.nn.softmax(logits, axis=-1).mean(axis=-2)
    got = tta_scores(logits.reshape(2, 100, V * 3), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
