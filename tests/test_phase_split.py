"""Phase-split (space-to-depth) paths: scatter linearization, DownSample2D
decomposition, and phase-space TTA orientation must match their
full-resolution counterparts exactly."""
import numpy as np
import jax
import jax.numpy as jnp

from streammos_tpu.nn.blocks import DownSample2D
from streammos_tpu.ops import voxel_max_pool
from streammos_tpu.ops.tta_fold import orient_grid, orient_grid_phase


def _space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4, C), phase = 2*(x&1)+(y&1)."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4, C)


def test_phase_scatter_matches_space_to_depth():
    rng = np.random.default_rng(0)
    feat = np.abs(rng.normal(size=(2, 500, 5))).astype(np.float32)
    inds = rng.uniform(-2.0, 18.0, size=(2, 500, 2)).astype(np.float32)
    f, i = jnp.asarray(feat), jnp.asarray(inds)
    dense = voxel_max_pool(f, i, (16, 16), (1.0, 1.0), "auto", True)
    phase = voxel_max_pool(f, i, (16, 16), (1.0, 1.0), "auto", True, True)
    np.testing.assert_allclose(np.asarray(phase),
                               np.asarray(_space_to_depth(dense)), rtol=1e-6)
    # gradients agree too
    g_d = jax.grad(lambda x: (voxel_max_pool(
        x, i, (16, 16), (1.0, 1.0), "auto", True) ** 2).sum())(f)
    g_p = jax.grad(lambda x: (voxel_max_pool(
        x, i, (16, 16), (1.0, 1.0), "auto", True, True) ** 2).sum())(f)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_d), rtol=1e-6)


def test_downsample_phase_matches_frame_split():
    rng = np.random.default_rng(1)
    B, T, H, W, C = 2, 3, 16, 16, 4
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(np.float32))
    xp = jnp.stack([_space_to_depth(x[:, t]) for t in range(T)], axis=1)

    mod = DownSample2D(6, stride=2)
    vars_ = mod.init(jax.random.key(0), x, train=False)
    y = mod.apply(vars_, x, train=False, mutable=["batch_stats"])[0]
    yp = mod.apply(vars_, xp, train=False, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y),
                               rtol=2e-5, atol=2e-5)
    # training mode: batch statistics must also agree (same element sets)
    yt, st = mod.apply(vars_, x, train=True, mutable=["batch_stats"])
    ypt, stp = mod.apply(vars_, xp, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ypt), np.asarray(yt),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(stp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_orient_phase_matches_full_res():
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    gp = _space_to_depth(g)
    for v in range(4):
        want = _space_to_depth(orient_grid(g, v, "bev", (1, 2)))
        got = orient_grid_phase(gp, v, (1, 2), 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
