import numpy as np
import jax
import jax.numpy as jnp

from streammos_tpu.ops import voxel_max_pool, voxel_max_pool_ref


def _case(B=2, N=300, C=5, seed=0, lo=-2.0, hi=10.0):
    rng = np.random.default_rng(seed)
    feat = rng.normal(size=(B, N, C)).astype(np.float32)
    inds = rng.uniform(lo, hi, size=(B, N, 2)).astype(np.float32)
    return feat, inds


def test_forward_matches_reference():
    feat, inds = _case()
    out = np.asarray(voxel_max_pool(jnp.asarray(feat), jnp.asarray(inds), (8, 8), (1.0, 1.0)))
    ref = voxel_max_pool_ref(feat, inds, (8, 8), (1.0, 1.0))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_forward_scale_rate():
    feat, inds = _case(seed=1, hi=16.0)
    out = np.asarray(voxel_max_pool(jnp.asarray(feat), jnp.asarray(inds), (8, 8), (0.5, 0.5)))
    ref = voxel_max_pool_ref(feat, inds, (8, 8), (0.5, 0.5))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_empty_cells_zero_and_negative_max_kept():
    feat = np.array([[[-3.0], [-5.0]]], dtype=np.float32)  # all-negative cell
    inds = np.array([[[0.2, 0.3], [0.5, 0.1]]], dtype=np.float32)
    out = np.asarray(voxel_max_pool(jnp.asarray(feat), jnp.asarray(inds), (2, 2), (1.0, 1.0)))
    assert out[0, 0, 0, 0] == -3.0  # true max, not clamped to 0
    assert out[0, 1, 1, 0] == 0.0  # empty cell


def test_out_of_range_points_dropped():
    feat = np.ones((1, 4, 2), dtype=np.float32)
    inds = np.array([[[-0.5, 0.0], [-1.5, 0.0], [8.0, 0.0], [1.0, 1.0]]],
                    dtype=np.float32)
    out = np.asarray(voxel_max_pool(jnp.asarray(feat), jnp.asarray(inds), (8, 8), (1.0, 1.0)))
    # point 0: the int cast truncates toward zero (CUDA int64(float*scale),
    # point_deep_cuda_kernel.cu:40), so -0.5 -> cell 0 and the point is KEPT;
    # points 1 and 2 are out of range; point 3 lands at (1, 1).
    assert out[0, 0, 0].tolist() == [1.0, 1.0]
    assert out[0, 1, 1].tolist() == [1.0, 1.0]
    assert out.sum() == 4.0
    ref = voxel_max_pool_ref(feat, inds, (8, 8), (1.0, 1.0))
    np.testing.assert_allclose(out, ref)


def test_backward_grad_to_argmax_with_ties():
    # two points in one cell with equal (max) value -> both get the full grad,
    # matching the CUDA value-equality backward (point_deep_cuda_kernel.cu:127)
    feat = jnp.asarray(np.array([[[2.0], [2.0], [1.0]]], dtype=np.float32))
    inds = jnp.asarray(np.array([[[0.1, 0.1], [0.4, 0.2], [0.2, 0.3]]], dtype=np.float32))

    def f(x):
        return voxel_max_pool(x, inds, (2, 2), (1.0, 1.0)).sum()

    g = np.asarray(jax.grad(f)(feat))
    np.testing.assert_allclose(g[0, :, 0], [1.0, 1.0, 0.0])


def test_backward_finite_difference():
    rng = np.random.default_rng(3)
    feat0 = rng.normal(size=(1, 40, 3)).astype(np.float64)
    inds = jnp.asarray(rng.uniform(0, 4, size=(1, 40, 2)))
    cot = rng.normal(size=(1, 4, 4, 3))

    def f(x):
        return (voxel_max_pool(x, inds, (4, 4), (1.0, 1.0)) * cot).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(feat0)))
    # computation runs in float32; keep eps well above float32 roundoff but
    # below typical gaps between per-cell competitors
    eps = 5e-3
    for idx in [(0, 0, 0), (0, 7, 1), (0, 20, 2), (0, 39, 0)]:
        fp = feat0.copy(); fp[idx] += eps
        fm = feat0.copy(); fm[idx] -= eps
        fd = (f(jnp.asarray(fp)) - f(jnp.asarray(fm))) / (2 * eps)
        np.testing.assert_allclose(g[idx], float(fd), atol=1e-2)


def test_jit_and_grad_compile():
    feat, inds = _case(seed=5)
    fn = jax.jit(lambda f, i: voxel_max_pool(f, i, (8, 8), (1.0, 1.0)).sum())
    v1 = fn(jnp.asarray(feat), jnp.asarray(inds))
    gfn = jax.jit(jax.grad(lambda f, i: voxel_max_pool(f, i, (8, 8), (1.0, 1.0)).sum()))
    g = gfn(jnp.asarray(feat), jnp.asarray(inds))
    assert np.isfinite(float(v1))
    assert g.shape == feat.shape


def test_nonneg_fast_path_matches_default():
    # non-negative features: the zero-fill scatter path must agree with the
    # segment_max path and the numpy reference, forward and backward
    rng = np.random.default_rng(7)
    feat = np.abs(rng.normal(size=(2, 400, 5))).astype(np.float32)
    inds = rng.uniform(-2.0, 10.0, size=(2, 400, 2)).astype(np.float32)
    f, i = jnp.asarray(feat), jnp.asarray(inds)
    out_fast = np.asarray(voxel_max_pool(f, i, (8, 8), (1.0, 1.0), "auto", True))
    out_ref = voxel_max_pool_ref(feat, inds, (8, 8), (1.0, 1.0))
    np.testing.assert_allclose(out_fast, out_ref, rtol=1e-6)

    def loss_fast(x):
        return (voxel_max_pool(x, i, (8, 8), (1.0, 1.0), "auto", True) ** 2).sum()

    def loss_def(x):
        return (voxel_max_pool(x, i, (8, 8), (1.0, 1.0)) ** 2).sum()

    g_fast = np.asarray(jax.jit(jax.grad(loss_fast))(f))
    g_def = np.asarray(jax.jit(jax.grad(loss_def))(f))
    np.testing.assert_allclose(g_fast, g_def, rtol=1e-6)


def test_nonneg_all_out_of_range():
    feat = np.ones((1, 8, 3), dtype=np.float32)
    inds = np.full((1, 8, 2), -5.0, dtype=np.float32)
    out = np.asarray(voxel_max_pool(jnp.asarray(feat), jnp.asarray(inds),
                                    (4, 4), (1.0, 1.0), "auto", True))
    assert (out == 0).all()
