import numpy as np
import jax.numpy as jnp

from streammos_tpu import geometry
from streammos_tpu.config import VoxelConfig


def _rand_points(n=500, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-60, 60, size=(n, 3)).astype(np.float32)
    i = rng.uniform(0, 1, size=(n, 1)).astype(np.float32)
    return np.concatenate([xyz, i], axis=-1)


def test_quantize_formula():
    v = VoxelConfig()
    pts = _rand_points()
    q = geometry.np_quantize(pts, v.range_x, v.range_y, v.range_z, v.bev_shape)
    # golden formula: (x - xmin) / dx
    dx = (v.range_x[1] - v.range_x[0]) / v.bev_shape[0]
    np.testing.assert_allclose(q[:, 0], (pts[:, 0] - v.range_x[0]) / dx, rtol=1e-6)
    # device version matches host version
    qj = np.asarray(geometry.quantize(jnp.asarray(pts), v.range_x, v.range_y,
                                      v.range_z, v.bev_shape))
    np.testing.assert_allclose(qj, q, rtol=1e-5, atol=1e-4)


def test_sphere_quantize_contract():
    v = VoxelConfig()
    pts = _rand_points(seed=1)
    s = geometry.np_sphere_quantize(pts, (-180.0, 180.0), v.rv_theta, v.rv_shape)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    d = np.sqrt(x * x + y * y + z * z) + 1e-12
    th_hi = v.rv_theta[1] * np.pi / 180.0
    th_lo = v.rv_theta[0] * np.pi / 180.0
    dtheta = (th_hi - th_lo) / v.rv_shape[0]
    np.testing.assert_allclose(s[:, 0], (th_hi - np.arcsin(z / d)) / dtheta, rtol=1e-5)
    # phi covers [0, W) for points below the horizon inside theta range
    dphi = 2 * np.pi / v.rv_shape[1]
    np.testing.assert_allclose(
        s[:, 1], (np.pi - np.arctan2(x, y)) / dphi, rtol=1e-5)
    sj = np.asarray(geometry.sphere_quantize(jnp.asarray(pts), (-180.0, 180.0),
                                             v.rv_theta, v.rv_shape))
    np.testing.assert_allclose(sj, s, rtol=1e-4, atol=1e-3)


def test_make_point_feat_channels():
    v = VoxelConfig()
    pts = _rand_points(seed=2)
    q = geometry.np_quantize(pts, v.range_x, v.range_y, v.range_z, v.bev_shape)
    f = geometry.np_make_point_feat(pts, q)
    assert f.shape == (pts.shape[0], 7)
    np.testing.assert_allclose(f[:, :4], pts[:, :4], rtol=1e-6)
    np.testing.assert_allclose(
        f[:, 4], np.sqrt((pts[:, :3] ** 2).sum(-1)) + 1e-12, rtol=1e-6)
    np.testing.assert_allclose(f[:, 5], q[:, 0] - np.floor(q[:, 0]), atol=1e-6)
    np.testing.assert_allclose(f[:, 6], q[:, 1] - np.floor(q[:, 1]), atol=1e-6)


def test_transform_rigid():
    pts = _rand_points(seed=3)
    theta = 0.3
    mat = np.array([
        [np.cos(theta), -np.sin(theta), 0, 1.0],
        [np.sin(theta), np.cos(theta), 0, -2.0],
        [0, 0, 1, 0.5],
        [0, 0, 0, 1],
    ])
    out = geometry.np_transform(pts, mat)
    expect = pts[:, :3] @ mat[:3, :3].T + mat[:3, 3]
    np.testing.assert_allclose(out[:, :3], expect, rtol=1e-5)
    np.testing.assert_allclose(out[:, 3], pts[:, 3])  # intensity untouched


def test_filter_mask_min_inclusive_max_exclusive():
    pts = np.array([[-50.0, 0, 0, 0], [50.0, 0, 0, 0], [49.99, 0, 0, 0],
                    [0, 0, -4.0, 0], [0, 0, 2.0, 0]], dtype=np.float32)
    m = geometry.np_filter_mask(pts, (-50, 50), (-50, 50), (-4, 2))
    np.testing.assert_array_equal(m, [True, False, True, True, False])


def test_parse_calibration_and_poses(tmp_path):
    calib_file = tmp_path / "calib.txt"
    calib_file.write_text(
        "P0: 1 0 0 0 0 1 0 0 0 0 1 0\n"
        "Tr: 0 -1 0 0.5 1 0 0 0 0 0 1 -0.1\n")
    poses_file = tmp_path / "poses.txt"
    poses_file.write_text("1 0 0 2 0 1 0 0 0 0 1 0\n")
    calib = geometry.parse_calibration(str(calib_file))
    assert calib["Tr"].shape == (4, 4)
    poses = geometry.parse_poses(str(poses_file), calib)
    assert len(poses) == 1
    Tr = calib["Tr"]
    raw = np.eye(4)
    raw[0, 3] = 2
    np.testing.assert_allclose(poses[0], np.linalg.inv(Tr) @ raw @ Tr, atol=1e-12)
