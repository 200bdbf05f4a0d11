"""Tests for the capability-parity components that the shipped reference
configs don't exercise: attention block variants (backbone.py:105-185),
CylinderQuantize (datasets/utils.py:195-212), TSEnsemble EMA
(utils/builder.py:66-110), and box/hull helpers (utils/box_utils.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from streammos_tpu import geometry
from streammos_tpu.nn.blocks import BasicBlockV2, CSAtt, SpatialAtt
from streammos_tpu.train import TSEnsemble
from streammos_tpu.utils import boxes


def test_spatial_csatt_blockv2_shapes():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 8)),
                    jnp.float32)
    for mod in (SpatialAtt(), CSAtt(8), BasicBlockV2(8)):
        vars_ = mod.init(jax.random.key(0), x, train=False)
        y = mod.apply(vars_, x, train=False,
                      mutable=["batch_stats"])[0]
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


def test_spatial_att_is_a_gate():
    # sigmoid gate: |out| <= |in| elementwise for a positive map... the gate
    # is in (0, 1), so out/in per pixel stays within (0, 1) where in != 0.
    x = jnp.ones((1, 4, 4, 8), jnp.float32)
    mod = SpatialAtt()
    vars_ = mod.init(jax.random.key(1), x, train=False)
    y = np.asarray(mod.apply(vars_, x, train=False, mutable=["batch_stats"])[0])
    assert (y > 0).all() and (y < 1).all()


def test_cylinder_quantize_formula():
    pts = np.random.default_rng(2).uniform(-40, 40, (300, 4)).astype(np.float32)
    phi_range, range_z, size = (-180.0, 180.0), (-3.0, 5.0), (64, 2048)
    q = geometry.np_cylinder_quantize(pts, phi_range, range_z, size)
    # golden formula from the reference (utils.py:195-212)
    H, W = size
    phi_hi = np.pi
    dphi = 2 * np.pi / W
    dz = (range_z[1] - range_z[0]) / H
    np.testing.assert_allclose(
        q[:, 1], (phi_hi - np.arctan2(pts[:, 0], pts[:, 1])) / dphi, rtol=1e-5)
    np.testing.assert_allclose(q[:, 0], (pts[:, 2] - range_z[0]) / dz, rtol=1e-5)
    qj = np.asarray(geometry.cylinder_quantize(jnp.asarray(pts), phi_range,
                                               range_z, size))
    np.testing.assert_allclose(qj, q, rtol=1e-4, atol=1e-4)


def test_ts_ensemble_ema():
    v0 = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2,))}}
    ens = TSEnsemble(v0, alpha=0.9)
    v1 = {"a": jnp.full((3,), 2.0), "b": {"c": jnp.ones((2,))}}
    mean = ens.update(v1)
    np.testing.assert_allclose(np.asarray(mean["a"]), 1.0 * 0.9 + 2.0 * 0.1)
    np.testing.assert_allclose(np.asarray(mean["b"]["c"]), 0.1)
    # repeated update converges toward the new variables
    for _ in range(200):
        mean = ens.update(v1)
    np.testing.assert_allclose(np.asarray(mean["a"]), 2.0, atol=1e-4)


def test_boxes_corners_and_hull():
    box = np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 2.0, 0.0]], np.float32)
    corners = boxes.boxes_to_corners_3d(box)
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners[0].min(0), [-1.0, 1.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(corners[0].max(0), [3.0, 3.0, 1.0], atol=1e-5)
    # yaw 90deg swaps the footprint extents
    box_r = box.copy()
    box_r[0, 6] = np.pi / 2
    cr = boxes.boxes_to_corners_3d(box_r)
    np.testing.assert_allclose(cr[0].min(0), [0.0, 0.0, -1.0], atol=1e-5)
    # hull membership
    inside = boxes.in_hull(np.array([[1.0, 2.0, 0.0], [10.0, 0.0, 0.0]]),
                           corners[0])
    assert inside.tolist() == [True, False]
    # degenerate hull -> all-False, no raise
    flat = np.zeros((4, 3), np.float32)
    assert not boxes.in_hull(np.array([[0.0, 0.0, 0.0]]), flat).any()


def test_box_wireframe_shapes():
    b = np.array([[0, 0, 0, 1, 1, 1, 0.3], [5, 5, 0, 2, 1, 1, 0.0]],
                 np.float32)
    verts, edges = boxes.box_wireframe(b)
    assert verts.shape == (16, 3) and edges.shape == (24, 2)
    assert edges.max() == 15
