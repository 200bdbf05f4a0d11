"""Tests for the capability-parity components that the shipped reference
configs don't exercise: attention block variants (backbone.py:105-185),
CylinderQuantize (datasets/utils.py:195-212), TSEnsemble EMA
(utils/builder.py:66-110), and box/hull helpers (utils/box_utils.py)."""
import os

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


def test_carry_across_sequences_switch(tmp_path, monkeypatch):
    """`stream_eval(carry_across_sequences=...)` controls the memory reset at
    sequence boundaries: default resets per sequence; True reproduces the
    reference's whole-loader carry (test_StreamMOS.py:66-71)."""
    import dataclasses
    import logging

    from synthetic_kitti import make_sequence

    from streammos_tpu.config import get_config
    from streammos_tpu.data.dataset import EvalDataset
    from streammos_tpu.train import evaluate as ev
    from streammos_tpu.train import trainer as trainer_mod

    # 4+ frames per sequence: the edge-frame forward mirror
    # (_history_ids) needs total >= 2*seq_num - 2
    make_sequence(str(tmp_path), "00", n_frames=4, n_points=900)
    make_sequence(str(tmp_path), "01", n_frames=4, n_points=900)
    cfg = get_config("StreamMOS_tiny")
    dcfg = dataclasses.replace(cfg.val, seq_dir=str(tmp_path))

    use_memory_flags = []

    def fake_make_eval_step(model, cfg_, with_refine):
        def step(variables, batch, memory, use_memory):
            use_memory_flags.append(bool(use_memory))
            return (jnp.zeros((1, dcfg.frame_point_num, 3), jnp.float32),
                    None, memory)
        return step

    monkeypatch.setattr(trainer_mod, "make_eval_step", fake_make_eval_step)
    logger = logging.getLogger("test_carry")

    for carry, expected in (
            (False, [False, True, True, True] * 2),
            (True, [False] + [True] * 7)):
        ds = EvalDataset(dcfg, split="valid", with_labels=True,
                         seq_ids=[0, 1])
        assert len(ds) == 8
        use_memory_flags.clear()
        ev.stream_eval(cfg, dcfg, None, {}, with_refine=False,
                       with_labels=True, logger=logger, dataset=ds,
                       carry_across_sequences=carry)
        assert use_memory_flags == expected, (carry, use_memory_flags)


def test_voting_cli_device_dispatch(tmp_path, monkeypatch):
    """tools/voting.py's worker picks `voxel_vote_device` when use_device is
    set (VERDICT r3: the CLI previously never touched the device path)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import voting as voting_cli

    calls = {}

    def fake_device_vote(lp, lpred, cp, cpred, voxel, *a, **k):
        calls["device"] = True
        from streammos_tpu.postprocess.voting import voxel_vote
        return voxel_vote(lp, lpred, cp, cpred, voxel)

    monkeypatch.setattr(voting_cli, "voxel_vote_device", fake_device_vote)

    # build a 3-frame sequence with saved predictions
    from synthetic_kitti import make_sequence

    from streammos_tpu.config import get_config
    from streammos_tpu.data import semantic_kitti as sk

    make_sequence(str(tmp_path), "00", n_frames=3, n_points=2000)
    data_dir = os.path.join(str(tmp_path), "00", "velodyne")
    pred_dir = os.path.join(str(tmp_path), "pred")
    save_dir = os.path.join(str(tmp_path), "refined")
    os.makedirs(pred_dir, exist_ok=True)
    inv_lut = sk.label_lut(sk.LEARNING_MAP_INV)
    rng = np.random.default_rng(0)
    fids = sorted(f.split(".")[0] for f in os.listdir(data_dir))
    for fid in fids:
        pts = np.fromfile(os.path.join(data_dir, fid + ".bin"),
                          dtype=np.float32).reshape(-1, 4)
        pred = rng.integers(1, 3, pts.shape[0]).astype(np.int64)
        inv_lut[pred].astype(np.uint32).tofile(
            os.path.join(pred_dir, fid + ".label"))

    cfg = get_config("StreamMOS_tiny")
    poses = [np.eye(4) for _ in fids]
    task = (data_dir, pred_dir, None, save_dir, fids, 1, poses,
            cfg.model.voxel, False, True)
    voting_cli.process_frame(task)
    assert calls.get("device")
    assert os.path.exists(os.path.join(save_dir, fids[1] + ".label"))
