import os

import numpy as np
import pytest

from streammos_tpu.data.copy_paste import (SequenceCutPaste, box_corners_2d,
                                           points_in_quad)


@pytest.fixture()
def obj_bank(tmp_path):
    rng = np.random.default_rng(0)
    cate_dir = tmp_path / "car"
    cate_dir.mkdir()
    # a compact car-like cluster 10 m ahead
    pcds = np.stack([
        rng.uniform(9, 11, 200), rng.uniform(-1, 1, 200),
        rng.uniform(-1.5, -0.5, 200), rng.uniform(0, 1, 200)], axis=-1)
    np.savez(cate_dir / "00_0001.npz", pcds=pcds.astype(np.float32),
             cate="car", cate_id=10, center=np.array([10.0, 0.0, -1.0]),
             size=np.array([2.5, 2.0, 1.2]), yaw=0.0)
    # a seq-08 instance that must be excluded
    np.savez(cate_dir / "08_0002.npz", pcds=pcds.astype(np.float32),
             cate="car", cate_id=10, center=np.array([10.0, 0.0, -1.0]),
             size=np.array([2.5, 2.0, 1.2]), yaw=0.0)
    return str(tmp_path)


def _scene(n=20000, seed=1):
    rng = np.random.default_rng(seed)
    # dense road disc so any rotation finds support
    pts = np.stack([rng.uniform(-30, 30, n), rng.uniform(-30, 30, n),
                    rng.uniform(-1.75, -1.65, n), rng.uniform(0, 1, n)],
                   axis=-1).astype(np.float32)
    labels = np.ones(n, np.int32)
    bf = np.ones(n, np.int32)
    raw = np.full(n, 40, np.int32)  # road
    return pts, labels, bf, raw


def test_bank_excludes_seq08(obj_bank):
    cp = SequenceCutPaste(obj_bank, paste_max_obj_num=5)
    assert len(cp.bank["car"]) == 1
    assert "08_" not in os.path.basename(cp.bank["car"][0])


def test_paste_inserts_consistent_object(obj_bank):
    cp = SequenceCutPaste(obj_bank, paste_max_obj_num=5)
    rng = np.random.default_rng(3)
    frames = [_scene(seed=i) for i in range(5)]
    scans = [f[0] for f in frames]
    labels = [f[1] for f in frames]
    bfs = [f[2] for f in frames]
    raws = [f[3] for f in frames]
    roads = [s[r == 40] for s, r in zip(scans, raws)]

    n_before = [s.shape[0] for s in scans]
    out_scans, out_labels, out_bf = cp(scans, labels, bfs, roads, raws, rng)

    pasted_any = any(s.shape[0] != n for s, n in zip(out_scans, n_before))
    assert pasted_any, "no object was pasted in 5 attempts with a dense road"
    for t in range(5):
        # pasted points: labels in {0,1,2}, movable flag 2, sizes consistent
        assert out_scans[t].shape[0] == out_labels[t].shape[0] == out_bf[t].shape[0]
        new_mask = out_bf[t] == 2
        assert new_mask.sum() > 0
        # the object sits on the road height
        z = out_scans[t][new_mask][:, 2]
        assert z.min() > -1.8 and z.min() < -1.5


def test_motion_label_tracks_velocity(obj_bank):
    cp = SequenceCutPaste(obj_bank, paste_max_obj_num=1)
    # drive many seeds; pasted object displacement across frames must match
    # its motion label: moving labels come with real displacement
    for seed in range(8):
        rng = np.random.default_rng(seed)
        frames = [_scene(seed=i + 10) for i in range(5)]
        scans = [f[0] for f in frames]
        labels = [f[1] for f in frames]
        bfs = [f[2] for f in frames]
        raws = [f[3] for f in frames]
        roads = [s[r == 40] for s, r in zip(scans, raws)]
        out_scans, out_labels, out_bf = cp(scans, labels, bfs, roads, raws, rng)
        m0 = out_bf[0] == 2
        m4 = out_bf[4] == 2
        if m0.sum() == 0:
            continue
        c0 = out_scans[0][m0][:, :2].mean(axis=0)
        c4 = out_scans[4][m4][:, :2].mean(axis=0)
        disp = np.linalg.norm(c4 - c0)  # over 0.4 s
        lab = out_labels[0][m0][0]
        if lab == 2:
            assert disp >= 0.3  # >= 1 m/s * 0.4 s (minus noise)
        elif lab == 1:
            assert disp < 0.2


def test_points_in_quad():
    quad = box_corners_2d((0, 0), (4, 2, 1), 0.0)
    pts = np.array([[0, 0], [1.9, 0.9], [2.1, 0], [0, 1.1], [-1.9, -0.9]])
    np.testing.assert_array_equal(points_in_quad(pts, quad),
                                  [True, True, False, False, True])
