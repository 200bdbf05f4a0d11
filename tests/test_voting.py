import numpy as np

from streammos_tpu.config import VoxelConfig
from streammos_tpu.postprocess import (instance_vote, voxel_vote,
                                       voxel_vote_device)
from streammos_tpu.postprocess.voting import gather_history


def _voxel_case(seed=0, n_local=5000, n_cur=800):
    rng = np.random.default_rng(seed)
    v = VoxelConfig(bev_shape=(64, 64, 16))
    local = np.stack([rng.uniform(-45, 45, n_local),
                      rng.uniform(-45, 45, n_local),
                      rng.uniform(-3.5, 1.5, n_local)], axis=-1)
    local_preds = rng.integers(0, 3, n_local).astype(np.int32)
    cur = local[:n_cur]
    cur_preds = local_preds[:n_cur].copy()
    return v, local, local_preds, cur, cur_preds


def test_voxel_vote_majority():
    v = VoxelConfig(bev_shape=(8, 8, 4))
    # three points in one voxel: votes {2, 2, 1} -> all relabeled 2
    local = np.array([[-49.9, -49.9, -3.9]] * 3)
    local_preds = np.array([2, 2, 1], np.int32)
    cur = local[:1]
    out = voxel_vote(local, local_preds, cur, np.array([1], np.int32), v)
    assert out.tolist() == [2]
    # tie {1, 2} -> torch argmax picks the lower class id (1)
    out2 = voxel_vote(local[:2], np.array([1, 2], np.int32), cur,
                      np.array([2], np.int32), v)
    assert out2.tolist() == [1]


def test_voxel_vote_device_matches_numpy():
    v, local, local_preds, cur, cur_preds = _voxel_case()
    ref = voxel_vote(local, local_preds, cur, cur_preds, v)
    dev = voxel_vote_device(local, local_preds, cur, cur_preds, v,
                            capacity=1 << 13)
    np.testing.assert_array_equal(ref, dev)


def test_instance_vote_relabels_cluster():
    rng = np.random.default_rng(1)
    # a tight cluster of 60 movable points currently labeled static
    cluster = rng.normal(scale=0.05, size=(60, 3)) + np.array([5, 5, 0])
    stray = rng.uniform(-40, 40, size=(100, 3))
    cur_points = np.concatenate([cluster, stray])
    cur_preds = np.ones(160, np.int32)
    cur_bf = np.concatenate([np.full(60, 2), np.ones(100)]).astype(np.int32)
    # local map says the cluster region is dynamic
    local_points = np.concatenate([cluster, stray])
    local_preds = np.concatenate([np.full(60, 2), np.ones(100)]).astype(np.int32)
    out = instance_vote(cur_points, cur_preds, cur_bf, local_points, local_preds)
    assert (out[:60] == 2).all()
    assert (out[60:] == 1).all()


def test_instance_vote_static_majority_keeps_static():
    rng = np.random.default_rng(2)
    cluster = rng.normal(scale=0.05, size=(60, 3)) + np.array([5, 5, 0])
    cur_points = cluster
    cur_preds = np.full(60, 2, np.int32)  # network says moving
    cur_bf = np.full(60, 2, np.int32)
    # local map overwhelmingly static in that region: 2*n_dyn < n_stat
    local_points = np.concatenate([cluster] * 5)
    local_preds = np.ones(300, np.int32)
    out = instance_vote(cur_points, cur_preds, cur_bf, local_points, local_preds)
    assert (out == 1).all()


def test_gather_history():
    assert gather_history(10, 100) == [9, 8, 7, 6, 5, 4, 3, 2]
    assert gather_history(3, 100) == [0, 1, 2, 4, 5, 6, 7]
    assert gather_history(0, 100) == [1, 2, 3, 4, 5, 6, 7]
    # a 1-frame sequence has no history at all
    assert gather_history(0, 1) == []


def test_voting_cli_single_frame_sequence(tmp_path):
    """The CLI's per-frame worker must fall back to current-frame-only voting
    when gather_history returns no ids (ADVICE r4: np.concatenate([]) raised)."""
    import sys
    sys.path.insert(0, "tools")
    import voting as voting_cli

    from streammos_tpu.data import semantic_kitti as sk

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "velodyne"
    pred_dir = tmp_path / "predictions"
    save_dir = tmp_path / "refined"
    data_dir.mkdir()
    pred_dir.mkdir()
    pts = np.concatenate([rng.uniform(-40, 40, (500, 2)),
                          rng.uniform(-3.5, 1.5, (500, 1)),
                          rng.uniform(0, 1, (500, 1))], axis=1).astype(np.float32)
    pts.tofile(data_dir / "000000.bin")
    inv_lut = sk.label_lut(sk.LEARNING_MAP_INV)
    pred = rng.integers(0, 3, 500)
    inv_lut[pred].astype(np.uint32).tofile(pred_dir / "000000.label")

    task = (str(data_dir), str(pred_dir), None, str(save_dir), ["000000"], 0,
            [np.eye(4)], VoxelConfig(bev_shape=(64, 64, 16)), False, False)
    assert voting_cli.process_frame(task) == "000000"
    out = np.fromfile(save_dir / "000000.label", dtype=np.uint32)
    assert out.shape == (500,)


def test_voting_cli_defaults():
    """'auto' resolves to the measured numpy default (BENCH_r04: device vote
    loses per frame even before H2D) and test-split seq dirs are zero-padded
    like the val path (data/dataset.py)."""
    import sys
    sys.path.insert(0, "tools")
    import voting as voting_cli

    assert voting_cli.resolve_vote_backend("auto") is False
    assert voting_cli.resolve_vote_backend("numpy") is False
    assert voting_cli.resolve_vote_backend("device") is True
    assert voting_cli.split_sequences("val") == ["08"]
    assert voting_cli.split_sequences("test") == [
        "11", "12", "13", "14", "15", "16", "17", "18", "19", "20", "21"]
