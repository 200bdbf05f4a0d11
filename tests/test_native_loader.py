import numpy as np
import pytest

from streammos_tpu import geometry, native
from tests.synthetic_kitti import make_sequence


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_kitti")
    make_sequence(str(root), "00", n_frames=3, n_points=2000)
    return str(root / "00")


def test_native_builds():
    assert native.available(), "native loader failed to build"


def test_load_scan_matches_numpy(seq_dir):
    path = f"{seq_dir}/velodyne/000000.bin"
    a = native.load_scan(path)
    b = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    np.testing.assert_array_equal(a, b)


def test_load_labels_matches_numpy(seq_dir):
    path = f"{seq_dir}/labels/000000.label"
    a = native.load_labels(path)
    b = np.fromfile(path, dtype=np.uint32)
    np.testing.assert_array_equal(a, b)


def test_transform_matches_numpy(seq_dir):
    pts = native.load_scan(f"{seq_dir}/velodyne/000001.bin")
    mat = np.array([[0.9, -0.1, 0, 2.0], [0.1, 0.9, 0, -1.0],
                    [0, 0, 1, 0.5], [0, 0, 0, 1.0]])
    a = native.transform(pts, mat)
    b = geometry.np_transform(pts, mat).astype(np.float32)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5)


def test_filter_matches_numpy(seq_dir):
    pts = native.load_scan(f"{seq_dir}/velodyne/000000.bin")
    lims = (-20, 20, -20, 20, -4, 2)
    kept, mask = native.filter_points(pts, lims)
    ref_mask = geometry.np_filter_mask(pts, (-20, 20), (-20, 20), (-4, 2))
    np.testing.assert_array_equal(mask, ref_mask)
    np.testing.assert_array_equal(kept, pts[ref_mask])


def test_resample_distribution():
    idx = native.resample_indices(1000, 50000, seed=7)
    assert idx.min() >= 0 and idx.max() < 1000
    # roughly uniform: each source index drawn ~50 times
    counts = np.bincount(idx, minlength=1000)
    assert counts.mean() == 50.0
    assert counts.std() < 25
    # deterministic per seed
    np.testing.assert_array_equal(idx, native.resample_indices(1000, 50000, 7))
    assert not np.array_equal(idx, native.resample_indices(1000, 50000, 8))


def test_assemble_eval_frame(seq_dir):
    path = f"{seq_dir}/velodyne/000002.bin"
    mat = np.eye(4)
    lims = (-20, 20, -20, 20, -4, 2)
    frame, n_valid, mask = native.assemble_eval_frame(path, mat, lims, 4096)
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    ref_mask = geometry.np_filter_mask(raw, (-20, 20), (-20, 20), (-4, 2))
    assert n_valid == ref_mask.sum()
    assert mask.shape[0] == raw.shape[0]
    np.testing.assert_array_equal(mask, ref_mask)
    np.testing.assert_allclose(frame[:n_valid], raw[ref_mask], rtol=1e-6)
    assert (frame[n_valid:, 2] == -4000.0).all()
    assert (frame[n_valid:, 0] == -1000.0).all()
