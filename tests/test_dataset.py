import dataclasses
import numpy as np
import pytest

from streammos_tpu.config import get_config
from streammos_tpu.data.dataset import EvalDataset, TrainDataset
from streammos_tpu.data import semantic_kitti as sk
from tests.synthetic_kitti import make_sequence


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    make_sequence(str(root), "00", n_frames=8)
    return str(root)


def _train_cfg(root, n=2048):
    cfg = get_config("StreamMOS_tiny").train
    return dataclasses.replace(cfg, seq_dir=root, frame_point_num=n,
                               drop_few_static_frames=False)


def test_label_maps():
    assert sk.LEARNING_MAP[252] == 2  # moving car -> moving
    assert sk.LEARNING_MAP[10] == 1  # parked car -> static
    assert sk.LEARNING_MAP[40] == 1  # road -> static
    assert sk.BF_LEARNING_MAP[10] == 2  # parked car -> movable
    assert sk.BF_LEARNING_MAP[40] == 1  # road -> background
    assert sk.LEARNING_MAP_INV == {0: 0, 1: 9, 2: 251}
    lab = np.array([0, 40, 252, 10])
    np.testing.assert_array_equal(sk.relabel(lab, sk.LEARNING_MAP),
                                  [0, 1, 2, 1])


def test_train_dataset_shapes(kitti_root):
    ds = TrainDataset(_train_cfg(kitti_root), seq_ids=[0])
    assert len(ds) == 8
    s = ds[4]
    assert s["xyzi"].shape == (3, 3, 2048, 4)
    assert s["targets"].shape == (3, 2048)
    assert s["xyzi"].dtype == np.float32
    # labels contain moving points (the synthetic car)
    assert (s["targets"] == 2).sum() > 0
    assert (s["targets"] == 1).sum() > 0
    batch = TrainDataset.collate([ds[4], ds[5]])
    assert batch["xyzi"].shape == (3, 2, 3, 2048, 4)


def test_train_windows_alignment(kitti_root):
    """Static structure must land at the same place in every frame of a
    window after ego-motion alignment."""
    ds = TrainDataset(_train_cfg(kitti_root), seq_ids=[0])
    s = ds[5]
    for w in range(3):
        pts = s["xyzi"][w]
        # building occupies a fixed world-x range; frames are ego-aligned so
        # per-frame max x of building-height points should agree closely
        highs = [pts[t][pts[t, :, 2] > 0.5, 0] for t in range(3)]
        mx = [h.max() for h in highs if len(h)]
        assert max(mx) - min(mx) < 1.0


def test_eval_dataset_padding(kitti_root):
    cfg = _train_cfg(kitti_root, n=4096)
    ds = EvalDataset(cfg, seq_ids=[0])
    s = ds[3]
    assert s["xyzi"].shape == (3, 4096, 4)
    n_valid = 4096 - s["pad_length"]
    assert n_valid == int(np.asarray(s["valid_mask"]).sum())
    # sentinel pads are far out of range
    assert (s["xyzi"][0, n_valid:, 2] == -4000).all()
    assert s["targets"][n_valid:].sum() == 0
    assert s["seq_id"] == "00" and s["file_id"] == "000003"
