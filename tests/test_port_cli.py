"""End-to-end checkpoint-port user journey (`tools/port_weights.py`):
a reference-format torch checkpoint FILE (what
`/root/reference/train_StreamMOS.py:196-197` saves and the published
pretrained model ships as, README.md:120-123) -> the CLI -> an orbax
checkpoint directory -> `train/checkpoint.load` -> exact agreement with the
in-memory `torch_state_dict_to_flax` port.

This covers the file surfaces the in-memory parity tests skip: torch.save
serialization (incl. the DDP ``module.`` prefix), CLI arg handling,
stage-1/stage-2 auto-detection, and the orbax round-trip that
`tools/val.py --checkpoint` consumes.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax
from streammos_tpu.config import get_config
from streammos_tpu.train import checkpoint as ckpt_lib
from streammos_tpu.train.port_torch import torch_state_dict_to_flax
from tests.torch_ref import load_reference, perturb_state

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO_ROOT, "tools", "port_weights.py")


@pytest.fixture(scope="module")
def torch_ckpt_file(tmp_path_factory):
    """A stage-2 reference checkpoint saved exactly the way the reference
    trainer does: ``torch.save(model.module.state_dict(), path)`` — the
    DDP wrapper means keys may carry a ``module.`` prefix in the wild, so
    we save WITH the prefix to exercise the CLI's removeprefix path."""
    _, StreamMOS_seg, pModel = load_reference()
    torch.manual_seed(11)
    tmodel = StreamMOS_seg.AttNet(pModel)
    perturb_state(tmodel, seed=11)
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    path = tmp_path_factory.mktemp("ckpt") / "10-model.pth"
    torch.save(sd, path)
    return path, {k.removeprefix("module."): v.detach().cpu().numpy()
                  for k, v in sd.items()}


def test_port_cli_roundtrip(torch_ckpt_file, tmp_path):
    pth, sd_np = torch_ckpt_file
    out_dir = tmp_path / "ported"
    res = subprocess.run(
        [sys.executable, TOOLS, "--pth", str(pth), "--out", str(out_dir),
         "--epoch", "10"],
        capture_output=True, text=True, cwd=REPO_ROOT)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "refine=True" in res.stdout  # stage-2 auto-detected

    cfg = get_config("StreamMOS").model
    expect = torch_state_dict_to_flax(sd_np, cfg, with_refine=True)
    loaded = ckpt_lib.restore(str(out_dir), 10,
                              jax.tree.map(np.asarray, expect))

    flat_l = jax.tree_util.tree_leaves_with_path(loaded["params"])
    flat_e = dict(jax.tree_util.tree_leaves_with_path(expect["params"]))
    assert len(flat_l) == len(flat_e)
    for path_k, leaf in flat_l:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_e[path_k]),
                                      err_msg=str(path_k))
    for coll in ("batch_stats",):
        got = dict(jax.tree_util.tree_leaves_with_path(loaded[coll]))
        want = dict(jax.tree_util.tree_leaves_with_path(expect[coll]))
        assert got.keys() == want.keys()
        for k in got:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]),
                                          err_msg=str(k))


def test_port_cli_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.pth"
    torch.save([1, 2, 3], bad)
    res = subprocess.run(
        [sys.executable, TOOLS, "--pth", str(bad), "--out",
         str(tmp_path / "o")],
        capture_output=True, text=True, cwd=REPO_ROOT)
    assert res.returncode != 0
    assert "state_dict" in (res.stderr + res.stdout)


def test_inverse_port_roundtrip(torch_ckpt_file):
    """flax -> torch must invert torch -> flax exactly on every live key
    (the transplant direction the trained-weight drift harness uses)."""
    from streammos_tpu.train.port_torch import flax_to_torch_state_dict

    _, sd_np = torch_ckpt_file
    cfg = get_config("StreamMOS").model
    variables = torch_state_dict_to_flax(sd_np, cfg, with_refine=True)
    back = flax_to_torch_state_dict(variables, cfg, with_refine=True)
    assert set(back).issubset(set(sd_np))
    for k, v in back.items():
        np.testing.assert_array_equal(v, np.asarray(sd_np[k], np.float32),
                                      err_msg=k)
    # every live key round-trips; only dead modules + num_batches_tracked
    # may be absent
    from streammos_tpu.train.port_torch import DEAD_KEY_MARKERS
    left = [k for k in sd_np if k not in back
            and not any(m in k for m in DEAD_KEY_MARKERS)]
    assert not left, left[:8]
