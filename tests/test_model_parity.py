"""Full-model numerical parity against the reference PyTorch network.

Round-1 proved per-kernel parity (scatter, gather, deformable attention,
losses); this test closes the compose-level gap: it transplants a reference
`AttNet` random-init `state_dict` into `StreamMOSNet` via
`streammos_tpu.train.port_torch` and asserts the end-to-end `stage_forward`
logits match (`/root/reference/models/StreamMOS.py:86-113`,
`StreamMOS_seg.py:98-140`) — for the first frame (learned query) AND a
carried-memory streaming step, point head, refine head, all three aux heads,
and the memory itself.

Everything runs at the production geometry (BEV 512x512, RV 64x2048,
query 64x64 — those sizes are hard-coded in the reference's
`CENet_Transformer.forward`, so they cannot be shrunk) with a reduced point
count, in float32, eval mode.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from streammos_tpu.config import get_config
from streammos_tpu.models.stream_mos import StreamMOSNet, memory_shape
from streammos_tpu.train.port_torch import (check_against_template,
                                            torch_state_dict_to_flax)
from tests.torch_ref import load_reference, numpy_state_dict, perturb_state

N_POINTS = 4096
SEED = 7


def _full_cfg():
    cfg = get_config("StreamMOS").model
    return dataclasses.replace(cfg, compute_dtype="float32")


def _random_inputs(rng: np.random.RandomState, n: int):
    """Network-level inputs shared bit-for-bit by both frameworks; ~5% of
    coords land out of range to exercise the scatter/gather masking."""
    points = rng.randn(1, 3, n, 7).astype(np.float32)
    bev_xy = rng.uniform(-6.0, 518.0, size=(1, 3, n, 2)).astype(np.float32)
    bev_z = rng.uniform(0.0, 30.0, size=(1, 3, n, 1)).astype(np.float32)
    bev = np.concatenate([bev_xy, bev_z], axis=-1)
    rv_v = rng.uniform(-1.0, 65.0, size=(1, 3, n, 1)).astype(np.float32)
    rv_h = rng.uniform(-20.0, 2068.0, size=(1, 3, n, 1)).astype(np.float32)
    rv = np.concatenate([rv_v, rv_h], axis=-1)
    return {"points": points, "bev_coord": bev, "rv_coord": rv}


def _to_torch(batch):
    # (B, T, N, C) -> reference (BS, T, C, N, 1); coords get a trailing 1
    pf = torch.from_numpy(np.ascontiguousarray(
        batch["points"].transpose(0, 1, 3, 2)))[..., None]
    pc = torch.from_numpy(batch["bev_coord"])[..., None]
    ps = torch.from_numpy(batch["rv_coord"])[..., None]
    return pf, pc, ps


def _nchw(x: torch.Tensor) -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 1)


def _close(name, ours: jax.Array, ref: np.ndarray, atol=2e-2):
    ours = np.asarray(ours, np.float32)
    scale = max(np.abs(ref).max(), 1e-3)
    diff = np.abs(ours - ref).max()
    assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
    assert diff <= atol * scale, (
        f"{name}: max|diff|={diff:.3e} vs scale {scale:.3e} "
        f"(rel {diff / scale:.3e})")


@pytest.fixture(scope="module")
def reference_run():
    """Build the reference stage-2 AttNet (a strict superset of stage 1 —
    same trunk + pred head, plus the refine branch), run two streaming
    steps, and hand over its state_dict + inputs + outputs as numpy."""
    _, StreamMOS_seg, pModel = load_reference()
    torch.manual_seed(SEED)  # deterministic base init (kaiming_uniform)
    tmodel = StreamMOS_seg.AttNet(pModel)
    perturb_state(tmodel, seed=SEED)
    tmodel.eval()

    rng = np.random.RandomState(SEED)
    step0 = _random_inputs(rng, N_POINTS)
    step1 = _random_inputs(rng, N_POINTS)

    with torch.no_grad():
        pf, pc, ps = _to_torch(step0)
        pred0, bf0, a0_0, a1_0, a2_0, mem = tmodel.stage_forward(
            pf, pc, ps, return_query=True)
        pf, pc, ps = _to_torch(step1)
        pred1, bf1, a0_1, a1_1, a2_1, mem1 = tmodel.stage_forward(
            pf, pc, ps, query_embed_store=mem, use_query_store=True,
            return_query=True)

    def point_logits(t):  # (BS, C, N, 1) -> (BS, N, C)
        return t.detach().numpy()[..., 0].transpose(0, 2, 1)

    return {
        "state_dict": numpy_state_dict(tmodel),
        "steps": (step0, step1),
        "out": [
            {"pred": point_logits(pred0), "bf_pred": point_logits(bf0),
             "aux0": _nchw(a0_0), "aux1": _nchw(a1_0), "aux2": _nchw(a2_0),
             "memory": _nchw(mem)},
            {"pred": point_logits(pred1), "bf_pred": point_logits(bf1),
             "aux0": _nchw(a0_1), "aux1": _nchw(a1_1), "aux2": _nchw(a2_1),
             "memory": _nchw(mem1)},
        ],
    }


def test_full_model_parity_streaming(reference_run):
    cfg = _full_cfg()
    model = StreamMOSNet(cfg, with_refine=True)
    variables = torch_state_dict_to_flax(reference_run["state_dict"], cfg,
                                         with_refine=True)
    variables = jax.tree.map(jnp.asarray, variables)

    @jax.jit
    def run(batch, memory, use_memory):
        return model.apply(variables, batch["points"], batch["bev_coord"],
                           batch["rv_coord"], memory, use_memory, train=False)

    memory = jnp.zeros(memory_shape(cfg, 1), jnp.float32)
    for i, (step, ref) in enumerate(zip(reference_run["steps"],
                                        reference_run["out"])):
        out = run(jax.tree.map(jnp.asarray, step), memory,
                  jnp.asarray(i > 0))
        memory = out["memory"]
        # measured agreement: max|diff| <= 0.9% of the output's peak
        # magnitude (e.g. point logits 8.5e-4 absolute on a 0.11-peak
        # output) — pure f32 op-ordering noise through ~40 BN/conv layers
        # (XLA fused convs + rsqrt BN vs torch). Threshold 2% of peak.
        for key in ("pred", "bf_pred", "aux0", "aux1", "aux2", "memory"):
            _close(f"step{i}:{key}", out[key], ref[key])


def test_stage1_port_strict(reference_run):
    """The stage-1 mapping (no refine branch) must consume every live torch
    key of a stage-1 checkpoint and reproduce the flax template structure —
    `train_StreamMOS_seg.py:165-167` loads stage-1 weights strict=False, so
    a stage-1 state_dict is exactly the seg state_dict minus `refine.*`."""
    cfg = _full_cfg()
    sd = {k: v for k, v in reference_run["state_dict"].items()
          if not k.startswith("refine.")}
    variables = torch_state_dict_to_flax(sd, cfg, with_refine=False)

    model = StreamMOSNet(cfg, with_refine=False)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, 64, 7)), jnp.zeros((1, 3, 64, 3)),
            jnp.zeros((1, 3, 64, 2)), jnp.zeros(memory_shape(cfg, 1)),
            jnp.asarray(False), train=False))
    problems = check_against_template(variables["params"], template["params"])
    problems += check_against_template(variables["batch_stats"],
                                       template["batch_stats"])
    assert not problems, problems[:10]
