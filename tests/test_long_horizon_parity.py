"""Long-horizon streaming parity vs the reference network, in PRODUCTION
bf16 compute.

`tests/test_model_parity.py` proves f32 logits parity for the first frame
plus one carried-memory step. Streaming eval, however, runs *thousands* of
frames with the memory recurrence in the loop
(`/root/reference/networks/multi_view_encoder.py:433-439` — the fused 1/8
features become the next frame's deformable-attention queries;
`val_StreamMOS.py:85,95`), and the production TPU path computes in bfloat16.
This test bounds bf16 implementation drift over a long horizon: it runs the
transplanted torch reference (f32, CPU ground truth) and the TPU build
(production `compute_dtype=bfloat16`) side-by-side over 50 synthetic
streaming frames, threading each framework's own memory, and records
per-frame argmax agreement and memory drift.

Input stream: a slowly-moving random walk over the coordinate space (frames
are correlated like a real drive, so the recurrence sees realistic
frame-to-frame feature overlap), ~5% of coords out of range.

Measured curve (2026-08-21, JAX side on the real v5e chip, 50 frames,
N=4096, random perturbed weights — the conservative probe: random logits
cluster near the decision boundary, so any drift shows up as argmax flips):
argmax agreement **1.0000 at every frame** (4096/4096 points); memory
rel-delta rises 0.0047 -> 0.0060 by frame ~10 and stays flat to frame 49 —
the recurrence is contractive w.r.t. bf16 noise. Full table in
docs/DESIGN.md "Long-horizon bf16 streaming parity". The assertion bounds
below keep ~100x margin under that measurement.
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
from streammos_tpu.train.port_torch import torch_state_dict_to_flax
from tests.torch_ref import load_reference, numpy_state_dict, perturb_state

N_POINTS = 4096
SEED = 11


class _StreamInputs:
    """Correlated synthetic stream: coordinates random-walk frame to frame."""

    def __init__(self, seed: int, n: int):
        self.rng = np.random.RandomState(seed)
        self.n = n
        r = self.rng
        self.bev = np.stack([r.uniform(-6.0, 518.0, (1, 3, n)),
                             r.uniform(-6.0, 518.0, (1, 3, n)),
                             r.uniform(0.0, 30.0, (1, 3, n))],
                            axis=-1).astype(np.float32)
        self.rv = np.stack([r.uniform(-1.0, 65.0, (1, 3, n)),
                            r.uniform(-20.0, 2068.0, (1, 3, n))],
                           axis=-1).astype(np.float32)
        self.points = r.randn(1, 3, n, 7).astype(np.float32)

    def step(self):
        r = self.rng
        # ego-motion-like drift: every coord walks a little; features too
        self.bev += r.randn(*self.bev.shape).astype(np.float32) * 1.5
        self.bev[..., :2] = (self.bev[..., :2] + 6.0) % 524.0 - 6.0
        self.bev[..., 2] = self.bev[..., 2] % 30.0
        self.rv[..., 0] = (self.rv[..., 0] + r.randn(1, 3, self.n) * 0.8 + 1.0
                           ) % 66.0 - 1.0
        self.rv[..., 1] = (self.rv[..., 1] + r.randn(1, 3, self.n) * 8.0 + 20.0
                           ) % 2088.0 - 20.0
        self.points = (0.95 * self.points
                       + 0.05 * r.randn(1, 3, self.n, 7)).astype(np.float32)
        return {"points": self.points.copy(),
                "bev_coord": self.bev.astype(np.float32).copy(),
                "rv_coord": self.rv.astype(np.float32).copy()}


def _train_production_weights(cfg, steps: int = 60, n_points: int = 2048):
    """Briefly train the PRODUCTION model on a synthetic stream so the drift
    harness can run on trained-distribution weights (VERDICT r4 task 5:
    random weights produce unrealistically diffuse features; training
    concentrates activations and exercises different numeric ranges).

    Single-window point-CE SGD (not the full 3-window BPTT step — a third
    of the graph, which matters because this compiles on the CPU test
    backend); weight realism, not recipe parity, is what the drift probe
    needs. Returns a float32 variables tree {params, batch_stats}."""
    import optax

    from streammos_tpu.losses import cross_entropy_per_element
    from streammos_tpu.models import init_model
    from streammos_tpu.models.stream_mos import featurize, memory_shape

    model, variables = init_model(jax.random.key(SEED), cfg, batch=1,
                                  num_points=n_points)
    tx = optax.sgd(0.02, momentum=0.9, nesterov=True)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    memory = jnp.zeros(memory_shape(cfg, 1), jnp.float32)

    @jax.jit
    def step(params, stats, opt_state, xyzi, targets):
        batch = featurize(xyzi, cfg)

        def loss_fn(p):
            out, new_vars = model.apply(
                {"params": p, "batch_stats": stats},
                batch["points"], batch["bev_coord"], batch["rv_coord"],
                memory, jnp.asarray(False), train=True,
                rngs={"dropout": jax.random.key(0)},
                mutable=["batch_stats"])
            return (cross_entropy_per_element(out["pred"], targets).mean(),
                    new_vars["batch_stats"])

        (_, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt

    rng = np.random.RandomState(SEED)
    for _ in range(steps):
        xyz = rng.uniform(-45, 45, (1, 3, n_points, 3)).astype(np.float32)
        xyz[..., 2] = rng.uniform(-3.5, 1.5, xyz.shape[:-1])
        inten = rng.uniform(0, 1, (1, 3, n_points, 1)).astype(np.float32)
        moving = rng.uniform(0, 1, (1, n_points)) < 0.15
        targets = np.where(moving, 2, 1).astype(np.int32)
        targets[rng.uniform(0, 1, targets.shape) < 0.1] = 0
        params, stats, opt_state = step(
            params, stats, opt_state,
            jnp.asarray(np.concatenate([xyz, inten], -1)),
            jnp.asarray(targets))
    return {"params": jax.device_get(params),
            "batch_stats": jax.device_get(stats)}


def run_long_horizon(frames: int = 50, n_points: int = N_POINTS,
                     verbose: bool = False, weights: str = "random"):
    """Returns per-frame dicts: argmax agreement on the point head, relative
    memory delta ||m_jax - m_torch|| / ||m_torch||, and logit peak.

    weights="random": perturbed-init reference weights ported torch->flax
    (the conservative probe — logits cluster near the decision boundary).
    weights="trained": OUR briefly-trained production weights transplanted
    flax->torch (`port_torch.flax_to_torch_state_dict`), so both frameworks
    run the same trained-distribution parameters."""
    _, StreamMOS_seg, pModel = load_reference()
    torch.manual_seed(SEED)
    tmodel = StreamMOS_seg.AttNet(pModel)
    perturb_state(tmodel, seed=SEED)
    tmodel.eval()

    cfg = get_config("StreamMOS").model  # production bf16 compute
    assert cfg.compute_dtype == "bfloat16"
    model = StreamMOSNet(cfg, with_refine=True)
    if weights == "trained":
        from streammos_tpu.train.port_torch import flax_to_torch_state_dict

        trained = _train_production_weights(cfg)
        # the trunk is shared; the torch model's refine branch keeps its
        # init (stage-2 trains only refine — the drift probe reads the
        # trunk's point head, so transplant the trunk exactly)
        sd = flax_to_torch_state_dict(trained, cfg, with_refine=False)
        missing, unexpected = tmodel.load_state_dict(
            {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
        assert not unexpected, unexpected[:5]
        variables = {"params": trained["params"],
                     "batch_stats": trained["batch_stats"]}
        # re-attach the refine branch params the flax side still needs
        # (stage-1 training doesn't create them; take the torch model's)
        ref_vars = torch_state_dict_to_flax(numpy_state_dict(tmodel), cfg,
                                            with_refine=True)
        variables["params"]["refine"] = ref_vars["params"]["refine"]
        if "refine" in ref_vars["batch_stats"]:
            variables["batch_stats"]["refine"] = \
                ref_vars["batch_stats"]["refine"]
    else:
        variables = torch_state_dict_to_flax(numpy_state_dict(tmodel), cfg,
                                             with_refine=True)
    variables = jax.tree.map(jnp.asarray, variables)

    @jax.jit
    def jrun(batch, memory, use_memory):
        return model.apply(variables, batch["points"], batch["bev_coord"],
                           batch["rv_coord"], memory, use_memory, train=False)

    stream = _StreamInputs(SEED, n_points)
    jmem = jnp.zeros(memory_shape(cfg, 1), jnp.float32)
    tmem = None
    curve = []
    for i in range(frames):
        batch = stream.step()
        pf = torch.from_numpy(np.ascontiguousarray(
            batch["points"].transpose(0, 1, 3, 2)))[..., None]
        pc = torch.from_numpy(batch["bev_coord"])[..., None]
        ps = torch.from_numpy(batch["rv_coord"])[..., None]
        with torch.no_grad():
            tpred, _, _, _, _, tmem = tmodel.stage_forward(
                pf, pc, ps, query_embed_store=tmem, use_query_store=i > 0,
                return_query=True)
        out = jrun(jax.tree.map(jnp.asarray, batch), jmem, jnp.asarray(i > 0))
        jmem = out["memory"]

        t_logits = tpred.detach().numpy()[..., 0].transpose(0, 2, 1)[0]
        j_logits = np.asarray(out["pred"], np.float32)[0]
        agree = float((t_logits.argmax(-1) == j_logits.argmax(-1)).mean())
        t_m = tmem.detach().numpy().transpose(0, 2, 3, 1)
        j_m = np.asarray(jmem, np.float32)
        rel = float(np.linalg.norm(j_m - t_m) / max(np.linalg.norm(t_m), 1e-9))
        curve.append({"frame": i, "argmax_agreement": agree,
                      "memory_rel_delta": rel,
                      "logit_peak": float(np.abs(t_logits).max())})
        if verbose:
            print(f"frame {i:3d}: agree {agree:.4f}  mem_rel {rel:.4f}",
                  flush=True)
    return curve


@pytest.mark.slow
@pytest.mark.parametrize("weights", ["random", "trained"])
def test_bf16_streaming_drift_50_frames(weights):
    frames = 50 if weights == "random" else 30  # trained adds a train phase
    curve = run_long_horizon(frames=frames, weights=weights)
    last = curve[-1]
    tail = curve[-10:]
    # Stated bounds (see module docstring): agreement must hold >= 95% at
    # frame 50 and on every one of the last 10 frames; the memory recurrence
    # must not amplify bf16 noise (relative delta stays below 10% and does
    # not trend upward: the mean of the last 10 deltas stays within 2x the
    # mean of frames 5-15).
    assert last["argmax_agreement"] >= 0.95, last
    assert min(f["argmax_agreement"] for f in tail) >= 0.95, tail
    assert max(f["memory_rel_delta"] for f in tail) <= 0.10, tail
    early = np.mean([f["memory_rel_delta"] for f in curve[5:15]])
    late = np.mean([f["memory_rel_delta"] for f in tail])
    assert late <= 2.0 * max(early, 1e-6), (early, late)


if __name__ == "__main__":
    import json
    import sys

    w = sys.argv[1] if len(sys.argv) > 1 else "random"
    curve = run_long_horizon(frames=50, verbose=True, weights=w)
    print(json.dumps(curve))
