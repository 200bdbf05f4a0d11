"""Training-step benchmark at production shapes on the current devices.

Measures the full jitted stage-1 training step (3-window streaming BPTT,
OHEM + Lovasz losses, SGD-nesterov update) with the chained-timing pattern
(see bench.py notes on this environment's RPC-tunneled TPU).

    python tools/bench_train.py [--batch 3] [--points 130000] [--remat]

Prints one JSON line with seconds/step and samples/s; on N-device meshes the
batch is sharded so the number also reflects data-parallel scaling.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3, help="per-device batch")
    ap.add_argument("--points", type=int, default=130000)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    backend = os.environ.get("STREAMMOS_BACKEND")
    if backend:
        jax.config.update("jax_platforms", backend)
    import jax.numpy as jnp
    from streammos_tpu import parallel
    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model
    from streammos_tpu.train import build_optimizer, create_train_state, \
        make_train_step
    from streammos_tpu.utils.profiling import measure_rtt

    cfg = get_config("StreamMOS")
    n_dev = len(jax.devices())
    B = args.batch * n_dev
    S, T, N = 3, cfg.model.seq_num, args.points

    model, variables = init_model(jax.random.key(0), cfg.model, batch=B,
                                  num_points=N)
    tx, _ = build_optimizer(cfg.optimize, per_epoch_iters=100)
    state = create_train_state(variables, tx)
    step = make_train_step(model, cfg, tx, donate=False, remat=args.remat)

    mesh = parallel.data_mesh()
    state = parallel.replicate_state(mesh, state)

    rng = np.random.default_rng(0)
    windows = parallel.shard_batch(mesh, {
        "xyzi": jnp.asarray(
            rng.uniform(-50, 50, size=(S, B, T, N, 4)).astype(np.float32)),
        "targets": jnp.asarray(rng.integers(0, 3, size=(S, B, N)).astype(np.int32)),
    }, axis=1)

    key = jax.random.key(1)
    state, metrics = step(state, windows, key)
    float(metrics["loss"])  # force

    rtt = measure_rtt()
    t0 = time.perf_counter()
    for i in range(args.iters):
        key, sub = jax.random.split(key)
        state, metrics = step(state, windows, sub)
    loss = float(metrics["loss"])  # chain through the state; forces all steps
    dt = (time.perf_counter() - t0 - rtt) / args.iters

    print(json.dumps({
        "metric": "train_step_seconds",
        "value": round(dt, 4),
        "unit": f"s/step (global bs {B}, {N} pts, 3-window BPTT, "
                f"{n_dev} devices{', remat' if args.remat else ''})",
        "samples_per_s": round(B / dt, 3),
        "loss": round(loss, 4),
    }))


if __name__ == "__main__":
    main()
