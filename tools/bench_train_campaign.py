"""Round-4 train-step measurement campaign (VERDICT r3 task 3): batch and
remat sweep at production shapes in ONE process (shared compile cache), plus
the donate=True/False reconciliation.

    python tools/bench_train_campaign.py [--configs 1,2,3 3r ...]

Each config label is '<bs>' or '<bs>r' (remat). Prints one JSON line per
measurement; paste the table into docs/DESIGN.md.
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
    ap.add_argument("--configs", nargs="+",
                    default=["1", "1d", "2", "3", "3r"],
                    help="'<bs>' = donate, '<bs>d' = no-donate, "
                         "'<bs>r' = donate+remat")
    ap.add_argument("--points", type=int, default=130000)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model
    from streammos_tpu.train import (build_optimizer, create_train_state,
                                     make_train_step)
    from streammos_tpu.utils.profiling import measure_rtt

    cfg = get_config("StreamMOS")
    S, T, N = 3, cfg.model.seq_num, args.points
    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", file=sys.stderr, flush=True)

    for label in args.configs:
        remat = "r" in label
        donate = "d" not in label
        B = int(label.rstrip("rd"))
        try:
            model, variables = init_model(jax.random.key(0), cfg.model,
                                          batch=B, num_points=N)
            tx, _ = build_optimizer(cfg.optimize, per_epoch_iters=100)
            state = create_train_state(variables, tx)
            step = make_train_step(model, cfg, tx, donate=donate, remat=remat)
            windows = {
                "xyzi": jnp.asarray(rng.uniform(
                    -50, 50, size=(S, B, T, N, 4)).astype(np.float32)),
                "targets": jnp.asarray(rng.integers(
                    0, 3, size=(S, B, N)).astype(np.int32)),
            }
            key = jax.random.key(1)
            t0 = time.perf_counter()
            state, metrics = step(state, windows, key)
            float(metrics["loss"])
            compile_s = time.perf_counter() - t0
            # full warmup: the FIRST ~6 executions of a fresh executable run
            # ~50% slow on this backend (measured round 4: 0.448 -> 0.289
            # s/step from batch 0 to 1); one warm call is NOT enough
            for _ in range(6):
                key, sub = jax.random.split(key)
                state, metrics = step(state, windows, sub)
            float(metrics["loss"])
            batches = []
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    key, sub = jax.random.split(key)
                    state, metrics = step(state, windows, sub)
                float(metrics["loss"])
                batches.append((time.perf_counter() - t0 - rtt) / args.iters)
            dt = min(batches)
            print(json.dumps({
                "metric": "train_step_seconds", "bs_per_chip": B,
                "remat": remat, "donate": donate,
                "value": round(dt, 4),
                "samples_per_s_per_chip": round(B / dt, 3),
                "compile_s": round(compile_s, 1),
                "loss": round(float(metrics["loss"]), 3),
            }), flush=True)
            del state, windows, step, model, variables
        except Exception as e:
            print(json.dumps({"metric": "train_step_seconds",
                              "bs_per_chip": B, "remat": remat,
                              "donate": donate,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
