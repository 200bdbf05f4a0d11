"""Whole-model device-op profile via jax.profiler trace.

Runs the production folded eval forward (TTA x4, 160k pts, T=3) under
`jax.profiler.trace`, then parses the chrome trace's TPU lane and prints
per-fusion device timings sorted by total time. This attributes the frame
budget exactly (the chained-jit timing in bench.py measures the wall total;
this shows where it goes).

Usage: python tools/profile_trace.py [train]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def newest_trace(root):
    paths = glob.glob(os.path.join(root, "plugins/profile/*/*.trace.json.gz"))
    return max(paths, key=os.path.getmtime)


def profile_eval(trace_dir):
    import jax
    import jax.numpy as jnp
    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model, memory_shape
    from streammos_tpu.models.stream_mos import (featurize, stage_forward,
                                                 tta_expand_folded,
                                                 tta_scores)

    cfg = get_config("StreamMOS")
    m = cfg.model
    N = cfg.val.frame_point_num
    TTA, T = 4, m.seq_num
    model, variables = init_model(jax.random.key(0), m, batch=TTA,
                                  num_points=N, tta_fold=True)

    rng = np.random.default_rng(0)
    xyzi = jnp.asarray(rng.uniform(-50, 50, (1, T, N, 4)).astype(np.float32))
    memory = jnp.zeros(memory_shape(m, TTA), jnp.float32)

    @jax.jit
    def frame(variables, xyzi, memory):
        batch = featurize(tta_expand_folded(xyzi), m)
        out, _ = stage_forward(model, variables, batch, memory,
                               jnp.asarray(True), train=False)
        scores = tta_scores(out["pred_folded"], m.class_num)
        return scores.sum(), out["memory"]

    s, memory = frame(variables, xyzi, memory)
    float(s)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            s, memory = frame(variables, xyzi, memory)
            float(s)


def profile_train(trace_dir, B=1):
    import jax
    import jax.numpy as jnp
    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model
    from streammos_tpu.train import build_optimizer
    from streammos_tpu.train.trainer import create_train_state, make_train_step

    cfg = get_config("StreamMOS")
    m = cfg.model
    S, T, N = 3, m.seq_num, cfg.train.frame_point_num
    model, variables = init_model(jax.random.key(0), m, batch=B, num_points=N)
    tx, _ = build_optimizer(cfg.optimize, per_epoch_iters=100)
    state = create_train_state(variables, tx)
    step = make_train_step(model, cfg, tx, donate=False)

    rng = np.random.default_rng(0)
    windows = {
        "xyzi": jnp.asarray(rng.uniform(-50, 50, (S, B, T, N, 4)).astype(np.float32)),
        "targets": jnp.asarray(rng.integers(0, 3, (S, B, N)).astype(np.int32)),
    }
    state, metrics = step(state, windows, jax.random.key(1))
    float(metrics["loss"])
    with jax.profiler.trace(trace_dir):
        state, metrics = step(state, windows, jax.random.key(1))
        float(metrics["loss"])


def report(trace_path, n_iters, top=45):
    with gzip.open(trace_path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    agg = {}
    cats = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.isdigit():
            continue  # whole-executable / module envelopes (double counts)
        d = e.get("dur", 0.0)
        a = agg.setdefault(name, [0.0, 0])
        a[0] += d
        a[1] += 1
        cat = (e.get("args") or {}).get("hlo_category", "?")
        cats[cat] = cats.get(cat, 0.0) + d
        total += d
    print(f"total device time: {total/1e3/n_iters:.2f} ms/iter "
          f"({len(agg)} distinct ops)")
    print("-- by HLO category --")
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        if dur / 1e3 / n_iters >= 0.05:
            print(f"{dur/1e3/n_iters:9.3f} ms  {cat}")
    print("-- top ops --")
    for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{dur/1e3/n_iters:9.3f} ms  x{cnt//n_iters:<3d} {name[:90]}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "eval"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    trace_dir = f"/tmp/smtrace_{mode}{bs if mode == 'train' else ''}"
    n = 1 if mode == "train" else 2
    if mode == "train":
        profile_train(trace_dir, B=bs)
    else:
        profile_eval(trace_dir)
    report(newest_trace(trace_dir), n)
