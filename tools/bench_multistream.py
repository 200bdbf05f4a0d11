"""Multi-stream serving throughput: frames/s at Bt parallel streams/chip.

The folded eval graph batches independent streams on the dense batch axis
(V-major: variant v of stream b sits at row v*Bt + b), each stream keeping
its own memory slot — the serving-side counterpart of the reference's
rank-parallel eval (`/root/reference/val_StreamMOS.py:205`). Correctness is
pinned by `tests/test_model.py::test_multi_stream_eval_matches_independent_streams`;
this measures where batching saturates the chip.

    python tools/bench_multistream.py [--streams 1 2 4] [--frames 8]

Prints one JSON line per Bt with frames/s (= Bt * steps/s) per chip.
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
    ap.add_argument("--streams", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model, memory_shape
    from streammos_tpu.models.stream_mos import (featurize, stage_forward,
                                                 tta_expand_folded,
                                                 tta_scores)
    from streammos_tpu.utils.profiling import measure_rtt

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    from bench import skewed_scan_bank  # noqa: repo-root bench helpers

    cfg = get_config("StreamMOS")
    m = cfg.model
    N, T, TTA, BANK, F = cfg.val.frame_point_num, m.seq_num, 4, 2, args.frames
    rng = np.random.default_rng(0)
    rtt = measure_rtt()

    out = {}
    for bt in args.streams:
        model, variables = init_model(jax.random.key(0), m, batch=TTA * bt,
                                      num_points=N, tta_fold=True)
        bank = jnp.asarray(np.concatenate(
            [skewed_scan_bank(rng, BANK, T, N) for _ in range(bt)],
            axis=1))  # (BANK, bt, T, N, 4)

        @jax.jit
        def stream(variables, bank, memory):
            def body(mem, t):
                batch = featurize(tta_expand_folded(bank[t % BANK]), m)
                o, _ = stage_forward(model, variables, batch, mem,
                                     jnp.asarray(True), train=False)
                scores = tta_scores(o["pred_folded"], m.class_num)
                return o["memory"], scores.sum()
            mem, sums = jax.lax.scan(body, memory, jnp.arange(F))
            return sums.sum(), mem

        memory = jnp.zeros(memory_shape(m, TTA * bt), jnp.float32)
        s, memory = stream(variables, bank, memory)
        float(s)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s, memory = stream(variables, bank, memory)
            float(s)
            times.append(time.perf_counter() - t0)
        per_step = max(float(np.median(times)) - rtt, 1e-9) / F
        fps = bt / per_step
        out[bt] = fps
        print(json.dumps({
            "metric": "multi_stream_fps_per_chip",
            "streams": bt,
            "value": round(fps, 3),
            "step_ms": round(per_step * 1e3, 2),
            "unit": "frames/s total across streams (TTAx4 each, 160k pts)",
        }), flush=True)

    base = out[args.streams[0]]
    print(json.dumps({
        "metric": "multi_stream_scaling",
        "fps_by_streams": {str(k): round(v, 2) for k, v in out.items()},
        "batching_gain_at_max": round(out[args.streams[-1]] / base, 2),
    }))


if __name__ == "__main__":
    main()
