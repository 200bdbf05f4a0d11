"""Headline benchmark: streaming MOS inference frames/s per chip.

Measures the reference's eval configuration (`val_StreamMOS.py:80-126`):
batch 1 streaming with TTA x4 riding the batch axis, short-term memory
carried on-device across frames, full production shapes (160k points eval
padding, T=3, BEV 512x512, RV 64x2048).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is frames/s relative to the 10 Hz LiDAR scan rate (the
real-time bar — the reference never measured FPS; BASELINE.md).

Inputs are regenerated per frame (distinct buffers) and the memory carry
feeds back, so results cannot be served from any execution cache.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model, memory_shape
    from streammos_tpu.train.trainer import make_eval_step

    cfg = get_config("StreamMOS")
    m = cfg.model
    N = cfg.val.frame_point_num  # 160000
    TTA = 4
    T = m.seq_num

    model, variables = init_model(jax.random.key(0), m, batch=TTA, num_points=N)
    eval_step = make_eval_step(model, cfg)

    rng = np.random.default_rng(0)
    H = m.voxel.bev_shape[0]
    rh, rw = m.voxel.rv_shape

    def frame(seed):
        r = np.random.default_rng(seed)
        return {
            "points": jnp.asarray(r.normal(size=(TTA, T, N, 7)).astype(np.float32)),
            "bev_coord": jnp.asarray(
                r.uniform(0, H, size=(TTA, T, N, 3)).astype(np.float32)),
            "rv_coord": jnp.asarray(np.stack(
                [r.uniform(0, rh, size=(TTA, T, N)),
                 r.uniform(0, rw, size=(TTA, T, N))], axis=-1).astype(np.float32)),
        }

    frames = [frame(i) for i in range(8)]
    memory = jnp.zeros(memory_shape(m, TTA), jnp.float32)

    # warmup / compile
    scores, _, memory = eval_step(variables, frames[0], memory,
                                  jnp.asarray(False))
    scores.block_until_ready()

    n_iters = 24
    t0 = time.perf_counter()
    for i in range(n_iters):
        scores, _, memory = eval_step(variables, frames[i % len(frames)],
                                      memory, jnp.asarray(True))
    scores.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "streaming_inference_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s (bs1, TTAx4, 160k pts, T=3)",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
