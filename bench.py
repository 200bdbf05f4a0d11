"""Headline benchmark: streaming MOS inference frames/s per chip, plus
training throughput — the two halves of the reference's production recipe
(`val_StreamMOS.py:80-126` eval protocol; `config/StreamMOS.py:80-95`
48-epoch training).

Prints one JSON line per metric; the LAST line is the headline streaming
fps (the driver's parsed artifact):

  {"metric": "train_step_seconds", ...}
  {"metric": "host_pipeline_seconds_per_sample", ...}
  {"metric": "streaming_inference_fps_per_chip_uniform_bank", ...}
  {"metric": "streaming_inference_fps_per_chip", ...}   <- headline

The headline fps is measured on a RANGE-SKEWED synthetic scan bank
(LiDAR-like: point density falls off with range, so near-range cells take
many points each — the collision pattern that stresses the scatter path),
not the uniform cube of rounds 1-2; the uniform number is kept one line
above so the bank delta stays visible.

Measurement notes (this environment routes the TPU through an RPC tunnel):
* `block_until_ready` returns before remote execution completes, so timing
  must force a host materialization (scalar fetch);
* a single round-trip costs ~30 ms, so the whole F-frame stream runs inside
  ONE jitted `lax.scan` (memory carry chains the steps; per-step inputs come
  from a rotating on-device bank so no execution caching is possible) and the
  tunnel cost is measured separately and subtracted.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _rtt(jax, jnp):
    trivial = jax.jit(lambda x: x.sum())
    z = jnp.zeros((8, 8))
    float(trivial(z))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(z))
        rtts.append(time.perf_counter() - t0)
    return float(np.median(rtts))


def skewed_scan_bank(rng, bank, T, N):
    """LiDAR-like range-skewed scans: 64 beams over the RV elevation range,
    uniform azimuth, range drawn from a near-heavy mixture clipped to the
    BEV extent. Near-range BEV cells collect hundreds of points (real
    SemanticKITTI scans put ~40% of returns within 12 m), which is the
    scatter collision pattern the uniform cube never produces."""
    shape = (bank, 1, T, N)
    az = rng.uniform(-np.pi, np.pi, shape)
    elev = np.deg2rad(rng.uniform(-25.0, 3.0, shape))
    r = np.minimum(2.5 + rng.exponential(9.0, shape), 69.0)
    # ~5% of points beyond the +-50 m crop (4% forced far + the clipped
    # exponential's own tail), mirroring the val filter's out-of-range
    # points that land in the sentinel cell
    far = rng.uniform(0, 1, shape) < 0.04
    r = np.where(far, rng.uniform(55.0, 80.0, shape), r)
    x = r * np.cos(elev) * np.cos(az)
    y = r * np.cos(elev) * np.sin(az)
    z = np.clip(r * np.sin(elev), -3.9, 1.9) + rng.normal(0, 0.05, shape)
    i = rng.uniform(0, 1, shape)
    return np.stack([x, y, z, i], axis=-1).astype(np.float32)


def measure_stream(jax, jnp, model, variables, m, bank_np, F=16, bt=1):
    from streammos_tpu.models import memory_shape
    from streammos_tpu.models.stream_mos import (featurize, stage_forward,
                                                 tta_expand_folded,
                                                 tta_scores)

    TTA = 4 * bt
    BANK = bank_np.shape[0]
    bank = jnp.asarray(bank_np)

    @jax.jit
    def stream(variables, bank, memory):
        def body(mem, t):
            batch = featurize(tta_expand_folded(bank[t % BANK]), m)
            out, _ = stage_forward(model, variables, batch, mem,
                                   jnp.asarray(True), train=False)
            scores = tta_scores(out["pred_folded"], m.class_num)
            return out["memory"], scores.sum()

        mem, sums = jax.lax.scan(body, memory, jnp.arange(F))
        return sums.sum(), mem

    memory = jnp.zeros(memory_shape(m, TTA), jnp.float32)
    s, memory = stream(variables, bank, memory)  # compile
    float(s)
    for _ in range(2):  # full executable warmup (see bench_train_step note)
        s, memory = stream(variables, bank, memory)
        float(s)
    rtt = _rtt(jax, jnp)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s, memory = stream(variables, bank, memory)
        float(s)
        times.append(time.perf_counter() - t0)
    total = float(np.median(times))
    per_frame = max(total - rtt, 1e-9) / F
    return 1.0 / per_frame


def bench_train_step(jax, jnp, cfg, B=1):
    """Full jitted stage-1 step (3-window streaming BPTT, OHEM + Lovasz +
    3 aux heads, in-graph BEV label rasterization, SGD-nesterov), per-chip
    batch B at 130k points — the training half of the reference recipe."""
    from streammos_tpu.models import init_model
    from streammos_tpu.train import (build_optimizer, create_train_state,
                                     make_train_step)

    S, T, N = 3, cfg.model.seq_num, cfg.train.frame_point_num
    model, variables = init_model(jax.random.key(0), cfg.model, batch=B,
                                  num_points=N)
    tx, _ = build_optimizer(cfg.optimize, per_epoch_iters=100)
    state = create_train_state(variables, tx)
    # donation is speed-neutral (round-4 campaign, docs/DESIGN.md
    # "Train-step campaign"); the production trainer default applies
    step = make_train_step(model, cfg, tx)

    rng = np.random.default_rng(0)
    windows = {
        "xyzi": jnp.asarray(
            rng.uniform(-50, 50, size=(S, B, T, N, 4)).astype(np.float32)),
        "targets": jnp.asarray(
            rng.integers(0, 3, size=(S, B, N)).astype(np.int32)),
    }
    key = jax.random.key(1)
    state, metrics = step(state, windows, key)
    float(metrics["loss"])
    # full warmup: the first ~6 executions of a fresh executable run ~50%
    # slow on this backend (round-4 campaign: 0.448 -> 0.289 s/step from
    # batch 0 to batch 1); one warm call is not enough
    for _ in range(6):
        key, sub = jax.random.split(key)
        state, metrics = step(state, windows, sub)
    float(metrics["loss"])
    rtt = _rtt(jax, jnp)
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, metrics = step(state, windows, sub)
    float(metrics["loss"])
    return (time.perf_counter() - t0 - rtt) / iters


def _make_bank(bank_dir, rng):
    """Synthetic copy-paste object bank (tools/extract_objects.py layout)."""
    import os

    cate_dir = os.path.join(bank_dir, "car")
    os.makedirs(cate_dir, exist_ok=True)
    for k in range(6):
        cx, cy = rng.uniform(6, 20), rng.uniform(-3, 3)
        pcds = np.stack([
            rng.uniform(cx - 1.2, cx + 1.2, 300),
            rng.uniform(cy - 0.9, cy + 0.9, 300),
            rng.uniform(-1.5, -0.4, 300),
            rng.uniform(0, 1, 300)], axis=-1).astype(np.float32)
        np.savez(os.path.join(cate_dir, f"00_{k:04d}.npz"), pcds=pcds,
                 cate="car", cate_id=10,
                 center=np.array([cx, cy, -1.0]),
                 size=np.array([2.5, 2.0, 1.2]), yaw=0.0)


def bench_host_pipeline():
    """Host input-pipeline cost per training sample at PRODUCTION shapes:
    ~125k-point scans on disk, 130k-point resample, 3 windows, copy-paste
    augmentation enabled against a synthetic object bank, loaded through
    `SampleWorkerPool` at this host's core budget (the pool caps workers at
    cores-2, so a 2-vCPU sandbox measures the inline path; production TPU
    hosts have >= 96 cores). Returns (s/sample measured, s/sample inline,
    workers actually used)."""
    import dataclasses
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from bench_pipeline import make_big_sequence

    from streammos_tpu.config import CopyPasteConfig, get_config
    from streammos_tpu.data.dataset import TrainDataset
    from streammos_tpu.data.loader import SampleWorkerPool

    rng = np.random.default_rng(3)
    with tempfile.TemporaryDirectory() as root:
        seq_root = os.path.join(root, "seq")
        bank_dir = os.path.join(root, "bank")
        make_big_sequence(seq_root, "00", n_frames=8, n_points=125000)
        _make_bank(bank_dir, rng)
        cfg = dataclasses.replace(
            get_config("StreamMOS").train, seq_dir=seq_root,
            drop_few_static_frames=False,
            copy_paste=CopyPasteConfig(is_use=True, obj_bank_dir=bank_dir))
        from streammos_tpu.data.copy_paste import SequenceCutPaste
        cp = SequenceCutPaste(bank_dir, cfg.copy_paste.paste_max_obj_num)
        assert cp.bank, "copy-paste bank not wired"
        ds = TrainDataset(cfg, copy_paste=cp, seq_ids=[0], seed=0)
        ds[0]  # warm (pose parse, page cache, lazy imports)
        n = min(6, len(ds))

        t0 = time.perf_counter()
        for k in range(n):
            ds[k]
        inline = (time.perf_counter() - t0) / n

        pool = SampleWorkerPool(ds, num_workers=4, seed=1)
        try:
            idx = [k % len(ds) for k in range(n)]
            t0 = time.perf_counter()
            for _ in pool.map_ordered(idx):
                pass
            pooled = (time.perf_counter() - t0) / n
        finally:
            workers = pool.num_workers
            pool.close()
        return (pooled if workers > 0 else inline), inline, workers


def bench_voting(jax, jnp):
    """Long-term-memory voxel vote at FULL production capacity
    (512x512x30 grid, 9-frame local map ~1.2M voting points): device
    (jitted segment-sum, `postprocess/voting.py:voxel_vote_device`) vs
    NumPy (`np.add.at`) — the backends `tools/voting.py --vote` selects
    between (reference votes on GPU, voxel_voting.py:55-75)."""
    from streammos_tpu.config import VoxelConfig
    from streammos_tpu.postprocess.voting import voxel_vote, voxel_vote_device

    rng = np.random.default_rng(0)
    voxel = VoxelConfig()  # production (512, 512, 30)
    n_local, n_cur = 1_200_000, 120_000
    local = np.stack([rng.uniform(-49.9, 49.9, n_local),
                      rng.uniform(-49.9, 49.9, n_local),
                      rng.uniform(-3.9, 1.9, n_local)], axis=-1)
    local_preds = rng.integers(0, 3, n_local).astype(np.int32)
    cur = local[:n_cur]
    cur_preds = local_preds[:n_cur].copy()

    t0 = time.perf_counter()
    ref = voxel_vote(local, local_preds, cur, cur_preds, voxel)
    t_np = time.perf_counter() - t0

    dev = voxel_vote_device(local, local_preds, cur, cur_preds, voxel)
    t0 = time.perf_counter()
    dev = voxel_vote_device(local, local_preds, cur, cur_preds, voxel)
    t_dev = time.perf_counter() - t0
    assert np.array_equal(ref, dev), "device vote diverged from numpy"

    # compute-only: the jitted vote over device-resident arrays (on a real
    # TPU host the H2D is PCIe-cheap; over this sandbox's RPC tunnel the
    # ~32 MB upload dominates t_dev)
    from streammos_tpu.postprocess.voting import _device_vote_fn
    size = voxel.bev_shape
    n_cells = size[0] * size[1] * size[2]
    fn = _device_vote_fn(n_cells, 3)
    cap = 1 << 21
    args = [jnp.asarray(np.resize(x, cap).astype(d)) for x, d in (
        (np.random.default_rng(1).integers(0, n_cells, cap), np.int32),
        (local_preds, np.int32), (np.ones(cap), bool),
        (np.random.default_rng(2).integers(0, n_cells, cap), np.int32),
        (np.ones(cap), bool), (cur_preds, np.int32))]
    np.asarray(fn(*args))  # compile + warm
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(out[:8])
    t_compute = time.perf_counter() - t0
    return t_np, t_dev, t_compute


def main():
    import jax

    # the persistent compilation cache (5-10 min of tunnel compiles on a
    # cold run, seconds warm) is configured by the streammos_tpu package
    # import below (STREAMMOS_JAX_CACHE overrides/disables)
    import jax.numpy as jnp
    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model

    import sys

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    cfg = get_config("StreamMOS")
    m = cfg.model
    N = cfg.val.frame_point_num  # 160000
    T = m.seq_num
    BANK = 4

    train_dt = None
    try:
        note("train step: compiling...")
        train_dt = bench_train_step(jax, jnp, cfg)
        print(json.dumps({
            "metric": "train_step_seconds",
            "value": round(train_dt, 4),
            "unit": "s/step (stage1, bs1/chip, 130k pts, 3-window BPTT)",
            "vs_baseline": None,
        }), flush=True)
    except Exception as e:  # keep the headline alive
        print(json.dumps({"metric": "train_step_seconds",
                          "error": str(e)[:200]}), flush=True)

    try:
        # regression check for the round-4 XLA scatter layout-cliff fix
        # (voxel_pool lane-pad guard): bs2 was 1.103 s/step before, 0.706
        # after; a regression to superlinear row cost shows here first
        note("train step bs2 (layout-cliff regression check)...")
        dt2 = bench_train_step(jax, jnp, cfg, B=2)
        print(json.dumps({
            "metric": "train_step_seconds_bs2",
            "value": round(dt2, 4),
            "unit": "s/step (stage1, bs2/chip — 2 samples/step)",
            "samples_per_s": round(2 / dt2, 3),
            "vs_baseline": None,
        }), flush=True)
    except Exception as e:
        print(json.dumps({"metric": "train_step_seconds_bs2",
                          "error": str(e)[:200]}), flush=True)

    try:
        note("host pipeline (production shapes, copy-paste on)...")
        sps, inline_sps, workers = bench_host_pipeline()
        line = {
            "metric": "host_pipeline_seconds_per_sample",
            "value": round(sps, 4),
            "unit": f"s/sample (125k-pt scans, 130k resample, 3 windows, "
                    f"copy-paste on, {workers} workers on "
                    f"{os.cpu_count()}-core host)",
            "inline_s_per_sample": round(inline_sps, 4),
            "vs_baseline": None,
        }
        if train_dt:
            # workers needed so the host keeps up with the chip at the
            # production configuration (bs1/chip, docs/DESIGN.md round-4
            # train campaign): one sample per step, inline_sps core-seconds
            # each
            line["projected_workers_per_chip_bs1"] = int(
                np.ceil(inline_sps / train_dt))
        print(json.dumps(line), flush=True)
    except Exception as e:
        print(json.dumps({"metric": "host_pipeline_seconds_per_sample",
                          "error": str(e)[:200]}), flush=True)

    try:
        note("voxel vote (512x512x30, device vs numpy)...")
        t_np, t_dev, t_compute = bench_voting(jax, jnp)
        print(json.dumps({
            "metric": "voxel_vote_seconds",
            "value": round(t_dev, 4),
            "unit": "s/frame (device segment-sum vote, 512x512x30, "
                    "1.2M local pts; warm jit, includes tunnel H2D)",
            "numpy_seconds": round(t_np, 4),
            "device_compute_seconds": round(t_compute, 4),
            "note": "over this sandbox's RPC tunnel the ~32MB upload "
                    "dominates; on a PCIe-attached TPU host the device "
                    "path is compute-bound",
            "vs_baseline": None,
        }), flush=True)
    except Exception as e:
        print(json.dumps({"metric": "voxel_vote_seconds",
                          "error": str(e)[:200]}), flush=True)

    # tta_fold: the 4 flip variants share one scatter/gather index structure
    # (ops/tta_fold.py), so the TTA fan rides the channel axis of the
    # row-count-bound ops instead of quadrupling their rows.
    model, variables = init_model(jax.random.key(0), m, batch=4,
                                  num_points=N, tta_fold=True)
    rng = np.random.default_rng(0)

    try:
        note("streaming eval: compiling...")
        uniform = rng.uniform(
            -50, 50, size=(BANK, 1, T, N, 4)).astype(np.float32)
        fps_u = measure_stream(jax, jnp, model, variables, m, uniform)
        print(json.dumps({
            "metric": "streaming_inference_fps_per_chip_uniform_bank",
            "value": round(fps_u, 3),
            "unit": "frames/s (uniform-cube bank; rounds 1-2 protocol)",
            "vs_baseline": round(fps_u / 10.0, 3),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "metric": "streaming_inference_fps_per_chip_uniform_bank",
            "error": str(e)[:200]}), flush=True)

    # Bt in {2, 4}: the serving-saturation table (docs/DESIGN.md
    # "Multi-stream serving") as regression-checked artifact lines
    for bt in (2, 4):
        try:
            note(f"multi-stream serving (Bt={bt})...")
            model2, variables2 = init_model(jax.random.key(0), m,
                                            batch=4 * bt, num_points=N,
                                            tta_fold=True)
            bank2 = np.concatenate(
                [skewed_scan_bank(rng, BANK, T, N) for _ in range(bt)],
                axis=1)
            fpsb = measure_stream(jax, jnp, model2, variables2, m, bank2,
                                  bt=bt)
            print(json.dumps({
                "metric": f"multi_stream_fps_per_chip_bt{bt}",
                "value": round(bt * fpsb, 3),
                "unit": f"total frames/s across {bt} parallel streams "
                        "(TTAx4 each, 160k pts)",
                "vs_baseline": round(bt * fpsb / 10.0, 3),
            }), flush=True)
            del model2, variables2, bank2
        except Exception as e:
            print(json.dumps({"metric": f"multi_stream_fps_per_chip_bt{bt}",
                              "error": str(e)[:200]}), flush=True)

    # eval point-budget curve (VERDICT r4 task 3): every row-count-bound op
    # scales with the 160k pad budget — the reference's worst-case
    # assumption (data_StreamMOS.py:565-574), not a law; real seq-08 frames
    # hold ~120-125k in-range points. 160k stays the reference-parity
    # default (the headline); these lines quantify the serving lever.
    for n_pts in (130000, 140000):
        try:
            note(f"point-budget sweep: N={n_pts}...")
            model_n, variables_n = init_model(jax.random.key(0), m, batch=4,
                                              num_points=n_pts,
                                              tta_fold=True)
            fps_n = measure_stream(jax, jnp, model_n, variables_n, m,
                                   skewed_scan_bank(rng, BANK, T, n_pts))
            print(json.dumps({
                "metric": f"streaming_inference_fps_per_chip_{n_pts//1000}k",
                "value": round(fps_n, 3),
                "unit": f"frames/s (bs1, TTAx4, frame_point_num={n_pts}, "
                        "range-skewed bank; serving guidance — 160k is the "
                        "reference-parity default)",
                "vs_baseline": round(fps_n / 10.0, 3),
            }), flush=True)
            del model_n, variables_n
        except Exception as e:
            print(json.dumps({
                "metric": f"streaming_inference_fps_per_chip_{n_pts//1000}k",
                "error": str(e)[:200]}), flush=True)

    try:
        fps = measure_stream(jax, jnp, model, variables, m,
                             skewed_scan_bank(rng, BANK, T, N))
        print(json.dumps({
            "metric": "streaming_inference_fps_per_chip",
            "value": round(fps, 3),
            "unit": "frames/s (bs1, TTAx4, 160k pts, T=3, in-graph "
                    "featurize, range-skewed LiDAR-like bank)",
            # the reference never measured FPS and no CUDA GPU exists in this
            # environment, so the denominator is the 10 Hz LiDAR scan rate
            # (real-time bar), NOT a measured reference throughput
            "vs_baseline": round(fps / 10.0, 3),
            "baseline_definition": "realtime_10hz_lidar_scan_rate",
        }))
    except Exception as e:
        # the driver parses the LAST line — emit an error-form headline so a
        # failure is still a recorded artifact, not a missing one
        print(json.dumps({"metric": "streaming_inference_fps_per_chip",
                          "error": str(e)[:200]}))
        raise


if __name__ == "__main__":
    main()
