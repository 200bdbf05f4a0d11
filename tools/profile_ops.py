"""Component-level timing of the StreamMOS forward on the real chip.

Times each hot component with the chained-jit pattern (see bench.py's
measurement notes): K iterations inside one jit, data-dependent chaining so
nothing folds, scalar fetch, tunnel RTT subtracted. Inputs are created
lazily per component (device transfers over the tunnel are expensive).

Usage: python tools/profile_ops.py [component ...]
Components: featurize dense scatter gather conv stage0 deform resize
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from streammos_tpu.config import get_config
    from streammos_tpu.models.stream_mos import featurize
    from streammos_tpu.ops import (deform_attn_sample, grid_to_point,
                                   resize_bilinear_align_corners,
                                   voxel_max_pool)

    cfg = get_config("StreamMOS").model
    rng = np.random.default_rng(0)
    sel = sys.argv[1:]

    def want(name):
        return not sel or any(s_ in name for s_ in sel)

    trivial = jax.jit(lambda x: x.sum())
    z = jnp.zeros((8, 8))
    float(trivial(z))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(z))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    def timeit(name, make_fn, K=4, reps=2):
        if not want(name):
            return
        fn, init = make_fn()

        @jax.jit
        def chained(c):
            for _ in range(K):
                c = fn(c)
            return c.sum()

        float(chained(init))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(init))
            ts.append(time.perf_counter() - t0)
        t = (np.median(ts) - rtt) / K
        print(f"{name:44s} {t*1e3:8.2f} ms", flush=True)

    B, T, N = 4, 3, 160000  # TTA x frames x eval points

    def mk_featurize():
        xyzi = jnp.asarray(rng.uniform(-50, 50, (B, T, N, 4)).astype(np.float32))
        def fn(x):
            f = featurize(x, cfg)
            return x + f["points"][..., :4] * 1e-9
        return fn, xyzi
    timeit("featurize (4x3x160k)", mk_featurize)

    def mk_pointnet():
        pts = jnp.asarray(rng.normal(size=(B * T, N, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
        def fn(x):
            return jnp.maximum(x @ w, 0)
        return fn, pts
    timeit("dense 64x64 over 1.92M pts", mk_pointnet)

    def mk_scatter():
        pts = jnp.asarray(rng.normal(size=(B * T, N, 64)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(0, 512, (B * T, N, 2)).astype(np.float32))
        def fn(x):
            g = voxel_max_pool(x, coords, (512, 512), (1.0, 1.0))
            return x + g.mean() * 0
        return fn, pts
    timeit("scatter 12x160k -> 512^2 x64", mk_scatter)

    def mk_gather():
        grid = jnp.asarray(rng.normal(size=(B, 256, 256, 32)).astype(np.float32))
        c1 = jnp.asarray(rng.uniform(0, 512, (B, N, 2)).astype(np.float32))
        def fn(g):
            p = grid_to_point(g, c1, (0.5, 0.5))
            return g + p.mean() * 0
        return fn, grid
    timeit("gather 256^2x32 -> 4x160k", mk_gather)

    def mk_conv():
        class ConvStack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for _ in range(6):
                    x = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                                use_bias=False)(x)
                    x = jnp.maximum(x, 0)
                return x
        conv = ConvStack()
        cx = jnp.asarray(rng.normal(size=(B, 256, 256, 32)).astype(np.float32))
        cv = conv.init(jax.random.key(0), cx)
        def fn(x):
            return conv.apply(cv, x) + x * 1e-9
        return fn, cx
    timeit("conv3x3 x6 32ch @256^2 (x4)", mk_conv)

    def mk_s0():
        class Stage0(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(32, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)), use_bias=False)(x)
        s0 = Stage0()
        sx = jnp.asarray(rng.normal(size=(1, 512, 512, 192)).astype(np.float32))
        sv = s0.init(jax.random.key(0), sx)
        def fn(x):
            y = s0.apply(sv, x)
            return x * (1 + y.mean() * 0)
        return fn, sx
    timeit("stage0 conv3x3 s2 192->32 @512^2 (x1)", mk_s0)

    def mk_deform():
        val = jnp.asarray(rng.normal(size=(B, 64, 64, 4, 32)).astype(np.float32))
        loc = jnp.asarray(rng.uniform(0, 1, (B, 4096, 4, 4, 2)).astype(np.float32))
        aw = jax.nn.softmax(jnp.asarray(
            rng.normal(size=(B, 4096, 4, 4)).astype(np.float32)), -1)
        def fn(v):
            o = deform_attn_sample(v, loc, aw)
            return v + o.mean() * 0
        return fn, val
    timeit("deform_attn 4096q (x4)", mk_deform)

    def mk_resize():
        d2 = jnp.asarray(rng.normal(size=(B, 64, 64, 128)).astype(np.float32))
        def fn(x):
            r = resize_bilinear_align_corners(x, (256, 256))
            return x + r.mean() * 0
        return fn, d2
    timeit("resize 64->256 x128ch (x4)", mk_resize)


if __name__ == "__main__":
    main()
