"""Point-side tap gather strategies: 4 separate row gathers (current
grid_to_point_tta) vs one windowed 2x2-patch gather per point.

Usage: python tools/bench_gather.py
"""
from __future__ import annotations

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    trivial = jax.jit(lambda x: x.sum())
    z = jnp.zeros((8, 8))
    float(trivial(z))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(trivial(z))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    N, C = 160000, 256
    H, W = 258, 258  # ext table at 256^2
    table = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    ys = jnp.asarray(rng.integers(0, H - 2, size=(N,)).astype(np.int32))
    xs = jnp.asarray(rng.integers(0, W - 2, size=(N,)).astype(np.int32))
    wk = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32)).astype(jnp.bfloat16)

    def timeit(name, fn, init, K=4, reps=2):
        @jax.jit
        def chained(c):
            for _ in range(K):
                c = fn(c)
            return c.sum()
        float(chained(init))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(chained(init))
            ts.append(time.perf_counter() - t0)
        print(f"{name:42s} {(np.median(ts)-rtt)/K*1e3:8.2f} ms", flush=True)

    flat = table.reshape(H * W, C)

    def four_rows(c):
        y = (ys + c.astype(jnp.int32)) % (H - 2)
        x = xs
        out = None
        for dy in range(2):
            for dx in range(2):
                idx = (y + dy) * W + (x + dx)
                t = jnp.take(flat, idx, axis=0)
                term = t * wk[:, 2*dy+dx, None]
                out = term if out is None else out + term
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("4 row gathers + FMA", four_rows, jnp.zeros((), jnp.float32))

    def windowed(c):
        y = (ys + c.astype(jnp.int32)) % (H - 2)
        starts = jnp.stack([y, xs], axis=-1)  # (N, 2)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        patch = lax.gather(table, starts, dn, slice_sizes=(2, 2, C),
                           mode=lax.GatherScatterMode.CLIP)
        out = (patch.reshape(N, 4, C) * wk[..., None]).sum(axis=1)
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("1 windowed 2x2xC gather", windowed, jnp.zeros((), jnp.float32))

    def two_rows(c):
        # gather 2 double-rows: (y, x) with slice (1, 2, C) -> halves rows
        y = (ys + c.astype(jnp.int32)) % (H - 2)
        out = None
        for dy in range(2):
            starts = jnp.stack([y + dy, xs], axis=-1)
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            patch = lax.gather(table, starts, dn, slice_sizes=(1, 2, C),
                               mode=lax.GatherScatterMode.CLIP)
            term = (patch.reshape(N, 2, C) * wk[:, 2*dy:2*dy+2, None]).sum(1)
            out = term if out is None else out + term
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("2 double-row (1x2xC) gathers", two_rows, jnp.zeros((), jnp.float32))

    # correctness cross-check
    @jax.jit
    def check():
        y, x = ys, xs
        a = None
        for dy in range(2):
            for dx in range(2):
                t = jnp.take(flat, (y + dy) * W + (x + dx), axis=0)
                term = t * wk[:, 2*dy+dx, None]
                a = term if a is None else a + term
        starts = jnp.stack([y, x], axis=-1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        patch = lax.gather(table, starts, dn, slice_sizes=(2, 2, C),
                           mode=lax.GatherScatterMode.CLIP)
        b = (patch.reshape(N, 4, C) * wk[..., None]).sum(axis=1)
        return jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()
    print("windowed-vs-rows max diff:", float(check()), flush=True)


def patch_concat():
    """The sample.py trick at folded-TTA widths: pre-concat the 2x2
    neighborhood into 4*C-wide rows, ONE flat take per point, lane-sliced
    tap FMA. vs the 4-separate-takes form grid_to_point_tta currently
    uses (round-3 trace: 4 x 0.48 ms per gather)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    trivial = jax.jit(lambda x: x.sum())
    float(trivial(jnp.zeros((8, 8))))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(trivial(jnp.zeros((8, 8))))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    N, C = 160000, 256
    H, W = 258, 258
    table_np = rng.normal(size=(H, W, C)).astype(np.float32)
    table = jnp.asarray(table_np).astype(jnp.bfloat16)
    ids_np = (rng.integers(0, H - 2, N) * W + rng.integers(0, W - 2, N))
    ids = jnp.asarray(ids_np.astype(np.int32))
    wk = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def timeit(name, fn, K=4, reps=2):
        @jax.jit
        def chained(c):
            for _ in range(K):
                c = fn(c)
            return c.sum()
        init = jnp.zeros((), jnp.float32)
        float(chained(init))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(chained(init))
            ts.append(time.perf_counter() - t0)
        print(f"{name:44s} {(np.median(ts)-rtt)/K*1e3:8.2f} ms", flush=True)

    def mk_patch(c):
        t = table + c.astype(table.dtype) * 0
        patch = jnp.concatenate(
            [t[:-1, :-1], t[:-1, 1:], t[1:, :-1], t[1:, 1:]],
            axis=-1).reshape((H - 1) * (W - 1), 4 * C)
        i = (ids + c.astype(jnp.int32)) % ((H - 1) * (W - 1))
        rows = jnp.take(patch, i, axis=0)  # (N, 4C)
        out = sum(rows[:, k * C:(k + 1) * C] * wk[:, k:k + 1]
                  for k in range(4))
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("patch-concat + 1 take (1024-lane rows)", mk_patch)

    flat = table.reshape(H * W, C)

    def mk_4take(c):
        t = flat + c.astype(flat.dtype) * 0
        i = (ids + c.astype(jnp.int32)) % (H * W - W - 2)
        out = None
        for k, off in enumerate((0, 1, W, W + 1)):
            rows = jnp.take(t, i + off, axis=0)
            term = rows * wk[:, k:k + 1]
            out = term if out is None else out + term
        return c + out[0, 0].astype(c.dtype) * 0 + 1
    timeit("4 takes + FMA (256-lane rows)", mk_4take)



if __name__ == "__main__":
    if "patch" in sys.argv:
        patch_concat()
    else:
        main()
