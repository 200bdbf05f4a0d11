"""Train-step roofline: measure the TRAIN step's scatter/gather op family —
scatter-ADD (gather VJPs), narrow sort-VJP scatters, scatter-max-VJP gathers —
and every candidate replacement route, at the exact shapes the bs1 train step
runs them (tools/analyze_train_hlo.py attribution, round 5).

The eval roofline (tools/bench_scatter_roofline.py) proved the serialized
XLA scatter-max is the floor for the eval family. Scatter-ADD is associative
and duplicate-combining in a way max-with-argmax-backward isn't, and the
train step adds three new primitive classes:

  1. narrow (1-lane) f32 scatter-add over N rows — the VJP of
     lax.sort / take_along_axis in the losses (losses.py:33,48,92);
     candidate replacements: one-hot dot (CE), argsort + k-row gather (OHEM),
     unsort-via-second-sort (Lovász).
  2. wide (4C-lane) scatter-add of N point rows into a patch grid — the VJP
     of the bilinear patch-row gather (sample.py:54); candidates: split into
     2x128-lane scatters, sort + segment-add consume.
  3. (R,64) gathers from the pooled grid — the scatter-max custom VJP
     (voxel_pool.py _bwd, attributed to stream_mos.py:214); candidate:
     one fused 128-lane gather over concat([out, grad]).
  4. narrow cumsum over (N,) f32 — Lovász jaccard coeffs; candidate:
     class-batched (3, N) cumsum.

Usage: python tools/bench_train_roofline.py [substr ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = 130000        # train points per frame
N_AUX = 65536     # aux BEV head cells (256^2)
GRID = 262144     # 512^2 flat cells per frame plane
CELLS_B = 66049   # 257^2 patch grid (256^2 stage, bilinear VJP target)
CELLS_S = 16641   # 129^2 patch grid (128^2 stage)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    sel = sys.argv[1:]

    def want(name):
        return not sel or any(s in name for s in sel)

    trivial = jax.jit(lambda x: x.sum())
    float(trivial(jnp.zeros((8, 8))))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(jnp.zeros((8, 8))))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel rtt: {rtt*1e3:.1f} ms", flush=True)

    results = {}

    def timeit(name, fn, ops, K=16, reps=4, rows=None):
        if not want(name):
            return
        @jax.jit
        def chained(c, ops):
            for _ in range(K):
                c = fn(c, ops)
            return c
        init = jnp.zeros((), jnp.float32)
        float(chained(init, ops))  # compile
        float(chained(init, ops))  # executable warmup
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(init, ops))
            ts.append(time.perf_counter() - t0)
        ms = (np.median(ts) - rtt) / K * 1e3
        results[name] = ms
        per_row = f"  ({ms*1e6/rows:6.1f} ns/row)" if rows else ""
        print(f"{name:40s} {ms:8.3f} ms{per_row}", flush=True)
        return ms

    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    # ---------------- class 1: narrow loss-VJP primitives ----------------
    vecN = jax.jit(lambda k: jax.random.normal(k, (N,), jnp.float32))(key)
    permN = jnp.asarray(rng.permutation(N).astype(np.int32))
    logits3 = jax.jit(lambda k: jax.random.normal(
        k, (N, 3), jnp.float32))(key)
    tgt3 = jnp.asarray(rng.integers(0, 3, N).astype(np.int32))

    def narrow_scatter_add(c, ops):
        p = (ops["perm"] + c.astype(jnp.int32)) % N
        out = jnp.zeros((N,), jnp.float32)
        out = out.at[p].add(ops["vec"])
        return c + out[N // 2] * 1e-9 + 1
    timeit("1_narrow_scatter_add_130k", narrow_scatter_add,
           {"perm": permN, "vec": vecN}, rows=N)

    def narrow_gather(c, ops):
        p = (ops["perm"] + c.astype(jnp.int32)) % N
        out = jnp.take(ops["vec"], p)
        return c + out.mean() * 1e-6 + 1
    timeit("1_narrow_gather_130k", narrow_gather,
           {"perm": permN, "vec": vecN}, rows=N)

    def sort_f32(c, ops):
        out = lax.sort(ops["vec"] + c, is_stable=False)
        return c + out[N // 2] * 1e-9 + 1
    timeit("1_sort_f32_130k", sort_f32, {"vec": vecN})

    def sort_kv_if32(c, ops):
        k = (ops["perm"] + c.astype(jnp.int32)) % N
        ks, vs = lax.sort_key_val(k, ops["vec"], is_stable=False)
        return c + (ks[N // 2].astype(jnp.float32) + vs[N // 2]) * 1e-9 + 1
    timeit("1_sort_kv_int_f32_130k", sort_kv_if32,
           {"perm": permN, "vec": vecN})

    vec3N = jax.jit(lambda k: jax.random.normal(
        k, (3, N), jnp.float32))(key)

    def sort_batched(c, ops):
        out = lax.sort(ops["v"] + c, dimension=1, is_stable=False)
        return c + out[1, N // 2] * 1e-9 + 1
    timeit("1_sort_f32_3x130k_batched", sort_batched, {"v": vec3N})

    def take_ce(c, ops):
        lp = ops["lg"] + c
        nll = -jnp.take_along_axis(lp, ops["t"][..., None], axis=-1)[..., 0]
        return c + nll.mean() * 1e-6 + 1
    timeit("1_ce_take_along_axis_fwd_bwd",
           lambda c, ops: c + jax.grad(
               lambda lg: -jnp.take_along_axis(
                   lg, ops["t"][..., None], axis=-1)[..., 0].mean())(
                       ops["lg"] + c)[0, 0] * 1e-9 + 1,
           {"lg": logits3, "t": tgt3})

    def onehot_ce(c, ops):
        def f(lg):
            oh = (ops["t"][:, None] == jnp.arange(3)[None, :]
                  ).astype(lg.dtype)
            return -(lg * oh).sum(-1).mean()
        return c + jax.grad(f)(ops["lg"] + c)[0, 0] * 1e-9 + 1
    timeit("1_ce_onehot_dot_fwd_bwd", onehot_ce, {"lg": logits3, "t": tgt3})

    # OHEM top-k: full-sort value+grad vs argsort + k-row gather
    K_TOP = N // 5

    def ohem_sort(c, ops):
        def f(v):
            return lax.sort(v, is_stable=False)[N - K_TOP:].mean()
        return c + jax.grad(f)(ops["vec"] + c)[0] * 1e-9 + 1
    timeit("1_ohem_full_sort_fwd_bwd", ohem_sort, {"vec": vecN})

    def ohem_argsort_gather(c, ops):
        def f(v):
            _, idx = lax.sort_key_val(
                lax.stop_gradient(v), jnp.arange(N, dtype=jnp.int32),
                is_stable=False)
            return jnp.take(v, idx[N - K_TOP:]).mean()
        return c + jax.grad(f)(ops["vec"] + c)[0] * 1e-9 + 1
    timeit("1_ohem_argsort_kgather_fwd_bwd", ohem_argsort_gather,
           {"vec": vecN})

    # Lovász inner: sort-VJP scatter vs unsort-via-second-sort
    def lovasz_sortvjp(c, ops):
        def f(err):
            neg, fg = lax.sort_key_val(-err, ops["vec"], is_stable=False)
            coeffs = lax.stop_gradient(jnp.cumsum(fg) / N)
            return jnp.dot(-neg, coeffs)
        return c + jax.grad(f)(ops["vec"] + c)[0] * 1e-9 + 1
    timeit("1_lovasz_sort_vjp_fwd_bwd", lovasz_sortvjp, {"vec": vecN})

    def lovasz_unsort(c, ops):
        def f(err):
            err_sg = lax.stop_gradient(err)
            neg, packed = lax.sort_key_val(
                -err_sg,
                jnp.arange(N, dtype=jnp.int32), is_stable=False)
            fg = jnp.take(ops["vec"], packed)
            coeffs = jnp.cumsum(fg) / N
            # unsort coeffs by a second key-value sort on the permutation
            _, coeffs_unsorted = lax.sort_key_val(packed, coeffs,
                                                  is_stable=False)
            return jnp.dot(err, lax.stop_gradient(coeffs_unsorted))
        return c + jax.grad(f)(ops["vec"] + c)[0] * 1e-9 + 1
    timeit("1_lovasz_unsort_via_sort_fwd_bwd", lovasz_unsort, {"vec": vecN})

    # ---------------- class 4: narrow cumsum ----------------
    def cumsum_1d(c, ops):
        out = jnp.cumsum(ops["vec"] + c)
        return c + out[N // 2] * 1e-9 + 1
    timeit("4_cumsum_130k", cumsum_1d, {"vec": vecN})

    def cumsum_batched(c, ops):
        out = jnp.cumsum(ops["v"] + c, axis=1)
        return c + out[1, N // 2] * 1e-9 + 1
    timeit("4_cumsum_3x130k_batched", cumsum_batched, {"v": vec3N})

    v9 = jax.jit(lambda k: jax.random.normal(k, (9, N), jnp.float32))(key)
    timeit("4_cumsum_9x130k_batched",
           lambda c, ops: c + jnp.cumsum(ops["v"] + c, axis=1)[1, N // 2]
           * 1e-9 + 1, {"v": v9})

    # ---------------- class 2: wide bilinear-VJP scatter-add ----------------
    for cells, w, tag in ((CELLS_B, 256, "66049c_256w"),
                          (CELLS_B, 128, "66049c_128w"),
                          (CELLS_S, 256, "16641c_256w")):
        upd = jax.jit(lambda k, w=w: jax.random.normal(
            k, (N, w), jnp.bfloat16))(key)
        ids = jnp.asarray((rng.integers(0, cells, N)).astype(np.int32))

        def wide_scatter_add(c, ops, cells=cells):
            u = ops["upd"] + c.astype(jnp.bfloat16)
            out = jnp.zeros((cells, u.shape[1]), jnp.float32)
            out = out.at[ops["ids"]].add(u.astype(jnp.float32))
            return c + out[0, 0] * 1e-9 + 1
        timeit(f"2_scatter_add_{tag}", wide_scatter_add,
               {"upd": upd, "ids": ids}, K=8, rows=N)

        if w == 256:
            def split_scatter(c, ops, cells=cells):
                u = ops["upd"] + c.astype(jnp.bfloat16)
                out = jnp.zeros((cells, 256), jnp.float32)
                out = out.at[ops["ids"], :128].add(
                    u[:, :128].astype(jnp.float32))
                out = out.at[ops["ids"], 128:].add(
                    u[:, 128:].astype(jnp.float32))
                return c + out[0, 0] * 1e-9 + 1
            timeit(f"2_scatter_add_{tag}_split2x128", split_scatter,
                   {"upd": upd, "ids": ids}, K=8, rows=N)

            def sorted_consume(c, ops, cells=cells):
                u = ops["upd"] + c.astype(jnp.bfloat16)
                ids2 = (ops["ids"] + c.astype(jnp.int32) * 0)
                ks, order = lax.sort_key_val(
                    ids2, jnp.arange(N, dtype=jnp.int32), is_stable=False)
                us = jnp.take(u, order, axis=0)
                out = jax.ops.segment_sum(
                    us.astype(jnp.float32), ks, num_segments=cells,
                    indices_are_sorted=True)
                return c + out[0, 0] * 1e-9 + 1
            timeit(f"2_sort_gather_segsum_{tag}", sorted_consume,
                   {"upd": upd, "ids": ids}, K=8, rows=N)

    # batching the 3 windows' same-site scatters into one op
    upd3 = jax.jit(lambda k: jax.random.normal(
        k, (3 * N, 256), jnp.bfloat16))(key)
    ids3 = jnp.asarray(
        (rng.integers(0, CELLS_B, 3 * N)
         + np.repeat(np.arange(3) * CELLS_B, N)).astype(np.int32))

    def batched_windows(c, ops):
        u = ops["upd"] + c.astype(jnp.bfloat16)
        out = jnp.zeros((3 * CELLS_B, 256), jnp.float32)
        out = out.at[ops["ids"]].add(u.astype(jnp.float32))
        return c + out[0, 0] * 1e-9 + 1
    timeit("2_scatter_add_3win_batched_390k_256w", batched_windows,
           {"upd": upd3, "ids": ids3}, K=4, rows=3 * N)

    # ---------------- class 3: voxel-pool-VJP gathers ----------------
    grid64 = jax.jit(lambda k: jax.random.normal(
        k, (3 * GRID, 64), jnp.bfloat16))(key)
    grid64b = jax.jit(lambda k: jax.random.normal(
        k, (3 * GRID, 64), jnp.bfloat16))(jax.random.key(1))
    gids = jnp.asarray(rng.integers(0, 3 * GRID, 3 * N).astype(np.int32))

    def two_gathers(c, ops):
        p = (ops["ids"] + c.astype(jnp.int32)) % (3 * GRID)
        a = jnp.take(ops["g1"], p, axis=0)
        b = jnp.take(ops["g2"], p, axis=0)
        return c + (a.astype(jnp.float32).mean()
                    + b.astype(jnp.float32).mean()) * 1e-6 + 1
    timeit("3_two_gathers_390k_64w", two_gathers,
           {"g1": grid64, "g2": grid64b, "ids": gids}, K=8, rows=2 * 3 * N)

    def fused_gather(c, ops):
        p = (ops["ids"] + c.astype(jnp.int32)) % (3 * GRID)
        cat = jnp.concatenate([ops["g1"], ops["g2"]], axis=1)
        ab = jnp.take(cat, p, axis=0)
        return c + ab.astype(jnp.float32).mean() * 1e-6 + 1
    timeit("3_concat_plus_one_gather_390k_128w", fused_gather,
           {"g1": grid64, "g2": grid64b, "ids": gids}, K=8, rows=3 * N)

    def one_gather_128(c, ops):
        p = (ops["ids"] + c.astype(jnp.int32)) % (3 * GRID)
        cat = ops["gcat"]
        ab = jnp.take(cat, p, axis=0)
        return c + ab.astype(jnp.float32).mean() * 1e-6 + 1
    gcat = jnp.concatenate([grid64, grid64b], axis=1)
    timeit("3_one_gather_390k_128w_precat", one_gather_128,
           {"gcat": gcat, "ids": gids}, K=8, rows=3 * N)

    print(json.dumps({"metric": "train_roofline_ms",
                      **{k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
