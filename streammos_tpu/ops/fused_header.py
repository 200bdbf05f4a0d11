"""Fused TTA header: phase-split scatter output -> DownSample2D in one
Pallas kernel per TTA variant PAIR, reading the canonical grid once.

This is the kernel docs/DESIGN.md's phase-split postmortem calls for. The
eval frame's largest bucket (~40 ms of 92 ms) is the 512^2 region between
the full-grid scatter and the stride-2 header conv
(`/root/reference/deep_point/src/point_deep_cuda_kernel.cu:24-99` feeding
`networks/backbone.py:14-34` DownSample2D): XLA materializes the
(12, 512, 512, 64) bf16 grid (~400 MB), pays per-variant orientation
copies (`ops/tta_fold.py:orient_grid`), and surrounds the conv with layout
retiling worth ~20 ms against ~0.5 ms of FLOPs.

Here the scatter emits the space-to-depth phase layout directly
(`voxel_max_pool(phase_split=True)`, a free relabel of cell ids) and the
kernels consume it straight from HBM:

  input   G (Bt*T, Hh, Wh, P=4, V*C)    canonical orientation, half res
  output  Y (V, Bt, Hh, Wh, Cout)       DownSample2D output per variant,
                                        CANONICAL-anchored (orient after,
                                        at 1/16 the bytes of the old path)

Key algebra (exact — the grid sides are even, so no half-pixel error): a
full-resolution axis reversal r -> 2*Hh-1-r is, in phase space r = 2h+p,
the half-res reversal h -> Hh-1-h plus a phase-bit swap p -> 1-p.
Anchoring the flipped variant's output at a = Hh-1-i puts every variant's
stride-2 taps on the SAME canonical half-res rows:

  conv3x3/s2, one axis:   out[i] = K0*g[i-1,p=1] + K1*g[i,0] + K2*g[i,1]
  x-flipped, anchored:    Y[a]   = K0*g[a+1,0]   + K1*g[a,1] + K2*g[a,0]

(the 3x3/s2 maxpool of the 1x1 branch decomposes identically, with -inf
instead of 0 outside the grid). Both DownSample2D branches, the
frame-split sum over T kernel slices (`nn/blocks.py:DownSample2D`), the
eval BatchNorm affines, and the final ReLU run inside the kernel; nothing
at 512^2 resolution is ever materialized, and the per-variant 400 MB
orientation copies disappear (outputs are re-oriented at 256^2 x 32).

Mosaic constraints that shaped the implementation:
* HBM DMA slices must be lane-tile aligned — a (.., p, v, 64ch) slice
  fails to legalize, but the v-major channel fold means a variant PAIR is
  one contiguous 128-channel block, so each kernel handles the two
  variants that share a row flip (fx = v>>1) and selects each variant via
  zero rows in the merged weight matrices (MXU padding is free — the op
  is memory-bound);
* vector-level sublane rotates/concats of these shapes fail to legalize,
  so every spatial shift is an offset load/store against border-padded
  VMEM scratch (`gbuf`/`zbuf` carry one pad column per side).

Traffic: the two pair kernels together read |G| exactly once (~400 MB) +
write 4 x 4 MB, vs ~3-4 passes of 400 MB before.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V_TTA = 4
P_PHASE = 4
PAIR = 2  # variants per kernel: {2k, 2k+1} share fx = k
GPAD = 16  # gbuf border width: bf16 sublane-tile-aligned DMA destinations
ZPAD = 8   # zbuf border width: f32 sublane tile
NEG = float(np.finfo(np.float32).min) / 2


def _axis_taps(flip: bool):
    """Canonical-anchored conv taps of one axis: (slot, offset, phase,
    k3 index). Slot 0 is the single off-row tap (offset -1 unflipped / +1
    flipped), slot 1 the two center taps (see module docstring)."""
    if flip:
        return ((0, +1, 0, 0), (1, 0, 1, 1), (1, 0, 0, 2))
    return ((0, -1, 1, 0), (1, 0, 0, 1), (1, 0, 1, 2))


def _pool_axis_taps(flip: bool):
    """(offset, phase) of the 3 maxpool taps of one axis."""
    if flip:
        return ((+1, 0), (0, 1), (0, 0))
    return ((-1, 1), (0, 0), (0, 1))


def merged_conv_kernel(k3: jax.Array, v: int, T: int, C: int,
                       dtype) -> jax.Array:
    """(T, 2, 2, P*PAIR*C, Cout) phase-merged conv kernel for variant v;
    rows follow the pair tile's channel layout p*(PAIR*C) + vp*C + c with
    zeros on the sibling variant's rows.

    k3: (3, 3, T*C, Cout) full-res kernel, frame-major channels
    (`nn/blocks.py:DownSample2D` frame-split)."""
    fx, fy, vp = bool(v >> 1), bool(v & 1), v % PAIR
    Cout = k3.shape[-1]
    out = jnp.zeros((T, 2, 2, P_PHASE * PAIR * C, Cout), jnp.float32)
    for (rs, _ro, rp, rk) in _axis_taps(fx):
        for (cs, _co, cp, ck) in _axis_taps(fy):
            base = (2 * rp + cp) * PAIR * C + vp * C
            for t in range(T):
                blk = k3[rk, ck, t * C:(t + 1) * C].astype(jnp.float32)
                out = out.at[t, rs, cs, base:base + C].add(blk)
    return out.astype(dtype)


def merged_pool_kernel(k1: jax.Array, v: int, T: int, C: int,
                       dtype) -> jax.Array:
    """(T, P, P*PAIR*C, Cout) per-phase 1x1 kernels for variant v (a 1x1
    conv does not mix phases; per-phase outputs keep every matmul result
    in a clean zero-offset layout)."""
    vp = v % PAIR
    Cout = k1.shape[-1]
    out = jnp.zeros((T, P_PHASE, P_PHASE * PAIR * C, Cout), jnp.float32)
    for p in range(P_PHASE):
        base = p * PAIR * C + vp * C
        for t in range(T):
            blk = k1[0, 0, t * C:(t + 1) * C].astype(jnp.float32)
            out = out.at[t, p, base:base + C].add(blk)
    return out.astype(dtype)


def _pair_kernel(g_hbm, kc_ref, kp_ref, aff_ref, y_ref, gbuf, zbuf, sems,
                 *, Bt: int, T: int, Hh: int, Wh: int, C: int, Cout: int,
                 TR: int, k_pair: int):
    """One variant pair's fused DownSample2D over the phase grid.

    Grid (Bt, n_row_tiles). Per step: DMA this tile's T frame slices
    (body TR rows + two 1-row halos, the pair's P lane-aligned channel
    blocks), then per variant-in-pair accumulate both branches over
    frames, apply BN affines, pool, ReLU.

    Refs: g_hbm (Bt*T, Hh, Wh, P*V*C) flat channels in ANY/HBM (the
    pair's per-phase 128-channel blocks are lane-tile-aligned slices);
    kc (PAIR, T, 2, 2, P*PAIR*C, Cout) VMEM;
    kp (PAIR, T, P, P*PAIR*C, Cout) VMEM; aff (4, Cout) f32 VMEM — rows
    (conv scale, conv bias, pool scale, pool bias);
    y block (PAIR, 1, TR, Wh, Cout);
    gbuf (T, TR+2, Wh+2*GPAD, P*PAIR*C) scratch — DMA destinations must be
    sublane-tile aligned, so the borders are GPAD(=16)-wide and the +-1
    tap windows become (legal) unaligned value reads;
    zbuf (P, TR+2, Wh+2*ZPAD, Cout) f32 scratch (ZPAD=8, same story);
    sems: DMA semaphore.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    Cin = P_PHASE * PAIR * C
    r0 = i * TR  # first output row of this tile
    fx = bool(k_pair)
    W2 = Wh + 2 * GPAD
    ch0 = k_pair * PAIR * C  # the pair's channel offset within a phase

    # ---- body rows [r0, r0+TR) -> gbuf rows [1, TR+1), cols [1, Wh+1)
    body = []
    for t in range(T):
        for p in range(P_PHASE):
            body.append(pltpu.make_async_copy(
                g_hbm.at[b * T + t, pl.ds(r0, TR), :,
                         pl.ds(p * V_TTA * C + ch0, PAIR * C)],
                gbuf.at[t, pl.ds(1, TR), pl.ds(GPAD, Wh),
                        pl.ds(p * PAIR * C, PAIR * C)],
                sems))
    for c in body:
        c.start()

    # ---- halo rows (1 row each); zeroed at the grid border
    def halo(src_row, dst_row):
        return [pltpu.make_async_copy(
            g_hbm.at[b * T + t, pl.ds(src_row, 1), :,
                     pl.ds(p * V_TTA * C + ch0, PAIR * C)],
            gbuf.at[t, pl.ds(dst_row, 1), pl.ds(GPAD, Wh),
                    pl.ds(p * PAIR * C, PAIR * C)],
            sems)
            for t in range(T) for p in range(P_PHASE)]

    @pl.when(i > 0)
    def _():
        for c in halo(r0 - 1, 0):
            c.start()

    @pl.when(i == 0)
    def _():
        for t in range(T):
            gbuf[t, 0] = jnp.zeros((W2, Cin), gbuf.dtype)

    @pl.when(i < n_i - 1)
    def _():
        for c in halo(r0 + TR, TR + 1):
            c.start()

    @pl.when(i == n_i - 1)
    def _():
        for t in range(T):
            gbuf[t, TR + 1] = jnp.zeros((W2, Cin), gbuf.dtype)

    # zero-pad border columns (conv zero padding); GPAD-wide aligned stores
    for t in range(T):
        gbuf[t, :, 0:GPAD] = jnp.zeros((TR + 2, GPAD, Cin), gbuf.dtype)
        gbuf[t, :, Wh + GPAD:W2] = jnp.zeros((TR + 2, GPAD, Cin),
                                             gbuf.dtype)

    for c in body:
        c.wait()

    @pl.when(i > 0)
    def _():
        for c in halo(r0 - 1, 0):
            c.wait()

    @pl.when(i < n_i - 1)
    def _():
        for c in halo(r0 + TR, TR + 1):
            c.wait()

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (TR, Wh, 1), 0)
    r_off = +1 if fx else -1

    for vp in range(PAIR):
        fy = bool(vp)
        c_off = +1 if fy else -1

        # ---- conv branch: 2x2 (row slot, col slot) matmuls per frame;
        # each tap window is an offset ref load from the padded tile
        conv = jnp.zeros((TR * Wh, Cout), jnp.float32)
        for t in range(T):
            for rs, rstart in ((0, 1 + r_off), (1, 1)):
                for cs, cstart in ((0, GPAD + c_off), (1, GPAD)):
                    rows = gbuf[t, rstart:rstart + TR,
                                cstart:cstart + Wh, :]
                    conv += jax.lax.dot_general(
                        rows.reshape(TR * Wh, Cin), kc_ref[vp, t, rs, cs],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        conv = conv.reshape(TR, Wh, Cout) * aff_ref[0] + aff_ref[1]

        # ---- pool branch: one clean-layout matmul per phase (t-summed) +
        # BN affine, staged into the NEG-padded zbuf so the 3x3 taps are
        # offset loads with the exclusion value in the border columns
        for p in range(P_PHASE):
            zp = jnp.zeros(((TR + 2) * Wh, Cout), jnp.float32)
            for t in range(T):
                g_rows = gbuf[t, :, GPAD:GPAD + Wh, :]
                zp += jax.lax.dot_general(
                    g_rows.reshape((TR + 2) * Wh, Cin), kp_ref[vp, t, p],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            zbuf[p, :, 0:ZPAD] = jnp.full((TR + 2, ZPAD, Cout), NEG,
                                          jnp.float32)
            zbuf[p, :, Wh + ZPAD:Wh + 2 * ZPAD] = jnp.full(
                (TR + 2, ZPAD, Cout), NEG, jnp.float32)
            zbuf[p, :, ZPAD:ZPAD + Wh, :] = (
                zp * aff_ref[2] + aff_ref[3]).reshape(TR + 2, Wh, Cout)

        # ---- 3x3/s2 maxpool in phase space; -inf outside the grid
        pooled = jnp.full((TR, Wh, Cout), NEG, jnp.float32)
        for (p_ro, p_rp) in _pool_axis_taps(fx):
            row_ok = ((r0 + rows_iota + p_ro >= 0)
                      & (r0 + rows_iota + p_ro < Hh))
            for (p_co, p_cp) in _pool_axis_taps(fy):
                ph = 2 * p_rp + p_cp
                zz = zbuf[ph, 1 + p_ro:1 + p_ro + TR,
                          ZPAD + p_co:ZPAD + p_co + Wh, :]
                pooled = jnp.maximum(pooled, jnp.where(row_ok, zz, NEG))

        y_ref[vp, 0] = jnp.maximum(conv + pooled, 0.0).astype(y_ref.dtype)


def _pick_tr(Hh: int) -> int:
    for tr in (4, 2):
        if Hh % tr == 0 and Hh // tr >= 2:
            return tr
    return 0


def fused_header_tta(g_phase: jax.Array, k3: jax.Array, k1: jax.Array,
                     conv_affine: Tuple[jax.Array, jax.Array],
                     pool_affine: Tuple[jax.Array, jax.Array],
                     T: int, interpret: bool = False) -> jax.Array:
    """All four TTA variants' DownSample2D outputs, canonical-anchored.

    g_phase: (Bt*T, Hh, Wh, P, V*C) — `voxel_max_pool(..., phase_split=True)`
      output whose channel axis carries the folded TTA variants (v-major,
      as `models.stream_mos` folds them).
    k3 / k1: (3, 3, T*C, Cout) / (1, 1, T*C, Cout) DownSample2D kernels.
    conv_affine / pool_affine: per-channel eval-BN (scale, bias) pairs.

    Returns (V, Bt, Hh, Wh, Cout) in g_phase's dtype, canonical
    orientation — apply `tta_fold.orient_grid` per variant for the
    variant-oriented stack the rest of the encoder consumes.
    """
    BtT, Hh, Wh, P, VC = g_phase.shape
    assert P == P_PHASE and VC % V_TTA == 0
    C = VC // V_TTA
    assert BtT % T == 0
    Bt = BtT // T
    Cout = k3.shape[-1]
    assert k3.shape == (3, 3, T * C, Cout) and k1.shape[-2] == T * C
    dt = g_phase.dtype
    TR = _pick_tr(Hh)
    if TR == 0:
        return fused_header_reference(g_phase, k3, k1, conv_affine,
                                      pool_affine, T)
    # flat channels: pair k of phase p is the lane-tile-aligned 128-wide
    # slice at p*V*C + k*PAIR*C (v-major fold)
    g_flat = g_phase.reshape(BtT, Hh, Wh, P * VC)

    aff = jnp.stack([conv_affine[0], conv_affine[1],
                     pool_affine[0], pool_affine[1]]).astype(jnp.float32)

    n_tiles = Hh // TR
    outs = []
    for k_pair in range(V_TTA // PAIR):
        kc = jnp.stack([merged_conv_kernel(k3, PAIR * k_pair + vp, T, C, dt)
                        for vp in range(PAIR)])
        kp = jnp.stack([merged_pool_kernel(k1, PAIR * k_pair + vp, T, C, dt)
                        for vp in range(PAIR)])
        kernel = functools.partial(
            _pair_kernel, Bt=Bt, T=T, Hh=Hh, Wh=Wh, C=C, Cout=Cout,
            TR=TR, k_pair=k_pair)
        Cin = P_PHASE * PAIR * C
        y = pl.pallas_call(
            kernel,
            grid=(Bt, n_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((PAIR, T, 2, 2, Cin, Cout),
                             lambda b, i: (0, 0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PAIR, T, P_PHASE, Cin, Cout),
                             lambda b, i: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, Cout), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((PAIR, 1, TR, Wh, Cout),
                                   lambda b, i: (0, b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((PAIR, Bt, Hh, Wh, Cout), dt),
            scratch_shapes=[
                pltpu.VMEM((T, TR + 2, Wh + 2 * GPAD, Cin), dt),
                pltpu.VMEM((P_PHASE, TR + 2, Wh + 2 * ZPAD, Cout),
                           jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(g_flat, kc, kp, aff)
        outs.append(y)
    return jnp.concatenate(outs, axis=0)


def fused_header_reference(g_phase: jax.Array, k3: jax.Array, k1: jax.Array,
                           conv_affine, pool_affine, T: int) -> jax.Array:
    """Slow, obviously-correct XLA composition (used for parity tests and
    as the non-TPU fallback): rebuild the full-res grid, orient each
    variant, run the standard DownSample2D math, anchor the outputs back
    to canonical orientation."""
    from streammos_tpu.ops.tta_fold import orient_grid

    BtT, Hh, Wh, P, VC = g_phase.shape
    C = VC // V_TTA
    Bt = BtT // T
    g7 = g_phase.reshape(BtT, Hh, Wh, 2, 2, V_TTA, C)
    # full[2h+bx, 2w+by] = G[h, w, 2*bx+by]
    full = jnp.transpose(g7, (0, 1, 3, 2, 4, 5, 6)).reshape(
        BtT, 2 * Hh, 2 * Wh, V_TTA, C)

    outs = []
    dn = ("NHWC", "HWIO", "NHWC")
    for v in range(V_TTA):
        gv = orient_grid(full[..., v, :], v, "bev", (1, 2))
        gv = gv.reshape(Bt, T, 2 * Hh, 2 * Wh, C)
        gv = jnp.concatenate([gv[:, t] for t in range(T)], axis=-1)
        conv = jax.lax.conv_general_dilated(
            gv.astype(jnp.float32), k3.astype(jnp.float32), (2, 2),
            ((1, 1), (1, 1)), dimension_numbers=dn)
        conv = conv * conv_affine[0] + conv_affine[1]
        z = jax.lax.conv_general_dilated(
            gv.astype(jnp.float32), k1.astype(jnp.float32), (1, 1),
            ((0, 0), (0, 0)), dimension_numbers=dn)
        z = z * pool_affine[0] + pool_affine[1]
        pooled = jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jnp.maximum(conv + pooled, 0.0)
        outs.append(orient_grid(y, v, "bev", (1, 2)))  # anchor canonical
    return jnp.stack(outs).astype(g_phase.dtype)
