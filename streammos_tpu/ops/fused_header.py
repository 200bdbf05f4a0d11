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
(`voxel_max_pool(phase_split=True, row_pad=1)` — a free relabel of cell
ids, with one always-empty half-res row above and below the grid) and the
kernels consume it straight from HBM:

  input   G (Bt*T, Hh+2, Wh, P=4, V*C)  canonical orientation, half res,
                                        1 zero row of padding top+bottom
  output  Y (Bt, Hh, Wh, PAIR*Cout)     DownSample2D output for the two
                                        variants of the pair side by side
                                        on channels, CANONICAL-anchored
                                        (orient after, at 1/16 the bytes
                                        of the old path)

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

Round-2 second iteration (the first shipped at 8.84 ms/call, ~4x off its
traffic floor — docs/DESIGN.md):
* the T frames moved from VMEM-resident slabs into the GRID (innermost
  dim) with f32 accumulators carried across steps, shrinking the working
  set enough for TR=8 row tiles and a 2-slot double buffer — DMA for
  step k+1 is in flight while step k computes;
* the scatter's `row_pad=1` makes each tile's (TR+2)-row halo window one
  static in-bounds DMA per (phase) — 4 copies per step, no edge cases,
  no per-tile zero-row stores;
* the two variants of a pair ride the matmul N dimension together
  (n = PAIR*Cout = 64) wherever they share an input window — the center
  column taps and the whole pool branch — removing most of the MXU
  lane-padding waste of n=32 matmuls. Only the off-column conv tap
  (whose +-1 column offset differs between the y-flipped pair members)
  keeps per-variant matmuls.

Mosaic constraints that shaped the implementation (kept from v1):
* HBM DMA slices must be lane-tile aligned — the v-major channel fold
  makes a variant pair one contiguous 128-channel block per phase;
* vector-level sublane rotates/concats of these shapes do not legalize,
  so every spatial shift is an offset load/store against border-padded
  VMEM scratch (GPAD-wide columns in `gbuf`, ZPAD in `zacc`).

Traffic: the two pair kernels together read |G| once (+TR+2/TR halo
overlap) + write 2 x 4 MB; compute floor ~1.9 ms of n-padded matmuls.
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
ZPAD = 8   # zacc border width: f32 sublane tile
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


def conv_kernel_shared(k3: jax.Array, k_pair: int, T: int, C: int,
                       dtype) -> Tuple[jax.Array, jax.Array, int]:
    """K-COMPACTED merged conv kernels for the CENTER column taps (shared
    window for both pair members), as (kcs0, kcs1, p0):

    * kcs1 (T, P*PAIR*C, PAIR*Cout) — the two center-ROW taps; their four
      (row-phase, col-phase) combinations touch every phase, so the k
      dimension stays the full phase stack;
    * kcs0 (T, 2*PAIR*C, PAIR*Cout) — the single off-row tap; its row
      phase is FIXED by the pair's flip (rp0), so only the two phases
      {2*rp0, 2*rp0+1} carry nonzero rows. Emitting just that contiguous
      (and lane-tile-aligned: 2*PAIR*C = 256) phase pair halves this
      matmul's k — the "k-compaction" headroom the round-2 kernel left
      (~50% of its conv k-tiles multiplied structural zeros).
      ``p0 = 2*rp0`` is the phase offset of the compacted slice.

    Rows follow the (sliced) channel layout p*(PAIR*C) + vp*C + c, columns
    vp*Cout + co. k3: (3, 3, T*C, Cout) full-res kernel, frame-major
    channels (`nn/blocks.py:DownSample2D` frame-split)."""
    fx = bool(k_pair)
    Cout = k3.shape[-1]
    rp0 = _axis_taps(fx)[0][2]
    p0 = 2 * rp0
    kcs0 = jnp.zeros((T, 2 * PAIR * C, PAIR * Cout), jnp.float32)
    kcs1 = jnp.zeros((T, P_PHASE * PAIR * C, PAIR * Cout), jnp.float32)
    for vp in range(PAIR):
        fy = bool(vp)
        for (rs, _ro, rp, rk) in _axis_taps(fx):
            for (cs, _co, cp, ck) in _axis_taps(fy):
                if cs != 1:
                    continue
                for t in range(T):
                    blk = k3[rk, ck, t * C:(t + 1) * C].astype(jnp.float32)
                    if rs == 0:
                        base = (2 * rp + cp - p0) * PAIR * C + vp * C
                        kcs0 = kcs0.at[t, base:base + C,
                                       vp * Cout:(vp + 1) * Cout].add(blk)
                    else:
                        base = (2 * rp + cp) * PAIR * C + vp * C
                        kcs1 = kcs1.at[t, base:base + C,
                                       vp * Cout:(vp + 1) * Cout].add(blk)
    return kcs0.astype(dtype), kcs1.astype(dtype), p0


def conv_kernel_split(k3: jax.Array, k_pair: int, T: int, C: int,
                      dtype) -> Tuple[jax.Array, Tuple]:
    """K-COMPACTED conv kernels for the single OFF-COLUMN tap, whose +-1
    column window differs per pair member.

    Each (row-tap ti, pair-member vp) combination touches exactly ONE
    phase, so its matmul needs only that phase's (lane-tile-aligned)
    PAIR*C block of the input — k = PAIR*C = 128 instead of the full
    P*PAIR*C = 512 (4x fewer k-tiles on this family than the round-2
    layout). Returns:

    * kernel (T, 3, PAIR, PAIR*C, PAIR*Cout) indexed [t, ti, vp], rows =
      the phase block's channel layout (zeros on the sibling vp's half),
      columns = the full pair block with zeros on the sibling's half (the
      result accumulates into the shared n = PAIR*Cout sum in place);
    * taps: per (ti, vp) static metadata (row_offset, col_offset, phase)
      for the kernel's input slicing."""
    fx = bool(k_pair)
    Cout = k3.shape[-1]
    out = jnp.zeros((T, 3, PAIR, PAIR * C, PAIR * Cout), jnp.float32)
    taps = []
    for ti, (rs, ro, rp, rk) in enumerate(_axis_taps(fx)):
        row = []
        for vp in range(PAIR):
            fy = bool(vp)
            (cs0, co, cp, ck) = _axis_taps(fy)[0]
            assert cs0 == 0
            ph = 2 * rp + cp
            row.append((ro, co, ph))
            for t in range(T):
                blk = k3[rk, ck, t * C:(t + 1) * C].astype(jnp.float32)
                out = out.at[t, ti, vp, vp * C:(vp + 1) * C,
                             vp * Cout:(vp + 1) * Cout].add(blk)
        taps.append(tuple(row))
    return out.astype(dtype), tuple(taps)


def pool_kernel(k1: jax.Array, T: int, C: int, dtype) -> jax.Array:
    """(T, PAIR*C, PAIR*Cout) block-diagonal 1x1 kernel (vp in -> vp out);
    a 1x1 conv does not mix phases, and every phase uses the same kernel,
    so one compact k=PAIR*C matmul per phase serves both pair members."""
    Cout = k1.shape[-1]
    out = jnp.zeros((T, PAIR * C, PAIR * Cout), jnp.float32)
    for vp in range(PAIR):
        for t in range(T):
            blk = k1[0, 0, t * C:(t + 1) * C].astype(jnp.float32)
            out = out.at[t, vp * C:vp * C + C,
                         vp * Cout:(vp + 1) * Cout].add(blk)
    return out.astype(dtype)


def _pair_kernel(g_hbm, kcs0_ref, kcs1_ref, kcx_ref, kp_ref, aff_ref, y_ref,
                 gbuf, zacc, cacc, sems, *, Bt: int, T: int, Hh: int,
                 Wh: int, C: int, Cout: int, TR: int, k_pair: int,
                 p0: int, xtaps: Tuple):
    """One variant pair's fused DownSample2D over the padded phase grid.

    Grid (Bt, n_row_tiles, T) — frames innermost, with f32 accumulators
    carried across the T steps of a tile and a 2-slot double buffer so the
    next step's 4 phase-block DMAs overlap this step's matmuls.

    Refs: g_hbm (Bt*T, P, Hh+2, Wh, V*C) PHASE-OUTER in ANY/HBM (the
    layout the scatter's flat output bitcasts to for free; the pair's
    128-channel block is a lane-tile-aligned slice of each phase plane);
    kcs0 (T, 2*PAIR*C, PAIR*Cout) k-compacted off-row center-column conv
    kernel (phase pair p0, p0+1 only) + kcs1 (T, P*PAIR*C, PAIR*Cout)
    center-rows kernel, VMEM;
    kcx (T, 3, PAIR, PAIR*C, PAIR*Cout) k-compacted off-column conv
    kernels (one phase block per (row-tap, member), `xtaps` metadata) VMEM;
    kp (T, PAIR*C, PAIR*Cout) pool 1x1 VMEM;
    aff (4, PAIR*Cout) f32 VMEM — rows (conv scale, conv bias, pool
    scale, pool bias), each variant-tiled;
    y block (1, TR, Wh, PAIR*Cout);
    gbuf (2, TR+2, Wh+2*GPAD, P*PAIR*C) double-buffered tile scratch —
    DMA destinations must be sublane-tile aligned, so the borders are
    GPAD(=16)-wide and the +-1 tap windows become (legal) unaligned value
    reads;
    zacc (P, TR+2, Wh+2*ZPAD, PAIR*Cout) f32 pool-branch accumulator
    (NEG borders double as the maxpool's out-of-grid exclusion value);
    cacc (TR*Wh, PAIR*Cout) f32 conv-branch accumulator;
    sems: (2,) DMA semaphores, one per buffer slot.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    t = pl.program_id(2)
    n_i = pl.num_programs(1)
    Cin = P_PHASE * PAIR * C
    PC = PAIR * Cout
    fx = bool(k_pair)
    W2 = Wh + 2 * GPAD
    ch0 = k_pair * PAIR * C  # the pair's channel offset within a phase

    step = (b * n_i + i) * T + t
    last = Bt * n_i * T - 1
    slot = jax.lax.rem(step, 2)
    nxt = step + 1
    nb = nxt // (n_i * T)
    ni = jax.lax.rem(nxt // T, n_i)
    ntt = jax.lax.rem(nxt, T)

    def copies(s, cb, ci, ct):
        # padded G: tile i's halo window is rows [i*TR, i*TR + TR+2)
        return [pltpu.make_async_copy(
            g_hbm.at[cb * T + ct, p, pl.ds(ci * TR, TR + 2), :,
                     pl.ds(ch0, PAIR * C)],
            gbuf.at[s, :, pl.ds(GPAD, Wh), pl.ds(p * PAIR * C, PAIR * C)],
            sems.at[s]) for p in range(P_PHASE)]

    # ---- pipeline: warm up at step 0, then prefetch one step ahead
    @pl.when(step == 0)
    def _():
        # zero the column borders once — DMAs never touch them
        gbuf[:, :, 0:GPAD] = jnp.zeros((2, TR + 2, GPAD, Cin), gbuf.dtype)
        gbuf[:, :, Wh + GPAD:W2] = jnp.zeros((2, TR + 2, GPAD, Cin),
                                             gbuf.dtype)
        for c in copies(0, b, i, t):
            c.start()

    @pl.when(step < last)
    def _():
        for c in copies(1 - slot, nb, ni, ntt):
            c.start()

    for c in copies(slot, b, i, t):
        c.wait()

    # ---- per-frame matmuls, accumulated across the T grid steps
    @pl.when(t == 0)
    def _():
        cacc[:] = jnp.zeros((TR * Wh, PC), jnp.float32)
        zacc[:, :, ZPAD:ZPAD + Wh] = jnp.zeros((P_PHASE, TR + 2, Wh, PC),
                                               jnp.float32)
        zacc[:, :, 0:ZPAD] = jnp.full((P_PHASE, TR + 2, ZPAD, PC), NEG,
                                      jnp.float32)
        zacc[:, :, Wh + ZPAD:] = jnp.full((P_PHASE, TR + 2, ZPAD, PC), NEG,
                                          jnp.float32)

    r_off = +1 if fx else -1
    conv = cacc[:]
    # center-column taps: both pair members share the window -> n = PAIR*Cout.
    # Off-row tap (fixed row phase): k-compacted to its phase PAIR — a
    # lane-tile-aligned 2*PAIR*C slice of the tile
    rows0 = gbuf[slot, 1 + r_off:1 + r_off + TR, GPAD:GPAD + Wh,
                 p0 * PAIR * C:(p0 + 2) * PAIR * C]
    conv += jax.lax.dot_general(
        rows0.reshape(TR * Wh, 2 * PAIR * C), kcs0_ref[t],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # center-row taps touch every phase: full-k matmul
    rows1 = gbuf[slot, 1:1 + TR, GPAD:GPAD + Wh, :]
    conv += jax.lax.dot_general(
        rows1.reshape(TR * Wh, Cin), kcs1_ref[t],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # off-column taps: each (row-tap, member) reads exactly ONE phase
    # block (k = PAIR*C, lane-tile aligned); the kernel's zero
    # sibling-rows/columns land the result in the shared n = PAIR*Cout sum
    for ti in range(3):
        for vp in range(PAIR):
            ro, co, ph = xtaps[ti][vp]
            rows = gbuf[slot, 1 + ro:1 + ro + TR,
                        GPAD + co:GPAD + co + Wh,
                        ph * PAIR * C:(ph + 1) * PAIR * C]
            conv += jax.lax.dot_general(
                rows.reshape(TR * Wh, PAIR * C), kcx_ref[t, ti, vp],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    cacc[:] = conv

    # pool branch: per phase, one compact k=PAIR*C matmul for both members
    for p in range(P_PHASE):
        g_rows = gbuf[slot, :, GPAD:GPAD + Wh,
                      p * PAIR * C:(p + 1) * PAIR * C]
        zp = jax.lax.dot_general(
            g_rows.reshape((TR + 2) * Wh, PAIR * C), kp_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        zacc[p, :, ZPAD:ZPAD + Wh] = (
            zacc[p, :, ZPAD:ZPAD + Wh]
            + zp.reshape(TR + 2, Wh, PC))

    # ---- epilogue on the last frame: affines, maxpool taps, ReLU, write
    @pl.when(t == T - 1)
    def _():
        for p in range(P_PHASE):
            zacc[p, :, ZPAD:ZPAD + Wh] = (
                zacc[p, :, ZPAD:ZPAD + Wh] * aff_ref[2] + aff_ref[3])

        r0 = i * TR
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (TR, Wh, 1), 0)
        lane_vp = jax.lax.broadcasted_iota(jnp.int32, (TR, Wh, PC),
                                           2) // Cout
        pooled = jnp.full((TR, Wh, PC), NEG, jnp.float32)
        for vp in range(PAIR):
            fy = bool(vp)
            for (p_ro, p_rp) in _pool_axis_taps(fx):
                row_ok = ((r0 + rows_iota + p_ro >= 0)
                          & (r0 + rows_iota + p_ro < Hh))
                for (p_co, p_cp) in _pool_axis_taps(fy):
                    ph = 2 * p_rp + p_cp
                    zz = zacc[ph, 1 + p_ro:1 + p_ro + TR,
                              ZPAD + p_co:ZPAD + p_co + Wh, :]
                    ok = row_ok & (lane_vp == vp)
                    pooled = jnp.maximum(pooled, jnp.where(ok, zz, NEG))

        conv_out = (cacc[:].reshape(TR, Wh, PC) * aff_ref[0] + aff_ref[1])
        y_ref[0] = jnp.maximum(conv_out + pooled, 0.0).astype(y_ref.dtype)


def _pick_tr(Hh: int) -> int:
    for tr in (8, 4, 2):
        if Hh % tr == 0 and Hh // tr >= 2:
            return tr
    return 0


def fused_header_tta(g_phase: jax.Array, k3: jax.Array, k1: jax.Array,
                     conv_affine: Tuple[jax.Array, jax.Array],
                     pool_affine: Tuple[jax.Array, jax.Array],
                     T: int, interpret: bool = False) -> jax.Array:
    """All four TTA variants' DownSample2D outputs, canonical-anchored.

    g_phase: (Bt*T, P, Hh+2, Wh, V*C) PHASE-OUTER —
      `voxel_max_pool(..., phase_split="outer", row_pad=1)` output (one
      always-zero half-res row above and below each phase plane) whose
      channel axis carries the folded TTA variants (v-major, as
      `models.stream_mos` folds them). Phase-outer makes this array the
      scatter's flat output verbatim (no retile between scatter and
      header).
    k3 / k1: (3, 3, T*C, Cout) / (1, 1, T*C, Cout) DownSample2D kernels.
    conv_affine / pool_affine: per-channel eval-BN (scale, bias) pairs.

    Returns (V, Bt, Hh, Wh, Cout) in g_phase's dtype, canonical
    orientation — apply `tta_fold.orient_grid` per variant for the
    variant-oriented stack the rest of the encoder consumes.
    """
    BtT, P, Hp, Wh, VC = g_phase.shape
    assert P == P_PHASE and VC % V_TTA == 0
    Hh = Hp - 2  # row_pad=1 top and bottom
    C = VC // V_TTA
    assert BtT % T == 0
    Bt = BtT // T
    Cout = k3.shape[-1]
    assert k3.shape == (3, 3, T * C, Cout) and k1.shape[-2] == T * C
    dt = g_phase.dtype
    TR = _pick_tr(Hh)
    if TR == 0:
        # no-silent-caps rule: say so when the kernel cannot tile this grid
        import warnings

        warnings.warn(
            f"fused_header_tta: Hh={Hh} has no valid row-tile (needs an 8/4/2"
            " divisor with >=2 tiles); falling back to the XLA reference"
            " composition", stacklevel=2)
        return fused_header_reference(g_phase, k3, k1, conv_affine,
                                      pool_affine, T)
    # phase-outer: each phase is its own (Hp, Wh, V*C) plane; pair k's
    # 128-channel block is the lane-tile-aligned slice at k*PAIR*C

    def tile_pair(a):
        return jnp.tile(a.astype(jnp.float32), (PAIR,))

    aff = jnp.stack([tile_pair(conv_affine[0]), tile_pair(conv_affine[1]),
                     tile_pair(pool_affine[0]), tile_pair(pool_affine[1])])

    n_tiles = Hh // TR
    Cin = P_PHASE * PAIR * C
    PC = PAIR * Cout
    kp = pool_kernel(k1, T, C, dt)
    outs = []
    for k_pair in range(V_TTA // PAIR):
        kcs0, kcs1, p0 = conv_kernel_shared(k3, k_pair, T, C, dt)
        kcx, xtaps = conv_kernel_split(k3, k_pair, T, C, dt)
        kernel = functools.partial(
            _pair_kernel, Bt=Bt, T=T, Hh=Hh, Wh=Wh, C=C, Cout=Cout,
            TR=TR, k_pair=k_pair, p0=p0, xtaps=xtaps)
        y = pl.pallas_call(
            kernel,
            grid=(Bt, n_tiles, T),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((T, 2 * PAIR * C, PC),
                             lambda b, i, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, Cin, PC), lambda b, i, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 3, PAIR, PAIR * C, PC),
                             lambda b, i, t: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, PAIR * C, PC),
                             lambda b, i, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, PC), lambda b, i, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TR, Wh, PC),
                                   lambda b, i, t: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bt, Hh, Wh, PC), dt),
            scratch_shapes=[
                pltpu.VMEM((2, TR + 2, Wh + 2 * GPAD, Cin), dt),
                pltpu.VMEM((P_PHASE, TR + 2, Wh + 2 * ZPAD, PC),
                           jnp.float32),
                pltpu.VMEM((TR * Wh, PC), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            # the double-buffered TR=8 working set slightly exceeds the
            # 16 MiB default scoped-vmem limit; v5e VMEM is far larger
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(g_phase, kcs0, kcs1, kcx, kp, aff)
        # split the pair back out of the channel axis
        outs.append(y[..., :Cout])
        outs.append(y[..., Cout:])
    return jnp.stack(outs, axis=0)


def fused_header_reference(g_phase: jax.Array, k3: jax.Array, k1: jax.Array,
                           conv_affine, pool_affine, T: int) -> jax.Array:
    """Slow, obviously-correct XLA composition (used for parity tests and
    as the non-TPU fallback): strip the padding rows, rebuild the full-res
    grid, orient each variant, run the standard DownSample2D math, anchor
    the outputs back to canonical orientation."""
    from streammos_tpu.ops.tta_fold import orient_grid

    g_phase = g_phase[:, :, 1:-1]  # strip the row_pad=1 halo rows
    BtT, P, Hh, Wh, VC = g_phase.shape
    C = VC // V_TTA
    Bt = BtT // T
    g7 = g_phase.reshape(BtT, 2, 2, Hh, Wh, V_TTA, C)
    # full[2h+bx, 2w+by] = G[p=2*bx+by, h, w]
    full = jnp.transpose(g7, (0, 3, 1, 4, 2, 5, 6)).reshape(
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
