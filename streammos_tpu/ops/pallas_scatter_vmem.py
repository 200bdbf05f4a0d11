"""Pallas TPU scatter-max with the output grid resident in VMEM.

The cascade scatters of the eval frame (`nn/encoder.py:cascade_scatter`)
route 160k point rows into SMALL grids — 8k-64k cells x 128-256 channels,
i.e. 4-17 MB — while XLA's scatter-max emitter processes rows serially
against HBM at ~13-19 ns/row (measured v5e; see docs/DESIGN.md "scatter
story"). Those grids fit in VMEM many times over, which enables a
formulation XLA cannot express:

* keep K independent COPIES of the whole output grid in VMEM and send
  point i to copy i mod K. The serial read-max-write dependence that
  bounds scatter throughput only exists WITHIN a copy (Mosaic can prove
  the K static leading-index slices disjoint), so K update chains overlap
  and the VPU pipeline stays full instead of stalling on load-use;
* stream point blocks in through the normal Pallas pipeline (features to
  VMEM, cell ids to SMEM where the scalar core can read them);
* merge the K copies with one vectorized max and write the grid out once
  at the end — the grid never round-trips through HBM during updates.

Semantics match `voxel_max_pool(..., nonneg=True)` exactly (the only mode
the cascade uses: inputs are post-ReLU/bilinear-blend features): zero
grid init, invalid points routed to a sentinel row past the live cells.
Bit-exact vs the XLA path because max is order-free.

This kernel requires ``(K+1) * cells_pad * C * itemsize`` to fit in VMEM
(~100 MB budget on v5e); `fits_vmem` gates it and `voxel_max_pool` falls
back to XLA above the budget (the full-res header grid stays on the XLA
path - its 135 MB phase grid does not fit).

Reference the kernel replaces:
`/root/reference/deep_point/src/point_deep_cuda_kernel.cu:24-99` (the
atomic-max voxel pooling), restricted to the in-cascade grid sizes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 1024  # points per grid step (ids block = 4 KB SMEM)
# v5e VMEM is 128 MiB; measured on-chip (round 3): the compiled kernel's
# scoped allocation = K-copy scratch + the SINGLE-BUFFERED full-grid output
# window + double-buffered input windows + ~48 MiB of register-allocator
# spill slots for the unrolled 8-point update body. The round-2 budget
# ignored the output window and the spills, so the stage-0 BEV cascade
# (65544 cells x 128 ch, K=4) failed to load with "Used 128.31M of 128.00M
# vmem" — caught by running bench.py on hardware.
VMEM_TOTAL = 127 * 1024 * 1024
SPILL_ALLOWANCE = 52 * 1024 * 1024
MAX_COPIES = 8


def _num_copies(cells_pad: int, C: int, itemsize: int) -> int:
    grid_bytes = cells_pad * C * itemsize
    # K update copies; the output grid window is single-buffered and the
    # input feature window double-buffered on top. K is a power of two so
    # the static 8-point inner group maps onto the copies evenly (point g
    # of a group updates copy g % K).
    budget = (VMEM_TOTAL - SPILL_ALLOWANCE - grid_bytes
              - 4 * BN * C * itemsize)
    k = budget // grid_bytes
    k = int(max(0, min(MAX_COPIES, k)))
    return 1 << (k.bit_length() - 1) if k else 0


def fits_vmem(num_cells: int, C: int, itemsize: int) -> bool:
    cells_pad = -(-(num_cells + 1) // 8) * 8
    return C % 128 == 0 and _num_copies(cells_pad, C, itemsize) >= 2


def _kernel(ids_ref, feat_ref, out_ref, acc, *, K: int, n_blocks: int,
            cells_pad: int, C: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros((K, cells_pad, C), acc.dtype)

    # Mosaic only allows dynamically-indexed vector loads/stores at
    # 8-sublane-aligned offsets, so (a) point features are read one ALIGNED
    # 8-row group at a time and rows extracted at static offsets, and
    # (b) each update works on the aligned 8-row window containing the
    # cell: max in the point's row via an iota mask (the other 7 rows max
    # with 0 — a no-op, the grid is non-negative). Point g of a group
    # updates copy g % K, so the serial read-max-write chains of the K
    # copies interleave and the VPU pipeline stays full.
    #
    # The row mask is built ARITHMETICALLY in the data dtype:
    # max(0, 1 - |sublane - off|) is exactly 1 on the point's sublane and 0
    # elsewhere (integers 0..7 are exact in bf16). An i1 mask vector paired
    # with a (16,128)-tiled bf16 operand hits an unsupported Mosaic relayout
    # ("Invalid relayout ... vector<8x128xi1>", the round-2 on-hardware
    # regression), and routing the select through f32 (the round-3 first
    # fix) doubles the per-update vector work.
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0).astype(acc.dtype)
    one = jnp.ones((), acc.dtype)
    zero = jnp.zeros((), acc.dtype)

    def body(j, _):
        bp = pl.multiple_of(j * 8, 8)
        win_f = feat_ref[0, pl.ds(bp, 8), :]
        for g in range(8):
            jj = j * 8 + g
            idx = ids_ref[0, jj // 128, jj % 128]
            k = g % K
            base = pl.multiple_of((idx // 8) * 8, 8)
            off = (idx - base).astype(acc.dtype)
            win = acc[k, pl.ds(base, 8), :]
            row = jnp.broadcast_to(win_f[g:g + 1, :], (8, C))
            m = jnp.maximum(one - jnp.abs(sub - off), zero)
            acc[k, pl.ds(base, 8), :] = jnp.maximum(win, row * m)
        return _

    jax.lax.fori_loop(0, BN // 8, body, 0)

    @pl.when(i == n_blocks - 1)
    def _():
        m = acc[0]
        for k in range(1, K):
            m = jnp.maximum(m, acc[k])
        out_ref[0] = m


@functools.partial(jax.jit, static_argnums=(2, 3))
def scatter_max_vmem(feat: jax.Array, ids: jax.Array,
                     num_cells: int, interpret: bool = False) -> jax.Array:
    """Scatter-max (B, N, C) non-negative rows into (B, num_cells, C).

    ids: (B, N) int32 cell ids; invalid points carry ``num_cells`` (the
    sentinel row, dropped from the output). Empty cells are 0.
    """
    B, N, C = feat.shape
    assert C % 128 == 0, C
    cells_pad = -(-(num_cells + 1) // 8) * 8
    K = _num_copies(cells_pad, C, feat.dtype.itemsize)
    assert K >= 2, "grid too large for the VMEM-resident scatter"
    n_blocks = -(-N // BN)
    if n_blocks * BN != N:
        pad = n_blocks * BN - N
        feat = jnp.pad(feat, ((0, 0), (0, pad), (0, 0)))
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=num_cells)
    # out-of-range ids (either sign) route to the sentinel row, matching the
    # XLA FILL_OR_DROP contract — a clip would corrupt live cell 0 for
    # negative ids; sentinel + pad rows are dropped by the final slice
    ids = jnp.where((ids < 0) | (ids > num_cells), num_cells, ids)
    # SMEM blocks must be (8, 128)-tile shaped for B > 1 (the last two dims
    # of a partial block must be sublane/lane divisible), so the per-block
    # 1024 ids ship as an 8 x 128 tile: id j lives at [j // 128, j % 128]
    ids = ids.reshape(B, n_blocks * (BN // 128), 128)

    kernel = functools.partial(_kernel, K=K, n_blocks=n_blocks,
                               cells_pad=cells_pad, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, BN // 128, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BN, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cells_pad, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cells_pad, C), feat.dtype),
        scratch_shapes=[pltpu.VMEM((K, cells_pad, C), feat.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_TOTAL),
        interpret=interpret,
    )(ids, feat)
    return out[:, :num_cells]


def _bench():  # pragma: no cover - measurement utility
    import time

    rng = np.random.default_rng(0)

    def rtt_s():
        trivial = jax.jit(lambda x: x.sum())
        z = jnp.zeros((8, 8))
        float(trivial(z))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(trivial(z))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rtt = rtt_s()
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)
    shapes = [  # (name, N, num_cells, C) - the eval cascade scatters
        ("stage0_bev", 160000, 256 * 256, 128),
        ("stage0_rv", 160000, 32 * 1024, 128),
        ("stage1_bev", 160000, 128 * 128, 256),
        ("stage1_rv", 160000, 16 * 512, 256),
    ]
    BANK, ITERS = 4, 16
    for name, N, cells, C in shapes:
        feat = jnp.asarray(
            rng.uniform(0, 4, (BANK, 1, N, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ids = jnp.asarray(
            rng.integers(0, cells + 1, (BANK, 1, N)).astype(np.int32))

        def run(fn):
            @jax.jit
            def loop(feat, ids):
                def body(c, t):
                    out = fn(feat[t % BANK] + c, ids[t % BANK])
                    return c + out.max() * 1e-9, 0.
                c, _ = jax.lax.scan(body, jnp.bfloat16(0), jnp.arange(ITERS))
                return c

            float(loop(feat, ids))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(feat, ids))
                ts.append(time.perf_counter() - t0)
            return (float(np.median(ts)) - rtt) / ITERS

        def xla(f, i):
            dnums = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,))
            return jax.lax.scatter_max(
                jnp.zeros((cells, C), f.dtype), i.reshape(-1, 1),
                f.reshape(-1, C), dnums,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP)

        t_x = run(xla)
        t_p = run(lambda f, i: scatter_max_vmem(f, i, cells))
        K = _num_copies(-(-(cells + 1) // 8) * 8, C, 2)
        print(f"{name:12s} N={N} cells={cells} C={C} K={K}: "
              f"xla {t_x*1e3:7.3f} ms  vmem {t_p*1e3:7.3f} ms  "
              f"({t_x/t_p:.2f}x)", flush=True)


if __name__ == "__main__":  # pragma: no cover
    _bench()
