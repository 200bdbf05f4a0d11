"""VMEM-resident Pallas scatter-max (`ops/pallas_scatter_vmem.py`) vs the
XLA scatter semantics of `voxel_max_pool(nonneg=True)` — zero-filled grid,
sentinel row for invalid points, exact (order-free) max. Runs the kernel in
Pallas interpret mode on the CPU test mesh (the TPU run is covered by the
in-model gating + bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammos_tpu.ops.pallas_scatter_vmem import (_num_copies, fits_vmem,
                                                   scatter_max_vmem)


def _ref(feat, ids, cells):
    B, N, C = feat.shape
    out = np.zeros((B, cells, C), feat.dtype)
    for b in range(B):
        for n in range(N):
            if ids[b, n] < cells:
                out[b, ids[b, n]] = np.maximum(out[b, ids[b, n]], feat[b, n])
    return out


@pytest.mark.parametrize("B,N,cells,C", [
    (1, 3000, 640, 128),     # non-multiple-of-block N (padding path)
    (2, 2048, 1000, 256),    # non-8-aligned cell count, two batches
])
def test_matches_reference(B, N, cells, C):
    rng = np.random.default_rng(3)
    feat = rng.uniform(0, 5, (B, N, C)).astype(np.float32)
    # heavy collisions + invalid sentinels
    ids = rng.integers(0, cells + 1, (B, N)).astype(np.int32)
    out = scatter_max_vmem(jnp.asarray(feat), jnp.asarray(ids), cells, True)
    np.testing.assert_array_equal(np.asarray(out), _ref(feat, ids, cells))


def test_bf16_exact():
    rng = np.random.default_rng(5)
    feat = rng.uniform(0, 5, (1, 2048, 128)).astype(np.float32)
    feat = np.asarray(jnp.asarray(feat).astype(jnp.bfloat16))
    ids = rng.integers(0, 513, (1, 2048)).astype(np.int32)
    out = scatter_max_vmem(jnp.asarray(feat), jnp.asarray(ids), 512, True)
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)),
        _ref(feat.astype(np.float32), ids, 512))


def test_fits_vmem_gate():
    # every eval cascade scatter shape must take the kernel...
    for cells, C in [(256 * 256, 128), (32 * 1024, 128),
                     (128 * 128, 256), (16 * 512, 256)]:
        assert fits_vmem(cells, C, 2), (cells, C)
        assert _num_copies(-(-(cells + 1) // 8) * 8, C, 2) >= 2
    # ...the copy budget must leave room for the single-buffered output
    # window + the ~48 MiB of register spill slots the compiled kernel
    # needs (measured on v5e round 3: K=4 at the 16 MiB stage-0 BEV grid
    # was rejected with "Used 128.31M of 128.00M vmem")
    k16 = _num_copies(-(-(256 * 256 + 1) // 8) * 8, 128, 2)
    assert 2 <= k16 <= 3, k16
    # ...and the full-res phase-split header grid must not fit (135 MB)
    assert not fits_vmem(260 * 256 * 4, 256, 2)
    # non-lane-aligned channel counts stay on XLA
    assert not fits_vmem(1024, 96, 2)


def test_in_model_gating_cpu_falls_back():
    # on the CPU test backend voxel_max_pool must never pick the kernel
    from streammos_tpu.ops.voxel_pool import _use_vmem

    assert jax.default_backend() == "cpu"
    assert not _use_vmem("auto", 16384, 256, 2, True)
