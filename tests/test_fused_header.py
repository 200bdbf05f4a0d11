"""Fused TTA header (ops/fused_header.py) correctness.

Two layers of defense:
* kernel vs the obviously-correct XLA composition in Pallas interpret mode
  (the composition itself reconstructs the full-res grid and runs the
  standard DownSample2D math per variant);
* whole-model equivalence: `StreamMOSNet(tta_fold=True)` with
  `fused_header=True` (reference-composition fallback on CPU) must match
  the standard folded-TTA path bit-for-bit up to f32 conv reassociation.

The compiled Pallas kernel itself is exercised on real TPU hardware by
`tools/bench_fused_header.py` (parity + timing); CI covers the math and
the model wiring.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streammos_tpu.config import get_config
from streammos_tpu.models.stream_mos import (StreamMOSNet, init_model,
                                             memory_shape, tta_expand_folded)
from streammos_tpu.ops.fused_header import (fused_header_reference,
                                            fused_header_tta)


def _rand_inputs(rng, T=3, C=8, Cout=16, Bt=1, Hh=16, Wh=128):
    # the kernels consume the phase-OUTER row_pad=1 layout: one always-zero
    # half-res row above and below each phase plane
    # (voxel_max_pool(..., phase_split="outer", row_pad=1))
    g = rng.randn(Bt * T, 4, Hh + 2, Wh, 4 * C).astype(np.float32)
    g[:, :, 0] = 0.0
    g[:, :, -1] = 0.0
    g = jnp.asarray(g)
    k3 = jnp.asarray(rng.randn(3, 3, T * C, Cout).astype(np.float32) * 0.1)
    k1 = jnp.asarray(rng.randn(1, 1, T * C, Cout).astype(np.float32) * 0.1)
    ca = (jnp.asarray(rng.uniform(0.5, 1.5, Cout).astype(np.float32)),
          jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1))
    pa = (jnp.asarray(rng.uniform(-1.5, 1.5, Cout).astype(np.float32)),
          jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1))
    return g, k3, k1, ca, pa


def test_kernel_matches_reference_interpret():
    rng = np.random.RandomState(0)
    g, k3, k1, ca, pa = _rand_inputs(rng)
    ref = fused_header_reference(g, k3, k1, ca, pa, 3)
    out = fused_header_tta(g, k3, k1, ca, pa, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_kernel_matches_reference_multibatch():
    rng = np.random.RandomState(1)
    g, k3, k1, ca, pa = _rand_inputs(rng, Bt=2, Hh=16, Wh=128)
    ref = fused_header_reference(g, k3, k1, ca, pa, 3)
    out = fused_header_tta(g, k3, k1, ca, pa, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_model_fused_header_equivalence():
    """Full tta_fold eval forward: fused header on vs off."""
    cfg_off = dataclasses.replace(get_config("StreamMOS_tiny").model,
                                  fused_header=False)
    cfg_on = dataclasses.replace(cfg_off, fused_header=True)

    rng = np.random.RandomState(7)
    N = 512
    model_off, variables = init_model(jax.random.PRNGKey(0), cfg_off,
                                      batch=4, num_points=N, tta_fold=True)
    model_on = StreamMOSNet(cfg_on, tta_fold=True)

    xyzi = jnp.asarray(rng.uniform(-45, 45, (1, 3, N, 4)).astype(np.float32))
    from streammos_tpu.models.stream_mos import featurize
    batch = featurize(tta_expand_folded(xyzi), cfg_off)
    mem = jnp.zeros(memory_shape(cfg_off, 4), jnp.float32)

    def run(model):
        return model.apply(variables, batch["points"], batch["bev_coord"],
                           batch["rv_coord"], mem, jnp.asarray(False),
                           train=False)

    out_off = run(model_off)
    out_on = run(model_on)
    for key in ("pred", "aux0", "memory"):
        np.testing.assert_allclose(np.asarray(out_on[key]),
                                   np.asarray(out_off[key]),
                                   rtol=2e-3, atol=2e-3)
