"""align_corners=True bilinear resize, formulated as two small matmuls.

The reference decoder upsamples coarse BEV maps with
``F.interpolate(mode='bilinear', align_corners=True)``
(`/root/reference/networks/multi_view_encoder.py:441-443`). `jax.image.resize`
uses half-pixel sampling, so we build the (out, in) interpolation operators
explicitly (they are static) and contract them on the spatial axes — on TPU
this runs on the MXU instead of a gather, which is far faster for the
64->256 / 128->256 upsamples in the decoder hot path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True linear interpolation operator."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.minimum(lo, n_in - 2)
    frac = pos - lo
    mat = np.zeros((n_out, n_in), dtype=np.float32)
    mat[np.arange(n_out), lo] = (1.0 - frac).astype(np.float32)
    mat[np.arange(n_out), lo + 1] = frac.astype(np.float32)
    return mat


def resize_bilinear_align_corners(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """x (B, h, w, C) -> (B, H, W, C) with align_corners=True bilinear."""
    B, h, w, C = x.shape
    H, W = out_hw
    if (h, w) == (H, W):
        return x
    mh = jnp.asarray(_interp_matrix(h, H), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(w, W), dtype=x.dtype)
    x = jnp.einsum("Hh,bhwc->bHwc", mh, x, preferred_element_type=x.dtype)
    x = jnp.einsum("Ww,bhwc->bhWc", mw, x, preferred_element_type=x.dtype)
    return x
