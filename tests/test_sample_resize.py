import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from streammos_tpu.ops import (grid_to_point, grid_to_point_ref,
                               resize_bilinear_align_corners)


def _torch_bilinear_sample(grid_nchw, coords, scale_rate):
    """The reference BilinearSample forward (networks/backbone.py:458-475)."""
    H, W = grid_nchw.shape[2], grid_nchw.shape[3]
    coords = torch.as_tensor(coords)[..., None]  # (B, N, 2, 1)
    gx = (2 * coords[:, :, 1] * scale_rate[1] / (W - 1)) - 1
    gy = (2 * coords[:, :, 0] * scale_rate[0] / (H - 1)) - 1
    g2 = torch.stack((gx, gy), dim=-1)  # (B, N, 1, 2)
    out = F.grid_sample(grid_nchw, g2, mode='bilinear', padding_mode='zeros',
                        align_corners=True)  # (B, C, N, 1)
    return out[..., 0].permute(0, 2, 1).numpy()


def test_grid_to_point_matches_torch_grid_sample():
    rng = np.random.default_rng(0)
    B, H, W, C, N = 2, 16, 24, 5, 200
    grid = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # coords include out-of-range values to exercise zeros padding
    coords = rng.uniform(-4, 40, size=(B, N, 2)).astype(np.float32)
    for scale in [(1.0, 1.0), (0.5, 0.5), (0.25, 0.25)]:
        ours = np.asarray(grid_to_point(jnp.asarray(grid), jnp.asarray(coords), scale))
        theirs = _torch_bilinear_sample(
            torch.as_tensor(grid).permute(0, 3, 1, 2).contiguous(), coords, scale)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_grid_to_point_matches_numpy_ref():
    rng = np.random.default_rng(1)
    grid = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    coords = rng.uniform(-1, 9, size=(1, 50, 2)).astype(np.float32)
    ours = np.asarray(grid_to_point(jnp.asarray(grid), jnp.asarray(coords), (0.5, 0.5)))
    ref = grid_to_point_ref(grid, coords, (0.5, 0.5))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_resize_matches_torch_interpolate():
    rng = np.random.default_rng(2)
    for (h, w, H, W) in [(64, 64, 256, 256), (128, 128, 256, 256), (16, 24, 16, 24)]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (H, W)))
        theirs = F.interpolate(torch.as_tensor(x).permute(0, 3, 1, 2), size=(H, W),
                               mode='bilinear', align_corners=True)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
