"""Folded-TTA parity: the channel-folded scatter/gather eval path
(ops/tta_fold.py) must reproduce the reference TTA protocol — four (x, y)
sign-flip variants run independently (data_StreamMOS.py:495-513) — on
production-like inputs (range-cropped points + far-out sentinel padding,
as DataloadVal ships them)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from streammos_tpu import geometry
from streammos_tpu.config import get_config
from streammos_tpu.models.stream_mos import featurize, tta_expand
from streammos_tpu.ops import (grid_to_point, grid_to_point_tta, orient_grid,
                               voxel_max_pool, voxel_max_pool_tta)


def _prod_like_points(rng, n, frames=1):
    """Cropped-to-range xyz with sentinel pads, like the eval pipeline."""
    xyz = rng.uniform(-60, 60, size=(1, frames, n, 3)).astype(np.float32)
    xyz[..., 2] = rng.uniform(-5, 3, size=(1, frames, n)).astype(np.float32)
    m = geometry.np_filter_mask(xyz, (-50, 50), (-50, 50), (-4, 2))
    xyz[~m] = np.array([-1000.0, -1000.0, -4000.0], np.float32)
    inten = rng.uniform(0, 1, size=(1, frames, n, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([xyz, inten], axis=-1))


CASES = [
    ("bev", (512, 512), (1.0, 1.0)),
    ("bev", (256, 256), (0.5, 0.5)),
    ("bev", (128, 128), (0.25, 0.25)),
    ("rv", (32, 1024), (0.5, 0.5)),
    ("rv", (16, 512), (0.25, 0.25)),
]


@pytest.fixture(scope="module")
def tta_batch():
    cfg = get_config("StreamMOS").model
    rng = np.random.default_rng(3)
    xyzi = _prod_like_points(rng, 6144)
    batch = featurize(tta_expand(xyzi), cfg)
    return rng, batch


@pytest.mark.parametrize("kind,out_size,scale", CASES)
def test_scatter_fold_exact(tta_batch, kind, out_size, scale):
    rng, batch = tta_batch
    coords = batch["bev_coord" if kind == "bev" else "rv_coord"][:, 0]
    feat = jnp.asarray(rng.normal(size=(4, 1, coords.shape[1], 8))
                       .astype(np.float32))
    exact = jnp.stack([
        voxel_max_pool(feat[v], coords[v][None, :, :2], out_size, scale)[0]
        for v in range(4)])
    n = coords.shape[1]
    folded = voxel_max_pool_tta(
        jnp.moveaxis(feat, 0, 2).reshape(1, n, 4 * 8), coords[0][None],
        out_size, scale, kind)[:, 0]
    assert jnp.array_equal(exact, folded), (
        f"{int((exact != folded).sum())} mismatched cells")


@pytest.mark.parametrize("kind,out_size,scale", CASES)
def test_gather_fold_close(tta_batch, kind, out_size, scale):
    rng, batch = tta_batch
    coords = batch["bev_coord" if kind == "bev" else "rv_coord"][:, 0]
    grids = jnp.asarray(rng.normal(size=(4, 1) + out_size + (8,))
                        .astype(np.float32))
    exact = jnp.stack([grid_to_point(grids[v], coords[v][None, :, :2], scale)
                       for v in range(4)])
    out = grid_to_point_tta(grids, coords[0][None, :, :2], scale, kind)
    folded = jnp.moveaxis(out.reshape(1, -1, 4, 8), 2, 0)  # unfold lanes
    # bilinear fractions enter as 1-f instead of frac(W-p): 1-ulp wiggle
    np.testing.assert_allclose(np.asarray(exact), np.asarray(folded),
                               atol=2e-3, rtol=2e-4)


def test_orient_grid_is_involution():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(2, 16, 64, 3)).astype(np.float32))
    for kind in ("bev", "rv"):
        for v in range(4):
            gg = orient_grid(orient_grid(g, v, kind, (1, 2)), v, kind, (1, 2))
            assert jnp.array_equal(g, gg)


def test_full_model_fold_matches_exact_tta():
    """End-to-end: StreamMOSNet(tta_fold=True) on the TTA fan ==
    per-variant exact path, same params, f32 compute."""
    import dataclasses

    from streammos_tpu.models import init_model
    from streammos_tpu.models.stream_mos import stage_forward
    from streammos_tpu.models.stream_mos import StreamMOSNet

    cfg = dataclasses.replace(get_config("StreamMOS_tiny").model,
                              compute_dtype="float32")
    rng = np.random.default_rng(7)
    N, T = 2048, cfg.seq_num
    xyzi = _prod_like_points(rng, N, frames=T)
    batch = featurize(tta_expand(xyzi), cfg)
    model, variables = init_model(jax.random.key(0), cfg, batch=4,
                                  num_points=N)
    mem = jnp.asarray(rng.normal(size=(4,) + (cfg.query_hw[0], cfg.query_hw[1],
                                              cfg.d_model)).astype(np.float32))
    out_exact, _ = stage_forward(model, variables, batch, mem,
                                 jnp.asarray(True), train=False)
    from streammos_tpu.models.stream_mos import tta_expand_folded
    batch_fold = featurize(tta_expand_folded(xyzi), cfg)
    folded_model = StreamMOSNet(cfg, tta_fold=True)
    out_fold, _ = stage_forward(folded_model, variables, batch_fold, mem,
                                jnp.asarray(True), train=False)
    for k in ("pred", "aux0", "aux1", "aux2", "memory"):
        a, b = np.asarray(out_exact[k]), np.asarray(out_fold[k])
        if k == "pred":
            # folded pred is (Bt, N, V, C); exact is (V(=B), N, C)
            b = np.moveaxis(b[0], -2, 0)
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=5e-3, err_msg=k)


def test_rev_roll_tables_match_gather_forms():
    # the stream-speed reverse/roll formulations must equal the index-map
    # gathers they replaced, for every transform and both parities of size
    import numpy as np
    import jax
    import jax.numpy as jnp
    from streammos_tpu.ops import tta_fold as tf

    rng = np.random.default_rng(0)
    for size in (6, 8, 16):
        g = jnp.asarray(rng.normal(size=(2, size, 3)).astype(np.float32))
        for tr in ("id", "rev", "roll", "revroll"):
            want = jnp.take(g, tf._cell_map(tr, size), axis=1)
            got = tf._orient_axis(g, tr, axis=1)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want))

            shift = -1 if tr in ("rev", "revroll") else 0
            gp = jnp.pad(g, ((0, 0), (0, 1), (0, 0)))
            want_ext = jnp.take(gp, tf._perm_ext(tr, size, shift), axis=1)
            got_ext = tf._ext_table(g, tr, axis=1)
            np.testing.assert_allclose(np.asarray(got_ext),
                                       np.asarray(want_ext))
