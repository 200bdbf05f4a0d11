import numpy as np
import jax
import jax.numpy as jnp

from streammos_tpu.config import get_config
from streammos_tpu.models import (StreamMOSNet, init_model, memory_shape,
                                  stage_forward, streaming_loss)


def _batch(cfg, B=1, seed=0):
    rng = np.random.default_rng(seed)
    m = cfg.model
    T, N = m.seq_num, cfg.train.frame_point_num
    H, W, _ = m.voxel.bev_shape
    rh, rw = m.voxel.rv_shape
    return {
        "points": jnp.asarray(rng.normal(size=(B, T, N, 7)).astype(np.float32)),
        "bev_coord": jnp.asarray(
            rng.uniform(0, H, size=(B, T, N, 3)).astype(np.float32)),
        "rv_coord": jnp.asarray(np.stack([
            rng.uniform(0, rh, size=(B, T, N)),
            rng.uniform(0, rw, size=(B, T, N))], axis=-1).astype(np.float32)),
    }


def test_forward_shapes_tiny():
    cfg = get_config("StreamMOS_tiny")
    model, variables = init_model(jax.random.key(0), cfg.model,
                                  num_points=cfg.train.frame_point_num)
    batch = _batch(cfg)
    mem = jnp.zeros(memory_shape(cfg.model, 1))
    (out, _) = stage_forward(model, variables, batch, mem, jnp.asarray(False),
                             train=False)
    N = cfg.train.frame_point_num
    H2 = cfg.model.voxel.bev_shape[0] // 2
    assert out["pred"].shape == (1, N, 3)
    for k in ("aux0", "aux1", "aux2"):
        assert out[k].shape == (1, H2, H2, 3)
    assert out["memory"].shape == memory_shape(cfg.model, 1)
    assert np.isfinite(np.asarray(out["pred"])).all()


def test_memory_branch_switches_in_one_graph():
    cfg = get_config("StreamMOS_tiny")
    model, variables = init_model(jax.random.key(0), cfg.model,
                                  num_points=cfg.train.frame_point_num)
    batch = _batch(cfg)

    @jax.jit
    def run(use_mem, mem):
        out, _ = stage_forward(model, variables, batch, mem, use_mem, False)
        return out["pred"]

    rng = np.random.default_rng(7)
    mem0 = jnp.zeros(memory_shape(cfg.model, 1))
    mem1 = jnp.asarray(rng.normal(size=memory_shape(cfg.model, 1)).astype(np.float32))
    mem2 = jnp.asarray(rng.normal(size=memory_shape(cfg.model, 1)).astype(np.float32))
    p_learned = run(jnp.asarray(False), mem0)
    p_mem = run(jnp.asarray(True), mem1)
    # different query sources must give different predictions
    assert not np.allclose(np.asarray(p_learned), np.asarray(p_mem))
    # carried-memory path actually reads the memory (note: a *constant* memory
    # offset is invisible by design — the query enters via residual+LayerNorm,
    # so only its per-position structure matters)
    p_mem2 = run(jnp.asarray(True), mem2)
    assert not np.allclose(np.asarray(p_mem), np.asarray(p_mem2))


def test_streaming_loss_and_grads():
    cfg = get_config("StreamMOS_tiny")
    model, variables = init_model(jax.random.key(1), cfg.model,
                                  num_points=cfg.train.frame_point_num)
    S, B = 3, 1
    rng = np.random.default_rng(3)
    N = cfg.train.frame_point_num
    # raw xyzi path: featurization happens in-graph
    windows = {
        "xyzi": jnp.asarray(
            rng.uniform(-40, 40, size=(S, B, cfg.model.seq_num, N, 4))
            .astype(np.float32)),
        "targets": jnp.asarray(rng.integers(0, 3, size=(S, B, N))),
    }

    def loss_fn(params):
        loss, _ = streaming_loss(model, {**variables, "params": params},
                                 windows, cfg.model, jax.random.key(0))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    # gradient flows through the memory chain into the deformable module
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    gnorm = sum(float((np.asarray(l) ** 2).sum()) for l in leaves)
    assert gnorm > 0


def test_refine_branch_superset():
    cfg = get_config("StreamMOS_tiny")
    _, v1 = init_model(jax.random.key(0), cfg.model, num_points=64)
    _, v2 = init_model(jax.random.key(0), cfg.model, num_points=64,
                       with_refine=True)
    p1 = set(jax.tree_util.tree_leaves_with_path(v1["params"]) and
             [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_flatten_with_path(v1["params"])[0]])
    p2 = set(jax.tree_util.keystr(k) for k, _ in
             jax.tree_util.tree_flatten_with_path(v2["params"])[0])
    assert p1 < p2
    extra = {k for k in p2 - p1}
    assert extra and all("refine" in k for k in extra)


def test_parameter_count_parity():
    """Live-parameter parity with the reference AttNet.

    The reference's full model has 4.368M params; excluding its dead modules
    (AttMerge up1/up2, DeformAttnLayer.self_attn — SURVEY.md §7.4) leaves
    3,927,626. Of those, 512 are the two `normx` LayerNorms each layer
    constructs but never calls in forward (multi_view_encoder.py:292-293 vs
    :313-321), so the live compute graph holds exactly 3,927,114 parameters —
    which this build reproduces to the parameter."""
    cfg = get_config("StreamMOS")
    _, variables = init_model(jax.random.key(0), cfg.model, batch=1,
                              num_points=64)
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n == 3_927_114


def test_multi_stream_eval_matches_independent_streams():
    """make_eval_step on a folded Bt=2 batch (the parallel-stream eval
    layout, round 3) must return per-stream scores identical to two
    independent Bt=1 evaluations — streams share nothing but params."""
    import dataclasses

    import numpy as np

    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model, memory_shape
    from streammos_tpu.models.stream_mos import featurize, tta_expand_folded
    from streammos_tpu.train.trainer import make_eval_step

    cfg = get_config("StreamMOS_tiny")
    # f32 keeps the comparison exact up to op ordering
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="float32"))
    rng = np.random.RandomState(0)
    N, T = 512, cfg.model.seq_num

    model2, variables = init_model(jax.random.key(0), cfg.model, batch=8,
                                   num_points=N, tta_fold=True)
    model1 = type(model2)(cfg.model, tta_fold=True)
    step2 = make_eval_step(model2, cfg)
    step1 = make_eval_step(model1, cfg)

    xyzi = jnp.asarray(rng.uniform(-18, 18, (2, T, N, 4)).astype(np.float32))
    batch2 = featurize(tta_expand_folded(xyzi), cfg.model)
    mem2 = jnp.zeros(memory_shape(cfg.model, 8), jnp.float32)
    scores2, _, _ = step2(variables, batch2, mem2, jnp.asarray(False))
    assert scores2.shape == (2, N, cfg.model.class_num)

    for s in range(2):
        b1 = featurize(tta_expand_folded(xyzi[s:s + 1]), cfg.model)
        m1 = jnp.zeros(memory_shape(cfg.model, 4), jnp.float32)
        s1, _, _ = step1(variables, b1, m1, jnp.asarray(False))
        np.testing.assert_allclose(np.asarray(scores2[s]),
                                   np.asarray(s1[0]), rtol=2e-4, atol=2e-5,
                                   err_msg=f"stream {s}")
