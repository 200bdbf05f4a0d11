import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from streammos_tpu.ops import deform_attn_sample, deform_attn_sample_ref


def _torch_core(value, shapes, loc, weights):
    """Port of the reference check impl `ms_deform_attn_core_pytorch`
    (deformattn/functions/ms_deform_attn_func.py:41-61), single level."""
    N_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = loc.shape
    H_, W_ = shapes[0]
    sampling_grids = 2 * loc - 1
    value_l = value.flatten(2).transpose(1, 2).reshape(N_ * M_, D_, H_, W_)
    grid_l = sampling_grids[:, :, :, 0].transpose(1, 2).flatten(0, 1)
    sampled = F.grid_sample(value_l, grid_l, mode='bilinear',
                            padding_mode='zeros', align_corners=False)
    attn = weights.transpose(1, 2).reshape(N_ * M_, 1, Lq_, L_ * P_)
    out = (sampled * attn).sum(-1).view(N_, M_ * D_, Lq_)
    return out.transpose(1, 2).contiguous().numpy()


def _case(B=2, H=8, W=8, M=4, Dh=8, Lq=16, P=4, seed=0):
    rng = np.random.default_rng(seed)
    value = rng.normal(size=(B, H, W, M, Dh)).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, M, P, 2)).astype(np.float32)
    w = rng.uniform(0, 1, size=(B, Lq, M, P)).astype(np.float32)
    w /= w.sum(axis=-1, keepdims=True)
    return value, loc, w


def test_matches_reference_check_impl():
    value, loc, w = _case()
    ours = np.asarray(deform_attn_sample(jnp.asarray(value), jnp.asarray(loc),
                                         jnp.asarray(w)))
    B, H, W, M, Dh = value.shape
    tv = torch.as_tensor(value.reshape(B, H * W, M, Dh))
    tl = torch.as_tensor(loc)[:, :, :, None]  # add level dim
    tw = torch.as_tensor(w)[:, :, :, None]
    theirs = _torch_core(tv, [(H, W)], tl, tw)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_matches_numpy_ref():
    value, loc, w = _case(seed=1)
    ours = np.asarray(deform_attn_sample(jnp.asarray(value), jnp.asarray(loc),
                                         jnp.asarray(w)))
    ref = deform_attn_sample_ref(value, loc, w)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_gradients_flow_and_match_torch():
    value, loc, w = _case(B=1, Lq=8, seed=2)
    cot = np.random.default_rng(3).normal(size=(1, 8, 32)).astype(np.float32)

    def f(v, l, a):
        return (deform_attn_sample(v, l, a) * cot).sum()

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))

    B, H, W, M, Dh = value.shape
    tv = torch.as_tensor(value.reshape(B, H * W, M, Dh), dtype=torch.float64).requires_grad_()
    tl = torch.as_tensor(loc, dtype=torch.float64)[:, :, :, None].requires_grad_()
    tw = torch.as_tensor(w, dtype=torch.float64)[:, :, :, None].requires_grad_()
    out = _torch_core_t(tv, [(H, W)], tl, tw)
    (out * torch.as_tensor(cot, dtype=torch.float64)).sum().backward()

    np.testing.assert_allclose(np.asarray(gv).reshape(B, H * W, M, Dh),
                               tv.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy()[:, :, :, 0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy()[:, :, :, 0],
                               rtol=1e-3, atol=1e-4)


def _torch_core_t(value, shapes, loc, weights):
    N_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = loc.shape
    H_, W_ = shapes[0]
    sampling_grids = 2 * loc - 1
    value_l = value.flatten(2).transpose(1, 2).reshape(N_ * M_, D_, H_, W_)
    grid_l = sampling_grids[:, :, :, 0].transpose(1, 2).flatten(0, 1)
    sampled = F.grid_sample(value_l, grid_l, mode='bilinear',
                            padding_mode='zeros', align_corners=False)
    attn = weights.transpose(1, 2).reshape(N_ * M_, 1, Lq_, L_ * P_)
    out = (sampled * attn).sum(-1).view(N_, M_ * D_, Lq_)
    return out.transpose(1, 2).contiguous()
