import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from streammos_tpu.losses import (boundary_loss, ce_ohem,
                                  cross_entropy_per_element, lovasz_softmax,
                                  weighted_ce)


def _torch_ce_ohem(logits, targets, top_ratio=0.2, top_weight=4.0):
    """The reference CE_OHEM math (utils/criterion.py:20-27)."""
    lg = torch.as_tensor(logits).permute(0, 2, 1)  # (B, C, N)
    tg = torch.as_tensor(targets).long()
    loss_mat = F.cross_entropy(lg, tg, reduction='none', ignore_index=0)
    loss = loss_mat.reshape(1, -1)
    k = max(int(top_ratio * loss.shape[1]), 1)
    topk = torch.topk(loss, k=k, dim=1, largest=True, sorted=False)[0]
    return float(loss.mean() + top_weight * topk.mean())


def _torch_lovasz(logits, targets, ignore=0):
    """The reference lovasz_softmax (utils/lovasz_losses.py:147-222):
    softmax inside, classes='present', dynamic ignore filtering."""
    lg = torch.as_tensor(logits).reshape(-1, logits.shape[-1])
    tg = torch.as_tensor(targets).reshape(-1).long()
    probas = F.softmax(lg, dim=1)
    valid = tg != ignore
    probas, tg = probas[valid], tg[valid]
    if probas.numel() == 0:
        return 0.0
    C = probas.shape[1]
    losses = []
    for c in range(C):
        fg = (tg == c).float()
        if fg.sum() == 0:
            continue
        errors = (fg - probas[:, c]).abs()
        errors_sorted, perm = torch.sort(errors, 0, descending=True)
        fg_sorted = fg[perm]
        gts = fg_sorted.sum()
        inter = gts - fg_sorted.cumsum(0)
        union = gts + (1 - fg_sorted).cumsum(0)
        jacc = 1.0 - inter / union
        p = len(fg_sorted)
        if p > 1:
            jacc[1:p] = jacc[1:p] - jacc[0:-1]
        losses.append(torch.dot(errors_sorted, jacc))
    return float(torch.stack(losses).mean())


def _case(B=2, N=500, C=3, seed=0, frac_ignore=0.3):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, N, C)).astype(np.float32)
    targets = rng.integers(1, C, size=(B, N)).astype(np.int32)
    ignore = rng.random(size=(B, N)) < frac_ignore
    targets[ignore] = 0
    return logits, targets


def test_ce_per_element_ignore():
    logits, targets = _case()
    ours = np.asarray(cross_entropy_per_element(jnp.asarray(logits),
                                                jnp.asarray(targets), 0))
    theirs = F.cross_entropy(torch.as_tensor(logits).permute(0, 2, 1),
                             torch.as_tensor(targets).long(),
                             reduction='none', ignore_index=0).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_ce_ohem_matches_reference():
    logits, targets = _case(seed=1)
    ours = float(ce_ohem(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = _torch_ce_ohem(logits, targets)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_lovasz_matches_reference():
    for seed, frac in [(2, 0.3), (3, 0.0), (4, 0.9)]:
        logits, targets = _case(seed=seed, frac_ignore=frac)
        ours = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(targets), 0))
        theirs = _torch_lovasz(logits, targets)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_lovasz_all_ignored_is_zero():
    logits = np.random.default_rng(0).normal(size=(1, 50, 3)).astype(np.float32)
    targets = np.zeros((1, 50), np.int32)
    assert float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(targets), 0)) == 0.0


def test_lovasz_gradient_finite():
    logits, targets = _case(seed=5)
    g = jax.grad(lambda lg: lovasz_softmax(lg, jnp.asarray(targets), 0))(
        jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    # ignored positions receive no gradient
    gi = np.asarray(g)[np.asarray(targets) == 0]
    np.testing.assert_allclose(gi, 0.0, atol=1e-7)


def _torch_boundary(logits, targets, theta0=3):
    """The reference BoundaryLoss math (utils/boundary_loss.py:16-86), with
    the softmax the paper prescribes (the reference comments it out but the
    op is dead code there; our impl keeps the sane semantics)."""
    pred = torch.softmax(torch.as_tensor(logits).permute(0, 3, 1, 2), dim=1)
    n, c = pred.shape[:2]
    gt = torch.as_tensor(targets).long()
    one_hot_gt = torch.eye(c)[gt].permute(0, 3, 1, 2)
    pad = (theta0 - 1) // 2
    gt_b = F.max_pool2d(1 - one_hot_gt, theta0, 1, pad) - (1 - one_hot_gt)
    pred_b = F.max_pool2d(1 - pred, theta0, 1, pad) - (1 - pred)
    gt_b, pred_b = gt_b.reshape(n, c, -1), pred_b.reshape(n, c, -1)
    P = (pred_b * gt_b).sum(2) / (pred_b.sum(2) + 1e-7)
    R = (pred_b * gt_b).sum(2) / (gt_b.sum(2) + 1e-7)
    bf1 = 2 * P * R / (P + R + 1e-7)
    return float(torch.mean(1 - bf1))


def test_boundary_loss_matches_reference():
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    targets = rng.integers(0, 3, size=(2, 16, 16)).astype(np.int32)
    ours = float(boundary_loss(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = _torch_boundary(logits, targets)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
    g = jax.grad(lambda lg: boundary_loss(lg, jnp.asarray(targets)))(
        jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()


def test_weighted_ce():
    logits, targets = _case(seed=6)
    w = np.array([0.0, 1.0, 2.5], np.float32)
    ours = float(weighted_ce(jnp.asarray(logits), jnp.asarray(targets),
                             jnp.asarray(w)))
    theirs = float(F.cross_entropy(torch.as_tensor(logits).permute(0, 2, 1),
                                   torch.as_tensor(targets).long(),
                                   weight=torch.as_tensor(w)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)
