"""Training losses: CE with ignore, online hard-example mining, and a
static-shape Lovász-softmax.

Numerical contracts follow the reference:
* `CE_OHEM` (`/root/reference/utils/criterion.py:10-27`): per-element CE with
  ignore_index=0 contributing 0, then ``mean + top_weight * mean(top-k)``
  where k = ``max(int(top_ratio * numel), 1)`` over the *whole* flattened
  batch (ignored elements count in the means' denominators, as in torch's
  ``reduce=False`` + ``.mean()``).
* `lovasz_softmax` (`/root/reference/utils/lovasz_losses.py:147-222`):
  softmax inside, ``classes='present'``, ``per_image=False``, ignore label 0.

TPU formulation notes: the reference filters ignored elements to a dynamic
shape before sorting; here ignored elements keep a static position with
error=0 / fg=0 instead. Because errors are non-negative and sorted
descending, every position at-or-after an ignored element carries error 0 and
contributes nothing to the ⟨errors, lovász-grad⟩ dot product, so the loss
value (and a.e. the gradient) is identical — with fully static shapes. Top-k
is a descending sort + static slice instead of ``torch.topk``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pick_class(values: jax.Array, targets: jax.Array) -> jax.Array:
    """values (..., C) -> the target-class entry per element, as a one-hot
    masked sum instead of ``take_along_axis``.

    C is tiny (3), so the select is pure elementwise work that XLA fuses
    into the surrounding softmax — while the take_along_axis form lowers to
    a 1-element-per-row gather whose forward costs ~1.4 ms per 130k points
    on v5e and whose VJP is a 130k-row scatter-add (round-5 train trace,
    losses.py CE sites: 10.4 ms/step total). ``where`` (not multiply) so a
    -inf log-prob in a non-target lane cannot produce 0 * -inf = NaN."""
    C = values.shape[-1]
    onehot = targets[..., None] == jnp.arange(C, dtype=targets.dtype)
    return jnp.where(onehot, values, 0.0).sum(axis=-1)


def cross_entropy_per_element(logits: jax.Array, targets: jax.Array,
                              ignore_index: int = 0,
                              weight: jax.Array | None = None) -> jax.Array:
    """logits (..., C), targets (...); ignored positions get 0."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
    nll = -_pick_class(logp, tgt)
    if weight is not None:
        nll = nll * _pick_class(jnp.broadcast_to(weight, logp.shape), tgt)
    if ignore_index is not None:
        nll = jnp.where(targets == ignore_index, 0.0, nll)
    return nll


def ce_ohem(logits: jax.Array, targets: jax.Array, top_ratio: float = 0.2,
            top_weight: float = 4.0, ignore_index: int = 0,
            weight: jax.Array | None = None) -> jax.Array:
    """CE + top-k hard-example mining (criterion.py:20-27)."""
    loss = cross_entropy_per_element(logits, targets, ignore_index, weight)
    flat = loss.reshape(-1)
    n = flat.shape[0]
    k = max(int(top_ratio * n), 1)
    # argsort on stop-grad keys + a k-row gather, instead of slicing a
    # differentiable full sort: the value is identical (same top-k set, same
    # tie-break-by-sort-order as torch.topk), but the backward touches only
    # the k selected rows — a k-row scatter-add — where the sort's VJP
    # scatter-adds ALL n rows (7.1 ms/step at the train shapes, round-5
    # trace; the argsort form measures ~free, tools/bench_train_roofline.py).
    _, idx = jax.lax.sort_key_val(jax.lax.stop_gradient(flat),
                                  jnp.arange(n, dtype=jnp.int32),
                                  is_stable=False)
    top = jnp.take(flat, idx[n - k:])
    return flat.mean() + top_weight * top.mean()


def weighted_ce(logits: jax.Array, targets: jax.Array,
                weight: jax.Array) -> jax.Array:
    """'wce' mode: torch CrossEntropyLoss(weight=w) mean semantics — the mean
    is weighted by the per-element class weight (models/StreamMOS.py:49-60;
    weight[0] = 0 so unlabeled points are excluded)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
    nll = -_pick_class(logp, tgt)
    w = _pick_class(jnp.broadcast_to(weight, logp.shape), tgt)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1e-12)


def _lovasz_grad_coeffs(fg_sorted: jax.Array) -> jax.Array:
    """Jaccard surrogate gradient over sorted error runs, batched over the
    leading (class) axis (lovasz_losses.py lovasz_grad)."""
    gts = fg_sorted.sum(axis=-1, keepdims=True)
    inter = gts - jnp.cumsum(fg_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=-1)
    jacc = 1.0 - inter / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jacc[..., :1], jacc[..., 1:] - jacc[..., :-1]],
                           axis=-1)


def lovasz_softmax(logits: jax.Array, targets: jax.Array,
                   ignore_index: int = 0) -> jax.Array:
    """Static-shape Lovász-softmax over present classes.

    logits (..., C), targets (...). Classes with no (valid) foreground are
    excluded from the mean; all-ignored batches give 0.

    TPU formulation (round 5): all C classes ride ONE batched multi-payload
    sort, and the Jaccard coefficients — a stop-gradient function of the
    sorted foreground run — are un-sorted back to element order with a second
    key-value sort, so the loss is ``sum(errors * coeffs_unsorted)`` and the
    backward pass is pure elementwise. The previous per-class form
    differentiated through the sort, whose VJP is an n-row scatter-add per
    class per call (21.4 ms/step at the train shapes, round-5 trace); sorts
    themselves measure ~0.1 ms at 130k on v5e
    (tools/bench_train_roofline.py), so both formulations' forward cost is
    the sort-count-free part while the scatter-adds vanish. Value is
    identical up to summation order and error ties (where the reference's
    own coefficient assignment is equally arbitrary).
    """
    C = logits.shape[-1]
    probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, C)
    labels = targets.reshape(-1)
    n = labels.shape[0]
    valid = (labels != ignore_index).astype(jnp.float32)

    classes = jnp.arange(C, dtype=labels.dtype)
    fg = (labels[None, :] == classes[:, None]).astype(jnp.float32) * valid
    errors = jnp.abs(fg - probas.T) * valid  # (C, n); ignored -> exactly 0

    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (C, n))
    # descending batched sort on stop-grad errors, carrying fg + positions;
    # is_stable=False — stability costs 20-80% extra on v5e (/tmp probe,
    # round 5: 1.67 -> 1.33 ms at 3x130k, 0.25 -> 0.12 at 3x65536) and ties
    # only permute equal-error elements (value unchanged, coefficient
    # assignment among ties as arbitrary as the reference's torch.sort)
    _, fg_sorted, order = jax.lax.sort(
        (-jax.lax.stop_gradient(errors), fg, iota), dimension=1, num_keys=1,
        is_stable=False)
    coeffs = _lovasz_grad_coeffs(fg_sorted)
    # the unsort keys are a permutation (all distinct) — stability is moot
    _, coeffs_unsorted = jax.lax.sort((order, coeffs), dimension=1,
                                      num_keys=1, is_stable=False)
    losses = (errors * jax.lax.stop_gradient(coeffs_unsorted)).sum(axis=1)
    present = (fg.sum(axis=1) > 0).astype(jnp.float32)
    denom = present.sum()
    return jnp.where(denom > 0, (losses * present).sum() / jnp.maximum(denom, 1.0), 0.0)


def boundary_loss(logits: jax.Array, targets: jax.Array,
                  theta0: int = 3) -> jax.Array:
    """Boundary-F1 loss (Bokhovkin et al., arXiv:1905.07852) over BEV maps.

    Mirrors `/root/reference/utils/boundary_loss.py:16-86` (instantiated at
    `models/StreamMOS.py:37` but never wired into the shipped loss — provided
    here for capability parity): boundary maps are
    ``maxpool_{theta0}(1 - x) - (1 - x)`` for the softmax prediction and the
    one-hot ground truth; per-(image, class) precision/recall over the
    boundary maps give BF1, and the loss is ``mean(1 - BF1)``.

    logits (B, H, W, C) raw scores; targets (B, H, W) int class ids.
    """
    B, H, W, C = logits.shape
    probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(targets, C, dtype=jnp.float32)

    def boundary(x):
        pooled = jax.lax.reduce_window(
            1.0 - x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, theta0, theta0, 1),
            window_strides=(1, 1, 1, 1), padding="SAME")
        return pooled - (1.0 - x)

    gt_b = boundary(one_hot).reshape(B, -1, C)
    pred_b = boundary(probas).reshape(B, -1, C)
    inter = (pred_b * gt_b).sum(axis=1)
    precision = inter / (pred_b.sum(axis=1) + 1e-7)
    recall = inter / (gt_b.sum(axis=1) + 1e-7)
    bf1 = 2.0 * precision * recall / (precision + recall + 1e-7)
    return jnp.mean(1.0 - bf1)


def make_criterion(loss_mode: str, class_num: int,
                   content_weights: jax.Array | None = None):
    """Criterion factory mirroring `AttNet.build_loss`
    (models/StreamMOS.py:42-62)."""
    if loss_mode == "ce":
        return lambda lg, tg: cross_entropy_per_element(lg, tg, 0).mean()
    if loss_mode == "ohem":
        return lambda lg, tg: ce_ohem(lg, tg, top_ratio=0.2, top_weight=4.0,
                                      ignore_index=0)
    if loss_mode == "wce":
        if content_weights is None:
            from streammos_tpu.data.semantic_kitti import content_class_weights
            content_weights = jnp.asarray(content_class_weights(
                class_num=class_num))
        return lambda lg, tg: weighted_ce(lg, tg, content_weights)
    raise ValueError('loss_mode must be in ["ce", "wce", "ohem"]')
