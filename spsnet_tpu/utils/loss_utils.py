"""Loss library (pure jnp, no reductions unless stated).

Parity targets in ``pcdet/utils/loss_utils.py``: ``SigmoidFocalClassificationLoss``
(:12), ``WeightedClassificationLoss`` (:232, sigmoid-CE — the IA-SSD default for
``WeightedCrossEntropy``-named config entries), ``WeightedSmoothL1Loss`` (:290,
beta=1/9, per-code weights, nan-target masking), ``WeightedBinaryCrossEntropyLoss``
(:396), ``WeightedCrossEntropyLoss`` (:422, softmax CE), and
``get_corner_loss_lidar`` (:497, 8-corner min over flipped heading).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import box_utils


def sigmoid_cross_entropy_with_logits(logits, labels):
    """max(x,0) - x*z + log(1+exp(-|x|)) — elementwise, stable."""
    return jnp.clip(logits, 0, None) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def weighted_sigmoid_ce(logits, one_hot_targets, weights=None):
    """Reference ``WeightedClassificationLoss.forward`` with reduction='none'.

    Args:
        logits: (..., C); one_hot_targets: (..., C); weights: (...,) or None.
    Returns: (..., C) loss.
    """
    loss = sigmoid_cross_entropy_with_logits(logits, one_hot_targets)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_softmax_ce(logits, one_hot_targets, weights=None):
    """Reference ``WeightedCrossEntropyLoss``: softmax CE vs argmax target."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(one_hot_targets * logprobs, axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def weighted_binary_ce(logits, one_hot_targets, weights=None):
    loss = sigmoid_cross_entropy_with_logits(logits, one_hot_targets).mean(axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def sigmoid_focal_loss(logits, targets, weights=None, gamma=2.0, alpha=0.25):
    """Reference ``SigmoidFocalClassificationLoss`` (elementwise, no reduction)."""
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - pred_sigmoid) + (1.0 - targets) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    bce = sigmoid_cross_entropy_with_logits(logits, targets)
    loss = focal_weight * bce
    if weights is not None:
        w = weights
        if w.ndim == loss.ndim - 1:
            w = w[..., None]
        loss = loss * w
    return loss


def smooth_l1(diff, beta=1.0 / 9.0):
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)


def weighted_smooth_l1(preds, targets, weights=None, beta=1.0 / 9.0, code_weights=None):
    """Reference ``WeightedSmoothL1Loss.forward``: nan targets are ignored.

    Args: preds/targets (..., C); weights (...,).
    Returns: (..., C).
    """
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = smooth_l1(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_l1(preds, targets, weights=None, code_weights=None):
    """Reference ``WeightedL1Loss`` (``loss_utils.py:348-393``)."""
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def get_corner_loss_lidar(pred_boxes, gt_boxes, weights=None):
    """8-corner smooth-L1 with heading-flip min (``loss_utils.py:497-522``).

    Args: pred_boxes/gt_boxes (N, 7); weights (N,) optional validity weights.
    Returns: (N,) per-box corner loss.
    """
    pred_corners = box_utils.boxes_to_corners_3d(pred_boxes)
    gt_corners = box_utils.boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(np.pi)
    gt_corners_flip = box_utils.boxes_to_corners_3d(gt_flip)
    dist = jnp.minimum(
        jnp.linalg.norm(pred_corners - gt_corners, axis=2),
        jnp.linalg.norm(pred_corners - gt_corners_flip, axis=2),
    )
    loss = smooth_l1(dist, beta=1.0).mean(axis=1)
    if weights is not None:
        loss = loss * weights
    return loss


_CLS_LOSSES = {
    'WeightedBinaryCrossEntropy': weighted_binary_ce,
    'WeightedCrossEntropy': weighted_sigmoid_ce,  # reference maps this name to sigmoid-CE
    'FocalLoss': sigmoid_focal_loss,
}


def build_cls_loss(name):
    """Mirror ``IASSD_Head.build_losses`` name dispatch (prefix match)."""
    for key, fn in _CLS_LOSSES.items():
        if name.startswith(key):
            return fn
    raise NotImplementedError(name)


def lovasz_grad(gt_sorted):
    """Gradient of the Jaccard-loss convex extension w.r.t. sorted errors
    (Lovasz-Softmax, Berman et al.; parity: the reference's vendored
    ``LovaszSoftmaxLoss`` used by ``CPGNetCriterion``)."""
    p = gt_sorted.shape[-1]
    gts = jnp.sum(gt_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=-1)
    jaccard = 1.0 - intersection / jnp.clip(union, 1e-9, None)
    if p > 1:
        jaccard = jnp.concatenate(
            [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1)
    return jaccard


def lovasz_softmax(probs, labels, valid=None, classes='present'):
    """Flat Lovasz-softmax over (P, C) probs and (P,) int labels.

    Fixed-shape formulation: invalid points get zero error and sort to the
    tail, where the cumulative Jaccard gradient contribution is zero.
    """
    P, C = probs.shape
    if valid is None:
        valid = jnp.ones((P,), bool)
    losses = []
    present = []
    for c in range(C):
        fg = ((labels == c) & valid).astype(probs.dtype)
        err = jnp.abs(fg - probs[:, c]) * valid
        order = jnp.argsort(-err)
        err_s = err[order]
        fg_s = fg[order]
        losses.append(jnp.sum(err_s * lovasz_grad(fg_s)))
        present.append(jnp.sum(fg) > 0)
    losses = jnp.stack(losses)
    if classes == 'present':
        pres = jnp.stack(present).astype(probs.dtype)
        return jnp.sum(losses * pres) / jnp.clip(jnp.sum(pres), 1.0, None)
    return jnp.mean(losses)


def cpgnet_criterion(logits, target, weight='dynamic-log', ignore=None,
                     classes='present', with_ls=True, valid=None):
    """Semantic-segmentation loss (``loss_utils.CPGNetCriterion:157-203``):
    frequency-weighted CE (+ optional dynamic/log weights, ignore classes)
    + 2 x Lovasz-softmax.

    Args: logits (P, C); target (P,) int; valid (P,) bool (fixed-shape pad
    mask — the reference's ragged points are always valid).
    """
    P, C = logits.shape
    if valid is None:
        valid = jnp.ones((P,), bool)
    tgt = jnp.clip(target.astype(jnp.int32), 0, C - 1)
    onehot = jax.nn.one_hot(tgt, C) * valid[:, None]

    if isinstance(weight, str) and weight.startswith('dynamic'):
        cnt = jnp.sum(onehot, axis=0)
        n = jnp.clip(jnp.sum(valid), 1, None)
        if weight == 'dynamic-log':
            freq = jnp.log(cnt + 1) / jnp.log(n.astype(jnp.float32) + 1)
        else:
            freq = cnt / n
        w = 1.0 / (freq + 1e-3)
    else:
        w = jnp.asarray(weight, jnp.float32)
    if ignore:
        w = w.at[jnp.asarray(list(ignore))].set(0.0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    per_pt_w = w[tgt] * valid
    ce = -jnp.sum(onehot * logp, axis=-1)
    # torch F.cross_entropy(weight=...) normalizes by the summed weights
    loss_wce = jnp.sum(ce * per_pt_w) / jnp.clip(jnp.sum(per_pt_w), 1e-9,
                                                 None)
    loss_ls = lovasz_softmax(jax.nn.softmax(logits, axis=-1), tgt,
                             valid=valid, classes=classes) \
        if with_ls else 0.0
    loss = loss_wce + 2.0 * loss_ls
    return {'loss_wce': loss_wce, 'loss_ls': loss_ls, 'loss': loss}
