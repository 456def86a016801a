"""Loss functions (weighted / masked, static-shape).

reference: ``mmdet/models/losses/`` — ``cross_entropy_loss.py:129-200``,
``smooth_l1_loss.py:46-130``, ``mse_loss.py:15-35``, ``focal_loss.py``,
``losses/utils.py`` (``weight_reduce_loss``).  Padded samples are handled
with per-element weights and an explicit ``avg_factor``, replacing the
reference's dynamic-shape tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import Registry, build_from_cfg

LOSSES = Registry("loss")


def build_loss(cfg, **default_args):
    return build_from_cfg(cfg, LOSSES, default_args)


def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
    """reference: ``mmdet/models/losses/utils.py``."""
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    # mean
    if avg_factor is None:
        if weight is None:
            return jnp.mean(loss)
        return jnp.sum(loss) / jnp.maximum(jnp.sum(weight), 1e-6)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-6)


def cross_entropy(logits, labels, weight=None, reduction="mean",
                  avg_factor=None):
    """Softmax CE with integer labels (padded labels must carry weight 0)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    loss = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy(logits, labels, weight=None, reduction="mean",
                         avg_factor=None):
    """Sigmoid BCE; ``labels`` same shape as ``logits`` (float or 0/1)."""
    labels = labels.astype(logits.dtype)
    loss = (jnp.clip(logits, 0, None) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def l1_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
    loss = jnp.abs(pred - target)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def smooth_l1_loss(pred, target, beta=1.0, weight=None, reduction="mean",
                   avg_factor=None):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def mse_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
    loss = (pred - target) ** 2
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def sigmoid_focal_loss(logits, labels, gamma=2.0, alpha=0.25, weight=None,
                       reduction="mean", avg_factor=None):
    """Elementwise focal loss; ``labels`` one-hot-like float of same shape.

    reference: mmcv CUDA ``SigmoidFocalLoss`` — pure-JAX elementwise here.
    """
    p = jax.nn.sigmoid(logits)
    labels = labels.astype(logits.dtype)
    ce = (jnp.clip(logits, 0, None) - logits * labels
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    p_t = p * labels + (1 - p) * (1 - labels)
    alpha_t = alpha * labels + (1 - alpha) * (1 - labels)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class CrossEntropyLoss:
    """reference: ``mmdet/models/losses/cross_entropy_loss.py:129-200``."""

    def __init__(self, use_sigmoid=False, use_mask=False, reduction="mean",
                 loss_weight=1.0):
        self.use_sigmoid = use_sigmoid
        self.use_mask = use_mask
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if self.use_mask:
            # pred (P, S, S) logits for the matched class channel;
            # target (P, S, S); weight (P,) per-instance validity
            w = None if weight is None else weight[:, None, None]
            loss = binary_cross_entropy(pred, target, w, self.reduction,
                                        avg_factor)
        elif self.use_sigmoid:
            loss = binary_cross_entropy(pred, target, weight, self.reduction,
                                        avg_factor)
        else:
            loss = cross_entropy(pred, target, weight, self.reduction,
                                 avg_factor)
        return self.loss_weight * loss


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta=1.0, reduction="mean", loss_weight=1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * smooth_l1_loss(
            pred, target, self.beta, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * l1_loss(pred, target, weight,
                                          self.reduction, avg_factor)


@LOSSES.register_module()
class MSELoss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * mse_loss(pred, target, weight,
                                           self.reduction, avg_factor)


def iou_loss_terms(pred, target, eps=1e-7):
    """Aligned IoU + enclosing-box terms for the IoU-loss family
    (reference: ``mmdet/models/losses/iou_loss.py``)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    ap = jnp.clip(pred[..., 2] - pred[..., 0], 0, None) * \
        jnp.clip(pred[..., 3] - pred[..., 1], 0, None)
    at = jnp.clip(target[..., 2] - target[..., 0], 0, None) * \
        jnp.clip(target[..., 3] - target[..., 1], 0, None)
    union = jnp.maximum(ap + at - inter, eps)
    iou = inter / union
    elt = jnp.minimum(pred[..., :2], target[..., :2])
    erb = jnp.maximum(pred[..., 2:], target[..., 2:])
    ewh = jnp.clip(erb - elt, 0, None)
    return iou, union, ewh


@LOSSES.register_module()
class BalancedL1Loss:
    """Libra R-CNN balanced L1 (reference:
    ``mmdet/models/losses/balanced_l1_loss.py``)."""

    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, reduction="mean",
                 loss_weight=1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        import numpy as _np
        diff = jnp.abs(pred - target)
        b = _np.e ** (self.gamma / self.alpha) - 1
        loss = jnp.where(
            diff < self.beta,
            self.alpha / b * (b * diff + 1)
            * jnp.log(b * diff / self.beta + 1) - self.alpha * diff,
            self.gamma * diff + self.gamma / b - self.alpha * self.beta)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class GHMC:
    """Gradient-harmonizing classification loss (reference:
    ``mmdet/models/losses/ghm_loss.py``) — sigmoid BCE reweighted by the
    inverse gradient-norm density, computed statically per batch."""

    def __init__(self, bins=10, momentum=0.0, use_sigmoid=True,
                 loss_weight=1.0):
        assert use_sigmoid
        self.bins = bins
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        target = target.astype(pred.dtype)
        valid = (jnp.ones_like(target) if weight is None
                 else (weight > 0).astype(pred.dtype))
        g = jnp.abs(jax.nn.sigmoid(pred) - target)
        tot = jnp.maximum(jnp.sum(valid), 1.0)
        edges = jnp.linspace(0, 1, self.bins + 1)
        w = jnp.zeros_like(pred)
        for i in range(self.bins):
            inds = ((g >= edges[i]) & (g < edges[i + 1] + (1e-6 if
                    i == self.bins - 1 else 0.0))) & (valid > 0)
            num_in_bin = jnp.sum(inds)
            bin_w = jnp.where(num_in_bin > 0, tot / jnp.maximum(
                num_in_bin, 1.0), 0.0)
            w = jnp.where(inds, bin_w, w)
        loss = binary_cross_entropy(pred, target, w, reduction="sum")
        return self.loss_weight * loss / tot


@LOSSES.register_module()
class IoULoss:
    def __init__(self, eps=1e-6, reduction="mean", loss_weight=1.0,
                 linear=False):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.linear = linear

    def __call__(self, pred, target, weight=None, avg_factor=None):
        iou, _, _ = iou_loss_terms(pred, target, self.eps)
        loss = (1 - iou) if self.linear else -jnp.log(
            jnp.maximum(iou, self.eps))
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class GIoULoss:
    def __init__(self, eps=1e-7, reduction="mean", loss_weight=1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        iou, union, ewh = iou_loss_terms(pred, target, self.eps)
        enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], self.eps)
        giou = iou - (enclose - union) / enclose
        return self.loss_weight * weight_reduce_loss(
            1 - giou, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class DIoULoss:
    def __init__(self, eps=1e-7, reduction="mean", loss_weight=1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        iou, _, ewh = iou_loss_terms(pred, target, self.eps)
        c2 = ewh[..., 0] ** 2 + ewh[..., 1] ** 2 + self.eps
        pc = (pred[..., :2] + pred[..., 2:]) / 2
        tc = (target[..., :2] + target[..., 2:]) / 2
        rho2 = jnp.sum((pc - tc) ** 2, axis=-1)
        return self.loss_weight * weight_reduce_loss(
            1 - iou + rho2 / c2, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction="mean", loss_weight=1.0):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * sigmoid_focal_loss(
            pred, target, self.gamma, self.alpha, weight, self.reduction,
            avg_factor)
