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
class GHMR:
    """Gradient-harmonizing regression loss (reference
    ``mmdet/models/losses/ghm_loss.py`` GHMR): authentic smooth L1
    ``sqrt(d^2 + mu^2) - mu`` whose per-element weight is the inverse
    density of the gradient norm ``d / sqrt(d^2 + mu^2)``."""

    def __init__(self, mu=0.02, bins=10, momentum=0.0, loss_weight=1.0):
        self.mu = mu
        self.bins = bins
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        g = jnp.abs(diff / jnp.sqrt(diff * diff + mu * mu))
        valid = (jnp.ones_like(loss) if weight is None
                 else (weight > 0).astype(loss.dtype))
        tot = jnp.maximum(jnp.sum(valid), 1.0)
        edges = jnp.linspace(0, 1, self.bins + 1)
        w = jnp.zeros_like(loss)
        for i in range(self.bins):
            hi = edges[i + 1] + (1e-6 if i == self.bins - 1 else 0.0)
            inds = (g >= edges[i]) & (g < hi) & (valid > 0)
            n_in = jnp.sum(inds)
            bin_w = jnp.where(n_in > 0, tot / jnp.maximum(n_in, 1.0), 0.0)
            w = jnp.where(inds, bin_w, w)
        return self.loss_weight * jnp.sum(loss * w) / tot


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


@LOSSES.register_module()
class CIoULoss:
    """Complete IoU (DIoU + aspect-ratio consistency term; reference:
    ``mmdet/models/losses/iou_loss.py`` CIoULoss)."""

    def __init__(self, eps=1e-7, reduction="mean", loss_weight=1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        import math
        iou, _, ewh = iou_loss_terms(pred, target, self.eps)
        c2 = ewh[..., 0] ** 2 + ewh[..., 1] ** 2 + self.eps
        pc = (pred[..., :2] + pred[..., 2:]) / 2
        tc = (target[..., :2] + target[..., 2:]) / 2
        rho2 = jnp.sum((pc - tc) ** 2, axis=-1)
        wp = jnp.clip(pred[..., 2] - pred[..., 0], self.eps, None)
        hp = jnp.clip(pred[..., 3] - pred[..., 1], self.eps, None)
        wt = jnp.clip(target[..., 2] - target[..., 0], self.eps, None)
        ht = jnp.clip(target[..., 3] - target[..., 1], self.eps, None)
        v = (4 / math.pi ** 2) * (jnp.arctan(wt / ht)
                                  - jnp.arctan(wp / hp)) ** 2
        alpha = jax.lax.stop_gradient(v / jnp.maximum(1 - iou + v, self.eps))
        return self.loss_weight * weight_reduce_loss(
            1 - iou + rho2 / c2 + alpha * v, weight, self.reduction,
            avg_factor)


@LOSSES.register_module()
class GaussianFocalLoss:
    """Focal loss on Gaussian-splatted heatmap targets (CenterNet family;
    reference: ``mmdet/models/losses/gaussian_focal_loss.py``):
    positives are heatmap==1 pixels, other pixels are down-weighted by
    ``(1 - heatmap)^gamma``."""

    def __init__(self, alpha=2.0, gamma=4.0, reduction="mean",
                 loss_weight=1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, gaussian_target, weight=None, avg_factor=None):
        eps = 1e-12
        pos = (gaussian_target == 1).astype(pred.dtype)
        neg_w = (1 - gaussian_target) ** self.gamma
        pos_loss = -jnp.log(pred + eps) * (1 - pred) ** self.alpha * pos
        neg_loss = -jnp.log(1 - pred + eps) * pred ** self.alpha * \
            neg_w * (1 - pos)
        return self.loss_weight * weight_reduce_loss(
            pos_loss + neg_loss, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class QualityFocalLoss:
    """Quality focal loss (generalized focal loss part 1; reference:
    ``mmdet/models/losses/gfocal_loss.py`` quality_focal_loss): sigmoid
    BCE against the (soft) localization-quality score, modulated by
    ``|score - sigmoid(pred)|^beta``.

    ``target`` is a tuple ``(labels, scores)``: int class labels (bg =
    num_classes) and the per-sample quality score of the matched gt.
    """

    def __init__(self, use_sigmoid=True, beta=2.0, reduction="mean",
                 loss_weight=1.0):
        assert use_sigmoid
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        labels, score = target
        num_classes = pred.shape[-1]
        sig = jax.nn.sigmoid(pred)
        # all-negative baseline: target 0 everywhere
        zerolabel = jnp.zeros_like(pred)
        bce_all = jnp.maximum(pred, 0) - pred * zerolabel + \
            jnp.log1p(jnp.exp(-jnp.abs(pred)))
        loss = bce_all * sig ** self.beta
        # positives: BCE against the quality score on the label channel
        pos = labels < num_classes
        onehot = jax.nn.one_hot(jnp.where(pos, labels, 0), num_classes,
                                dtype=pred.dtype)
        t = onehot * score[..., None]
        bce_pos = jnp.maximum(pred, 0) - pred * t + \
            jnp.log1p(jnp.exp(-jnp.abs(pred)))
        mod = jnp.abs(t - sig) ** self.beta
        loss = jnp.where(pos[..., None] & (onehot > 0), bce_pos * mod, loss)
        loss = jnp.sum(loss, axis=-1)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class DistributionFocalLoss:
    """Distribution focal loss (generalized focal loss part 2; reference:
    ``mmdet/models/losses/gfocal_loss.py`` distribution_focal_loss):
    cross-entropy against the two integer bins bracketing the continuous
    regression target, weighted by proximity."""

    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        # pred: (..., n_bins) logits over discretized offsets;
        # target: (...,) continuous value in [0, n_bins - 1]
        disl = jnp.floor(target).astype(jnp.int32)
        disr = disl + 1
        n = pred.shape[-1]
        disl = jnp.clip(disl, 0, n - 1)
        disr = jnp.clip(disr, 0, n - 1)
        wl = disr.astype(pred.dtype) - target
        wr = target - disl.astype(pred.dtype)
        logp = jax.nn.log_softmax(pred, axis=-1)
        ll = jnp.take_along_axis(logp, disl[..., None], axis=-1)[..., 0]
        lr = jnp.take_along_axis(logp, disr[..., None], axis=-1)[..., 0]
        loss = -(ll * wl + lr * wr)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class AssociativeEmbeddingLoss:
    """Associative embedding pull/push loss for corner grouping
    (reference: ``mmdet/models/losses/ae_loss.py``): embeddings of the
    same instance are pulled to their mean, means of different instances
    are pushed apart with the margin-exponential penalty.

    Padded-static formulation: ``tl``/``br`` are ``(K,)`` corner
    embeddings for K padded instances with a ``valid`` mask.
    """

    def __init__(self, pull_weight=0.25, push_weight=0.25):
        self.pull_weight = pull_weight
        self.push_weight = push_weight

    def __call__(self, tl, br, valid):
        v = valid.astype(tl.dtype)
        n = jnp.maximum(jnp.sum(v), 1.0)
        mean = (tl + br) / 2.0
        pull = ((tl - mean) ** 2 + (br - mean) ** 2) * v
        pull = jnp.sum(pull) / n
        # push: sum over pairs i != j of max(0, 1 - |e_i - e_j|)
        diff = jnp.abs(mean[:, None] - mean[None, :])
        pair_v = v[:, None] * v[None, :] * \
            (1.0 - jnp.eye(tl.shape[0], dtype=tl.dtype))
        push = jnp.maximum(0.0, 1.0 - diff) * pair_v
        push = jnp.sum(push) / jnp.maximum(n * (n - 1.0), 1.0)
        return self.pull_weight * pull, self.push_weight * push


# ---------------------------------------------------------------- PISA

def isr_p(label_weights, ious, pos_mask, labels, matched_gt, pos_loss_cls,
          k=2.0, bias=0.0):
    """Importance-based Sample Reweighting for positives (ISR-P).

    reference: ``mmdet/models/losses/pisa_loss.py:6-117`` — positives are
    ranked by IoU-HLR (sort by IoU within each (label, matched-gt) group,
    then re-rank across groups of the same label), the rank is linearly
    mapped to a weight, raised to ``k`` with shift ``bias``, and the
    result is normalised so the weighted positive cls loss keeps its
    original sum.  Static-shape formulation: both hierarchical sorts are
    one segmented-rank pass each (sort + segmented scan), no python
    loops over labels/instances.

    Args:
      label_weights: ``(N,)`` current cls weights.
      ious: ``(N,)`` aligned IoU between decoded prediction and target
        (any value on non-positive rows — masked out).
      pos_mask: ``(N,)`` bool.
      labels: ``(N,)`` int class of each row.
      matched_gt: ``(N,)`` int matched-gt index for positives.
      pos_loss_cls: ``(N,)`` per-sample unweighted cls loss
        (stop-gradiented; 0 on non-positive rows).
    Returns updated ``(N,)`` label weights.
    """
    from ..core.samplers import _within_group_rank
    n = labels.shape[0]
    pf = pos_mask.astype(jnp.float32)
    num_pos = jnp.sum(pf)
    # per-label positive counts -> max_l_num
    counts = jnp.zeros(n, jnp.float32).at[
        jnp.where(pos_mask, labels, n - 1)].add(pf)
    max_l_num = jnp.maximum(jnp.max(counts), 1.0)

    iou_key = 1.0 - jnp.clip(ious, 0.0, 1.0) * (1.0 - 1e-6)   # desc iou
    # group 1: (label, gt); non-positives into a junk group
    g1 = jnp.where(pos_mask, labels * (n + 1) + matched_gt + 1, 0)
    t_rank = _within_group_rank(g1, iou_key).astype(jnp.float32)
    iou_aug = jnp.clip(ious, 0.0, 1.0) + (max_l_num - t_rank)
    # group 2: label, ranked by descending augmented iou
    key2 = 1.0 - iou_aug / (max_l_num + 2.0)
    g2 = jnp.where(pos_mask, labels + 1, 0)
    l_rank = _within_group_rank(g2, key2).astype(jnp.float32)

    w_raw = (max_l_num - l_rank) / max_l_num
    imp = (bias + label_weights * w_raw * (1.0 - bias)) ** k
    ori = jnp.sum(pos_loss_cls * label_weights * pf)
    new = jnp.maximum(jnp.sum(pos_loss_cls * imp * pf), 1e-12)
    ratio = jnp.where(num_pos > 0, ori / new, 1.0)
    return jnp.where(pos_mask, imp * ratio, label_weights)


def carl_loss(pos_cls_prob, pos_mask, reg_loss_raw, k=1.0, bias=0.2,
              avg_factor=None):
    """Classification-Aware Regression Loss (CARL).

    reference: ``mmdet/models/losses/pisa_loss.py:119-181`` — the
    regression loss of each positive is scaled by a weight derived from
    its own classification score (normalised to sum to num_pos), making
    box quality follow classification confidence.

    Args:
      pos_cls_prob: ``(N,)`` predicted probability of each row's gt class
        (graded — keeps gradient, per reference).
      pos_mask: ``(N,)`` bool.
      reg_loss_raw: ``(N, 4)`` unreduced regression loss.
      avg_factor: normaliser (defaults to N).
    """
    pf = pos_mask.astype(jnp.float32)
    num_pos = jnp.sum(pf)
    w = (bias + (1.0 - bias) * pos_cls_prob) ** k
    ratio = jnp.where(num_pos > 0,
                      num_pos / jnp.maximum(jnp.sum(w * pf), 1e-12), 0.0)
    w = w * ratio
    if avg_factor is None:
        avg_factor = float(reg_loss_raw.shape[0])
    return jnp.sum(reg_loss_raw * (w * pf)[:, None]) / avg_factor


def bounded_iou_loss(pred, target, beta=0.2, eps=1e-3):
    """Bounded IoU loss (reference ``mmdet/models/losses/iou_loss.py:
    33-75``; arXiv 1711.00164) — per-coordinate bounded terms with
    smooth-L1 shaping.  Target terms are stop-gradiented like the
    reference's no_grad block."""
    pred_cx = (pred[..., 0] + pred[..., 2]) * 0.5
    pred_cy = (pred[..., 1] + pred[..., 3]) * 0.5
    pred_w = pred[..., 2] - pred[..., 0]
    pred_h = pred[..., 3] - pred[..., 1]
    t = jax.lax.stop_gradient(target)
    t_cx = (t[..., 0] + t[..., 2]) * 0.5
    t_cy = (t[..., 1] + t[..., 3]) * 0.5
    t_w = t[..., 2] - t[..., 0]
    t_h = t[..., 3] - t[..., 1]
    dx = jnp.abs(t_cx - pred_cx)
    dy = jnp.abs(t_cy - pred_cy)
    loss_dx = 1 - jnp.maximum((t_w - 2 * dx) / (t_w + 2 * dx + eps), 0.0)
    loss_dy = 1 - jnp.maximum((t_h - 2 * dy) / (t_h + 2 * dy + eps), 0.0)
    loss_dw = 1 - jnp.minimum(t_w / (pred_w + eps), pred_w / (t_w + eps))
    loss_dh = 1 - jnp.minimum(t_h / (pred_h + eps), pred_h / (t_h + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], -1)
    return jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta)


@LOSSES.register_module()
class BoundedIoULoss:
    def __init__(self, beta=0.2, eps=1e-3, reduction="mean",
                 loss_weight=1.0):
        self.beta = beta
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = bounded_iou_loss(pred, target, self.beta, self.eps)
        if weight is not None and weight.ndim < loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)
