"""Reference surface: TraditionalModel/LossFunctions/Lovasz-Softmax_Loss.py
(module name sanitized — the reference file isn't importable as-is).

All public names preserved; NCHW torch-style tensors accepted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.compat._adapt import to_array
from weaklysuperviseddl_tpu.losses import lovasz as _lovasz

lovasz_grad = _lovasz.lovasz_grad
StableBCELoss = None  # class defined below


def _nchw_probas(probas):
    p = to_array(probas)
    if p.ndim == 3:  # [B,H,W] sigmoid output → [B,H,W,1]
        return p[..., None]
    return jnp.transpose(p, (0, 2, 3, 1))


def lovasz_softmax(probas, labels, classes="present", per_image=False, ignore=None):
    """Reference :146-161 — probas NCHW."""
    return _lovasz.lovasz_softmax(
        _nchw_probas(probas), to_array(labels),
        classes=classes if isinstance(classes, str) else tuple(classes),
        per_image=per_image, ignore=ignore,
    )


def lovasz_softmax_flat(probas, labels, classes="present"):
    """Reference :164-192 — flat [P,C] probas."""
    p = to_array(probas)
    l = to_array(labels)
    return _lovasz.lovasz_softmax(
        p.reshape(1, -1, 1, p.shape[-1]), l.reshape(1, -1, 1),
        classes=classes if isinstance(classes, str) else tuple(classes),
    )


def lovasz_hinge(logits, labels, per_image=True, ignore=None):
    """Reference :71-84."""
    return _lovasz.lovasz_hinge(to_array(logits), to_array(labels),
                                per_image=per_image, ignore=ignore)


def lovasz_hinge_flat(logits, labels):
    """Reference :87-104."""
    lg = to_array(logits).reshape(1, 1, -1)
    lb = to_array(labels).reshape(1, 1, -1)
    return _lovasz.lovasz_hinge(lg, lb, per_image=False)


def flatten_binary_scores(scores, labels, ignore=None):
    """Reference :107-119 — host-side numpy filtering (dynamic shapes are fine
    off-device)."""
    s = np.asarray(to_array(scores)).reshape(-1)
    l = np.asarray(to_array(labels)).reshape(-1)
    if ignore is None:
        return s, l
    valid = l != ignore
    return s[valid], l[valid]


def flatten_probas(probas, labels, ignore=None):
    """Reference :195-211."""
    p = np.asarray(_nchw_probas(probas))
    C = p.shape[-1]
    p = p.reshape(-1, C)
    l = np.asarray(to_array(labels)).reshape(-1)
    if ignore is None:
        return p, l
    valid = l != ignore
    return p[valid], l[valid]


class _StableBCE:
    """Reference StableBCELoss (:122-128)."""

    def __call__(self, input, target):
        return _lovasz.stable_bce(to_array(input), to_array(target))

    forward = __call__


StableBCELoss = _StableBCE


def binary_xloss(logits, labels, ignore=None):
    """Reference :131-140."""
    s, l = flatten_binary_scores(logits, labels, ignore)
    return _lovasz.stable_bce(jnp.asarray(s), jnp.asarray(l, jnp.float32))


def xloss(logits, labels, ignore=None):
    """Reference :213-217 — CE with ignore_index=255."""
    from weaklysuperviseddl_tpu.losses.basic import cross_entropy_loss

    lg = to_array(logits)
    lb = to_array(labels)
    if lg.ndim == 4:
        lg = jnp.transpose(lg, (0, 2, 3, 1))
    valid = lb != 255
    logp = jnp.take_along_axis(
        jnp.log(jnp.clip(jnp.exp(lg - lg.max(-1, keepdims=True)) /
                         jnp.sum(jnp.exp(lg - lg.max(-1, keepdims=True)), -1, keepdims=True),
                         1e-30, None)),
        jnp.clip(lb, 0, lg.shape[-1] - 1)[..., None].astype(jnp.int32), axis=-1,
    )[..., 0]
    return -(logp * valid).sum() / jnp.maximum(valid.sum(), 1)


def iou_binary(preds, labels, EMPTY=1.0, ignore=None, per_image=True):
    """Reference :26-43."""
    p = np.asarray(to_array(preds))
    l = np.asarray(to_array(labels))
    if not per_image:
        p, l = p[None], l[None]
    ious = []
    for pi, li in zip(p, l):
        intersection = ((li == 1) & (pi == 1)).sum()
        union = ((li == 1) | ((pi == 1) & (li != ignore))).sum()
        ious.append(EMPTY if not union else float(intersection) / float(union))
    return 100.0 * float(np.mean(ious))


def iou(preds, labels, C, EMPTY=1.0, ignore=None, per_image=False):
    """Reference :46-65."""
    p = np.asarray(to_array(preds))
    l = np.asarray(to_array(labels))
    if not per_image:
        p, l = p[None], l[None]
    ious = []
    for pi, li in zip(p, l):
        per_cls = []
        for i in range(C):
            if i != ignore:
                intersection = ((li == i) & (pi == i)).sum()
                union = ((li == i) | ((pi == i) & (li != ignore))).sum()
                per_cls.append(EMPTY if not union else float(intersection) / float(union))
        ious.append(per_cls)
    return 100.0 * np.array([np.mean(vals) for vals in zip(*ious)])


def isnan(x):
    return x != x


def mean(values, ignore_nan=False, empty=0):
    """Reference :225-243 — generator-safe nanmean."""
    import math

    vals = [v for v in values]
    if ignore_nan:
        vals = [v for v in vals if not (isinstance(v, float) and math.isnan(v))]
    if not vals:
        if empty == "raise":
            raise ValueError("Empty mean")
        return empty
    return sum(vals) / len(vals)
