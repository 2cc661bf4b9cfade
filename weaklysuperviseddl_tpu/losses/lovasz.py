"""Lovász losses — TPU-native fixed-shape re-design.

Semantics from the reference's vendored library
(TraditionalModel/LossFunctions/Lovasz-Softmax_Loss.py): the Lovász extension
of the Jaccard index — sort per-class absolute errors descending, dot with the
discrete IoU subgradient computed by cumulative sums over the sorted ground
truth.

TPU adaptations (SURVEY.md §7 hard parts):
  * sorting via jax.lax sort (fine on TPU),
  * the dynamic-shape constructs — ``classes='present'`` skipping and
    ``ignore`` filtering — become mask-weighted fixed-shape computations.
    Invalid pixels get fg=0 and error=0, so they sort to the tail and
    contribute nothing to the dot product or the cumsum prefixes; absent
    classes get weight 0 in the class mean. This is exactly equivalent to the
    filtered computation (prefix sums only depend on the valid prefix).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def lovasz_grad(gt_sorted: jnp.ndarray):
    """Jaccard subgradient w.r.t. sorted errors (ref Lovasz-Softmax_Loss.py:11-23)."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def _lovasz_softmax_flat(probas, labels, valid, class_ids, present_only):
    """probas [P,C], labels [P] int, valid [P] bool. Returns scalar."""
    losses = []
    weights = []
    for c in class_ids:
        fg = ((labels == c) & valid).astype(probas.dtype)
        errors = jnp.abs(fg - probas[:, c]) * valid.astype(probas.dtype)
        # descending sort of errors, carrying fg along
        neg_err_sorted, fg_sorted = jax.lax.sort_key_val(-errors, fg)
        errors_sorted = -neg_err_sorted
        grad = lovasz_grad(fg_sorted)
        losses.append(jnp.dot(errors_sorted, grad))
        weights.append(jnp.where(present_only, (jnp.sum(fg) > 0).astype(probas.dtype), 1.0))
    losses = jnp.stack(losses)
    weights = jnp.stack(weights)
    denom = jnp.maximum(jnp.sum(weights), 1e-8)
    return jnp.sum(losses * weights) / denom


@partial(jax.jit, static_argnames=("classes", "per_image", "ignore"))
def lovasz_softmax(
    probas: jnp.ndarray,   # [B,H,W,C] probabilities (NHWC; reference is NCHW)
    labels: jnp.ndarray,   # [B,H,W] int
    classes: str | tuple = "present",
    per_image: bool = False,
    ignore: int | None = None,
):
    """Multi-class Lovász-Softmax (ref Lovasz-Softmax_Loss.py:146-192)."""
    B, H, W, C = probas.shape
    if isinstance(classes, str):
        class_ids = tuple(range(C))
        present_only = classes == "present"
    else:
        class_ids = tuple(classes)
        present_only = False

    flat_p = probas.reshape(B, H * W, C)
    flat_l = labels.reshape(B, H * W).astype(jnp.int32)
    valid = jnp.ones_like(flat_l, bool) if ignore is None else flat_l != ignore

    if per_image:
        per = jax.vmap(
            lambda p, l, v: _lovasz_softmax_flat(p, l, v, class_ids, present_only)
        )(flat_p, flat_l, valid)
        return jnp.mean(per)
    return _lovasz_softmax_flat(
        flat_p.reshape(-1, C), flat_l.reshape(-1), valid.reshape(-1),
        class_ids, present_only,
    )


def _lovasz_hinge_flat(logits, labels, valid):
    signs = 2.0 * labels - 1.0
    # hinge errors can be negative, so ignored pixels must be forced below
    # every valid element (-inf sentinel) or they'd interleave mid-sort and
    # corrupt the cumsum prefixes; relu() then zeroes their contribution.
    errors = jnp.where(valid > 0, 1.0 - logits * signs, -1e9)
    neg_err_sorted, fg_sorted = jax.lax.sort_key_val(-errors, labels * valid)
    errors_sorted = -neg_err_sorted
    grad = lovasz_grad(fg_sorted)
    return jnp.dot(jax.nn.relu(errors_sorted), grad)


@partial(jax.jit, static_argnames=("per_image", "ignore"))
def lovasz_hinge(
    logits: jnp.ndarray,   # [B,H,W]
    labels: jnp.ndarray,   # [B,H,W] binary
    per_image: bool = True,
    ignore: int | None = None,
):
    """Binary Lovász hinge (ref Lovasz-Softmax_Loss.py:71-104)."""
    B = logits.shape[0]
    flat_lg = logits.reshape(B, -1)
    flat_lb = labels.reshape(B, -1).astype(logits.dtype)
    valid = (
        jnp.ones_like(flat_lb) if ignore is None else (flat_lb != ignore).astype(logits.dtype)
    )
    if per_image:
        per = jax.vmap(_lovasz_hinge_flat)(flat_lg, flat_lb, valid)
        return jnp.mean(per)
    return _lovasz_hinge_flat(flat_lg.reshape(-1), flat_lb.reshape(-1), valid.reshape(-1))


def stable_bce(logits: jnp.ndarray, targets: jnp.ndarray):
    """Numerically-stable BCE with logits (ref StableBCELoss, :122-128)."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.clip(logits, 0.0, None) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)
