"""Cross-entropy and KL losses with the reference's exact reductions."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def per_example_nll(logits: jnp.ndarray, labels: jnp.ndarray, axis: int = -1):
    """Unreduced softmax negative log-likelihood (class axis contracted).

    One-hot multiply-sum rather than take_along_axis: the gather's backward
    is a scatter-add, which serializes on TPU — on the 256² seg step the
    swap alone measured 49.5 → 34.0 ms (+45% throughput), identical loss.
    The single CE formulation shared by the classifier step, the seg step
    (both weight it by their padded-row valid masks) and cross_entropy_loss.
    """
    log_probs = jax.nn.log_softmax(logits, axis=axis)
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), logits.shape[axis],
                            axis=axis, dtype=log_probs.dtype)
    return -jnp.sum(log_probs * onehot, axis=axis)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray, axis: int = -1):
    """Mean softmax cross-entropy over all non-class dims — torch
    nn.CrossEntropyLoss default (ref SegmentationModel.py:90, pixelwise for
    [B,H,W,C] logits vs [B,H,W] int labels)."""
    return jnp.mean(per_example_nll(logits, labels, axis))


def kl_div_batchmean(log_q: jnp.ndarray, p: jnp.ndarray):
    """torch F.kl_div(log_q, p, reduction='batchmean'):
    sum(p * (log p - log q)) / batch_size — the refinement objective's KL term
    (ref AlternatingDirectionCutLoss.py:742)."""
    batch = log_q.shape[0]
    # torch kl_div treats p log p with p=0 as 0
    p_log_p = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    return jnp.sum(p_log_p - p * log_q) / batch
