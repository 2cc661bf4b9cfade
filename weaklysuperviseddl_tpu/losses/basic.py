"""Cross-entropy and KL losses with the reference's exact reductions."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray, axis: int = -1):
    """Mean softmax cross-entropy over all non-class dims — torch
    nn.CrossEntropyLoss default (ref SegmentationModel.py:90, pixelwise for
    [B,H,W,C] logits vs [B,H,W] int labels)."""
    log_probs = jax.nn.log_softmax(logits, axis=axis)
    nll = -jnp.take_along_axis(log_probs, labels[..., None].astype(jnp.int32), axis=axis)
    return jnp.mean(nll)


def kl_div_batchmean(log_q: jnp.ndarray, p: jnp.ndarray):
    """torch F.kl_div(log_q, p, reduction='batchmean'):
    sum(p * (log p - log q)) / batch_size — the refinement objective's KL term
    (ref AlternatingDirectionCutLoss.py:742)."""
    batch = log_q.shape[0]
    # torch kl_div treats p log p with p=0 as 0
    p_log_p = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    return jnp.sum(p_log_p - p * log_q) / batch
