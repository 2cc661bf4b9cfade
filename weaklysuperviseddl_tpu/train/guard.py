"""Cheap non-finite-gradient guard (failure detection, SURVEY.md §5).

Drop-in replacement for ``optax.apply_if_finite`` with the check cost removed:
optax runs an elementwise ``isfinite(...).all()`` over every gradient leaf
(a full extra pass over ~100 MB of gradients for ResNet-50 — measured 1.6 ms
of a 34 ms DeepLabV3 train step on v5e). A single fused fp32 SUM over the
gradients detects the same failures: any NaN propagates to the total; any
lone ±inf makes the total ±inf; +inf and −inf together make it NaN. The only
divergence is finite-but-astronomical gradients (≥ ~1e31) overflowing the
accumulator — which triggers a (correct in spirit) skipped step.

Like apply_if_finite, a non-finite step applies zero updates and leaves the
inner optimizer state untouched, so one poisoned batch cannot corrupt
training (reference analogue: none — the reference would silently NaN its
params; see tests/test_train.py guard test).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FastFiniteState(NamedTuple):
    notfinite_count: jnp.ndarray   # consecutive non-finite steps
    total_notfinite: jnp.ndarray   # lifetime non-finite steps
    inner_state: optax.OptState


def apply_if_finite_fast(
    tx: optax.GradientTransformation, max_consecutive_errors: int = 100
) -> optax.GradientTransformation:
    """``max_consecutive_errors`` keeps optax's escape hatch: once that many
    consecutive steps are non-finite, the update passes through unprotected so
    a permanently diverged run surfaces as NaN params instead of silently
    training nothing forever."""

    def init(params):
        return FastFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=tx.init(params),
        )

    def update(grads, state, params=None):
        total = sum(
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(grads)
        )
        finite = jnp.isfinite(total)
        give_up = state.notfinite_count >= max_consecutive_errors
        apply = finite | give_up
        updates, new_inner = tx.update(grads, state.inner_state, params)
        updates = jax.tree.map(
            lambda u: jnp.where(apply, u, jnp.zeros_like(u)), updates
        )
        new_inner = jax.tree.map(
            lambda n, o: jnp.where(apply, n, o), new_inner, state.inner_state
        )
        return updates, FastFiniteState(
            notfinite_count=jnp.where(finite, 0, state.notfinite_count + 1),
            total_notfinite=state.total_notfinite + (1 - finite.astype(jnp.int32)),
            inner_state=new_inner,
        )

    return optax.GradientTransformation(init, update)
