"""apply_if_finite_fast semantics: identical protection to
optax.apply_if_finite (skip the step, freeze inner state, count) at the cost
of one fused sum instead of a per-leaf isfinite pass (train/guard.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from weaklysuperviseddl_tpu.train.guard import apply_if_finite_fast


def make():
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    tx = apply_if_finite_fast(optax.adam(0.1))
    return params, tx, tx.init(params)


def test_finite_step_updates():
    params, tx, state = make()
    grads = {"w": jnp.full((4,), 0.5), "b": jnp.full((2,), -0.25)}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))
    assert int(state.notfinite_count) == 0
    assert int(state.total_notfinite) == 0


def test_nan_and_inf_steps_are_skipped_and_state_frozen():
    params, tx, state = make()
    good = {"w": jnp.full((4,), 0.5), "b": jnp.full((2,), -0.25)}
    _, state = tx.update(good, state, params)
    inner_before = jax.tree.map(np.asarray, state.inner_state)

    for bad_val in (jnp.nan, jnp.inf, -jnp.inf):
        bad = {"w": jnp.array([0.1, bad_val, 0.2, 0.3]), "b": jnp.zeros((2,))}
        updates, state = tx.update(bad, state, params)
        assert all(np.all(np.asarray(u) == 0) for u in jax.tree.leaves(updates))

    # opposing infs in different leaves must also be caught (sum -> NaN)
    bad2 = {"w": jnp.full((4,), jnp.inf), "b": jnp.full((2,), -jnp.inf)}
    updates, state = tx.update(bad2, state, params)
    assert all(np.all(np.asarray(u) == 0) for u in jax.tree.leaves(updates))

    inner_after = jax.tree.map(np.asarray, state.inner_state)
    for a, b in zip(jax.tree.leaves(inner_before), jax.tree.leaves(inner_after)):
        np.testing.assert_array_equal(a, b)
    assert int(state.notfinite_count) == 4
    assert int(state.total_notfinite) == 4

    # recovery: a finite step resets the consecutive counter
    _, state = tx.update(good, state, params)
    assert int(state.notfinite_count) == 0
    assert int(state.total_notfinite) == 4


def test_escape_hatch_passes_through_after_limit():
    """optax semantics kept: after max_consecutive_errors consecutive
    non-finite steps the update passes through unprotected, so a permanently
    diverged run surfaces as NaN params instead of silently freezing."""
    params = {"w": jnp.ones((4,))}
    tx = apply_if_finite_fast(optax.adam(0.1), max_consecutive_errors=3)
    state = tx.init(params)
    bad = {"w": jnp.full((4,), jnp.nan)}
    for i in range(3):
        updates, state = tx.update(bad, state, params)
        assert np.all(np.asarray(updates["w"]) == 0), i  # still protected
    updates, state = tx.update(bad, state, params)       # 4th: gives up
    assert np.isnan(np.asarray(updates["w"])).any()
