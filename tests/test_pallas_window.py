"""Fused Pallas window-loss kernels vs the XLA reference implementation —
forward values and analytic backward, in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from weaklysuperviseddl_tpu.losses.window import boundary_loss, local_normalized_cut_loss
from weaklysuperviseddl_tpu.ops.pallas_window import (
    pallas_boundary_loss,
    pallas_local_normalized_cut_loss,
)


def _data(seed=0, B=2, H=16, W=16, C=2):
    rng = np.random.default_rng(seed)
    preds = rng.standard_normal((B, H, W, C)).astype(np.float32)
    images = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    return jnp.asarray(preds), jnp.asarray(images)


def test_ncut_forward_matches_xla():
    preds, images = _data()
    ref = float(local_normalized_cut_loss(preds, images, sigma_color=0.05, window_size=5))
    got = float(pallas_local_normalized_cut_loss(preds, images, sigma_color=0.05,
                                                 window_size=5, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_boundary_forward_matches_xla():
    preds, images = _data(1)
    probs = jax.nn.softmax(preds, axis=-1)
    ref = float(boundary_loss(probs, images, sigma_color=0.1, sigma_space=5.0, window_size=5))
    got = float(pallas_boundary_loss(probs, images, sigma_color=0.1, sigma_space=5.0,
                                     window_size=5, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ncut_backward_matches_xla():
    """Analytic Pallas backward (incl. reflect-pad fold) vs XLA autodiff."""
    preds, images = _data(2, B=1, H=12, W=12)
    g_ref = jax.grad(lambda p: local_normalized_cut_loss(p, images, sigma_color=0.05,
                                                         window_size=5))(preds)
    g_got = jax.grad(lambda p: pallas_local_normalized_cut_loss(p, images, sigma_color=0.05,
                                                                window_size=5, interpret=True))(preds)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-7)


def test_boundary_backward_matches_xla():
    preds, images = _data(3, B=2, H=10, W=10)
    probs_fn = lambda p: jax.nn.softmax(p, axis=-1)
    g_ref = jax.grad(lambda p: boundary_loss(probs_fn(p), images, window_size=3))(preds)
    g_got = jax.grad(lambda p: pallas_boundary_loss(probs_fn(p), images, window_size=3,
                                                    interpret=True))(preds)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-7)


def test_window7_matches():
    preds, images = _data(4, H=14, W=14)
    ref = float(local_normalized_cut_loss(preds, images, sigma_color=0.1, window_size=7))
    got = float(pallas_local_normalized_cut_loss(preds, images, sigma_color=0.1,
                                                 window_size=7, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
