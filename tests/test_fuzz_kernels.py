"""Shape/parameter sweeps for the Pallas kernels and device lattice beyond
the reference's fixed geometry (C=2, window 5, square 2^k images): odd sizes,
3 classes, windows 3/7, low-dimensional features. All interpret-mode vs the
XLA/native goldens — latent tiling or offset bugs live exactly here."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weaklysuperviseddl_tpu.losses.window import (
    boundary_loss,
    local_normalized_cut_loss,
)
from weaklysuperviseddl_tpu.ops.pallas_window import (
    pallas_boundary_loss,
    pallas_local_normalized_cut_loss,
)


@pytest.mark.parametrize("H,W,C,ws", [
    (11, 13, 2, 3),
    (16, 24, 3, 5),
    (9, 32, 2, 7),
])
def test_window_kernels_shape_sweep(H, W, C, ws):
    rng = np.random.default_rng(H * W + C + ws)
    preds = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32))
    images = jnp.asarray(rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32))
    probs = jax.nn.softmax(preds, axis=-1)

    ref = float(local_normalized_cut_loss(preds, images, sigma_color=0.07, window_size=ws))
    got = float(pallas_local_normalized_cut_loss(
        preds, images, sigma_color=0.07, window_size=ws, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    refb = float(boundary_loss(probs, images, sigma_color=0.1, sigma_space=4.0,
                               window_size=ws))
    gotb = float(pallas_boundary_loss(probs, images, sigma_color=0.1,
                                      sigma_space=4.0, window_size=ws,
                                      interpret=True))
    np.testing.assert_allclose(gotb, refb, rtol=1e-5)

    g_ref = jax.grad(lambda p: local_normalized_cut_loss(
        p, images, sigma_color=0.07, window_size=ws))(preds)
    g_got = jax.grad(lambda p: pallas_local_normalized_cut_loss(
        p, images, sigma_color=0.07, window_size=ws, interpret=True))(preds)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("H,W,C,ws,loss", [
    (12, 20, 2, 3, "ncut"),
    (10, 14, 3, 5, "ncut"),
    (15, 17, 2, 7, "boundary"),
])
def test_refine_mega_kernel_shape_sweep(H, W, C, ws, loss):
    from weaklysuperviseddl_tpu.ops.pallas_refine import pallas_refine
    from weaklysuperviseddl_tpu.train.refine import refine_from_soft_predictions

    rng = np.random.default_rng(H + W + C + ws)
    S = rng.uniform(0.1, 1, (2, H, W, C)).astype(np.float32)
    S = jnp.asarray(S / S.sum(-1, keepdims=True))
    images = jnp.asarray(rng.uniform(-1, 1, (2, H, W, 3)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, C, (2, H, W)).astype(np.int32))
    ref_m, ref_l = refine_from_soft_predictions(
        S, images, masks, num_steps=4, window_size=ws, loss=loss,
        use_pallas=False)
    got_m, got_l = pallas_refine(
        S, images, masks, num_steps=4, window_size=ws, loss=loss,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)


@pytest.mark.parametrize("d", [2, 3, 5])
def test_permutohedral_dims_vs_cpp(d):
    """Device lattice ≡ C++ lattice for spatial-only (d=2) through bilateral
    (d=5) feature spaces."""
    from weaklysuperviseddl_tpu import native
    from weaklysuperviseddl_tpu.masks.permutohedral import (
        permutohedral_precompute, permutohedral_filter)

    rng = np.random.default_rng(d)
    N = 300
    feats = rng.uniform(0, 12, (N, d)).astype(np.float32)
    vals = rng.uniform(size=(N, 2)).astype(np.float32)
    cpp = native.permutohedral_filter(feats, vals)
    pre = permutohedral_precompute(jnp.asarray(feats))
    mine = np.asarray(permutohedral_filter(jnp.asarray(vals), pre))
    alpha = 1.0 / (1.0 + 2.0 ** -d)  # wsdl_native.cpp:227
    rel = (np.abs(mine * alpha - cpp) / np.abs(cpp).clip(1e-9)).mean()
    assert rel < 1e-3, (d, rel)


@pytest.mark.parametrize("B,N,C", [(1, 700, 2), (2, 130, 1), (1, 513, 3)])
def test_bilateral_attention_shapes(B, N, C):
    from weaklysuperviseddl_tpu.ops.pallas_bilateral import (
        gaussian_filter_pallas, gaussian_filter_xla)

    rng = np.random.default_rng(N + C)
    feats = jnp.asarray(rng.uniform(0, 25, (N, 5)).astype(np.float32))
    vals = jnp.asarray(rng.uniform(size=(N, C)).astype(np.float32))
    ref = np.asarray(gaussian_filter_xla(feats, vals))
    got = np.asarray(gaussian_filter_pallas(feats, vals, interpret=True))
    rel = np.abs(got - ref) / np.abs(ref).clip(1e-9)
    assert rel.mean() < 5e-3, rel.mean()
