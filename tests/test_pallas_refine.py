"""The VMEM-resident whole-refinement kernel (ops/pallas_refine.py) vs the
scan/vmap XLA path — identical masks and matching losses, both loss variants,
plus ragged shapes that exercise the tile-alignment padding. Interpreter mode
on CPU; torch-semantics parity is inherited from tests/test_refine.py (the
XLA path is the golden-verified one)."""

import numpy as np
import jax.numpy as jnp
import pytest

from weaklysuperviseddl_tpu.ops.pallas_refine import pallas_refine
from weaklysuperviseddl_tpu.train.refine import refine_from_soft_predictions


def _case(seed=0, B=2, H=16, W=16):
    rng = np.random.default_rng(seed)
    S = rng.uniform(0.1, 1, (B, H, W, 2)).astype(np.float32)
    S = jnp.asarray(S / S.sum(-1, keepdims=True))
    images = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, 2, (B, H, W)).astype(np.int32))
    return S, images, masks


@pytest.mark.parametrize("plan", ["v1", "v1sym", "v2", "v2_aff"])
@pytest.mark.parametrize("loss", ["ncut", "boundary"])
def test_mega_kernel_matches_xla_path(loss, plan):
    S, images, masks = _case(0)
    ref_m, ref_l = refine_from_soft_predictions(
        S, images, masks, num_steps=6, loss=loss, use_pallas=False)
    got_m, got_l = pallas_refine(
        S, images, masks, num_steps=6, loss=loss, interpret=True, plan=plan)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)


@pytest.mark.parametrize("plan", ["v1", "v1sym", "v2", "v2_aff"])
def test_mega_kernel_ragged_shape(plan):
    """Non-tile-aligned H/W exercise the alignment margins (v2 additionally
    exercises the zero-ringed ad plane's alignment rounding)."""
    S, images, masks = _case(1, B=1, H=20, W=24)
    ref_m, ref_l = refine_from_soft_predictions(
        S, images, masks, num_steps=4, use_pallas=False)
    got_m, got_l = pallas_refine(
        S, images, masks, num_steps=4, interpret=True, plan=plan)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)


def test_mega_kernel_moves_toward_predictions():
    """With λ=0 the KL term pulls X toward S's argmax (the same functional
    check as test_refine.test_refinement_moves_toward_predictions)."""
    rng = np.random.default_rng(1)
    H = W = 12
    target = (rng.uniform(0, 1, (1, H, W)) > 0.5).astype(np.int32)
    S = np.stack([1 - target, target], axis=-1).astype(np.float32) * 0.98 + 0.01
    images = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    wrong = 1 - target  # start from the inverted mask

    refined, _ = pallas_refine(
        jnp.asarray(S), jnp.asarray(images), jnp.asarray(wrong),
        lambda_boundary=0.0, threshold=0.5, lr=0.5, num_steps=60,
        interpret=True)
    agree = (np.asarray(refined) == target).mean()
    assert agree > 0.95, f"refinement failed to follow S: {agree}"


def test_vmem_budget_gates_kernel():
    """The mega-kernel holds the whole per-image working set in VMEM; the
    budget estimate must pass reference-scale images and reject ones that
    cannot fit (train/refine falls back to the scan/vmap path there)."""
    from weaklysuperviseddl_tpu.ops.pallas_refine import refine_vmem_bytes
    assert refine_vmem_bytes((8, 256, 256, 2), 5) < 13 * 1024 * 1024
    assert refine_vmem_bytes((8, 512, 512, 2), 5) > 13 * 1024 * 1024
