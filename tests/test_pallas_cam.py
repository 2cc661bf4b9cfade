"""Fused Pallas CAM-fusion kernel vs the XLA reference math."""

import numpy as np
import jax
import jax.numpy as jnp

from weaklysuperviseddl_tpu.ops.pallas_cam import fused_cam_fusion


def reference_fusion(act, grad):
    cam = jnp.sum(jax.nn.relu(grad * act), axis=-1)
    cam = jax.nn.relu(cam)
    lo = jnp.min(cam, axis=(-2, -1), keepdims=True)
    cam = cam - lo
    hi = jnp.max(cam, axis=(-2, -1), keepdims=True)
    return cam / (hi + 1e-8)


def test_fused_cam_matches_xla():
    rng = np.random.default_rng(0)
    act = rng.standard_normal((3, 14, 14, 160)).astype(np.float32)
    grad = rng.standard_normal((3, 14, 14, 160)).astype(np.float32)
    got = np.asarray(fused_cam_fusion(jnp.asarray(act), jnp.asarray(grad), interpret=True))
    ref = np.asarray(reference_fusion(jnp.asarray(act), jnp.asarray(grad)))
    # note: reference divides by (max-0+1e-8) after subtracting min; kernel
    # computes (x-lo)/(hi-lo+1e-8) — identical since lo is subtracted first
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_fused_cam_odd_shapes():
    rng = np.random.default_rng(1)
    act = rng.standard_normal((2, 7, 9, 130)).astype(np.float32)  # nothing aligned
    grad = rng.standard_normal((2, 7, 9, 130)).astype(np.float32)
    got = np.asarray(fused_cam_fusion(jnp.asarray(act), jnp.asarray(grad), interpret=True))
    ref = np.asarray(reference_fusion(jnp.asarray(act), jnp.asarray(grad)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_layercam_fusion_flag_consistency():
    from test_models import make_pair
    from weaklysuperviseddl_tpu.cam.layercam import layercam

    _, fmodel, variables = make_pair(18, 0.25)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 64, 3), dtype=np.float32))
    cam_xla, _ = layercam(fmodel, variables, x, jnp.asarray([3]), output_size=64, fusion="xla")
    # interpret-mode pallas path isn't reachable through the jitted layercam
    # on CPU; equivalence of the kernel itself is covered above. This checks
    # the flag plumbing doesn't alter the XLA result.
    cam_auto, _ = layercam(fmodel, variables, x, jnp.asarray([3]), output_size=64, fusion="auto")
    np.testing.assert_allclose(np.asarray(cam_xla), np.asarray(cam_auto), atol=1e-6)
