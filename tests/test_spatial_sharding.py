"""Spatially-sharded window loss (halo exchange over the mesh) vs the
single-device XLA reference — on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weaklysuperviseddl_tpu.losses.window import local_normalized_cut_loss
from weaklysuperviseddl_tpu.parallel import make_mesh
from weaklysuperviseddl_tpu.parallel.spatial import shard_spatial, spatial_sharded_ncut_loss


# one shard count: each parametrization recompiles the shard_map program,
# which dominates suite time on the 1-core CPU host (uneven-halo edge cases
# are covered by the window3 test below at a different shard/size ratio)
@pytest.mark.parametrize("n_shards", [4])
def test_sharded_matches_unsharded(n_shards):
    mesh = make_mesh(data=n_shards, model=1, devices=jax.devices()[:n_shards])
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 16, 2
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    images = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)

    # unsharded reference takes logits (softmaxes inside); feed log-probs so
    # the probabilities match the sharded version's input exactly
    ref = float(local_normalized_cut_loss(jnp.log(jnp.asarray(probs)), jnp.asarray(images),
                                          sigma_color=0.05, window_size=5))

    probs_s = shard_spatial(mesh, jnp.asarray(probs))
    images_s = shard_spatial(mesh, jnp.asarray(images))
    got = float(spatial_sharded_ncut_loss(probs_s, images_s, mesh,
                                          sigma_color=0.05, window_size=5))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_sharded_window3():
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 16, 16, 2
    probs = rng.uniform(0.1, 1, (B, H, W, C)).astype(np.float32)
    probs = probs / probs.sum(-1, keepdims=True)
    images = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    ref = float(local_normalized_cut_loss(jnp.log(jnp.asarray(probs)), jnp.asarray(images),
                                          sigma_color=0.1, window_size=3))
    got = float(spatial_sharded_ncut_loss(
        shard_spatial(mesh, jnp.asarray(probs)), shard_spatial(mesh, jnp.asarray(images)),
        mesh, sigma_color=0.1, window_size=3))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
