"""VMEM-resident Pallas CC kernel vs the XLA label-propagation reference."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from weaklysuperviseddl_tpu.masks.components import keep_largest_batch, label_components
from weaklysuperviseddl_tpu.ops.pallas_cc import (
    pallas_keep_largest_batch,
    pallas_label_components_batch,
)


def blobs(seed, shape=(32, 48)):
    rng = np.random.default_rng(seed)
    f = ndimage.gaussian_filter(rng.standard_normal(shape), 2.5)
    return (f > np.quantile(f, 0.6)).astype(np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_labels_match_xla(seed):
    masks = np.stack([blobs(seed), blobs(seed + 10)])
    got = np.asarray(pallas_label_components_batch(jnp.asarray(masks), interpret=True))
    for i in range(2):
        ref = np.asarray(label_components(jnp.asarray(masks[i])))
        np.testing.assert_array_equal(got[i], ref)


def test_pallas_keep_largest_matches():
    masks = np.stack([blobs(5), blobs(6)])
    got = np.asarray(pallas_keep_largest_batch(jnp.asarray(masks), interpret=True))
    ref = np.asarray(keep_largest_batch(jnp.asarray(masks)))
    np.testing.assert_array_equal(got, ref)


def test_keep_largest_backend_dispatch():
    masks = np.stack([blobs(7), blobs(8)])
    ref = np.asarray(keep_largest_batch(jnp.asarray(masks), backend="xla"))
    auto = np.asarray(keep_largest_batch(jnp.asarray(masks)))  # cpu → xla path
    np.testing.assert_array_equal(auto, ref)
    with pytest.raises(ValueError):
        keep_largest_batch(jnp.asarray(masks), backend="cuda")


def test_pallas_cc_snake_and_diagonal():
    mask = np.zeros((16, 16), np.uint8)
    for r in range(0, 16, 2):
        mask[r, :] = 1
        if (r // 2) % 2 == 0 and r + 1 < 16:
            mask[r + 1, -1] = 1
        elif r + 1 < 16:
            mask[r + 1, 0] = 1
    labels = np.asarray(pallas_label_components_batch(jnp.asarray(mask)[None], interpret=True))[0]
    assert len(np.unique(labels[labels >= 0])) == 1
    diag = np.zeros((8, 8), np.uint8)
    diag[2, 2] = diag[3, 3] = 1
    labels = np.asarray(pallas_label_components_batch(jnp.asarray(diag)[None], interpret=True))[0]
    assert len(np.unique(labels[labels >= 0])) == 1  # 8-connectivity
