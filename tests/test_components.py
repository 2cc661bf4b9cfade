"""Connected-component labeling vs scipy golden (8-connectivity, the skimage
default the reference relies on)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from weaklysuperviseddl_tpu.masks.components import (
    keep_largest,
    keep_largest_batch,
    label_components,
)

EIGHT = np.ones((3, 3), np.int32)


def scipy_keep_largest(mask):
    labeled, n = ndimage.label(mask, structure=EIGHT)
    if n == 0:
        return mask.astype(np.uint8)
    counts = np.bincount(labeled.ravel())
    counts[0] = 0
    return (labeled == counts.argmax()).astype(np.uint8)


def random_blobs(rng, shape=(48, 48), thresh=0.62):
    field = rng.standard_normal(shape)
    field = ndimage.gaussian_filter(field, 3.0)
    return (field > np.quantile(field, thresh)).astype(np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_labels_partition_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    mask = random_blobs(rng)
    got = np.asarray(label_components(jnp.asarray(mask)))
    ref, _ = ndimage.label(mask, structure=EIGHT)
    # same partition: component maps must be relabelings of each other
    assert (got >= 0).sum() == (ref > 0).sum()
    for lab in np.unique(got[got >= 0]):
        ref_vals = np.unique(ref[got == lab])
        assert len(ref_vals) == 1
    for lab in np.unique(ref[ref > 0]):
        got_vals = np.unique(got[ref == lab])
        assert len(got_vals) == 1


@pytest.mark.parametrize("seed", [0, 5, 7])
def test_keep_largest_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    mask = random_blobs(rng)
    got = np.asarray(keep_largest(jnp.asarray(mask)))
    ref = scipy_keep_largest(mask)
    np.testing.assert_array_equal(got, ref)


def test_keep_largest_empty_and_full():
    empty = jnp.zeros((16, 16), jnp.uint8)
    np.testing.assert_array_equal(np.asarray(keep_largest(empty)), np.zeros((16, 16)))
    full = jnp.ones((16, 16), jnp.uint8)
    np.testing.assert_array_equal(np.asarray(keep_largest(full)), np.ones((16, 16)))


def test_diagonal_connectivity():
    # two pixels touching only diagonally are ONE component under 8-connectivity
    mask = np.zeros((8, 8), np.uint8)
    mask[2, 2] = 1
    mask[3, 3] = 1
    mask[6, 6] = 1  # far blob, size 1
    got = np.asarray(keep_largest(jnp.asarray(mask)))
    assert got.sum() == 2 and got[2, 2] == 1 and got[3, 3] == 1


def test_snake_converges():
    # serpentine path: worst case for naive relaxation; sweeps must handle it
    mask = np.zeros((16, 16), np.uint8)
    for r in range(0, 16, 2):
        mask[r, :] = 1
        if (r // 2) % 2 == 0 and r + 1 < 16:
            mask[r + 1, -1] = 1
        elif r + 1 < 16:
            mask[r + 1, 0] = 1
    labels = np.asarray(label_components(jnp.asarray(mask)))
    assert len(np.unique(labels[labels >= 0])) == 1


def test_batched_keep_largest():
    rng = np.random.default_rng(11)
    masks = np.stack([random_blobs(rng) for _ in range(3)])
    got = np.asarray(keep_largest_batch(jnp.asarray(masks)))
    for i in range(3):
        np.testing.assert_array_equal(got[i], scipy_keep_largest(masks[i]))
