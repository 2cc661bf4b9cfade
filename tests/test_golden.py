"""Golden-output regression tests (SURVEY.md §4d): pseudo-masks and saliency
maps on fixed seeds must stay stable across refactors, and the CAM pipeline
must actually localize the synthetic pets (quality canary)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weaklysuperviseddl_tpu.cam.layercam import layercam
from weaklysuperviseddl_tpu.data import download_data
from weaklysuperviseddl_tpu.data.loader import batches
from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
from weaklysuperviseddl_tpu.masks.pseudo import cam_to_mask
from weaklysuperviseddl_tpu.models.classifier import CamClassifier
from weaklysuperviseddl_tpu.train.classifier import train_fc_only
from weaklysuperviseddl_tpu.utils.metrics import compute_iou_and_acc

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _pseudo_masks_fixed_seed():
    ds = download_data(None, split="trainval", synthetic_size=4, image_size=48, num_classes=4)
    model = CamClassifier(num_classes=4, depth=18, width_multiplier=0.25)
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 48, 48, 3)))
    b = next(iter(batches(ds, 4)))
    x, _ = preprocess_batch(jnp.asarray(b.image), None, size=48)
    cam, _ = layercam(model, variables, x, jnp.asarray(b.label),
                      target_layers=("layer3", "layer4"), output_size=48)
    return np.asarray(cam_to_mask(cam, 0.3, True))


def test_pseudo_mask_golden():
    masks = _pseudo_masks_fixed_seed()
    path = os.path.join(GOLDEN_DIR, "pseudo_masks_seed7.npz")
    if not os.path.exists(path):  # first run: record the golden
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, masks=masks)
        pytest.skip("golden recorded")
    golden = np.load(path)["masks"]
    # tolerate tiny numeric drift at the threshold boundary: ≥99.5% pixels equal
    agree = (masks == golden).mean()
    assert agree > 0.995, f"pseudo-mask drift: {agree:.4f} agreement"


def test_saliency_golden():
    from weaklysuperviseddl_tpu.pipelines.basnet_infer import build_basnet, saliency_step

    ds = download_data(None, split="test", synthetic_size=2, image_size=64)
    model, variables = build_basnet(weights_path=None, rng=jax.random.PRNGKey(3))
    b = next(iter(batches(ds, 2)))
    sal = np.asarray(saliency_step(model, variables, jnp.asarray(b.image)))
    path = os.path.join(GOLDEN_DIR, "saliency_seed3.npz")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, sal=sal.astype(np.float16))
        pytest.skip("golden recorded")
    golden = np.load(path)["sal"].astype(np.float32)
    np.testing.assert_allclose(sal, golden, atol=2e-3)


def test_cam_localizes_after_training():
    """Quality canary: after fc training on color-keyed classes, thresholded
    LayerCAM masks must overlap the true pet region far better than chance."""
    ds = download_data(None, split="trainval", synthetic_size=32, image_size=48, num_classes=4)
    model = CamClassifier(num_classes=4, depth=18, width_multiplier=0.25)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    variables = train_fc_only(
        model, variables,
        train_loader_fn=lambda: batches(ds, 8, shuffle=True, seed=0, pad_to_full=True),
        epochs=6, lr=5e-2, num_classes=4, image_size=48, log=lambda s: None,
    )
    b = next(iter(batches(ds, 8)))
    x, _ = preprocess_batch(jnp.asarray(b.image), None, size=48)
    cam, _ = layercam(model, variables, x, jnp.asarray(b.label), output_size=48)
    masks = cam_to_mask(cam, 0.3, True)

    ious = []
    for i in range(8):
        true_fg = (jnp.asarray(b.trimap[i]) == 1).astype(jnp.int32)
        iou, _ = compute_iou_and_acc(masks[i], true_fg)
        ious.append(float(iou))
    mean_iou = sum(ious) / len(ious)
    # chance level for ~15%-area blobs is ≈0.08; demand clear localization
    assert mean_iou > 0.2, f"CAM failed to localize: mean IoU {mean_iou:.3f} ({ious})"
