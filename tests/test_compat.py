"""Compat-layer tests: reference-named entry points with reference signatures,
driven the way the reference scripts call them (SURVEY.md §3.2 flow)."""

import numpy as np
import jax.numpy as jnp
import pytest

from weaklysuperviseddl_tpu.compat.ClassificationModel import (
    FrozenResNetCAM,
    evaluate_classification,
    train_fc_only,
)
from weaklysuperviseddl_tpu.compat.LayerCAM import (
    LayerCAMGenerator,
    evaluate_layercam_on_test_set,
)
from weaklysuperviseddl_tpu.compat import PsuedoMasks, SegmentationModel
from weaklysuperviseddl_tpu.data import download_data
from weaklysuperviseddl_tpu.data.loader import batches


@pytest.fixture(scope="module")
def classifier():
    return FrozenResNetCAM(num_classes=37, depth=18, width_multiplier=0.25)


@pytest.fixture(scope="module")
def pet_loaders():
    train = download_data(None, split="trainval", synthetic_size=8, image_size=64)
    test = download_data(None, split="test", synthetic_size=8, image_size=64)
    return train, test


def test_frozen_resnet_contract(classifier):
    # reference contract: (logits, [f2, f3, f4]); accepts NCHW like torch users
    x_nchw = np.random.default_rng(0).uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    logits, feats = classifier(x_nchw)
    assert logits.shape == (2, 37)
    assert len(feats) == 3
    # torch-style checkpoint round-trip
    sd = classifier.state_dict()
    assert any(k.startswith("layer1.0.conv1") for k in sd)
    clone = FrozenResNetCAM(num_classes=37, depth=18, width_multiplier=0.25, seed=9)
    clone.load_state_dict(sd)
    logits2, _ = clone(x_nchw)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-6)


def test_train_and_eval_signatures(classifier, pet_loaders):
    train_ds, _ = pet_loaders
    loader = lambda: batches(train_ds, 4, pad_to_full=True)
    train_fc_only(classifier, loader, device=None, epochs=1, num_classes=37, image_size=64)
    acc, f1 = evaluate_classification(classifier, loader, device=None,
                                      num_classes=37, image_size=64)
    assert 0 <= acc <= 100 and 0 <= f1 <= 1


def test_layercam_generator_surface(classifier):
    gen = LayerCAMGenerator(classifier, target_layer_names=["layer3", "layer4"],
                            output_size=64)
    img_chw = np.random.default_rng(1).uniform(0, 1, (3, 64, 64)).astype(np.float32)
    cam = gen.generate(img_chw, class_idx=jnp.asarray([5]), alpha=0.5)
    assert cam.shape == (1, 64, 64)
    assert 0.0 <= float(cam.min()) and float(cam.max()) <= 1.0 + 1e-6
    m_bg, max_cam = gen.generate_bg_cam(img_chw, [5], alpha=2.0)
    assert m_bg.shape == (64, 64) and max_cam.shape == (64, 64)


def test_layercam_eval_surface(classifier, pet_loaders):
    _, test_ds = pet_loaders
    gen = LayerCAMGenerator(classifier, ["layer3", "layer4"], output_size=64)
    logs = []
    out = evaluate_layercam_on_test_set(gen, batches(test_ds, 4), alpha=1.0,
                                        cam_thresh=0.3, max_images=5, log=logs.append)
    assert set(out) == {"layercam_fg_iou", "layercam_fg_acc"}


def test_pseudo_masks_to_segmentation_flow(classifier, pet_loaders, tmp_path):
    """The Abalations.py pipeline end-to-end through compat shims."""
    train_ds, test_ds = pet_loaders
    gen = LayerCAMGenerator(classifier, ["layer3", "layer4"], output_size=64)

    image_dir, mask_dir = PsuedoMasks.generate_pseudo_masks(
        batches(train_ds, 4, pad_to_full=True), gen,
        cam_thresh=0.3, alpha=1.0, keep_largest_masks=True,
        run_id="compat_test", root=str(tmp_path),
    )
    import os
    assert len(os.listdir(mask_dir)) == 8
    assert len(os.listdir(image_dir)) == 8

    model, final_loss = SegmentationModel.train_segmentation_model(
        loss_fn="cross_entropy", run_id="compat_test", lr=1e-3, num_epochs=1,
        batch_size=4, root=str(tmp_path),
        backbone_depth=18, width_multiplier=0.25, seg_size=64, log=lambda s: None,
    )
    assert np.isfinite(final_loss)

    iou, acc = SegmentationModel.evaluate_model(
        model, batches(test_ds, 4), log=lambda s: None)
    assert 0.0 <= iou <= 1.0 and 0.0 <= acc <= 1.0


def test_window_loss_classes_match_core():
    from weaklysuperviseddl_tpu.compat.AlternatingDirectionCutLoss import LocalNormalizedCutLoss
    from weaklysuperviseddl_tpu.compat.AlternatingDirectionBoundaryLoss import (
        ConstrainToBoundaryLossSingle,
    )
    from weaklysuperviseddl_tpu.losses.window import boundary_loss, local_normalized_cut_loss

    rng = np.random.default_rng(2)
    preds_nchw = rng.standard_normal((1, 2, 12, 12)).astype(np.float32)
    img_nchw = rng.uniform(0, 1, (1, 3, 12, 12)).astype(np.float32)

    got = float(LocalNormalizedCutLoss(0.05, 5)(preds_nchw, img_nchw))
    want = float(local_normalized_cut_loss(
        jnp.transpose(jnp.asarray(preds_nchw), (0, 2, 3, 1)),
        jnp.transpose(jnp.asarray(img_nchw), (0, 2, 3, 1)), sigma_color=0.05))
    assert abs(got - want) < 1e-6

    import jax
    probs = jax.nn.softmax(jnp.asarray(preds_nchw), axis=1)
    got_b = float(ConstrainToBoundaryLossSingle(0.1, 5, 5)(probs[0], img_nchw[0]))
    want_b = float(boundary_loss(
        jnp.transpose(probs, (0, 2, 3, 1)),
        jnp.transpose(jnp.asarray(img_nchw), (0, 2, 3, 1)),
        sigma_color=0.1, sigma_space=5.0))
    assert abs(got_b - want_b) < 1e-6


def test_refine_pseudo_mask_surface(tmp_path):
    from weaklysuperviseddl_tpu.compat.AlternatingDirectionCutLoss import refine_pseudo_mask
    from weaklysuperviseddl_tpu.compat.SegmentationModel import initialize_model

    model, _ = initialize_model(2, backbone_depth=18, width_multiplier=0.25, input_size=32)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)   # CHW like the reference
    mask255 = (rng.uniform(0, 1, (32, 32)) > 0.5).astype(np.uint8) * 255
    refined = refine_pseudo_mask(model, img, mask255, threshold=0.3, lr=1e-2, num_steps=2)
    assert refined.shape == (32, 32)
    assert set(np.unique(np.asarray(refined))).issubset({0.0, 1.0})


def test_lovasz_compat_names():
    from weaklysuperviseddl_tpu.compat import Lovasz_Softmax_Loss as L

    rng = np.random.default_rng(4)
    probas = rng.uniform(0, 1, (1, 2, 8, 8)).astype(np.float32)
    probas = probas / probas.sum(1, keepdims=True)
    labels = rng.integers(0, 2, (1, 8, 8))
    val = float(L.lovasz_softmax(probas, labels, classes="present"))
    assert 0.0 <= val <= 1.0
    assert L.mean([1.0, float("nan"), 3.0], ignore_nan=True) == 2.0
    assert L.mean([], empty=0) == 0


def test_cutloss_script_surface(tmp_path):
    """train_model / evaluate_model / infer_and_plot from the CutLoss script."""
    import optax
    from weaklysuperviseddl_tpu.compat.AlternatingDirectionCutLoss import (
        evaluate_model as cut_evaluate_model,
        infer_and_plot,
        train_model as cut_train_model,
    )
    from weaklysuperviseddl_tpu.compat.SegmentationModel import initialize_model

    model, tx = initialize_model(2, backbone_depth=18, width_multiplier=0.25,
                                 input_size=48, lr=1e-3)
    train_ds = download_data(None, split="trainval", synthetic_size=8, image_size=48)
    loss = cut_train_model(model, tx, num_epochs=1,
                           train_loader=batches(train_ds, 4, pad_to_full=True),
                           log=lambda s: None)
    assert np.isfinite(loss)

    test_ds = download_data(None, split="test", synthetic_size=4, image_size=48)
    iou, acc = cut_evaluate_model(model, batches(test_ds, 4))
    assert 0.0 <= iou <= 1.0 and 0.0 <= acc <= 1.0

    # infer_and_plot from files
    from PIL import Image
    img_path = str(tmp_path / "0.png")
    mask_path = str(tmp_path / "0m.png")
    Image.fromarray(train_ds.images[0]).save(img_path)
    Image.fromarray((train_ds.trimaps[0] == 1).astype(np.uint8) * 255).save(mask_path)
    pred = infer_and_plot(model, img_path, mask_path, save_path=str(tmp_path / "viz.png"))
    assert pred.shape == (256, 256)
    import os
    assert os.path.exists(tmp_path / "viz.png")
