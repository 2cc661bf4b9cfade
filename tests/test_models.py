"""Numerical parity of flax backbones vs PyTorch goldens (weights converted
via models/torch_import.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from weaklysuperviseddl_tpu.models.classifier import CamClassifier
from weaklysuperviseddl_tpu.models.torch_import import cam_classifier_variables

from torch_ref import TResNetCAM, randomize_bn_stats


def make_pair(depth, width, dilate=True, num_classes=37, seed=0):
    torch.manual_seed(seed)
    tmodel = TResNetCAM(depth=depth, width=width, num_classes=num_classes,
                        replace_stride_with_dilation=(False, False, dilate))
    randomize_bn_stats(tmodel, seed)
    tmodel.eval()
    variables = cam_classifier_variables(tmodel.state_dict())
    fmodel = CamClassifier(num_classes=num_classes, depth=depth,
                           width_multiplier=width, dilate_layer4=dilate)
    variables = jax.tree.map(jnp.asarray, variables)
    return tmodel, fmodel, variables


@pytest.mark.parametrize("depth,width", [(18, 0.25), (50, 0.25)])
def test_classifier_parity(depth, width):
    tmodel, fmodel, variables = make_pair(depth, width)
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3), dtype=np.float32)

    with torch.no_grad():
        tlogits, tfeats = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))

    flogits, ffeats = fmodel.apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(flogits), tlogits.numpy(), rtol=1e-3, atol=1e-4,
    )
    for ff, tf in zip(ffeats, tfeats):
        np.testing.assert_allclose(
            np.asarray(ff), tf.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-3,
        )


def test_dilated_layer4_shape():
    # 224-input → layer4 stays 14×14 when dilated (ref ClassificationModel.py:12)
    _, fmodel, variables = make_pair(18, 0.25)
    x = jnp.zeros((1, 224, 224, 3))
    _, feats = fmodel.apply(variables, x)
    assert feats[1].shape[1:3] == (14, 14)  # layer3: os 16
    assert feats[2].shape[1:3] == (14, 14)  # layer4: dilated, os stays 16

    _, fmodel2, variables2 = make_pair(18, 0.25, dilate=False)
    _, feats2 = fmodel2.apply(variables2, x)
    assert feats2[2].shape[1:3] == (7, 7)  # undilated: os 32


def test_perturbation_is_gradient_port():
    """Zero perturbations don't change outputs; grads flow to them."""
    _, fmodel, variables = make_pair(18, 0.25)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 3), dtype=np.float32))

    logits0, feats = fmodel.apply(variables, x)
    zeros = {"layer3": jnp.zeros_like(feats[1]), "layer4": jnp.zeros_like(feats[2])}
    logits1, _ = fmodel.apply(variables, x, perturbations=zeros)
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits1), rtol=1e-6)

    def score(perts):
        lg, _ = fmodel.apply(variables, x, perturbations=perts)
        return lg[0, 3]

    grads = jax.grad(score)(zeros)
    assert float(jnp.abs(grads["layer3"]).max()) > 0
    assert float(jnp.abs(grads["layer4"]).max()) > 0


def test_deeplab_torchvision_layout_parity():
    """A torchvision-``deeplabv3_resnet50``-layout state dict (the real
    pretrained checkpoint format, ref SegmentationModel.py:86-88) ingests via
    torch_import.deeplab_variables and matches the torch golden forward."""
    from torch_ref import TDeepLabV3
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.models.torch_import import deeplab_variables

    torch.manual_seed(3)
    tmodel = TDeepLabV3(num_classes=2, width=0.25)
    randomize_bn_stats(tmodel, 3)
    tmodel.eval()
    # fake an aux head entry to exercise the drop path
    sd = dict(tmodel.state_dict())
    sd["aux_classifier.0.weight"] = torch.zeros(1)

    variables = jax.tree.map(jnp.asarray, deeplab_variables(sd))
    fmodel = DeepLabV3(num_classes=2, width_multiplier=0.25)

    x = np.random.default_rng(4).standard_normal((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        tlogits = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    flogits = fmodel.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(flogits), tlogits.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=2e-3,
    )


def test_atrous_tap_conv_matches_dilated_conv():
    """_AtrousTapConv ≡ zero-padded dilated nn.Conv for rates below, near,
    and beyond the feature-map size."""
    import flax.linen as nn_
    from weaklysuperviseddl_tpu.models.deeplabv3 import _AtrousTapConv

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8), dtype=np.float32))
    for rate in (2, 6, 15, 16, 40):
        tap = _AtrousTapConv(features=12, rate=rate)
        variables = tap.init(jax.random.PRNGKey(rate), x)
        ref_conv = nn_.Conv(
            12, (3, 3), padding=((rate, rate), (rate, rate)),
            kernel_dilation=(rate, rate), use_bias=False)
        ref = ref_conv.apply({"params": {"kernel": variables["params"]["kernel"]}}, x)
        got = tap.apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=f"rate={rate}")

        # gradients agree too (incl. zero grads for dead taps)
        g_got = jax.grad(lambda v: jnp.sum(jnp.square(tap.apply(v, x))))(variables)
        g_ref = jax.grad(lambda k: jnp.sum(jnp.square(
            ref_conv.apply({"params": {"kernel": k}}, x))))(variables["params"]["kernel"])
        np.testing.assert_allclose(
            np.asarray(g_got["params"]["kernel"]), np.asarray(g_ref),
            rtol=1e-4, atol=1e-4, err_msg=f"rate={rate} grad")


def test_atrous_tap_conv_bf16_single_rounding():
    """Under bf16 the tap decomposition accumulates partial sums in fp32 and
    rounds once, staying within bf16 epsilon of the fp32 reference (a bf16
    accumulator would compound ~9 rounding steps)."""
    from weaklysuperviseddl_tpu.models.deeplabv3 import _AtrousTapConv

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32), dtype=np.float32))
    tap32 = _AtrousTapConv(features=16, rate=16)
    variables = tap32.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(tap32.apply(variables, x))
    got = np.asarray(
        _AtrousTapConv(features=16, rate=16, dtype=jnp.bfloat16).apply(variables, x)
    ).astype(np.float32)
    # compare against the typical output magnitude: pointwise relative error
    # is meaningless where random sums cancel to ~0
    rel = np.abs(got - ref).max() / np.abs(ref).mean()
    assert rel < 5e-2, rel  # bf16 input rounding + one output rounding


def test_stem_plans_match_direct_conv():
    """All _Stem7x7 execution plans (s2d block fold, pack8 single-matmul
    phase packing) compute the identical 7x7/2 conv from the SAME standard
    [7,7,C,F] parameter — outputs and weight gradients agree with the plain
    strided conv, including non-square inputs."""
    from weaklysuperviseddl_tpu.models.resnet import _Stem7x7

    rng = np.random.default_rng(11)
    for H, W in ((16, 16), (24, 32)):
        x = jnp.asarray(rng.standard_normal((2, H, W, 3), dtype=np.float32))
        ref = _Stem7x7(8, plan="direct")
        variables = ref.init(jax.random.PRNGKey(0), x)
        y_ref = ref.apply(variables, x)
        for plan in ("s2d", "pack8"):
            y = _Stem7x7(8, plan=plan).apply(variables, x)
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5,
                err_msg=f"{plan} {H}x{W}")

        def wgrad(plan):
            return jax.grad(lambda v: jnp.sum(jnp.sin(
                _Stem7x7(8, plan=plan).apply(v, x))))(variables)["params"]["kernel"]

        g_ref = wgrad("direct")
        for plan in ("s2d", "pack8"):
            np.testing.assert_allclose(
                np.asarray(wgrad(plan)), np.asarray(g_ref),
                rtol=1e-4, atol=1e-4, err_msg=f"{plan} grad {H}x{W}")
