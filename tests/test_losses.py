"""Loss parity: XLA window losses vs torch shifted-slice goldens; fixed-shape
Lovász vs a filtering numpy golden; KL vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from weaklysuperviseddl_tpu.losses import (
    boundary_loss,
    cross_entropy_loss,
    kl_div_batchmean,
    local_normalized_cut_loss,
    lovasz_hinge,
    lovasz_softmax,
    stable_bce,
    window_affinities,
)


# ---- torch goldens (reference semantics, written fresh) ---------------------

def torch_ncut(preds_nchw, images_nchw, sigma_color=0.05, window=5):
    B, C, H, W = preds_nchw.shape
    pad = window // 2
    probs = F.softmax(preds_nchw, dim=1)
    probs_p = F.pad(probs, (pad,) * 4, mode="reflect")
    img_p = F.pad(images_nchw, (pad,) * 4, mode="reflect")
    loss, count = 0.0, 0
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            if dy == 0 and dx == 0:
                continue
            sp = probs_p[:, :, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            si = img_p[:, :, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            aff = torch.exp(-(images_nchw - si).pow(2).sum(1, keepdim=True) / (2 * sigma_color**2))
            for c in range(C):
                loss = loss + (aff * (probs[:, c : c + 1] - sp[:, c : c + 1]) ** 2).mean()
            count += 1
    return loss / (count * C)


def torch_boundary(probs_nchw, images_nchw, sigma_color=0.1, sigma_space=5.0, window=5):
    B, C, H, W = probs_nchw.shape
    pad = window // 2
    probs_p = F.pad(probs_nchw, (pad,) * 4, mode="reflect")
    img_p = F.pad(images_nchw, (pad,) * 4, mode="reflect")
    loss, count = 0.0, 0
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            if dy == 0 and dx == 0:
                continue
            sp = probs_p[:, :, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            si = img_p[:, :, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            cd = (images_nchw - si).pow(2).sum(1)
            w = torch.exp(-cd / (2 * sigma_color**2) - (dx * dx + dy * dy) / (2 * sigma_space**2))
            diff = (probs_nchw - sp).pow(2).sum(1)
            loss = loss + (w * diff).mean()
            count += 1
    return loss / count


def numpy_lovasz_grad(gt_sorted):
    gts = gt_sorted.sum()
    inter = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jac = 1.0 - inter / union
    if len(gt_sorted) > 1:
        jac[1:] = jac[1:] - jac[:-1]
    return jac


def numpy_lovasz_softmax_flat(probas, labels, classes="present"):
    """Golden with ACTUAL filtering/skipping (the dynamic-shape original)."""
    C = probas.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if classes == "present" and fg.sum() == 0:
            continue
        errors = np.abs(fg - probas[:, c])
        order = np.argsort(-errors, kind="stable")
        losses.append(np.dot(errors[order], numpy_lovasz_grad(fg[order])))
    return float(np.mean(losses)) if losses else 0.0


# ---- tests -------------------------------------------------------------------

@pytest.fixture
def wdata():
    rng = np.random.default_rng(0)
    preds = rng.standard_normal((2, 12, 12, 2)).astype(np.float32)
    images = rng.uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    return preds, images


def test_ncut_matches_torch(wdata):
    preds, images = wdata
    got = float(local_normalized_cut_loss(jnp.asarray(preds), jnp.asarray(images),
                                          sigma_color=0.05, window_size=5))
    ref = float(torch_ncut(torch.from_numpy(preds).permute(0, 3, 1, 2),
                           torch.from_numpy(images).permute(0, 3, 1, 2)))
    assert abs(got - ref) < 1e-5


def test_boundary_matches_torch(wdata):
    preds, images = wdata
    probs = jax.nn.softmax(jnp.asarray(preds), axis=-1)
    got = float(boundary_loss(probs, jnp.asarray(images),
                              sigma_color=0.1, sigma_space=5.0, window_size=5))
    ref = float(torch_boundary(
        F.softmax(torch.from_numpy(preds).permute(0, 3, 1, 2), dim=1),
        torch.from_numpy(images).permute(0, 3, 1, 2)))
    assert abs(got - ref) < 1e-5


def test_window_affinities_shape_and_center(wdata):
    _, images = wdata
    aff = window_affinities(jnp.asarray(images), window_size=5)
    assert aff.shape == (2, 24, 12, 12)
    assert float(aff.max()) <= 1.0 + 1e-6


def test_ncut_grad_flows(wdata):
    preds, images = wdata
    g = jax.grad(lambda p: local_normalized_cut_loss(p, jnp.asarray(images)))(jnp.asarray(preds))
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("classes", ["present", "all"])
def test_lovasz_softmax_matches_filtering_golden(classes):
    rng = np.random.default_rng(1)
    probas = rng.uniform(0, 1, (300, 3))
    probas = (probas / probas.sum(1, keepdims=True)).astype(np.float32)
    labels = rng.integers(0, 2, 300).astype(np.int32)  # class 2 absent
    got = float(lovasz_softmax(
        jnp.asarray(probas).reshape(1, 30, 10, 3), jnp.asarray(labels).reshape(1, 30, 10),
        classes=classes))
    ref = numpy_lovasz_softmax_flat(probas.astype(np.float64), labels, classes)
    assert abs(got - ref) < 1e-5


def test_lovasz_softmax_ignore_equals_filtered():
    rng = np.random.default_rng(2)
    probas = rng.uniform(0, 1, (200, 2))
    probas = (probas / probas.sum(1, keepdims=True)).astype(np.float32)
    labels = rng.integers(0, 2, 200).astype(np.int32)
    labels[::7] = 255  # void pixels
    got = float(lovasz_softmax(
        jnp.asarray(probas).reshape(1, 20, 10, 2), jnp.asarray(labels).reshape(1, 20, 10),
        classes="present", ignore=255))
    keep = labels != 255
    ref = numpy_lovasz_softmax_flat(probas[keep].astype(np.float64), labels[keep], "present")
    assert abs(got - ref) < 1e-5


def test_lovasz_hinge_matches_golden():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 2, (2, 8, 8)).astype(np.float32)
    got = float(lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels), per_image=True))

    refs = []
    for i in range(2):
        lg, lb = logits[i].ravel().astype(np.float64), labels[i].ravel().astype(np.float64)
        signs = 2 * lb - 1
        errors = 1 - lg * signs
        order = np.argsort(-errors, kind="stable")
        refs.append(np.dot(np.maximum(errors[order], 0), numpy_lovasz_grad(lb[order])))
    assert abs(got - float(np.mean(refs))) < 1e-5


def test_stable_bce_matches_torch():
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((50,)).astype(np.float32)
    targets = rng.integers(0, 2, 50).astype(np.float32)
    got = float(stable_bce(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    assert abs(got - ref) < 1e-6


def test_kl_div_matches_torch():
    rng = np.random.default_rng(5)
    q = rng.uniform(0.05, 1, (3, 2, 6, 6)).astype(np.float32)
    q = q / q.sum(1, keepdims=True)
    p = rng.uniform(0.05, 1, (3, 2, 6, 6)).astype(np.float32)
    p = p / p.sum(1, keepdims=True)
    got = float(kl_div_batchmean(jnp.log(jnp.asarray(q)), jnp.asarray(p)))
    ref = float(F.kl_div(torch.from_numpy(q).log(), torch.from_numpy(p), reduction="batchmean"))
    assert abs(got - ref) < 1e-5


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(6)
    logits = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (2, 5, 5))
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(labels).long()))
    assert abs(got - ref) < 1e-6


def test_lovasz_softmax_per_image_matches_golden():
    rng = np.random.default_rng(7)
    B, H, W, C = 3, 6, 8, 2
    probas = rng.uniform(0, 1, (B, H, W, C))
    probas = (probas / probas.sum(-1, keepdims=True)).astype(np.float32)
    labels = rng.integers(0, 2, (B, H, W)).astype(np.int32)
    got = float(lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels),
                               classes="present", per_image=True))
    refs = [numpy_lovasz_softmax_flat(
        probas[i].reshape(-1, C).astype(np.float64), labels[i].reshape(-1), "present")
        for i in range(B)]
    assert abs(got - float(np.mean(refs))) < 1e-5


def test_lovasz_hinge_ignore_matches_filtered():
    rng = np.random.default_rng(8)
    logits = rng.standard_normal((1, 10, 10)).astype(np.float32)
    labels = rng.integers(0, 2, (1, 10, 10)).astype(np.float32)
    labels[0, ::3] = 255.0  # void
    got = float(lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels),
                             per_image=False, ignore=255))
    keep = labels.ravel() != 255
    lg, lb = logits.ravel()[keep].astype(np.float64), labels.ravel()[keep].astype(np.float64)
    signs = 2 * lb - 1
    errors = 1 - lg * signs
    order = np.argsort(-errors, kind="stable")
    ref = float(np.dot(np.maximum(errors[order], 0), numpy_lovasz_grad(lb[order])))
    assert abs(got - ref) < 1e-5
