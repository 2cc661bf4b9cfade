"""BASNet training — the paper's hybrid BCE+SSIM+IoU deep supervision.

The reference ships BASNet as an inference-only engine with externally
trained weights (PretrainedBasnetModel/RunInference.py:10,23 loads
``./Weights/basnet.pth``). In zero-egress environments that asset never
exists, so the engine could only ever run random-init. This module closes
that gap from the other side: it implements the training recipe the BASNet
authors used to PRODUCE ``basnet.pth`` (Qin et al., CVPR 2019 — hybrid loss
ℓ = ℓ_bce + ℓ_ssim + ℓ_iou applied to every one of the 8 side outputs,
Adam(1e-3, eps=1e-8)), so the flax port (models/basnet.py) can be trained
and functionally validated in-framework: a short overfit run drives saliency
IoU on held-in images from random (~0.3) to ~1.0, demonstrating every stage
of the architecture (encoder, bridge, U-decoder, side heads, RefUnet) learns.

TPU notes: the whole step is one jit — forward over all 8 heads, the fused
hybrid loss (the SSIM window runs as two separable depthwise convs, which XLA
fuses into the surrounding elementwise work), and Adam. Batches are padded
static shapes; train-mode BN stats update through flax ``mutable``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

_EPS = 1e-7


def bce_loss(pred, target):
    """Binary cross-entropy on probabilities (the torch recipe applies
    ``nn.BCELoss`` to the already-sigmoided side outputs); mean over all
    pixels. pred/target: [B,H,W] in [0,1]."""
    p = jnp.clip(pred, _EPS, 1.0 - _EPS)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return jnp.asarray((g / g.sum()).astype(np.float32))


def _separable_blur(x, win):
    """Gaussian filter as two 1D depthwise convs ('SAME'); x: [B,H,W]."""
    k = win.shape[0]
    xh = jax.lax.conv_general_dilated(
        x[..., None], win.reshape(k, 1, 1, 1), (1, 1),
        ((k // 2, k // 2), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xw = jax.lax.conv_general_dilated(
        xh, win.reshape(1, k, 1, 1), (1, 1),
        ((0, 0), (k // 2, k // 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return xw[..., 0]


def ssim(pred, target, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM with an 11×11 Gaussian window (the pytorch_ssim semantics
    the BASNet recipe uses: C1=0.01², C2=0.03², 'SAME' padding so borders
    count). pred/target: [B,H,W] in [0,1]."""
    win = _gaussian_window(window_size, sigma)
    mu_p = _separable_blur(pred, win)
    mu_t = _separable_blur(target, win)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    var_p = _separable_blur(pred * pred, win) - mu_pp
    var_t = _separable_blur(target * target, win) - mu_tt
    cov = _separable_blur(pred * target, win) - mu_pt
    c1, c2 = 0.01**2, 0.03**2
    s = ((2 * mu_pt + c1) * (2 * cov + c2)) / (
        (mu_pp + mu_tt + c1) * (var_p + var_t + c2))
    return jnp.mean(s)


def iou_loss(pred, target):
    """Soft-IoU loss (pytorch_iou semantics): per-image
    1 - Σ(p·t)/(Σp + Σt − Σ(p·t)), averaged over the batch."""
    inter = jnp.sum(pred * target, axis=(1, 2))
    union = jnp.sum(pred, axis=(1, 2)) + jnp.sum(target, axis=(1, 2)) - inter
    return jnp.mean(1.0 - (inter + _EPS) / (union + _EPS))


def hybrid_loss(pred, target):
    """ℓ_bce + ℓ_ssim + ℓ_iou for one side output (BASNet paper eq. 8-11)."""
    return bce_loss(pred, target) + (1.0 - ssim(pred, target)) + iou_loss(pred, target)


def fusion_loss(outputs, target):
    """Deep supervision: the hybrid loss summed over all 8 maps
    (dout, d1..d6, db) — every decoder stage, the bridge, and the refiner
    train against the same ground truth."""
    return sum(hybrid_loss(d[..., 0], target) for d in outputs)


def make_basnet_train_step(model, tx):
    """One jit'd step: fused 8-head hybrid loss + Adam + BN stat update.
    Returns (params, batch_stats, opt_state, loss)."""

    @jax.jit
    def step(params, batch_stats, opt_state, images, targets):
        def loss_fn(p):
            outputs, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"])
            return fusion_loss(outputs, targets), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


def train_basnet(
    model,
    variables,
    images,                # [N,H,W,3] float32, ImageNet-normalized
    targets,               # [N,H,W] float32 saliency in {0,1}
    *,
    epochs: int = 10,
    batch_size: int = 8,
    lr: float = 1e-3,
    clip_norm: float | None = None,
    lr_end: float | None = None,
    seed: int = 0,
    eval_hook=None,
    eval_every: int = 0,
    log=print,
) -> tuple[dict, list]:
    """Train the flax BASNet with the paper's recipe (Adam(1e-3), hybrid
    deep-supervision loss). Device-resident: the dataset uploads once and
    per-epoch batches are gathered on-device by index, following the
    repo-wide epoch-loop pattern (train/segmentation.py). N must be a
    multiple of ``batch_size`` (pad upstream; this is a demo/validation
    trainer, not the reference path — the reference has no BASNet trainer).

    Deliberately NOT chunked-dispatch (unlike train/segmentation.py): losses
    are only read back at epoch end, so JAX async dispatch already hides the
    per-step relay round trips behind the ~200 ms step — a K=4 scanned-chunk
    variant measured flat (39.1 vs 38.1 img/s marginal epoch, fp32 256²
    batch 8 on v5e). The seg trainer needed chunking because its steps are
    ~26 ms against a ~25 ms dispatch floor.

    The paper's Adam(1e-3) assumes the pretrained-ResNet encoder init; from
    a RANDOM init that rate diverges (measured: fused loss climbs 18→36 over
    60 epochs). For from-scratch runs pass ``clip_norm`` (global-norm grad
    clip) and a lower ``lr`` — 3e-4 + clip 1.0 descends monotonically in the
    same setup. ``lr_end`` turns on a cosine decay lr→lr_end over the run.

    Returns (variables, per-epoch mean losses)."""
    n = images.shape[0]
    assert n % batch_size == 0, "pad the dataset to a batch multiple"
    if lr_end is not None:
        steps_total = epochs * (n // batch_size)
        sched = optax.cosine_decay_schedule(lr, steps_total, alpha=lr_end / lr)
        opt = optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)
    else:
        opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    tx = (optax.chain(optax.clip_by_global_norm(clip_norm), opt)
          if clip_norm is not None else opt)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    step = make_basnet_train_step(model, tx)

    dev_images = jnp.asarray(images)
    dev_targets = jnp.asarray(targets, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses = []
        for s in range(0, n, batch_size):
            idx = jnp.asarray(order[s:s + batch_size])
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.take(dev_images, idx, axis=0),
                jnp.take(dev_targets, idx, axis=0))
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        history.append(mean_loss)
        log(f"basnet epoch {epoch + 1}/{epochs}: loss {mean_loss:.4f}")
        if eval_hook is not None and eval_every and (epoch + 1) % eval_every == 0:
            # mid-training checkpoint eval (e.g. held-out IoU trajectory);
            # the hook sees a plain variables dict and must not mutate it
            eval_hook({"params": params, "batch_stats": batch_stats}, epoch + 1)
    return {"params": params, "batch_stats": batch_stats}, history
