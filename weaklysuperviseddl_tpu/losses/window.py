"""Window-affinity losses — XLA reference implementations.

The reference's two hottest pure-Python math paths (SURVEY.md §2.2):
  * ``LocalNormalizedCutLoss`` (AlternatingDirectionCutLoss.py:65-105):
    per offset (dy,dx) in a win×win window (center excluded), color affinity
    ``exp(-‖I−I_shift‖²/(2σ_c²))`` times per-class ``(S_c−S_c,shift)²``,
    .mean() per class per offset, summed, normalized by ``count*C``.
  * ``ConstrainToBoundaryLoss`` (AlternatingDirectionBoundaryLoss.py:12-70):
    affinity adds a spatial term ``−(dx²+dy²)/(2σ_s²)``; the class diff is
    summed over classes *before* weighting; mean over offsets.

Both use reflect padding. These versions keep the shifted-slice structure but
let XLA fuse the 24-offset unrolled loop; jit+grad'able end to end. The fused
Pallas kernels live in ops/pallas_window.py with these as their goldens.

Layouts are TPU-native NHWC: preds [B,H,W,C] (logits for ncut — softmax is
inside, matching the reference), images [B,H,W,3].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _offsets(window_size: int):
    pad = window_size // 2
    return [
        (dy, dx)
        for dy in range(-pad, pad + 1)
        for dx in range(-pad, pad + 1)
        if not (dy == 0 and dx == 0)
    ]


def _shift(padded: jnp.ndarray, dy: int, dx: int, H: int, W: int):
    """Slice the (dy,dx)-shifted H×W window out of a reflect-padded array."""
    pad = (padded.shape[1] - H) // 2
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(padded, pad + dy, H, axis=1), pad + dx, W, axis=2
    )


@partial(jax.jit, static_argnames=("sigma_color", "window_size"))
def local_normalized_cut_loss(
    preds: jnp.ndarray,    # [B,H,W,C] logits
    images: jnp.ndarray,   # [B,H,W,3]
    sigma_color: float = 0.05,
    window_size: int = 5,
):
    """Exact reference semantics (AlternatingDirectionCutLoss.py:71-105)."""
    B, H, W, C = preds.shape
    pad = window_size // 2
    probs = jax.nn.softmax(preds, axis=-1)

    probs_p = jnp.pad(probs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    img_p = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    inv_two_sigma2 = 1.0 / (2.0 * sigma_color**2)
    loss = 0.0
    offsets = _offsets(window_size)
    for dy, dx in offsets:
        shifted_probs = _shift(probs_p, dy, dx, H, W)
        shifted_img = _shift(img_p, dy, dx, H, W)
        color_diff = jnp.sum((images - shifted_img) ** 2, axis=-1)      # [B,H,W]
        affinity = jnp.exp(-color_diff * inv_two_sigma2)
        diff2 = (probs - shifted_probs) ** 2                             # [B,H,W,C]
        # reference does .mean() per class of (affinity * diff_c), then sums
        loss = loss + jnp.sum(jnp.mean(affinity[..., None] * diff2, axis=(0, 1, 2)))
    return loss / (len(offsets) * C)


@partial(jax.jit, static_argnames=("sigma_color", "sigma_space", "window_size"))
def window_affinities(
    images: jnp.ndarray,   # [B,H,W,3]
    sigma_color: float = 0.1,
    sigma_space: float = 5.0,
    window_size: int = 5,
):
    """Stacked affinity maps [B,K,H,W] for all K=win²−1 offsets
    (ref compute_affinities, AlternatingDirectionCutLoss.py:612-637)."""
    B, H, W, _ = images.shape
    pad = window_size // 2
    img_p = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    outs = []
    for dy, dx in _offsets(window_size):
        shifted = _shift(img_p, dy, dx, H, W)
        diff = jnp.sum((images - shifted) ** 2, axis=-1)
        spatial = dx * dx + dy * dy
        outs.append(
            jnp.exp(-diff / (2 * sigma_color**2) - spatial / (2 * sigma_space**2))
        )
    return jnp.stack(outs, axis=1)


@partial(jax.jit, static_argnames=("sigma_color", "sigma_space", "window_size"))
def boundary_loss(
    probs: jnp.ndarray,    # [B,H,W,C] softmax outputs (the reference takes softmaxed preds)
    images: jnp.ndarray,   # [B,H,W,3]
    sigma_color: float = 0.1,
    sigma_space: float = 5.0,
    window_size: int = 5,
):
    """ConstrainToBoundary loss, batched
    (ref AlternatingDirectionBoundaryLoss.py:20-44, single-image there)."""
    B, H, W, C = probs.shape
    pad = window_size // 2
    probs_p = jnp.pad(probs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    img_p = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    loss = 0.0
    offsets = _offsets(window_size)
    for dy, dx in offsets:
        shifted_probs = _shift(probs_p, dy, dx, H, W)
        shifted_img = _shift(img_p, dy, dx, H, W)
        color_diff = jnp.sum((images - shifted_img) ** 2, axis=-1)
        spatial = dx * dx + dy * dy
        weight = jnp.exp(-color_diff / (2 * sigma_color**2) - spatial / (2 * sigma_space**2))
        diff = jnp.sum((probs - shifted_probs) ** 2, axis=-1)           # [B,H,W]
        loss = loss + jnp.mean(weight * diff)
    return loss / len(offsets)
