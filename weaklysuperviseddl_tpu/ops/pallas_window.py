"""Fused Pallas kernels for the window-affinity losses.

The XLA reference (losses/window.py) materializes 24 shifted HxW slices per
tensor; these kernels read the padded image + probability planes into VMEM
once and accumulate all offsets in-register — one HBM pass instead of ~50
(BASELINE.json north star: "the pixel-neighborhood loss sums fused as Pallas
kernels"; reference math at AlternatingDirectionCutLoss.py:65-105 and
AlternatingDirectionBoundaryLoss.py:12-70).

Layout: channel-planes-first [C, H+2p, W+2p] so the W dimension rides the
128-lane axis (NHWC with C∈{2,3} would waste 97% of each lane tile). Callers
pass reflect-padded planes; the backward kernel emits gradients w.r.t. the
*padded* array and the wrapper folds the margins back through the transpose
of the reflect-pad (plain XLA, a few rows/cols).

Both losses share one kernel body parameterized by the spatial-affinity term:
  ncut:     aff = exp(-||ΔI||²/(2σc²));       loss = Σ_o Σ_c mean(aff·(ΔS_c)²) / (K·C)
  boundary: aff = exp(-||ΔI||²/(2σc²) − (dx²+dy²)/(2σs²));
            loss = Σ_o mean(aff·Σ_c(ΔS_c)²) / K
(the two normalizations coincide up to the 1/C factor — folded into `norm`).

Gradient w.r.t. padded S_c at position r (norm factored out):
  center  term: +2·Σ_o aff_o(r−p)·(S_c(r−p) − S_c(r−p+o))   [r−p interior]
  neighbor term: −2·Σ_o aff_o(r−o−p)·(S_c(r−o−p) − S_c(r))  [r−o−p interior]
both are static slice-accumulations — no scatters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _offsets(window_size: int):
    p = window_size // 2
    return tuple(
        (dy, dx)
        for dy in range(-p, p + 1)
        for dx in range(-p, p + 1)
        if not (dy == 0 and dx == 0)
    )


def _affinity(img_ref, center_img, dy, dx, pad, H, W, inv2sc, spatial_coeff):
    """exp(-color_diff/(2σc²) [− spatial/(2σs²)]) for one offset; [H,W]."""
    color = None
    for ch in range(center_img.shape[0]):
        shifted = img_ref[0, ch, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
        d = center_img[ch] - shifted
        color = d * d if color is None else color + d * d
    expo = -color * inv2sc
    if spatial_coeff is not None:
        expo = expo - (dx * dx + dy * dy) * spatial_coeff
    return jnp.exp(expo)


def _fwd_kernel(img_ref, probs_ref, out_ref, *, H, W, pad, offsets, inv2sc, spatial_coeff, C):
    center_img = jnp.stack([img_ref[0, ch, pad : pad + H, pad : pad + W] for ch in range(3)])
    center_probs = [probs_ref[0, c, pad : pad + H, pad : pad + W] for c in range(C)]

    acc = jnp.zeros((), jnp.float32)
    for dy, dx in offsets:
        aff = _affinity(img_ref, center_img, dy, dx, pad, H, W, inv2sc, spatial_coeff)
        for c in range(C):
            shifted = probs_ref[0, c, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            d = center_probs[c] - shifted
            acc = acc + jnp.sum(aff * d * d)

    # TPU grid steps run sequentially: accumulate the batch into one scalar
    # (a (1,1) SMEM output block must equal the full array shape)
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((), jnp.float32)

    out_ref[0, 0] += acc


def _bwd_kernel(
    img_ref, probs_ref, grad_ref, *, H, W, pad, offsets, inv2sc, spatial_coeff, C
):
    center_img = jnp.stack([img_ref[0, ch, pad : pad + H, pad : pad + W] for ch in range(3)])
    center_probs = [probs_ref[0, c, pad : pad + H, pad : pad + W] for c in range(C)]

    grad_ref[0, :, :, :] = jnp.zeros(grad_ref.shape[1:], jnp.float32)

    for dy, dx in offsets:
        aff = _affinity(img_ref, center_img, dy, dx, pad, H, W, inv2sc, spatial_coeff)
        for c in range(C):
            shifted = probs_ref[0, c, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            t = aff * (center_probs[c] - shifted)  # [H,W] at interior positions
            # center term: +2t at padded position (p..p+H, p..p+W)
            grad_ref[0, c, pad : pad + H, pad : pad + W] = (
                grad_ref[0, c, pad : pad + H, pad : pad + W] + 2.0 * t
            )
            # neighbor term: −2t at padded position shifted by the offset
            grad_ref[0, c, pad + dy : pad + dy + H, pad + dx : pad + dx + W] = (
                grad_ref[0, c, pad + dy : pad + dy + H, pad + dx : pad + dx + W] - 2.0 * t
            )


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _pad_planes(x_bhwc, pad):
    """[B,H,W,C] → reflect-padded planes [B,C,Hp_a,Wp_a] where the trailing
    dims are padded up to TPU tile alignment (8 sublanes × 128 lanes; Mosaic
    requires aligned memref shapes). The alignment margin is zero-filled and
    never read (kernel slices stay within H+2p / W+2p)."""
    x = jnp.transpose(x_bhwc, (0, 3, 1, 2))
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    Hp, Wp = x.shape[2], x.shape[3]
    Ha, Wa = _round_up(Hp, 8), _round_up(Wp, 128)
    return jnp.pad(x, ((0, 0), (0, 0), (0, Ha - Hp), (0, Wa - Wp)))


def _fold_reflect(g_pad, pad):
    """Transpose of reflect-pad: fold padded-margin gradients back into the
    interior (what autodiff of jnp.pad(mode='reflect') does)."""
    _, fold = jax.vjp(
        lambda x: jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect"),
        jnp.zeros(
            (g_pad.shape[0], g_pad.shape[1], g_pad.shape[2] - 2 * pad, g_pad.shape[3] - 2 * pad),
            g_pad.dtype,
        ),
    )
    return fold(g_pad)[0]


def _window_sum(probs, images, sigma_color, sigma_space, window_size, interpret):
    """Raw fused sum Σ_o Σ_c Σ_p aff·(ΔS_c)² (normalization applied by callers)."""
    B, H, W, C = probs.shape
    pad = window_size // 2
    offsets = _offsets(window_size)
    inv2sc = 1.0 / (2.0 * sigma_color**2)
    spatial_coeff = None if sigma_space is None else 1.0 / (2.0 * sigma_space**2)

    img_p = _pad_planes(images, pad)
    probs_p = _pad_planes(probs, pad)
    Hp, Wp = img_p.shape[2], img_p.shape[3]

    kernel = partial(
        _fwd_kernel, H=H, W=W, pad=pad, offsets=offsets,
        inv2sc=inv2sc, spatial_coeff=spatial_coeff, C=C,
    )
    total = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, Hp, Wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Hp, Wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(img_p, probs_p)
    return total[0, 0]


def _window_sum_grad(probs, images, sigma_color, sigma_space, window_size, interpret):
    """d(window_sum)/d(probs), same shape as probs."""
    B, H, W, C = probs.shape
    pad = window_size // 2
    offsets = _offsets(window_size)
    inv2sc = 1.0 / (2.0 * sigma_color**2)
    spatial_coeff = None if sigma_space is None else 1.0 / (2.0 * sigma_space**2)

    img_p = _pad_planes(images, pad)
    probs_p = _pad_planes(probs, pad)
    Hp, Wp = img_p.shape[2], img_p.shape[3]

    kernel = partial(
        _bwd_kernel, H=H, W=W, pad=pad, offsets=offsets,
        inv2sc=inv2sc, spatial_coeff=spatial_coeff, C=C,
    )
    g_pad = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, Hp, Wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Hp, Wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, Hp, Wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(img_p, probs_p)
    g_pad = g_pad[:, :, : H + 2 * pad, : W + 2 * pad]  # drop alignment margin
    g = _fold_reflect(g_pad, pad)            # [B,C,H,W]
    return jnp.transpose(g, (0, 2, 3, 1))    # [B,H,W,C]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_window_sum(probs, images, sigma_color, sigma_space, window_size, interpret=False):
    """Differentiable (w.r.t. probs ONLY) fused window-affinity sum.

    WARNING: the custom VJP returns zero gradient for ``images`` — affinities
    are treated as constants, matching every reference use (images are data,
    never optimized; ref AlternatingDirectionCutLoss.py:745 passes the frozen
    input). Use losses.window (XLA autodiff) if you ever need d/d(images).
    """
    return _window_sum(probs, images, sigma_color, sigma_space, window_size, interpret)


def _fws_fwd(probs, images, sigma_color, sigma_space, window_size, interpret):
    out = _window_sum(probs, images, sigma_color, sigma_space, window_size, interpret)
    return out, (probs, images)


def _fws_bwd(sigma_color, sigma_space, window_size, interpret, res, g):
    probs, images = res
    gp = _window_sum_grad(probs, images, sigma_color, sigma_space, window_size, interpret)
    return (g * gp, jnp.zeros_like(images))


fused_window_sum.defvjp(_fws_fwd, _fws_bwd)


# A precomputed-affinity variant (window_affinities + fused_window_sum_pre)
# was built and measured here in round 2: DMAing 24 stored affinity planes
# costs what the per-offset recompute saves (VPU exp is cheap, VMEM bandwidth
# is not), and the whole per-step-kernel structure was then superseded by the
# VMEM-resident mega-kernel (ops/pallas_refine.py). Removed as dead code; the
# measurements live in BASELINE.md ("Refinement mega-kernel").


def pallas_local_normalized_cut_loss(
    preds, images, sigma_color: float = 0.05, window_size: int = 5, interpret: bool = False
):
    """Drop-in fused equivalent of losses.window.local_normalized_cut_loss
    (takes logits, softmaxes internally like the reference)."""
    B, H, W, C = preds.shape
    probs = jax.nn.softmax(preds, axis=-1)
    K = window_size * window_size - 1
    norm = 1.0 / (B * H * W * K * C)
    return fused_window_sum(probs, images, sigma_color, None, window_size, interpret) * norm


def pallas_boundary_loss(
    probs, images, sigma_color: float = 0.1, sigma_space: float = 5.0,
    window_size: int = 5, interpret: bool = False,
):
    """Drop-in fused equivalent of losses.window.boundary_loss."""
    B, H, W, C = probs.shape
    K = window_size * window_size - 1
    norm = 1.0 / (B * H * W * K)
    return fused_window_sum(probs, images, sigma_color, sigma_space, window_size, interpret) * norm
