"""Alternating-direction pseudo-mask refinement — scan over steps, vmap over images.

Reference (AlternatingDirectionCutLoss.py:709-767, the codebase's hottest
loop, SURVEY.md §3.1 HOT LOOP #5): per image, freeze the net, take its soft
prediction S; initialize a mask variable X = one_hot(mask); run Adam on X for
``num_steps`` minimizing

    KL(softmax(X) ‖ S) + λ_dyn · window_loss(softmax(X), image)

with λ_dyn = λ · KL/window (both .item()'d in the reference — i.e. the ratio
is a stop-gradient constant); threshold the fg probability for the new mask.

Faithfully reproduced quirks:
  * the window criterion softmaxes its input again (the reference feeds the
    already-softmaxed X_norm into LocalNormalizedCutLoss, which applies
    softmax internally — :739,745 + :78), so the effective probabilities are
    softmax(softmax(X));
  * KL uses log(X_norm + 1e-8) with reduction='batchmean' (batch of one).

TPU re-design: the whole per-image optimisation is a ``lax.scan`` over Adam
steps (optax, matching torch Adam's bias correction) and the per-image loop
becomes ``vmap`` — the reference's O(images × steps) Python loop compiles into
one XLA program, batched.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from weaklysuperviseddl_tpu.losses.window import boundary_loss, local_normalized_cut_loss


def _kl_batchmean_single(x_probs, s_probs):
    """F.kl_div((X+1e-8).log(), S, 'batchmean') for a single image: batch=1 →
    plain sum over all elements."""
    p_log_p = jnp.where(s_probs > 0, s_probs * jnp.log(jnp.where(s_probs > 0, s_probs, 1.0)), 0.0)
    return jnp.sum(p_log_p - s_probs * jnp.log(x_probs + 1e-8))


def _use_pallas_default():
    return jax.default_backend() == "tpu"


@partial(
    jax.jit,
    static_argnames=(
        "lambda_boundary", "threshold", "lr", "num_steps",
        "sigma_color", "sigma_space", "window_size", "loss", "use_pallas",
    ),
)
def refine_from_soft_predictions(
    S: jnp.ndarray,        # [B,H,W,C] the frozen net's softmax predictions
    images: jnp.ndarray,   # [B,H,W,3] normalized (the seg model's input space)
    masks: jnp.ndarray,    # [B,H,W] int {0,1}
    lambda_boundary: float = 0.1,
    threshold: float = 0.5,
    lr: float = 1e-2,
    num_steps: int = 20,
    sigma_color: float = 0.1,
    sigma_space: float = 5.0,
    window_size: int = 5,
    loss: str = "ncut",
    use_pallas: bool | None = None,
):
    """Batched refinement core. Returns (refined uint8 [B,H,W], mean total loss).

    use_pallas: run the whole optimization as the VMEM-resident mega-kernel
    (ops/pallas_refine.py); None → auto (TPU backend only). Falls back to the
    scan/vmap XLA path when the per-image working set exceeds the VMEM budget
    (≈≥512² — see refine_vmem_bytes) or off-TPU."""
    num_classes = S.shape[-1]
    tx = optax.adam(lr)
    if use_pallas is None:
        use_pallas = _use_pallas_default()

    if use_pallas:
        # TPU path: the ENTIRE per-image optimization runs as one
        # VMEM-resident Pallas program (ops/pallas_refine.py) — X, Adam
        # moments, and the padded probability planes never touch HBM between
        # steps. Measured vs the scan-of-fused-kernels structure in
        # BASELINE.md. Semantics identical (tests/test_pallas_refine.py).
        from weaklysuperviseddl_tpu.ops.pallas_refine import (
            pallas_refine, refine_vmem_bytes)

        # the kernel holds the whole working set on-chip: above ~VMEM size
        # (e.g. ≥512² images) fall back to the scan/vmap XLA path — or use
        # refine_from_soft_predictions_sharded to split H across chips
        if refine_vmem_bytes(S.shape, window_size) <= 13 * 1024 * 1024:
            return pallas_refine(
                S, images, masks,
                lambda_boundary=lambda_boundary, threshold=threshold, lr=lr,
                num_steps=num_steps, sigma_color=sigma_color,
                sigma_space=sigma_space, window_size=window_size, loss=loss,
            )

    def window_term(x_probs, image):
        if loss == "boundary":
            return boundary_loss(
                x_probs[None], image[None],
                sigma_color=sigma_color, sigma_space=sigma_space, window_size=window_size,
            )
        # reference quirk: LocalNormalizedCutLoss softmaxes again internally
        return local_normalized_cut_loss(
            x_probs[None], image[None],
            sigma_color=sigma_color, window_size=window_size,
        )

    def refine_one(s_i, image_i, mask_i):
        x0 = jax.nn.one_hot(mask_i, num_classes, dtype=jnp.float32)  # [H,W,C]
        opt_state = tx.init(x0)

        def loss_fn(x):
            x_probs = jax.nn.softmax(x, axis=-1)
            loss_kl = _kl_batchmean_single(x_probs, s_i)
            loss_w = window_term(x_probs, image_i)
            ratio = jax.lax.stop_gradient(loss_kl) / (jax.lax.stop_gradient(loss_w) + 1e-6)
            lam = lambda_boundary * ratio
            return loss_kl + lam * loss_w

        def body(carry, _):
            x, opt_state = carry
            l, grads = jax.value_and_grad(loss_fn)(x)
            updates, opt_state = tx.update(grads, opt_state, x)
            x = optax.apply_updates(x, updates)
            return (x, opt_state), l

        (x, _), losses = jax.lax.scan(body, (x0, opt_state), None, length=num_steps)
        x_final = jax.nn.softmax(x, axis=-1)
        refined = (x_final[..., 1] > threshold).astype(jnp.uint8)
        return refined, jnp.sum(losses)

    refined, totals = jax.vmap(refine_one)(S, images, masks.astype(jnp.int32))
    return refined, jnp.mean(totals)


def refine_from_soft_predictions_sharded(
    S, images, masks, mesh, axis: str = "data", **kwargs
):
    """Opt-in large-image path: same refinement with H sharded across the
    mesh (halo-exchange window term, psum'd KL) — for images whose working
    set exceeds one chip. Semantics match refine_from_soft_predictions
    (tested at 1024² on the CPU mesh, tests/test_spatial_sharding.py)."""
    from weaklysuperviseddl_tpu.parallel.spatial import refine_spatial_sharded

    kwargs.pop("use_pallas", None)  # sharded path is XLA-only
    return refine_spatial_sharded(S, images, masks, mesh, axis=axis, **kwargs)


def refine_pseudo_masks(
    model,
    params,
    batch_stats,
    images: jnp.ndarray,
    masks: jnp.ndarray,
    **kwargs,
):
    """Model-facing wrapper (the reference's refine_pseudo_mask signature,
    :709): compute S = softmax(net(image)) under stop-gradient, then refine."""
    logits = model.apply({"params": params, "batch_stats": batch_stats}, images, train=False)
    S = jax.lax.stop_gradient(jax.nn.softmax(logits, axis=-1))
    return refine_from_soft_predictions(S, images, masks, **kwargs)
