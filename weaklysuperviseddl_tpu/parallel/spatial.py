"""Spatial (sequence-parallel analogue) sharding for the window-affinity losses.

The reference has no sequence dimension; its scaling dimension is spatial
H×W (SURVEY.md §2.3/§5 "the spatial analogue: sharding H×W of the
window-affinity losses across chips with halo exchange"). This implements it:

  * probs/images are sharded along H on a mesh axis;
  * each shard exchanges a ``pad``-row halo with its neighbours over ICI via
    ``jax.lax.ppermute`` (two shifts, up and down);
  * global-edge shards reflect-pad exactly like the unsharded op, so results
    match losses.window bit-for-bit up to reduction order;
  * per-shard partial sums reduce with one ``psum``.

This turns a 24-offset window loss over a virtually-unbounded image into an
SPMD program whose per-chip working set is H/n — the idiomatic TPU answer to
"the image doesn't fit", with communication limited to 2·pad rows per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from weaklysuperviseddl_tpu.losses.window import _offsets


def _exchange_halo(x, pad, axis_name):
    """x: [B, Hl, W, C] local shard. Returns x extended to [B, Hl+2p, W, C]
    with neighbour rows (edge shards get reflect padding)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # send my TOP rows to the PREVIOUS shard (they become its bottom halo)
    top = x[:, :pad]
    bottom = x[:, -pad:]
    from_next = jax.lax.ppermute(top, axis_name, [(i, (i - 1) % n) for i in range(n)])
    from_prev = jax.lax.ppermute(bottom, axis_name, [(i, (i + 1) % n) for i in range(n)])

    # global edges: reflect my own rows like jnp.pad(mode='reflect')
    reflect_top = x[:, 1 : pad + 1][:, ::-1]
    reflect_bottom = x[:, -pad - 1 : -1][:, ::-1]
    upper = jnp.where(idx == 0, reflect_top, from_prev)
    lower = jnp.where(idx == n - 1, reflect_bottom, from_next)
    return jnp.concatenate([upper, x, lower], axis=1)


def _local_window_sums(probs_h, images_h, pad, offsets, inv2sc, spatial_coeff):
    """Window sums over the local rows; probs_h/images_h carry the halo.
    Returns per-(offset,class) sums [K, C] so both ncut and boundary
    normalizations can be applied globally."""
    Hl = probs_h.shape[1] - 2 * pad
    W = probs_h.shape[2]
    C = probs_h.shape[3]

    # reflect-pad the W axis locally (W is unsharded)
    probs_p = jnp.pad(probs_h, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    img_p = jnp.pad(images_h, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    center_probs = probs_p[:, pad : pad + Hl, pad : pad + W]
    center_img = img_p[:, pad : pad + Hl, pad : pad + W]

    sums = []
    for dy, dx in offsets:
        sp = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(probs_p, pad + dy, Hl, axis=1), pad + dx, W, axis=2
        )
        si = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(img_p, pad + dy, Hl, axis=1), pad + dx, W, axis=2
        )
        color = jnp.sum((center_img - si) ** 2, axis=-1)
        expo = -color * inv2sc
        if spatial_coeff is not None:
            expo = expo - (dx * dx + dy * dy) * spatial_coeff
        aff = jnp.exp(expo)
        diff2 = (center_probs - sp) ** 2
        sums.append(jnp.sum(aff[..., None] * diff2, axis=(0, 1, 2)))  # [C]
    return jnp.stack(sums)  # [K, C]


def spatial_sharded_ncut_loss(
    probs: jnp.ndarray,     # [B,H,W,C] softmax probabilities (pre-softmaxed)
    images: jnp.ndarray,    # [B,H,W,3]
    mesh: Mesh,
    axis: str = "data",
    sigma_color: float = 0.05,
    window_size: int = 5,
):
    """H-sharded LocalNormalizedCut loss == losses.window semantics on the
    softmax'd input (pass probs; matching the reference's double-softmax quirk
    is the caller's choice, as in train/refine.py)."""
    B, H, W, C = probs.shape
    pad = window_size // 2
    offsets = _offsets(window_size)
    inv2sc = 1.0 / (2.0 * sigma_color**2)
    K = len(offsets)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None)),
        out_specs=P(),
    )
    def run(probs_l, images_l):
        probs_h = _exchange_halo(probs_l, pad, axis)
        images_h = _exchange_halo(images_l, pad, axis)
        sums = _local_window_sums(probs_h, images_h, pad, offsets, inv2sc, None)
        return jax.lax.psum(jnp.sum(sums), axis)

    total = run(probs, images)
    return total / (B * H * W * K * C)


def spatial_sharded_boundary_loss(
    probs: jnp.ndarray,     # [B,H,W,C] softmax probabilities
    images: jnp.ndarray,    # [B,H,W,3]
    mesh: Mesh,
    axis: str = "data",
    sigma_color: float = 0.1,
    sigma_space: float = 5.0,
    window_size: int = 5,
):
    """H-sharded ConstrainToBoundary loss == losses.window.boundary_loss
    (aff·Σ_c diff² == Σ_c aff·diff², so the per-class sums reuse
    _local_window_sums with the spatial affinity term)."""
    B, H, W, C = probs.shape
    pad = window_size // 2
    offsets = _offsets(window_size)
    inv2sc = 1.0 / (2.0 * sigma_color**2)
    spatial_coeff = 1.0 / (2.0 * sigma_space**2)
    K = len(offsets)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None)),
        out_specs=P(),
    )
    def run(probs_l, images_l):
        probs_h = _exchange_halo(probs_l, pad, axis)
        images_h = _exchange_halo(images_l, pad, axis)
        sums = _local_window_sums(probs_h, images_h, pad, offsets, inv2sc, spatial_coeff)
        return jax.lax.psum(jnp.sum(sums), axis)

    total = run(probs, images)
    return total / (B * H * W * K)


def refine_spatial_sharded(
    S: jnp.ndarray,        # [B,H,W,C] frozen-net softmax predictions
    images: jnp.ndarray,   # [B,H,W,3] normalized
    masks: jnp.ndarray,    # [B,H,W] int {0,1}
    mesh: Mesh,
    axis: str = "data",
    lambda_boundary: float = 0.1,
    threshold: float = 0.5,
    lr: float = 1e-2,
    num_steps: int = 20,
    sigma_color: float = 0.1,
    sigma_space: float = 5.0,
    window_size: int = 5,
    loss: str = "ncut",
):
    """Alternating-direction refinement with the image H-sharded across the
    mesh — the opt-in large-image path (images too big for one chip's VMEM/HBM
    working set). Semantics == train.refine.refine_from_soft_predictions: the
    whole Adam-on-X loop runs inside one shard_map; the KL term psums, the
    window term halo-exchanges each step. Returns (refined uint8 [B,H,W],
    mean total loss) with the same meaning as the unsharded op.
    """
    import optax

    B, H, W, C = S.shape
    pad = window_size // 2
    offsets = _offsets(window_size)
    inv2sc = 1.0 / (2.0 * sigma_color**2)
    spatial_coeff = (1.0 / (2.0 * sigma_space**2)) if loss == "boundary" else None
    K = len(offsets)
    tx = optax.adam(lr)
    # reference window-loss normalizations, PER IMAGE (each image carries its
    # own λ_dyn ratio, matching the vmap'd unsharded refine_one):
    #   ncut: /(H·W·K·C) per image; boundary: /(H·W·K) per image
    denom = H * W * K * (C if loss != "boundary" else 1)

    def per_image_window_sums(x_probs_l, images_h):
        # reference quirk kept: ncut softmaxes its input again (refine.py)
        inner = jax.nn.softmax(x_probs_l, axis=-1) if loss != "boundary" else x_probs_l
        probs_h = _exchange_halo(inner, pad, axis)
        probs_p = jnp.pad(probs_h, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
        img_p = jnp.pad(images_h, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
        Hl = probs_h.shape[1] - 2 * pad
        Wl = probs_h.shape[2]
        center_probs = probs_p[:, pad : pad + Hl, pad : pad + Wl]
        center_img = img_p[:, pad : pad + Hl, pad : pad + Wl]
        total = jnp.zeros((x_probs_l.shape[0],), jnp.float32)
        for dy, dx in offsets:
            sp = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(probs_p, pad + dy, Hl, axis=1),
                pad + dx, Wl, axis=2)
            si = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(img_p, pad + dy, Hl, axis=1),
                pad + dx, Wl, axis=2)
            expo = -jnp.sum((center_img - si) ** 2, axis=-1) * inv2sc
            if spatial_coeff is not None:
                expo = expo - (dx * dx + dy * dy) * spatial_coeff
            aff = jnp.exp(expo)
            total = total + jnp.sum(aff[..., None] * (center_probs - sp) ** 2,
                                    axis=(1, 2, 3))
        return jax.lax.psum(total, axis) / denom  # [B]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, axis, None, None),
            P(None, axis, None, None),
            P(None, axis, None),
        ),
        out_specs=(P(None, axis, None), P()),
    )
    def run(S_l, images_l, masks_l):
        images_h = _exchange_halo(images_l, pad, axis)
        x0 = jax.nn.one_hot(masks_l, C, dtype=jnp.float32)
        opt_state = tx.init(x0)

        def loss_fn(x):
            x_probs = jax.nn.softmax(x, axis=-1)
            # per-image KL(batchmean over a batch of 1) == plain sum → psum
            p_log_p = jnp.where(S_l > 0, S_l * jnp.log(jnp.where(S_l > 0, S_l, 1.0)), 0.0)
            loss_kl = jax.lax.psum(
                jnp.sum(p_log_p - S_l * jnp.log(x_probs + 1e-8), axis=(1, 2, 3)), axis
            )  # [B]
            loss_w = per_image_window_sums(x_probs, images_h)  # [B]
            ratio = jax.lax.stop_gradient(loss_kl) / (jax.lax.stop_gradient(loss_w) + 1e-6)
            per_image = loss_kl + lambda_boundary * ratio * loss_w
            # images are independent: grad of the sum == per-image grads
            return jnp.sum(per_image), per_image

        def body(carry, _):
            x, opt_state = carry
            (_, per_image), grads = jax.value_and_grad(loss_fn, has_aux=True)(x)
            updates, opt_state = tx.update(grads, opt_state, x)
            x = optax.apply_updates(x, updates)
            return (x, opt_state), per_image

        (x, _), losses = jax.lax.scan(body, (x0, opt_state), None, length=num_steps)
        x_final = jax.nn.softmax(x, axis=-1)
        refined = (x_final[..., 1] > threshold).astype(jnp.uint8)
        return refined, jnp.mean(jnp.sum(losses, axis=0))

    refined, total = run(S, images, masks.astype(jnp.int32))
    return refined, total


def shard_spatial(mesh: Mesh, x, axis: str = "data"):
    """device_put an [B,H,...] array sharded along H."""
    spec = P(None, axis, *([None] * (x.ndim - 2)))
    return jax.device_put(x, NamedSharding(mesh, spec))
