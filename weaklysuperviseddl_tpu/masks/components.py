"""On-device connected-component labeling + largest-component filter.

The reference offloads this to skimage's C/Cython union-find
(``keep_largest``, ref TraditionalModel/PsuedoMasks.py:15-21 — a
GPU→host→C-extension round trip per image, SURVEY.md §2.2). Here it is a
jit-able fixed-point label propagation that runs on the TPU and vmaps over the
batch; a C++ union-find twin lives in native/ for host-side golden checks.

Algorithm: seed every foreground pixel with its linear index, then iterate
  1. 8-neighbour min-relaxation (one step of label flooding), and
  2. segmented min-scans along rows and columns (associative_scan with a
     reset at background pixels) — these propagate labels across an entire
     straight run in one shot, so convergence needs only O(#turns) iterations
     instead of O(image diameter).
inside ``lax.while_loop`` until a fixed point. Matches skimage's default
8-connectivity (connectivity=2 for 2-D inputs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.iinfo(jnp.int32).max


def _segmented_min_scan(values, fg, axis, reverse):
    """Min-scan along ``axis`` that resets at background pixels.

    Elements are (v, r): r=1 marks a segment boundary (background).
    combine(a, b) = (b.v if b.r else min(a.v, b.v), a.r | b.r) — associative.
    """
    reset = ~fg

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    out, _ = jax.lax.associative_scan(combine, (values, reset), axis=axis, reverse=reverse)
    return jnp.where(fg, out, _INF)


def _neighbor_min(labels, fg):
    """One step of 8-neighbour min-relaxation (INF-padded shifts)."""
    padded = jnp.pad(labels, 1, constant_values=_INF)
    best = labels
    H, W = labels.shape
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (H, W))
            best = jnp.minimum(best, shifted)
    return jnp.where(fg, best, _INF)


@partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jnp.ndarray, max_iters: int | None = None):
    """Label 8-connected components of a binary [H,W] mask.

    Returns int32 labels: background = -1; each component gets the linear
    index of its minimal pixel (stable, order-independent). ``max_iters``
    bounds the fixed-point loop (default H+W, ample for real masks; raise it
    for adversarial spirals).
    """
    H, W = mask.shape
    fg = mask.astype(bool)
    seeds = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    labels = jnp.where(fg, seeds, _INF)
    limit = max_iters if max_iters is not None else H + W

    def step(labels):
        labels = _neighbor_min(labels, fg)
        labels = _segmented_min_scan(labels, fg, axis=1, reverse=False)
        labels = _segmented_min_scan(labels, fg, axis=1, reverse=True)
        labels = _segmented_min_scan(labels, fg, axis=0, reverse=False)
        labels = _segmented_min_scan(labels, fg, axis=0, reverse=True)
        return labels

    def cond(state):
        labels, prev_changed, it = state
        return prev_changed & (it < limit)

    def body(state):
        labels, _, it = state
        new = step(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True), 0))
    return jnp.where(fg, labels, -1)


@partial(jax.jit, static_argnames=("max_iters",))
def keep_largest(mask: jnp.ndarray, max_iters: int | None = None):
    """Retain only the largest connected component (ref PsuedoMasks.py:15-21).

    Empty masks pass through unchanged (the reference's `if not regions`
    guard). Ties resolve to the component with the smallest root index
    (skimage picks max(area) which is first-found on ties; the choice is
    arbitrary in both).
    """
    H, W = mask.shape
    labels = label_components(mask, max_iters=max_iters)
    fg = labels >= 0
    counts = jnp.bincount(
        jnp.where(fg, labels, 0).ravel(),
        weights=fg.ravel().astype(jnp.int32),
        length=H * W,
    )
    largest = jnp.argmax(counts)
    return ((labels == largest) & fg).astype(jnp.uint8)


def keep_largest_batch(masks: jnp.ndarray, max_iters: int | None = None):
    """vmap'd largest-component filter over [B,H,W]."""
    return jax.vmap(lambda m: keep_largest(m, max_iters=max_iters))(masks)
