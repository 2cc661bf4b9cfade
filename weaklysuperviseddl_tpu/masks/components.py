"""On-device connected-component labeling + largest-component filter.

The reference offloads this to skimage's C/Cython union-find
(``keep_largest``, ref TraditionalModel/PsuedoMasks.py:15-21 — a
GPU→host→C-extension round trip per image, SURVEY.md §2.2). Here it is a
jit-able fixed-point label propagation that runs on the TPU and vmaps over the
batch; a C++ union-find twin lives in native/ for host-side golden checks.

Algorithm: seed every foreground pixel with its linear index, then iterate
  1. separable 3×3 min-relaxation (vertical 3-min then horizontal 3-min ==
     min over the 8-neighbourhood + self, 4 shifted ops instead of 8 padded
     slices), and
  2. segmented min-scans along rows and columns (associative_scan with a
     reset at background pixels) — these propagate labels across an entire
     straight run in one shot, so convergence needs only O(#turns) iterations
     instead of O(image diameter),
inside ``lax.while_loop`` until a fixed point. Matches skimage's default
8-connectivity (connectivity=2 for 2-D inputs).

(Pointer-jumping via gathers — the classic Shiloach–Vishkin accelerator — was
tried and measured 70× SLOWER on TPU: 50k-element gathers do not vectorize on
the VPU. Scans + shifts are the TPU-native formulation.)

Measured on v5e at 224², batch 32: Pallas labeling ~3 ms/batch on realistic
blobby CAM masks (2-3 fixed-point iterations), ~37 ms on adversarial speckle
(vs 332 ms for this XLA path). Largest-component selection is sort-based
(``largest_label_by_sort``): the former H*W-bin bincount lowered to a
scatter-add costing 14 ms/batch — scatters don't vectorize on the VPU,
sorts do (1.7 ms).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.iinfo(jnp.int32).max


def _neighbor_min(labels, fg, sentinel=_INF):
    """Min over the 3×3 neighbourhood (separable), masked to foreground.

    labels: [H,W] int32 where background holds ``sentinel`` (≥ any label).
    """
    pv = jnp.pad(labels, ((1, 1), (0, 0)), constant_values=sentinel)
    v = jnp.minimum(jnp.minimum(pv[:-2], pv[1:-1]), pv[2:])
    ph = jnp.pad(v, ((0, 0), (1, 1)), constant_values=sentinel)
    m = jnp.minimum(jnp.minimum(ph[:, :-2], ph[:, 1:-1]), ph[:, 2:])
    return jnp.where(fg, m, sentinel)


@partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jnp.ndarray, max_iters: int | None = None):
    """Label 8-connected components of a binary [H,W] mask.

    Returns int32 labels: background = -1; each component gets the linear
    index of its minimal pixel (stable, order-independent). ``max_iters``
    bounds the fixed-point loop (default H+W, ample for real masks; raise it
    for adversarial spirals).

    Segmented min-scans use native ``lax.cummin`` via a run-id offset trick:
    with BIG = H·W (all in-scan values ≤ BIG) and run ids r (cumsum of
    background resets, precomputed once per axis since the mask is static
    across iterations), ``cummin(v − BIG·r) + BIG·r`` equals the min over the
    contiguous foreground run — earlier runs are shifted up by ≥BIG and can
    never win. One native cumulative op per direction instead of a 2-tuple
    associative_scan (~4× fewer passes).
    """
    H, W = mask.shape
    assert H * W * (max(H, W) + 1) < 2**31, "run-id offset would overflow int32"
    fg = mask.astype(bool)
    seeds = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    BIG = jnp.int32(H * W)
    labels = jnp.where(fg, seeds, BIG)
    limit = max_iters if max_iters is not None else H + W

    reset = (~fg).astype(jnp.int32)
    row_run = jnp.cumsum(reset, axis=1) * BIG   # constant within each row run
    col_run = jnp.cumsum(reset, axis=0) * BIG

    def seg_cummin(values, run_offset, axis, reverse):
        # scan-direction-"earlier" runs must rank strictly higher than any
        # in-run value: shift by −BIG·run_id forward, +BIG·run_id reverse
        sign = 1 if reverse else -1
        adj = jnp.where(fg, values, BIG) + sign * run_offset
        out = jax.lax.cummin(adj, axis=axis, reverse=reverse) - sign * run_offset
        return jnp.where(fg, jnp.minimum(out, BIG), BIG)

    def step(labels):
        labels = _neighbor_min(labels, fg, BIG)
        labels = seg_cummin(labels, row_run, 1, False)
        labels = seg_cummin(labels, row_run, 1, True)
        labels = seg_cummin(labels, col_run, 0, False)
        labels = seg_cummin(labels, col_run, 0, True)
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


def largest_label_by_sort(labels: jnp.ndarray, num_labels: int) -> jnp.ndarray:
    """Most-frequent nonnegative label in [H,W] ``labels`` (bg = -1).

    One ``jnp.sort`` + run-length extraction instead of a ``num_labels``-bin
    bincount: bincount lowers to scatter-add, which doesn't vectorize on the
    TPU VPU (measured 14 ms/batch32 at 224² on v5e vs 1.7 ms for this path).
    Ties resolve to the smallest label, matching argmax-over-bincount.
    Returns ``num_labels`` (the sentinel) when there is no foreground.
    """
    flat = labels.ravel()
    sent = jnp.int32(num_labels)
    s = jnp.sort(jnp.where(flat >= 0, flat, sent))
    idx = jnp.arange(flat.size, dtype=jnp.int32)
    changed = s[1:] != s[:-1]
    new_run = jnp.concatenate([jnp.ones((1,), bool), changed])
    start = jax.lax.cummax(jnp.where(new_run, idx, 0))
    is_end = jnp.concatenate([changed, jnp.ones((1,), bool)])
    run_len = jnp.where(is_end & (s != sent), idx - start + 1, 0)
    return s[jnp.argmax(run_len)]


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
    largest = largest_label_by_sort(labels, H * W)
    return ((labels == largest) & fg).astype(jnp.uint8)


def keep_largest_batch(masks: jnp.ndarray, max_iters: int | None = None,
                       backend: str = "auto"):
    """Largest-component filter over [B,H,W].

    backend='auto' uses the VMEM-resident Pallas kernel on TPU
    (ops/pallas_cc.py — measured 1.3-1.5× over this XLA path with identical
    outputs); 'pallas' forces the kernel; 'xla' forces the vmapped
    while_loop version.
    """
    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend == "pallas" or (backend == "auto" and jax.default_backend() == "tpu"):
        from weaklysuperviseddl_tpu.ops.pallas_cc import pallas_keep_largest_batch

        return pallas_keep_largest_batch(masks, max_iters=max_iters)
    return jax.vmap(lambda m: keep_largest(m, max_iters=max_iters))(masks)
