"""Whole alternating-direction refinement as ONE VMEM-resident Pallas kernel.

The reference's hottest loop (AlternatingDirectionCutLoss.py:709-767, HOT
LOOP #5): per image, Adam on a mask variable X for num_steps minimizing
KL(softmax(X)‖S) + λ_dyn·window(X). Round 1 compiled it as lax.scan over
optax steps with fused window kernels; measurement (BASELINE.md round 2)
shows that structure is launch/DMA-bound — per step it dispatches two Pallas
kernels (window fwd + analytic bwd, each re-DMAing image+probs into VMEM) and
a ~0.6 ms XLA elementwise pass (softmax/KL/Adam over HBM).

This kernel runs the ENTIRE optimization per image inside one Pallas program:
X, Adam moments, S, and the padded probability planes never leave VMEM; the
color affinities are recomputed per offset per step (measured cheaper than
storing 24 planes — VPU exp beats the extra DMA). Gradients are hand-derived:

  q  = softmax(X)                    (channel axis)
  q2 = softmax(q)                    (the reference's double-softmax quirk —
                                      ncut path only; boundary uses q)
  KL = Σ S·logS − S·log(q+1e-8)
  Wsum = Σ_o Σ_c Σ_r aff_o(r)·(t_c(r) − t_c(r+o))²,  t ∈ {q2 (ncut), q (boundary)}
  L  = KL + λ·stop_grad(KL/(W+1e-6))·W,  W = normW·Wsum

  dWsum/dt (wrt the reflect-PADDED t, then fold margins — the transpose of
  reflect-pad): +2·aff_o·d at the center, −2·aff_o·d at the neighbor.
  Softmax VJP: dz = p ⊙ (g − Σ_c p·g).
  Adam matches optax/torch defaults (β1 .9, β2 .999, eps 1e-8, bias corr.).

Parity: tests/test_pallas_refine.py — masks equal + loss rtol vs the
scan/vmap XLA path (losses/window.py) in interpreter mode, and vs torch
semantics via the existing refine goldens (tests/test_refine.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weaklysuperviseddl_tpu.ops.pallas_window import _offsets, _round_up


def _refine_kernel(
    img_ref,      # [1, 3, Hp, Wa]  reflect-padded image planes
    s_ref,        # [1, C, Ha, Wa]  soft predictions (interior in [:H,:W])
    mask_ref,     # [1, Ha, Wa]     int32 initial mask
    out_ref,      # [1, Ha, Wa]     int32 refined mask
    loss_ref,     # [1, 1]          SMEM: Σ over images of Σ step losses
    x_ref,        # scratch [C, Ha, Wa]      the optimized variable
    m_ref,        # scratch [C, Ha, Wa]      Adam m
    v_ref,        # scratch [C, Ha, Wa]      Adam v
    tp_ref,       # scratch [C, Hp2, Wp2]    padded window-input planes
    gp_ref,       # scratch [C, Hp2, Wp2]    padded window-gradient planes
    *,
    H, W, pad, offsets, inv2sc, spatial_coeff, C, num_steps,
    lr, lambda_boundary, threshold, double_softmax, normW, symmetric=False,
):
    b1, b2, eps = 0.9, 0.999, 1e-8
    # symmetric (C==2 only): both window-input planes sum to 1 (softmax), so
    # d_1 = -d_0 and aff·d_1·d_1 = aff·d_0·d_0 — the whole offset sweep
    # (reflect-write, K shifted reads, 2K slice-accumulates, fold) runs for
    # class 0 alone; wsum doubles and g_t1 = -g_t0. Exact up to the ~1-ulp
    # error of the softmax channels' sum, halving the kernel's hot loop.
    ncls = 1 if symmetric else C

    # init: X = one_hot(mask), moments = 0
    mask = mask_ref[0, :H, :W]
    for c in range(C):
        x_ref[c, :H, :W] = (mask == c).astype(jnp.float32)
    m_ref[:, :, :] = jnp.zeros(m_ref.shape, jnp.float32)
    v_ref[:, :, :] = jnp.zeros(v_ref.shape, jnp.float32)

    center_img = [img_ref[0, ch, pad : pad + H, pad : pad + W] for ch in range(3)]

    def affinity(dy, dx):
        color = None
        for ch in range(3):
            shifted = img_ref[0, ch, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            d = center_img[ch] - shifted
            color = d * d if color is None else color + d * d
        expo = -color * inv2sc
        if spatial_coeff is not None:
            expo = expo - (dx * dx + dy * dy) * spatial_coeff
        return jnp.exp(expo)

    def softmax_c(planes):
        mx = planes[0]
        for p_ in planes[1:]:
            mx = jnp.maximum(mx, p_)
        es = [jnp.exp(p_ - mx) for p_ in planes]
        tot = es[0]
        for e in es[1:]:
            tot = tot + e
        inv = 1.0 / tot
        return [e * inv for e in es]

    def softmax_vjp(p_planes, g_planes):
        dot = p_planes[0] * g_planes[0]
        for p_, g_ in zip(p_planes[1:], g_planes[1:]):
            dot = dot + p_ * g_
        return [p_ * (g_ - dot) for p_, g_ in zip(p_planes, g_planes)]

    def write_reflect(planes):
        """planes [ncls][H,W] → tp_ref with jnp.pad(mode='reflect') semantics
        (rows mirrored about the edge, then columns of the row-padded array)."""
        for c in range(len(planes)):
            tp_ref[c, pad : pad + H, pad : pad + W] = planes[c]
        # rows
        for j in range(1, pad + 1):
            for c in range(len(planes)):
                tp_ref[c, pad - j, pad : pad + W] = tp_ref[c, pad + j, pad : pad + W]
                tp_ref[c, pad + H - 1 + j, pad : pad + W] = (
                    tp_ref[c, pad + H - 1 - j, pad : pad + W]
                )
        # columns (over the full padded height → corners come out right)
        Hp2 = 2 * pad + H
        for j in range(1, pad + 1):
            for c in range(len(planes)):
                tp_ref[c, 0:Hp2, pad - j] = tp_ref[c, 0:Hp2, pad + j]
                tp_ref[c, 0:Hp2, pad + W - 1 + j] = tp_ref[c, 0:Hp2, pad + W - 1 - j]

    def fold_reflect():
        """Transpose of write_reflect on gp_ref → interior [ncls][H,W] grads."""
        Hp2 = 2 * pad + H
        # columns first (reverse order of the pad)
        for j in range(1, pad + 1):
            for c in range(ncls):
                gp_ref[c, 0:Hp2, pad + j] = gp_ref[c, 0:Hp2, pad + j] + gp_ref[c, 0:Hp2, pad - j]
                gp_ref[c, 0:Hp2, pad + W - 1 - j] = (
                    gp_ref[c, 0:Hp2, pad + W - 1 - j] + gp_ref[c, 0:Hp2, pad + W - 1 + j]
                )
        # then rows
        for j in range(1, pad + 1):
            for c in range(ncls):
                gp_ref[c, pad + j, pad : pad + W] = (
                    gp_ref[c, pad + j, pad : pad + W] + gp_ref[c, pad - j, pad : pad + W]
                )
                gp_ref[c, pad + H - 1 - j, pad : pad + W] = (
                    gp_ref[c, pad + H - 1 - j, pad : pad + W]
                    + gp_ref[c, pad + H - 1 + j, pad : pad + W]
                )
        return [gp_ref[c, pad : pad + H, pad : pad + W] for c in range(ncls)]

    def step(t, loss_acc):
        x = [x_ref[c, :H, :W] for c in range(C)]
        q = softmax_c(x)

        # KL(S ‖ q) with the reference's log(q+1e-8)
        s = [s_ref[0, c, :H, :W] for c in range(C)]
        kl = jnp.zeros((), jnp.float32)
        for c in range(C):
            p_log_p = jnp.where(s[c] > 0, s[c] * jnp.log(jnp.where(s[c] > 0, s[c], 1.0)), 0.0)
            kl = kl + jnp.sum(p_log_p - s[c] * jnp.log(q[c] + 1e-8))

        t_planes = softmax_c(q) if double_softmax else q
        write_reflect(t_planes[:ncls])

        # window sum + padded gradient in one sweep over offsets
        if symmetric:
            gp_ref[0, :, :] = jnp.zeros(gp_ref.shape[1:], jnp.float32)
        else:
            gp_ref[:, :, :] = jnp.zeros(gp_ref.shape, jnp.float32)
        wsum = jnp.zeros((), jnp.float32)
        for dy, dx in offsets:
            aff = affinity(dy, dx)
            for c in range(ncls):
                shifted = tp_ref[c, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
                d = tp_ref[c, pad : pad + H, pad : pad + W] - shifted
                ad = aff * d
                wsum = wsum + jnp.sum(ad * d)
                gp_ref[c, pad : pad + H, pad : pad + W] = (
                    gp_ref[c, pad : pad + H, pad : pad + W] + 2.0 * ad
                )
                gp_ref[c, pad + dy : pad + dy + H, pad + dx : pad + dx + W] = (
                    gp_ref[c, pad + dy : pad + dy + H, pad + dx : pad + dx + W] - 2.0 * ad
                )
        if symmetric:
            wsum = wsum + wsum

        w = wsum * normW
        lam = lambda_boundary * kl / (w + 1e-6)        # stop-grad ratio
        loss = kl + lam * w

        g_t = fold_reflect()                            # dL/dt (before λ scale)
        g_t = [g * (lam * normW) for g in g_t]
        if symmetric:
            g_t = [g_t[0], -g_t[0]]
        if double_softmax:
            g_q_window = softmax_vjp(t_planes, g_t)
        else:
            g_q_window = g_t
        g_q = [g - s[c] / (q[c] + 1e-8) for c, g in enumerate(g_q_window)]
        g_x = softmax_vjp(q, g_q)

        # Adam (optax/torch defaults, bias-corrected with step t+1).
        # β^t via exp(t·lnβ): Mosaic has no powf-with-traced-exponent.
        import math as _math

        tt = (t + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(tt * _math.log(b1))
        bc2 = 1.0 - jnp.exp(tt * _math.log(b2))
        for c in range(C):
            g = g_x[c]
            m_new = b1 * m_ref[c, :H, :W] + (1.0 - b1) * g
            v_new = b2 * v_ref[c, :H, :W] + (1.0 - b2) * g * g
            m_ref[c, :H, :W] = m_new
            v_ref[c, :H, :W] = v_new
            upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
            x_ref[c, :H, :W] = x_ref[c, :H, :W] - lr * upd

        return loss_acc + loss

    total = jax.lax.fori_loop(0, num_steps, step, jnp.zeros((), jnp.float32))

    # final mask: softmax(X) channel-1 prob > threshold (ref :759-765)
    xf = [x_ref[c, :H, :W] for c in range(C)]
    qf = softmax_c(xf)
    out_ref[0, :, :] = jnp.zeros(out_ref.shape[1:], jnp.int32)
    out_ref[0, :H, :W] = (qf[1] > threshold).astype(jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[0, 0] = jnp.zeros((), jnp.float32)

    loss_ref[0, 0] += total


def _refine_kernel_v2(
    img_ref,      # [1, 3, Hp, Wa]  reflect-padded image planes
    s_ref,        # [1, C, Ha, Wa]  soft predictions (interior in [:H,:W])
    mask_ref,     # [1, Ha, Wa]     int32 initial mask
    out_ref,      # [1, Ha, Wa]     int32 refined mask
    loss_ref,     # [1, 1]          SMEM: Σ over images of Σ step losses
    x_ref,        # scratch [C, Ha, Wa]      the optimized variable
    m_ref,        # scratch [C, Ha, Wa]      Adam m
    v_ref,        # scratch [C, Ha, Wa]      Adam v
    tp_ref,       # scratch [C, Hp2a, Wp2a]  padded window-input planes
    gp_ref,       # scratch [C, Hp2a, Wp2a]  padded window-gradient planes
    ad_ref,       # scratch [Hqa, Wqa]       zero-ringed aff·diff plane
    *,
    H, W, pad, offsets, inv2sc, spatial_coeff, C, num_steps,
    lr, lambda_boundary, threshold, double_softmax, normW, precompute_aff,
):
    """v2 of the mega-kernel: same math as _refine_kernel, restructured around
    the two costs that BASELINE.md's round-2 measurement left on the table:

    * the color affinities depend only on the image, which is CONSTANT across
      the Adam steps — ``precompute_aff`` computes all K planes once before
      the ``fori_loop`` (they stay live in VMEM) instead of re-evaluating
      K exp()s per step;
    * the window backward's 2·K·C misaligned slice-ACCUMULATES per step
      (each a read+add+write against gp_ref) become register-held
      accumulators: the center term sums the freshly computed ``ad`` values
      directly, and the neighbor term is a shifted pure READ of ``ad`` from a
      zero-ringed scratch plane — exploiting grad(r) = Σ_o 2·ad_o(r)
      − 2·ad_o(r−o), whose second term is a gather, not a scatter. Only the
      thin reflect-fold margins still read-modify-write.
    """
    b1, b2, eps = 0.9, 0.999, 1e-8
    Hp2 = 2 * pad + H
    Wp2 = 2 * pad + W

    mask = mask_ref[0, :H, :W]
    for c in range(C):
        x_ref[c, :H, :W] = (mask == c).astype(jnp.float32)
    m_ref[:, :, :] = jnp.zeros(m_ref.shape, jnp.float32)
    v_ref[:, :, :] = jnp.zeros(v_ref.shape, jnp.float32)
    # zero ring: per-offset writes only ever touch the interior
    ad_ref[:, :] = jnp.zeros(ad_ref.shape, jnp.float32)

    center_img = [img_ref[0, ch, pad : pad + H, pad : pad + W] for ch in range(3)]

    def affinity(dy, dx):
        color = None
        for ch in range(3):
            shifted = img_ref[0, ch, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            d = center_img[ch] - shifted
            color = d * d if color is None else color + d * d
        expo = -color * inv2sc
        if spatial_coeff is not None:
            expo = expo - (dx * dx + dy * dy) * spatial_coeff
        return jnp.exp(expo)

    affs = [affinity(dy, dx) for dy, dx in offsets] if precompute_aff else None

    def softmax_c(planes):
        mx = planes[0]
        for p_ in planes[1:]:
            mx = jnp.maximum(mx, p_)
        es = [jnp.exp(p_ - mx) for p_ in planes]
        tot = es[0]
        for e in es[1:]:
            tot = tot + e
        inv = 1.0 / tot
        return [e * inv for e in es]

    def softmax_vjp(p_planes, g_planes):
        dot = p_planes[0] * g_planes[0]
        for p_, g_ in zip(p_planes[1:], g_planes[1:]):
            dot = dot + p_ * g_
        return [p_ * (g_ - dot) for p_, g_ in zip(p_planes, g_planes)]

    def write_reflect(planes):
        for c in range(C):
            tp_ref[c, pad : pad + H, pad : pad + W] = planes[c]
        for j in range(1, pad + 1):
            for c in range(C):
                tp_ref[c, pad - j, pad : pad + W] = tp_ref[c, pad + j, pad : pad + W]
                tp_ref[c, pad + H - 1 + j, pad : pad + W] = (
                    tp_ref[c, pad + H - 1 - j, pad : pad + W]
                )
        for j in range(1, pad + 1):
            for c in range(C):
                tp_ref[c, 0:Hp2, pad - j] = tp_ref[c, 0:Hp2, pad + j]
                tp_ref[c, 0:Hp2, pad + W - 1 + j] = tp_ref[c, 0:Hp2, pad + W - 1 - j]

    def fold_reflect():
        for j in range(1, pad + 1):
            for c in range(C):
                gp_ref[c, 0:Hp2, pad + j] = gp_ref[c, 0:Hp2, pad + j] + gp_ref[c, 0:Hp2, pad - j]
                gp_ref[c, 0:Hp2, pad + W - 1 - j] = (
                    gp_ref[c, 0:Hp2, pad + W - 1 - j] + gp_ref[c, 0:Hp2, pad + W - 1 + j]
                )
        for j in range(1, pad + 1):
            for c in range(C):
                gp_ref[c, pad + j, pad : pad + W] = (
                    gp_ref[c, pad + j, pad : pad + W] + gp_ref[c, pad - j, pad : pad + W]
                )
                gp_ref[c, pad + H - 1 - j, pad : pad + W] = (
                    gp_ref[c, pad + H - 1 - j, pad : pad + W]
                    + gp_ref[c, pad + H - 1 + j, pad : pad + W]
                )
        return [gp_ref[c, pad : pad + H, pad : pad + W] for c in range(C)]

    def step(t, loss_acc):
        x = [x_ref[c, :H, :W] for c in range(C)]
        q = softmax_c(x)

        s = [s_ref[0, c, :H, :W] for c in range(C)]
        kl = jnp.zeros((), jnp.float32)
        for c in range(C):
            p_log_p = jnp.where(s[c] > 0, s[c] * jnp.log(jnp.where(s[c] > 0, s[c], 1.0)), 0.0)
            kl = kl + jnp.sum(p_log_p - s[c] * jnp.log(q[c] + 1e-8))

        t_planes = softmax_c(q) if double_softmax else q
        write_reflect(t_planes)

        # window sum + both gradient roles in one sweep; the centers come
        # straight from t_planes (values), never re-read from tp_ref
        wsum = jnp.zeros((), jnp.float32)
        g_center = [None] * C
        g_shift = [None] * C
        for k, (dy, dx) in enumerate(offsets):
            aff = affs[k] if precompute_aff else affinity(dy, dx)
            for c in range(C):
                shifted = tp_ref[c, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
                d = t_planes[c] - shifted
                ad = aff * d
                wsum = wsum + jnp.sum(ad * d)
                g_center[c] = ad if g_center[c] is None else g_center[c] + ad
                # neighbor role as a shifted READ: grad_pad(p) −= ad(p−o−pad),
                # ad stored with its interior at (2·pad, 2·pad) inside a zero
                # ring so out-of-interior reads contribute exactly 0
                ad_ref[2 * pad : 2 * pad + H, 2 * pad : 2 * pad + W] = ad
                nb = ad_ref[pad - dy : pad - dy + Hp2, pad - dx : pad - dx + Wp2]
                g_shift[c] = -nb if g_shift[c] is None else g_shift[c] - nb

        w = wsum * normW
        lam = lambda_boundary * kl / (w + 1e-6)        # stop-grad ratio
        loss = kl + lam * w

        for c in range(C):
            gp_ref[c, 0:Hp2, 0:Wp2] = g_shift[c]
        folded = fold_reflect()
        scale = 2.0 * lam * normW
        g_t = [(g_center[c] + folded[c]) * scale for c in range(C)]
        if double_softmax:
            g_q_window = softmax_vjp(t_planes, g_t)
        else:
            g_q_window = g_t
        g_q = [g - s[c] / (q[c] + 1e-8) for c, g in enumerate(g_q_window)]
        g_x = softmax_vjp(q, g_q)

        import math as _math

        tt = (t + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(tt * _math.log(b1))
        bc2 = 1.0 - jnp.exp(tt * _math.log(b2))
        for c in range(C):
            g = g_x[c]
            m_new = b1 * m_ref[c, :H, :W] + (1.0 - b1) * g
            v_new = b2 * v_ref[c, :H, :W] + (1.0 - b2) * g * g
            m_ref[c, :H, :W] = m_new
            v_ref[c, :H, :W] = v_new
            upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
            x_ref[c, :H, :W] = x_ref[c, :H, :W] - lr * upd

        return loss_acc + loss

    total = jax.lax.fori_loop(0, num_steps, step, jnp.zeros((), jnp.float32))

    xf = [x_ref[c, :H, :W] for c in range(C)]
    qf = softmax_c(xf)
    out_ref[0, :, :] = jnp.zeros(out_ref.shape[1:], jnp.int32)
    out_ref[0, :H, :W] = (qf[1] > threshold).astype(jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[0, 0] = jnp.zeros((), jnp.float32)

    loss_ref[0, 0] += total


def refine_vmem_bytes(S_shape, window_size: int, plan: str = "v1") -> int:
    """Per-program VMEM working set of the mega-kernel (inputs + scratch),
    used by train/refine to decide kernel vs XLA fallback for big images.

    plan: "v1"/"v1sym" (round-2 kernel; sym shares its scratch), "v2"
    (shifted-read backward + zero-ringed ad scratch), "v2_aff" (v2 + K
    precomputed affinity planes held live across the Adam loop)."""
    _, H, W, C = S_shape
    pad = window_size // 2
    Ha, Wa = _round_up(H, 8), _round_up(W, 128)
    Hp2a = _round_up(2 * pad + H, 8)
    Wp2a = _round_up(2 * pad + W, 128)
    planes = (
        3 * Hp2a * Wp2a          # image
        + C * Ha * Wa            # S
        + 2 * Ha * Wa            # mask in + mask out (int32)
        + 3 * C * Ha * Wa        # x, m, v
        + 2 * C * Hp2a * Wp2a    # padded t + padded grads
    )
    if plan.startswith("v2"):
        planes += _round_up(H + 4 * pad, 8) * _round_up(W + 4 * pad, 128)  # ad
    if plan == "v2_aff":
        planes += len(_offsets(window_size)) * Ha * Wa  # live affinity planes
    return planes * 4


_VMEM_BUDGET = 13 * 1024 * 1024


def _pick_plan(S_shape, window_size):
    """Plan selection, settled by measurement on the real chip (2026-08-18,
    scripts/bench_refine_plans.py): the v2 shifted-read backward holds
    g_center/g_shift (full padded planes per class) plus the per-offset ad
    values LIVE across the K=24 offset loop, and Mosaic allocates those
    loop-carried values on the kernel's scoped-vmem STACK — 38.6 MiB at 256²
    (17.2 MiB even at 224²) against a 16 MiB scoped limit, so v2/v2_aff fail
    to compile on real TPUs at every production geometry. The declared-scratch
    estimate below cannot see compiler stack usage. v1's slice-accumulates
    write straight to gp_ref scratch and keep the live set tiny; v2 stays
    available explicitly (and interpret-mode parity-tested) as the recorded
    experiment.

    For the production binary case (C==2) "v1sym" runs the v1 structure with
    the class-symmetry reduction (see _refine_kernel): both window planes sum
    to 1, so the whole offset sweep runs once instead of per class."""
    del window_size
    return "v1sym" if S_shape[-1] == 2 else "v1"


@partial(
    jax.jit,
    static_argnames=(
        "lambda_boundary", "threshold", "lr", "num_steps", "sigma_color",
        "sigma_space", "window_size", "loss", "interpret", "plan",
    ),
)
def pallas_refine(
    S, images, masks,
    lambda_boundary=0.1, threshold=0.5, lr=1e-2, num_steps=20,
    sigma_color=0.1, sigma_space=5.0, window_size=5, loss="ncut",
    interpret=False, plan="auto",
):
    """Batched refinement, one VMEM-resident program per image.

    Same contract as train.refine.refine_from_soft_predictions: returns
    (refined uint8 [B,H,W], mean per-image total loss).

    plan: "auto" (default — "v1sym" for binary masks, else "v1"; see
    _pick_plan), or pin "v1" / "v1sym" / "v2" / "v2_aff" explicitly (see
    _refine_kernel_v2 / BASELINE.md for v2's measured negative result)."""
    B, H, W, C = S.shape
    if plan == "auto":
        plan = _pick_plan(S.shape, window_size)
    pad = window_size // 2
    offsets = _offsets(window_size)
    K = len(offsets)
    inv2sc = 1.0 / (2.0 * sigma_color**2)
    if loss == "boundary":
        spatial_coeff = 1.0 / (2.0 * sigma_space**2)
        double_softmax = False
        normW = 1.0 / (H * W * K)
    else:
        spatial_coeff = None
        double_softmax = True
        normW = 1.0 / (H * W * K * C)

    Ha, Wa = _round_up(H, 8), _round_up(W, 128)
    Hp2, Wp2 = 2 * pad + H, 2 * pad + W
    Hp2a, Wp2a = _round_up(Hp2, 8), _round_up(Wp2, 128)

    img = jnp.transpose(images.astype(jnp.float32), (0, 3, 1, 2))
    img_p = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    img_p = jnp.pad(
        img_p, ((0, 0), (0, 0), (0, Hp2a - Hp2), (0, Wp2a - Wp2))
    )
    s_p = jnp.pad(
        jnp.transpose(S.astype(jnp.float32), (0, 3, 1, 2)),
        ((0, 0), (0, 0), (0, Ha - H), (0, Wa - W)),
    )
    mask_p = jnp.pad(
        masks.astype(jnp.int32), ((0, 0), (0, Ha - H), (0, Wa - W))
    )

    scratch_shapes = [
        pltpu.VMEM((C, Ha, Wa), jnp.float32),      # x
        pltpu.VMEM((C, Ha, Wa), jnp.float32),      # m
        pltpu.VMEM((C, Ha, Wa), jnp.float32),      # v
        pltpu.VMEM((C, Hp2a, Wp2a), jnp.float32),  # padded t planes
        pltpu.VMEM((C, Hp2a, Wp2a), jnp.float32),  # padded grads
    ]
    if plan in ("v1", "v1sym"):
        if plan == "v1sym" and C != 2:
            raise ValueError("plan='v1sym' requires C == 2")
        kernel = partial(
            _refine_kernel,
            H=H, W=W, pad=pad, offsets=offsets, inv2sc=inv2sc,
            spatial_coeff=spatial_coeff, C=C, num_steps=num_steps,
            lr=lr, lambda_boundary=lambda_boundary, threshold=threshold,
            double_softmax=double_softmax, normW=normW,
            symmetric=(plan == "v1sym"),
        )
    else:
        kernel = partial(
            _refine_kernel_v2,
            H=H, W=W, pad=pad, offsets=offsets, inv2sc=inv2sc,
            spatial_coeff=spatial_coeff, C=C, num_steps=num_steps,
            lr=lr, lambda_boundary=lambda_boundary, threshold=threshold,
            double_softmax=double_softmax, normW=normW,
            precompute_aff=(plan == "v2_aff"),
        )
        scratch_shapes.append(
            pltpu.VMEM(
                (_round_up(H + 4 * pad, 8), _round_up(W + 4 * pad, 128)),
                jnp.float32,
            )  # zero-ringed ad plane
        )
    out, total = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, Hp2a, Wp2a), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Ha, Wa), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ha, Wa), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Ha, Wa), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Ha, Wa), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(img_p, s_p, mask_p)
    refined = out[:, :H, :W].astype(jnp.uint8)
    return refined, total[0, 0] / B
