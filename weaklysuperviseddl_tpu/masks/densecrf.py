"""On-device dense-CRF mean-field inference.

TPU equivalent of the reference's pydensecrf call
(``apply_dense_crf``, AlternatingDirectionCutLoss.py:183-204: 2-label CRF,
unary from [1−cam, cam], Gaussian sxy=1/compat=2 + bilateral sxy=50/srgb=5/
compat=10, 5 mean-field iterations, argmax).

Message-passing semantics are shared EXACTLY with the C++ native paths
(native/wsdl_native.cpp): symmetric kernel normalization
k'(x,y)=k(x,y)/√(n(x)n(y)), self-included messages m = K'Q (scale-invariant,
so each path's filter may carry an arbitrary constant scale), Potts update
Q ← softmax(−U + Σ_k w_k·m_k). The filters differ only in approximation:

  * Gaussian (small σ_xy): exact truncated separable convolution.
  * Bilateral (σ_xy≈50, σ_rgb≈5), four device backends:
      - "attention" (default): EXACT O(N²) kernel attention
        (ops/pallas_bilateral.py) — the bilateral filter *is* unnormalized
        flash attention with queries = keys = the bilateral features. No
        approximation: it computes the brute-force golden itself (round 3
        found and fixed an MXU bf16-truncation bug that had silently broken
        this on real hardware — see the kernel module). ~58 ms/img at 224²
        reference params ≈ the VPU floor for 6 exact passes (BASELINE.md).
      - "rff": random-Fourier-feature factorization K ≈ ΦΦᵀ
        (ops/pallas_bilateral.rff_basis) — each filter call is two skinny
        matmuls, O(N·D) instead of O(N²). MEASURED NEGATIVE RESULT at
        reference bandwidths (σ_rgb=5 → ±51σ color range): the Monte-Carlo
        noise is absolute per kernel entry while true entries/norms are
        O(1), so norm estimates go negative and the filter is ~90% wrong
        at D=4096 (see ops/pallas_bilateral.py). Kept opt-in as the record
        of why the obvious factorization shortcut fails here.
      - "lattice": sort-based permutohedral lattice (masks/permutohedral.py)
        — the same Adams et al. construction as the C++ host path, hash table
        replaced by a sort + binary-search join. Matches the host lattice to
        1e-4 but its gather-bound structure is slow on TPU; kept as the
        O(N)-scaling option for resolutions where O(N²) stops being free.
      - "grid": bilateral grid (Chen et al.) — multilinear splat into a 5-D
        grid, [1,2,1] blur per axis, multilinear slice. Its 32-corner
        scatter-add splat is the measured bottleneck at reference params.
    The O(N²) brute force (native, exact=True) is the test golden for all.

Everything jits; batch handled by lax.map over images (grids are large).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from weaklysuperviseddl_tpu.masks.permutohedral import (
    coordinate_bound,
    permutohedral_precompute,
    permutohedral_filter,
    _COORD_MAX,
)
from weaklysuperviseddl_tpu.ops.pallas_bilateral import (
    gaussian_filter,
    gaussian_filter_rect,
    gaussian_filter_rff,
    rff_basis,
)


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------

def _gaussian_filter(values, sxy):
    """Truncated separable spatial Gaussian, σ=sxy; values [H,W,C]."""
    radius = max(1, int(3 * sxy))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sxy) ** 2)

    def conv1d(v, axis):
        v = jnp.moveaxis(v, axis, -1)  # [..., N]
        pad = [(0, 0)] * (v.ndim - 1) + [(radius, radius)]
        vp = jnp.pad(v, pad)
        out = jnp.zeros_like(v)
        for i in range(2 * radius + 1):
            out = out + k[i] * jax.lax.dynamic_slice_in_dim(vp, i, v.shape[-1], axis=-1)
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(values, 0), 1)


def _bilateral_precompute(image, sxy, srgb):
    """Iteration-invariant splat/slice geometry: 32-corner multilinear indices
    and weights for the 5-D bilateral grid (σ-sized cells, +1 margin)."""
    H, W = image.shape[0], image.shape[1]
    fy = jnp.arange(H, dtype=jnp.float32)[:, None] / sxy + 1.0
    fx = jnp.arange(W, dtype=jnp.float32)[None, :] / sxy + 1.0
    fy = jnp.broadcast_to(fy, (H, W))
    fx = jnp.broadcast_to(fx, (H, W))
    fc = image / srgb + 1.0                                   # [H,W,3]
    feats = jnp.stack([fy, fx, fc[..., 0], fc[..., 1], fc[..., 2]], axis=-1)

    sizes = (
        int((H - 1) // sxy) + 3,
        int((W - 1) // sxy) + 3,
        int(255.0 // srgb) + 3,
        int(255.0 // srgb) + 3,
        int(255.0 // srgb) + 3,
    )
    strides = []
    total = 1
    for s in reversed(sizes):
        strides.append(total)
        total *= s
    strides = tuple(reversed(strides))

    flat = feats.reshape(-1, 5)
    lo = jnp.floor(flat).astype(jnp.int32)                    # [N,5]
    frac = flat - lo                                          # [N,5]

    idxs, ws = [], []
    for corner in range(32):
        bits = [(corner >> b) & 1 for b in range(5)]
        idx = jnp.zeros(flat.shape[0], jnp.int32)
        w = jnp.ones(flat.shape[0], jnp.float32)
        for d in range(5):
            cd = lo[:, d] + bits[d]
            idx = idx + cd * strides[d]
            w = w * jnp.where(bits[d] == 1, frac[:, d], 1.0 - frac[:, d])
        idxs.append(idx)
        ws.append(w)
    return {
        "idx": jnp.stack(idxs), "w": jnp.stack(ws),           # [32,N]
        "sizes": sizes, "total": total, "H": H, "W": W,
    }


def _bilateral_grid_filter(values, pre):
    """Bilateral-grid Gaussian filter with precomputed geometry.

    values [H,W,C]. Returns [H,W,C] ≈ s·K(values) for an arbitrary constant s
    (cancelled by the symmetric normalization).
    """
    H, W, C = values.shape
    sizes, total = pre["sizes"], pre["total"]
    vals = values.reshape(-1, C)

    # splat: 2^5 corners, multilinear weights
    grid = jnp.zeros((total, C), jnp.float32)
    for corner in range(32):
        grid = grid.at[pre["idx"][corner]].add(vals * pre["w"][corner][:, None])

    # blur [1,2,1] along each grid axis
    g = grid.reshape(sizes + (C,))
    for d in range(5):
        up = jnp.roll(g, 1, axis=d)
        down = jnp.roll(g, -1, axis=d)
        # zero the wrapped rows (roll is circular; grid margins are empty so
        # wraps only matter if splat mass sits at the border — margins prevent it)
        g = 2.0 * g + up + down
    grid = g.reshape(total, C)

    # slice
    out = jnp.zeros((vals.shape[0], C), jnp.float32)
    for corner in range(32):
        out = out + grid[pre["idx"][corner]] * pre["w"][corner][:, None]
    return out.reshape(H, W, C)


def _inv_sqrt_norm(filter_fn, shape_hw):
    """1/√(K⊗1) — constant across mean-field iterations, compute once."""
    ones = jnp.ones(shape_hw + (1,), jnp.float32)
    n = jnp.clip(filter_fn(ones), 1e-20, None)
    return jax.lax.rsqrt(n)


def _sym_message(filter_fn, Q, inv_sqrt):
    """Symmetric-normalized self-included message m = (1/√n)·K(Q/√n)."""
    return filter_fn(Q * inv_sqrt) * inv_sqrt


# ---------------------------------------------------------------------------
# mean field
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=(
        "gauss_sxy", "gauss_compat", "bilat_sxy", "bilat_srgb", "bilat_compat",
        "n_iters", "bilat_backend", "rff_dim", "key_stride",
    ),
)
def densecrf_inference(
    probs: jnp.ndarray,     # [B,H,W,L] initial label probabilities
    images: jnp.ndarray,    # [B,H,W,3] uint8 or float in [0,255]
    gauss_sxy: float = 1.0,
    gauss_compat: float = 2.0,
    bilat_sxy: float = 50.0,
    bilat_srgb: float = 5.0,
    bilat_compat: float = 10.0,
    n_iters: int = 5,
    bilat_backend: str = "attention",
    rff_dim: int = 4096,
    key_stride: int = 2,
):
    """Mean-field marginals [B,H,W,L].

    ``bilat_backend="subsampled"``: the round-5 fast approximation — full-
    resolution QUERIES against a stride-``key_stride`` subgrid of KEYS
    through the same exact attention kernel (ops/pallas_bilateral.
    gaussian_filter_rect). The bilateral sum Σ_j k(f_i,f_j)·v_j is a grid
    quadrature of a σ_xy=50-smooth spatial integrand, so a stride-2 subgrid
    estimates it with small relative error while cutting the dominant N²
    exponent work by stride² (4×). The uniform 1/stride² scale cancels in
    the symmetric normalization k/√(n_q·n_k) — norms are computed through
    the SAME subsampled operator — so no rescaling appears anywhere.
    Quality vs the exact backend is measured at reference params in
    scripts/bench_crf.py (mask agreement bar: BASELINE.md)."""
    images = images.astype(jnp.float32)
    if bilat_backend not in ("attention", "subsampled", "lattice", "grid",
                             "rff"):
        raise ValueError(f"unknown bilat_backend {bilat_backend!r}")
    H, W = probs.shape[1:3]
    if (bilat_backend in ("attention", "subsampled")
            and jax.default_backend() != "tpu" and H * W > 64 * 64):
        # the exact O(N²) path is an MXU design: off-TPU its XLA fallback
        # would materialize an N×N kernel matrix (~10 GB at 224²). Keep exact
        # attention for small (test-scale) images; route production sizes to
        # the O(N) grid approximation on CPU/GPU hosts.
        bilat_backend = "grid"
    if bilat_backend == "lattice" and bilat_compat:
        # static coordinate-range check for the 12-bit key packing
        bound = coordinate_bound(
            [(W - 1) / bilat_sxy, (H - 1) / bilat_sxy] + [255.0 / bilat_srgb] * 3
        )
        if bound > _COORD_MAX:
            raise ValueError(
                f"lattice coordinates may exceed the packed-key range "
                f"(bound {bound} > {_COORD_MAX}); use bilat_backend='grid' "
                f"or larger sigmas"
            )

    def one(args):
        p, img = args
        unary = -jnp.log(jnp.clip(p, 1e-8, 1.0))
        hw = p.shape[:-1]

        def gauss(v):
            return _gaussian_filter(v, gauss_sxy)

        feats = None
        feats_k = None
        pre = None
        if bilat_compat:
            if bilat_backend == "grid":
                pre = _bilateral_precompute(img, bilat_sxy, bilat_srgb)
            else:
                yy = jnp.arange(hw[0], dtype=jnp.float32)[:, None] / bilat_sxy
                xx = jnp.arange(hw[1], dtype=jnp.float32)[None, :] / bilat_sxy
                feats_hw = jnp.stack(
                    [jnp.broadcast_to(xx, hw), jnp.broadcast_to(yy, hw)]
                    + [img[..., c] / bilat_srgb for c in range(3)],
                    axis=-1,
                )                                             # [H,W,5]
                feats = feats_hw.reshape(-1, 5)
                if bilat_backend == "lattice":
                    pre = permutohedral_precompute(feats)
                elif bilat_backend == "rff":
                    pre = rff_basis(feats, dim=rff_dim)
                elif bilat_backend == "subsampled":
                    feats_k = feats_hw[::key_stride, ::key_stride].reshape(-1, 5)

        def bilat(v):
            C = v.shape[-1]
            if bilat_backend == "grid":
                return _bilateral_grid_filter(v, pre)
            if bilat_backend == "lattice":
                return permutohedral_filter(v.reshape(-1, C), pre).reshape(v.shape)
            if bilat_backend == "rff":
                return gaussian_filter_rff(pre, v.reshape(-1, C)).reshape(v.shape)
            if bilat_backend == "subsampled":
                # full-res queries × stride-s key subgrid; the uniform
                # 1/stride² quadrature scale cancels in _sym_message's
                # symmetric normalization (norms use this same operator)
                vk = v[::key_stride, ::key_stride].reshape(-1, C)
                return gaussian_filter_rect(feats, feats_k, vk).reshape(v.shape)
            return gaussian_filter(feats, v.reshape(-1, C)).reshape(v.shape)

        # kernel norms are iteration-invariant: filtering ones 2× here instead
        # of 2× per iteration halves the CRF cost at 5 iterations
        gauss_inv = _inv_sqrt_norm(gauss, hw) if gauss_compat else None
        bilat_inv = _inv_sqrt_norm(bilat, hw) if bilat_compat else None

        def body(Q, _):
            logits = -unary
            if gauss_compat:
                logits = logits + gauss_compat * _sym_message(gauss, Q, gauss_inv)
            if bilat_compat:
                logits = logits + bilat_compat * _sym_message(bilat, Q, bilat_inv)
            Q = jax.nn.softmax(logits, axis=-1)
            return Q, None

        Q0 = jax.nn.softmax(-unary, axis=-1)
        Q, _ = jax.lax.scan(body, Q0, None, length=n_iters)
        return Q

    return jax.lax.map(one, (probs, images))


def apply_dense_crf(images, cams, n_iters: int = 5, **kwargs):
    """Reference-surface helper (AlternatingDirectionCutLoss.py:183-204):
    cam [B,H,W] in [0,1] → refined binary mask [B,H,W] uint8 via a 2-label CRF
    with unary softmax([1−cam, cam])."""
    probs = jnp.stack([1.0 - cams, cams], axis=-1)
    probs = jnp.clip(probs, 1e-8, 1.0)
    images = images.astype(jnp.float32)
    # [0,1] tensors → [0,255] color space; traced-value-safe (this helper runs
    # inside the jit'd pseudo-mask sweep when use_crf is on, masks/pseudo.py)
    images = jnp.where(jnp.max(images) <= 1.5, images * 255.0, images)
    Q = densecrf_inference(probs, images, n_iters=n_iters, **kwargs)
    return jnp.argmax(Q, axis=-1).astype(jnp.uint8)
