"""Exact high-dimensional Gaussian filtering as MXU kernel-attention.

The dense-CRF bilateral message pass needs, per mean-field iteration,

    out_i = Σ_j exp(-½‖f_i - f_j‖²) · v_j            (f ∈ R^d, v ∈ R^C)

i.e. *unnormalized kernel attention* with queries = keys = the bilateral
features. The reference reaches this through pydensecrf's permutohedral
lattice (AlternatingDirectionCutLoss.py:183-204) — an approximation invented
to avoid O(N²) on CPUs. On TPU the economics invert: at 224² (N = 50k,
N² = 2.5e9 kernel entries) the exact computation is a few dense matmuls
(~0.7 TFLOP per filter call) that the MXU eats in milliseconds, while the
lattice's sparse structure (hash joins, gathers) is measured 100× slower on
this hardware (see masks/permutohedral.py and BASELINE.md). So the exact
flash-style kernel is the production TPU path; it is also bit-faithful to the
O(N²) brute-force golden rather than an approximation of it.

Shape of the kernel: exponent(i,j) = q_i·k_j - ½‖f_i‖² - ½‖f_j‖² ≤ 0 over
augmented features (aug_q = [f, -½‖f‖², 1], aug_k = [f, 1, -½‖f‖²]); since
the exponent is ≤ 0 no running-max is needed (unlike softmax attention) and
accumulation over key blocks is a plain sum. exp ≤ 1 and values are
probability-scaled, so the value matmul runs in bf16 on the MXU with fp32
accumulation.

The exponent CANNOT be a naive MXU matmul: Mosaic's default fp32 dot
truncates inputs to bf16, which puts O(30) absolute error into an exponent
carrying ‖f‖² ≈ 7e3 terms and turns exp() into ~1e13 garbage (shipped that
way in rounds 1-2; invisible to CPU tests, which run interpret mode / true
fp32 XLA gemms). Two correct plans, both shipped and fp64-pinned on device:

  * plan="mxu" (default): ONE default-precision bf16 MXU matmul over
    split-bf16 augmented columns (_augment_split) — each operand is Dekker-
    split into 3 exactly-representable bf16 components and the 6 column
    pairs with non-negligible products are laid out explicitly, so the fp32
    accumulator reconstructs the fp32 exponent (bf16×bf16 products are
    exact in fp32). Max exponent error 1.4e-4 — BETTER than fp32 FMAs.
    7.4 ms/filter-call at N=224² ≈ 88% of the structural MXU floor (every
    kernel entry is produced by one matmul touch and consumed by another:
    2×N²×128 MACs ≈ 6.5 ms at the measured bf16 rate). exp() is free — a
    no-exp ablation times identically (it overlaps the MXU).
  * plan="vpu": d+2 broadcast FMAs in true fp32 on the VPU (the round-3
    fix). VPU-bound at ~8.5 ms/call; kept as the measured alternative.
    Dim limits: mxu takes d ≤ 20 (6d+6 split columns in one lane tile),
    vpu d ≤ 6 (_DA=8 augmentation); gaussian_filter routes d > 20 to the
    exact XLA formulation.

Full 5-iteration CRF at 224² reference params: ~45 ms/img (6 filter calls ×
7.4 ms + sub-ms gauss/softmax updates) — was ~51 ms with plan="vpu".
Levers measured and kept: padding mask folded into the augmentation (padded
keys carry sq = -1e30 so exp underflows to exactly 0), zero pad dims skipped
in the FMA loop. Levers measured and rejected: precision=HIGHEST MXU
exponent (3× slower — bf16x6 on a K=8-padded-to-128 matmul), bf16/exp2 exp
variants (exp is already overlapped; no wall-clock change), K=64 column
packing and CP<128 value lanes (MXU pads to 128 anyway), larger key blocks
(VMEM pressure).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DA = 8         # augmented feature dim, padded to the fp32 sublane minimum
# Block shapes swept on v5e at N=224² (round 3, pre-precision-fix numbers;
# relative ordering unchanged): 256×512 = 9.1 ms/call, 512×1024 = 7.0,
# 512×2048 best (1024×1024 ties), 512×4096 regresses (VMEM pressure breaks
# double buffering).
_BQ = 512       # query rows per program
_BK = 2048      # key rows per program
_CP = 128       # value channels padded to one MXU lane tile


def _augment(feats):
    """[N, d] → query/key augmentations [N, _DA] with q·kᵀ = -½‖f_i-f_j‖²."""
    N, d = feats.shape
    if d > _DA - 2:
        raise ValueError(f"feature dim {d} > {_DA - 2}")
    sq = -0.5 * jnp.sum(feats * feats, axis=1, keepdims=True)
    pad = jnp.zeros((N, _DA - 2 - d), feats.dtype)
    ones = jnp.ones((N, 1), feats.dtype)
    aug_q = jnp.concatenate([feats, pad, sq, ones], axis=1)
    aug_k = jnp.concatenate([feats, pad, ones, sq], axis=1)
    return aug_q, aug_k


_SPLIT_PAIRS = ((0, 0), (0, 1), (1, 0), (0, 2), (2, 0), (1, 1))
_KSPLIT = 128   # split-augmented column count padded to one MXU lane tile


def _round_bf16(x):
    # NOT astype(bf16).astype(f32): XLA's algebraic simplifier elides
    # convert round-trips under fusion, silently skipping the rounding —
    # measured on v5e as O(30) exponent error (host replay of the device
    # columns showed the components were never rounded). reduce_precision
    # is the guaranteed-rounding primitive.
    return jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)


def _split3(x):
    """Dekker-style 3-component bf16 split: x ≈ x1+x2+x3 with exactly
    representable components (|x2| ≤ 2⁻⁹|x|, |x3| ≤ 2⁻¹⁸|x|)."""
    x1 = _round_bf16(x)
    x2 = _round_bf16(x - x1)
    x3 = x - x1 - x2
    return (x1.astype(jnp.bfloat16), x2.astype(jnp.bfloat16),
            x3.astype(jnp.bfloat16))

def _augment_split(feats):
    """[N, d] → bf16 split-augmented (Qs [N, _KSPLIT], Ks [N, _KSPLIT]) such
    that one default-precision bf16 MXU matmul Qs·Ksᵀ reproduces the fp32
    exponent -½‖f_i-f_j‖² to ~1e-4 absolute.

    Encoding: each feature dim contributes the 6 column-pairs (a,b) of its
    3-component splits with a+b ≤ 3 or (a,b)=(2,2) — bf16×bf16 products are
    exact in the MXU's fp32 accumulator, so the only error is the dropped
    (2,3)/(3,2)/(3,3) cross terms, ≲2⁻²⁷ relative per dim. The -½‖f‖² terms
    (magnitude ~7e3 at reference bilateral scales, the terms whose bf16
    rounding broke the rounds-1/2 kernel) pair their 3 components against an
    exactly-representable ones column. Measured vs fp64: max exponent error
    1.4e-4 — BETTER than the VPU fp32 FMA path's 2.4e-4.
    """
    N, d = feats.shape
    ncols = 6 * d + 6
    if ncols > _KSPLIT:
        raise ValueError(f"feature dim {d} needs {ncols} > {_KSPLIT} columns")
    f32 = feats.astype(jnp.float32)
    comps = _split3(f32)                                  # 3 × [N, d]
    sq = -0.5 * jnp.sum(f32 * f32, axis=1, keepdims=True)
    sq_c = _split3(sq)                                    # 3 × [N, 1]
    ones = jnp.ones((N, 1), jnp.bfloat16)
    qcols, kcols = [], []
    for a, b in _SPLIT_PAIRS:
        qcols.append(comps[a])                            # [N, d] each
        kcols.append(comps[b])
    qcols += [sq_c[0], sq_c[1], sq_c[2], ones, ones, ones]
    kcols += [ones, ones, ones, sq_c[0], sq_c[1], sq_c[2]]
    pad = jnp.zeros((N, _KSPLIT - ncols), jnp.bfloat16)
    qs = jnp.concatenate(qcols + [pad], axis=1)
    ks = jnp.concatenate(kcols + [pad], axis=1)
    return qs, ks


def _kernel_mxu(qs_ref, kts_ref, v_ref, o_ref):
    """Exponent as ONE bf16 MXU matmul over the split-augmented columns.
    The VPU then only pays for exp(); measured against the FMA kernel in
    BASELINE.md (round 3, 'split-bf16 MXU exponent')."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    expo = jnp.dot(qs_ref[:], kts_ref[:], preferred_element_type=jnp.float32)
    e = jnp.exp(expo)
    o_ref[:] += jnp.dot(
        e.astype(jnp.bfloat16), v_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _make_kernel(dims):
    """Kernel over the `dims` active augmented columns (static)."""

    def _kernel(q_ref, kt_ref, v_ref, o_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        # exponent block [BQ, BK], accumulated on the VPU as broadcast FMAs.
        # NOT an MXU dot: Mosaic's default fp32 matmul truncates inputs to
        # bf16, and the augmented features carry ‖f‖² ≈ 7e3 terms whose bf16
        # rounding puts O(30) absolute error in an exponent that should be
        # ≤ 0 — exp() of that is ~1e13 garbage (measured on v5e; round-1/2
        # shipped that bug and no CPU test could see it — interpret mode is
        # exact fp32). precision=HIGHEST fixes it but costs 3× (bf16x6 passes
        # on a K=8 matmul padded to K=128); the VPU form is exact fp32 AND 3×
        # faster than even the wrong default (38.6 vs 119.8 ms/call at
        # N=224² incl. dispatch) — it overlaps with the value matmul instead
        # of serializing the MXU. Padded key rows carry sq = -1e30 in the
        # augmentation, so exp() underflows to exactly 0 with no mask here.
        expo = q_ref[:, dims[0]][:, None] * kt_ref[dims[0], :][None, :]
        for d in dims[1:]:
            expo += q_ref[:, d][:, None] * kt_ref[d, :][None, :]
        # (a bf16 exp measured identical end-to-end error — the bf16 value
        # matmul dominates — but no wall-clock win, so exp stays fp32)
        e = jnp.exp(expo)
        # value matmul in bf16 (exp ≤ 1, values probability-scaled), fp32 acc
        o_ref[:] += jnp.dot(
            e.astype(jnp.bfloat16), v_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret", "plan"))
def gaussian_filter_cross(feats_q, feats_k, values, interpret: bool = False,
                          plan: str = "mxu"):
    """RECTANGULAR exact Gaussian-kernel filter:
    out_i = Σ_j exp(-½‖fq_i - fk_j‖²)·v_j over feats_q [Nq,d], feats_k
    [Nk,d], values [Nk,C] → [Nq,C]. With feats_q is feats_k this is the
    square filter (gaussian_filter_pallas delegates here); with feats_k a
    strided subsample of the pixel grid it is the primitive of the CRF's
    "subsampled" backend (masks/densecrf.py): Nq·Nk exponent entries instead
    of Nq², an s²× MXU-work cut at key stride s."""
    Nq, d = feats_q.shape
    Nk, C = values.shape
    if C > _CP:
        raise ValueError(f"C={C} > {_CP}")
    npad_q = (-Nq) % _BQ
    npad_k = (-Nk) % _BK
    v = jnp.pad(values.astype(jnp.float32), ((0, npad_k), (0, _CP - C)))
    nq, nk = (Nq + npad_q) // _BQ, (Nk + npad_k) // _BK

    if plan == "mxu":
        qs, _ = _augment_split(feats_q)
        _, ks = _augment_split(feats_k)
        qs = jnp.pad(qs, ((0, npad_q), (0, 0)))
        # padded key rows: -1e30 in the first sq-component column (paired
        # with the q-side exact ones) → exponent -1e30, exp() exactly 0
        kpad = (jnp.zeros((npad_k, _KSPLIT), jnp.bfloat16)
                .at[:, 6 * d + 3].set(-1e30))
        kt = jnp.concatenate([ks, kpad], axis=0).T         # [_KSPLIT, Nk]
        kernel, aug_q, kdim = _kernel_mxu, qs, _KSPLIT
    else:
        aug_q, _ = _augment(feats_q.astype(jnp.float32))
        _, aug_k = _augment(feats_k.astype(jnp.float32))
        aug_q = jnp.pad(aug_q, ((0, npad_q), (0, 0)))
        # padded key rows get sq = -1e30 (last column): the exponent they
        # induce is -1e30·1 and exp() underflows to exactly 0, so the kernel
        # needs no column mask
        kpad = jnp.zeros((npad_k, _DA), jnp.float32).at[:, _DA - 1].set(-1e30)
        kt = jnp.concatenate([aug_k, kpad], axis=0).T      # [_DA, Nk]
        # active augmented columns: d features + [ones, sq] — the zero pad
        # columns between them carry nothing, skip their FMAs
        dims = tuple(range(d)) + (_DA - 2, _DA - 1)
        kernel, kdim = _make_kernel(dims), _DA

    out = pl.pallas_call(
        kernel,
        grid=(nq, nk),
        in_specs=[
            pl.BlockSpec((_BQ, kdim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kdim, _BK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BK, _CP), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BQ, _CP), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nq + npad_q, _CP), jnp.float32),
        interpret=interpret,
    )(aug_q, kt, v)
    return out[:Nq, :C]


@functools.partial(jax.jit, static_argnames=("interpret", "plan"))
def gaussian_filter_pallas(feats, values, interpret: bool = False,
                           plan: str = "mxu"):
    """Exact Gaussian-kernel filter: feats [N,d], values [N,C] → [N,C].

    plan="mxu" (default, d ≤ 20): exponent as one bf16 MXU matmul over
    split-bf16 augmented columns (_augment_split) — more accurate than the
    fp32 VPU FMA form AND ~15% faster (exp overlaps the MXU; BASELINE.md).
    plan="vpu" (d ≤ 6): the round-3 fp32 broadcast-FMA exponent, kept as
    the measured alternative. For d > 20 use gaussian_filter_xla.
    """
    return gaussian_filter_cross(feats, feats, values, interpret=interpret,
                                 plan=plan)


@jax.jit
def gaussian_filter_xla_cross(feats_q, feats_k, values):
    """Rectangular reference/fallback path (identical math, fp32 throughout).

    The exponent matmul must run at HIGHEST precision: it carries ‖f‖² ≈ 1e3
    terms whose bf16-scale rounding (XLA's default-precision gemm lowers to a
    reduced-precision kernel on both TPU MXU and oneDNN/AMX CPU backends)
    perturbs the exponent by O(10) — and exp() of that is garbage. Measured
    on this host: default precision gave exponent error +15.4 where a true
    fp32 gemm gives 2.4e-4.
    """
    aug_q, _ = _augment(feats_q.astype(jnp.float32))
    _, aug_k = _augment(feats_k.astype(jnp.float32))
    kernel = jnp.exp(
        jnp.dot(aug_q, aug_k.T, precision=jax.lax.Precision.HIGHEST)
    )
    return jnp.dot(
        kernel, values.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
    )


@jax.jit
def gaussian_filter_xla(feats, values):
    """Square reference/fallback path — see gaussian_filter_xla_cross."""
    return gaussian_filter_xla_cross(feats, feats, values)


# ---------------------------------------------------------------------------
# Random-Fourier-feature factorization: K ≈ Φ Φᵀ, filter in O(N·D)
# ---------------------------------------------------------------------------
#
# Bochner's theorem for the Gaussian kernel: exp(-½‖x-y‖²) =
# E_{w~N(0,I), b~U[0,2π)}[2·cos(w·x+b)·cos(w·y+b)], so with
# Φ = √(2/D)·cos(F·W + b)  (F = [N,d] features, W = [d,D] fixed draws)
# the filter K·v ≈ Φ·(Φᵀ·v): two skinny matmuls instead of the N×N kernel.
#
# MEASURED NEGATIVE RESULT at reference CRF parameters — kept opt-in, not
# wired as a production path. The estimate is unbiased with ~√(2/D) stderr
# per kernel ENTRY in absolute terms, but the reference bilateral kernel
# (σ_rgb=5 over a 0-255 color range → features spanning ±51σ) is so narrow
# that most true entries — and many per-pixel norms K·1 — are O(1) while the
# filter sums N of those noisy entries: measured against an fp64 golden at
# N=48² the factorized filter's max relative error is 0.93 at D=4096 and
# 0.69 at D=8192, with per-pixel norm estimates going NEGATIVE (true min
# 1.0, estimated min −1.7 at D=4096) — which the symmetric normalization
# 1/√n turns into garbage. Closing the gap needs D ≈ N, at which point the
# two skinny matmuls cost what the exact kernel does. The exact attention
# path at ~58 ms/img (BASELINE.md) therefore stays the production backend;
# this factorization is retained as the measured record of why the obvious
# O(N·D) shortcut does not work at these bandwidths.

_RFF_SEED = 7


@functools.partial(jax.jit, static_argnames=("dim",))
def rff_basis(feats, dim: int = 4096):
    """Fourier features Φ [N, dim] (bf16) for σ-scaled bilateral feats [N,d]."""
    d = feats.shape[1]
    kw, kb = jax.random.split(jax.random.PRNGKey(_RFF_SEED))
    W = jax.random.normal(kw, (d, dim), jnp.float32)
    b = jax.random.uniform(kb, (dim,), jnp.float32, 0.0, 2.0 * jnp.pi)
    # HIGHEST precision: feats carry entries up to ~255/σ_rgb ≈ 51, so a
    # reduced-precision gemm puts O(0.1 rad) phase error inside the cos
    proj = (
        jnp.dot(feats.astype(jnp.float32), W, precision=jax.lax.Precision.HIGHEST)
        + b
    )
    # cos ∈ [-1,1] and the √(2/D) scale are well inside bf16 range; the
    # matmuls accumulate in fp32 (preferred_element_type below)
    return (jnp.cos(proj) * jnp.sqrt(2.0 / dim)).astype(jnp.bfloat16)


@jax.jit
def gaussian_filter_rff(phi, values):
    """Factorized Gaussian filter: Φ·(Φᵀ·v). phi [N,D] bf16, values [N,C]."""
    coeff = jnp.dot(
        phi.T, values.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    return jnp.dot(
        phi, coeff.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )


def gaussian_filter(feats, values, plan: str = "auto"):
    """Dispatch: Pallas on TPU (mxu plan up to d=20, the split-column limit;
    the vpu plan's FMA loop caps at d=6), exact XLA everywhere else —
    including d > 20 on TPU, where neither kernel plan applies."""
    if jax.default_backend() == "tpu" and (
        plan != "auto" or 6 * feats.shape[1] + 6 <= _KSPLIT
    ):
        if plan == "auto":
            plan = "mxu"
        return gaussian_filter_pallas(feats, values, plan=plan)
    return gaussian_filter_xla(feats, values)


def gaussian_filter_rect(feats_q, feats_k, values, plan: str = "auto"):
    """Rectangular dispatch twin of gaussian_filter (same routing rules)."""
    if jax.default_backend() == "tpu" and (
        plan != "auto" or 6 * feats_q.shape[1] + 6 <= _KSPLIT
    ):
        if plan == "auto":
            plan = "mxu"
        return gaussian_filter_cross(feats_q, feats_k, values, plan=plan)
    return gaussian_filter_xla_cross(feats_q, feats_k, values)
