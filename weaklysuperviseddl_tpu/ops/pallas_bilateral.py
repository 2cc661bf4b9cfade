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

Shape of the kernel: exponent(i,j) = q_i·k_j - ½‖f_i‖² - ½‖f_j‖² ≤ 0, done as
one augmented matmul (aug_q = [f, -½‖f‖², 1], aug_k = [f, 1, -½‖f‖²]); since
the exponent is ≤ 0 no running-max is needed (unlike softmax attention) and
accumulation over key blocks is a plain sum. exp ≤ 1 and values are
probability-scaled, so the second (dominant) matmul runs in bf16 with fp32
accumulation; the exponent matmul stays fp32 (it carries ‖f‖² ≈ 1e3 terms
where bf16's 8-bit mantissa would corrupt the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DA = 8         # augmented feature dim, padded to the fp32 sublane minimum
# Block shapes swept on v5e at N=224² (round 3): 256×512 = 9.1 ms/call,
# 512×1024 = 7.0, 512×2048 = 6.7 (best; 1024×1024 ties), 512×4096 regresses
# (VMEM pressure breaks double buffering). The win is per-program overhead
# amortization — exp is only ~2.5 ms of the call, so a bf16 exp variant
# bought nothing (measured 0% at 6.8e-2 relative error; rejected).
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


def _kernel(nk_ref, q_ref, kt_ref, v_ref, o_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # exponent block [BQ, BK], fp32 on the MXU
    expo = jnp.dot(q_ref[:], kt_ref[:], preferred_element_type=jnp.float32)
    # mask padded key rows (their exponent column must contribute exactly 0)
    col = j * _BK + jax.lax.broadcasted_iota(jnp.int32, expo.shape, 1)
    e = jnp.where(col < nk_ref[0], jnp.exp(expo), 0.0)
    # value matmul in bf16 (exp ≤ 1, values probability-scaled), fp32 acc
    o_ref[:] += jnp.dot(
        e.astype(jnp.bfloat16), v_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def gaussian_filter_pallas(feats, values, interpret: bool = False):
    """Exact Gaussian-kernel filter: feats [N,d], values [N,C] → [N,C]."""
    N, C = values.shape
    if C > _CP:
        raise ValueError(f"C={C} > {_CP}")
    npad_q = (-N) % _BQ
    npad_k = (-N) % _BK
    aug_q, aug_k = _augment(feats.astype(jnp.float32))
    aug_q = jnp.pad(aug_q, ((0, npad_q), (0, 0)))
    kt = jnp.pad(aug_k, ((0, npad_k), (0, 0))).T          # [_DA, Nk]
    v = jnp.pad(values.astype(jnp.float32), ((0, npad_k), (0, _CP - C)))
    nq, nk = (N + npad_q) // _BQ, (N + npad_k) // _BK

    out = pl.pallas_call(
        _kernel,
        grid=(nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BQ, _DA), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DA, _BK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BK, _CP), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BQ, _CP), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + npad_q, _CP), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([N], jnp.int32), aug_q, kt, v)
    return out[:N, :C]


@jax.jit
def gaussian_filter_xla(feats, values):
    """Reference/fallback path (identical math, fp32 throughout)."""
    aug_q, aug_k = _augment(feats.astype(jnp.float32))
    kernel = jnp.exp(aug_q @ aug_k.T)
    return kernel @ values.astype(jnp.float32)


def gaussian_filter(feats, values):
    """Dispatch: Pallas on TPU, plain XLA elsewhere (CPU tests, tiny N)."""
    if jax.default_backend() == "tpu":
        return gaussian_filter_pallas(feats, values)
    return gaussian_filter_xla(feats, values)
