"""Dense-CRF parity: C++ brute-force golden (the mathematical definition) vs
C++ permutohedral lattice vs the JAX bilateral-grid device path, plus the
native connected-components twin vs scipy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import ndimage

from weaklysuperviseddl_tpu import native
from weaklysuperviseddl_tpu.masks.densecrf import apply_dense_crf, densecrf_inference


def make_case(seed=0, H=24, W=24, noise=0.2):
    """Two-color image with a noisy CAM roughly matching the left half."""
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W, 3), np.uint8)
    img[:, : W // 2] = [200, 60, 60]
    img[:, W // 2 :] = [40, 40, 180]
    img = np.clip(img.astype(np.int32) + rng.integers(-15, 15, img.shape), 0, 255).astype(np.uint8)

    cam = np.zeros((H, W), np.float32)
    cam[:, : W // 2] = 0.75
    cam[:, W // 2 :] = 0.25
    cam += rng.uniform(-noise, noise, cam.shape).astype(np.float32)
    cam = np.clip(cam, 0.02, 0.98)
    probs = np.stack([1 - cam, cam], axis=-1)
    unary = -np.log(probs)
    return img, cam, probs, unary


PARAMS = dict(gauss_sxy=1.0, gauss_compat=2.0, bilat_sxy=6.0, bilat_srgb=20.0,
              bilat_compat=10.0, n_iters=5)


def test_lattice_matches_brute_force():
    img, _, _, unary = make_case()
    q_exact = native.densecrf(unary, img, exact=True, **{k: v for k, v in PARAMS.items()
                                                         if k != "n_iters"}, n_iters=5)
    q_lattice = native.densecrf(unary, img, exact=False, **{k: v for k, v in PARAMS.items()
                                                            if k != "n_iters"}, n_iters=5)
    mae = np.abs(q_exact - q_lattice).mean()
    agree = (q_exact.argmax(-1) == q_lattice.argmax(-1)).mean()
    assert mae < 0.02, mae
    assert agree > 0.99, agree


def test_jax_grid_matches_brute_force():
    img, _, probs, unary = make_case(1)
    q_exact = native.densecrf(unary, img, exact=True, **PARAMS)
    q_jax = np.asarray(densecrf_inference(
        jnp.asarray(probs)[None], jnp.asarray(img.astype(np.float32))[None],
        bilat_backend="grid", **PARAMS))[0]
    mae = np.abs(q_exact - q_jax).mean()
    agree = (q_exact.argmax(-1) == q_jax.argmax(-1)).mean()
    assert mae < 0.05, mae
    assert agree > 0.97, agree


def test_jax_attention_matches_brute_force():
    """Default device bilateral backend: exact MXU kernel attention. This is
    the same O(N²) math as the golden, so tolerance is float-level, not the
    approximation tolerance the lattice/grid backends need."""
    img, _, probs, unary = make_case(1)
    q_exact = native.densecrf(unary, img, exact=True, **PARAMS)
    q_jax = np.asarray(densecrf_inference(
        jnp.asarray(probs)[None], jnp.asarray(img.astype(np.float32))[None],
        bilat_backend="attention", **PARAMS))[0]
    mae = np.abs(q_exact - q_jax).mean()
    agree = (q_exact.argmax(-1) == q_jax.argmax(-1)).mean()
    assert mae < 1e-4, mae
    assert agree == 1.0, agree


def test_cross_filter_rectangular_matches_brute_force():
    """gaussian_filter_xla_cross / gaussian_filter_cross (interpret) with
    Nq ≠ Nk must equal the literal Σ_j exp(-½‖fq_i-fk_j‖²)·v_j — the
    primitive under the CRF 'subsampled' backend."""
    from weaklysuperviseddl_tpu.ops.pallas_bilateral import (
        gaussian_filter_cross, gaussian_filter_xla_cross)

    rng = np.random.default_rng(7)
    Nq, Nk = 531, 187  # ragged on both sides
    fq = rng.uniform(0, 20, (Nq, 5)).astype(np.float32)
    fk = rng.uniform(0, 20, (Nk, 5)).astype(np.float32)
    v = rng.uniform(size=(Nk, 2)).astype(np.float32)
    d2 = ((fq[:, None, :] - fk[None, :, :]) ** 2).sum(-1)
    want = np.exp(-0.5 * d2.astype(np.float64)) @ v.astype(np.float64)

    got_xla = np.asarray(gaussian_filter_xla_cross(
        jnp.asarray(fq), jnp.asarray(fk), jnp.asarray(v)))
    np.testing.assert_allclose(got_xla, want, rtol=1e-4, atol=1e-5)

    for plan in ("vpu", "mxu"):
        got = np.asarray(gaussian_filter_cross(
            jnp.asarray(fq), jnp.asarray(fk), jnp.asarray(v),
            interpret=True, plan=plan))
        rel = np.abs(got - want) / np.abs(want).clip(1e-9)
        assert rel.mean() < 5e-3, (plan, rel.mean())


def test_crf_subsampled_backend_close_to_exact():
    """The 'subsampled' backend (full-res queries × stride-2 key subgrid,
    round 5): a grid quadrature of the σ_xy-smooth bilateral sum, with the
    1/stride² scale cancelling in the symmetric normalization. At test-scale
    reference-shaped params it must track the exact attention marginals to
    approximation tolerance; the reference-params speed/agreement
    measurement on real hardware is scripts/bench_crf.py → BASELINE.md."""
    img, _, probs, _ = make_case(1)
    q_exact = np.asarray(densecrf_inference(
        jnp.asarray(probs)[None], jnp.asarray(img.astype(np.float32))[None],
        bilat_backend="attention", **PARAMS))[0]
    q_sub = np.asarray(densecrf_inference(
        jnp.asarray(probs)[None], jnp.asarray(img.astype(np.float32))[None],
        bilat_backend="subsampled", key_stride=2, **PARAMS))[0]
    mae = np.abs(q_exact - q_sub).mean()
    agree = (q_exact.argmax(-1) == q_sub.argmax(-1)).mean()
    assert mae < 0.05, mae
    assert agree > 0.97, agree


@pytest.mark.parametrize("plan", ["vpu", "mxu"])
def test_pallas_bilateral_matches_xla(plan):
    """The Pallas flash-style kernel (interpret mode off-TPU) vs the plain XLA
    formulation, including a ragged N that exercises key-block masking.
    Both exponent plans: fp32 VPU FMAs and the split-bf16 MXU matmul."""
    from weaklysuperviseddl_tpu.ops.pallas_bilateral import (
        gaussian_filter_pallas, gaussian_filter_xla)
    rng = np.random.default_rng(5)
    N = 700  # not a multiple of either block size
    feats = jnp.asarray(rng.uniform(0, 30, (N, 5)).astype(np.float32))
    vals = jnp.asarray(rng.uniform(size=(N, 2)).astype(np.float32))
    ref = np.asarray(gaussian_filter_xla(feats, vals))
    got = np.asarray(gaussian_filter_pallas(feats, vals, interpret=True, plan=plan))
    rel = np.abs(got - ref) / np.abs(ref).clip(1e-9)
    assert rel.mean() < 5e-3, rel.mean()  # bf16 value matmul tolerance


def test_split3_encoding_is_exact_bf16_splitting():
    """Regression for the XLA convert-elision bug: the Dekker split must use
    lax.reduce_precision, not astype round-trips — under fusion XLA elides
    bf16→f32 convert pairs and the 'components' silently stay fp32, which
    makes the single bf16 MXU matmul drop everything below the leading 8
    mantissa bits (measured O(30) exponent error on v5e). This test pins the
    contract the kernel relies on: components are exactly bf16-representable,
    sum back to the input at fp32, and the host-replayed split-dot reproduces
    the fp32 exponent at reference bilateral magnitudes."""
    from weaklysuperviseddl_tpu.ops.pallas_bilateral import (
        _augment_split, _split3)
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.uniform(-1, 1, (256, 5)) * [4.5, 4.5, 51, 51, 51]
                     ).astype(np.float32))
    c1, c2, c3 = jax.jit(_split3)(x)
    for c in (c1, c2, c3):
        c64 = np.asarray(c, np.float64)
        assert (c64 == np.asarray(jnp.asarray(c64).astype(jnp.bfloat16),
                                  np.float64)).all()
    recon = (np.asarray(c1, np.float64) + np.asarray(c2, np.float64)
             + np.asarray(c3, np.float64))
    np.testing.assert_allclose(recon, np.asarray(x, np.float64), atol=2e-6)

    qs, ks = jax.jit(_augment_split)(x)
    q64 = np.asarray(qs, np.float64)
    k64 = np.asarray(ks, np.float64)
    f64 = np.asarray(x, np.float64)
    sq = -0.5 * (f64 ** 2).sum(1)
    gold = f64 @ f64.T + sq[:, None] + sq[None, :]
    err = np.abs(q64 @ k64.T - gold)
    assert err.max() < 5e-3, err.max()  # the broken split gave ~36


def test_exact_filter_fp64_parity_at_reference_magnitudes():
    """Regression for the default-precision gemm explosion: at reference
    bilateral magnitudes (color features up to 255/σ_rgb ≈ 51, ‖f‖² ≈ 1e3)
    the exponent matmul must run at HIGHEST precision — XLA's default gemm
    lowers to a reduced-precision kernel on both MXU and oneDNN/AMX hosts,
    which perturbed the exponent by O(10) and blew up exp() (measured +15.4
    error vs 2.4e-4 for a true fp32 gemm)."""
    from weaklysuperviseddl_tpu.ops.pallas_bilateral import gaussian_filter_xla
    rng = np.random.default_rng(0)
    S = 32
    img = rng.integers(0, 255, (S, S, 3)).astype(np.float64)
    yy = np.arange(S)[:, None] / 50.0
    xx = np.arange(S)[None, :] / 50.0
    feats = np.stack(
        [np.broadcast_to(xx, (S, S)), np.broadcast_to(yy, (S, S))]
        + [img[..., c] / 5.0 for c in range(3)], -1,
    ).reshape(-1, 5)
    v = rng.uniform(0, 1, (S * S, 2))
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    gold = np.exp(-0.5 * d2) @ v
    got = np.asarray(gaussian_filter_xla(
        jnp.asarray(feats, jnp.float32), jnp.asarray(v, jnp.float32)))
    rel = np.abs(got - gold).max() / np.abs(gold).max()
    assert rel < 1e-3, rel


def test_rff_filter_accurate_only_at_narrow_feature_range():
    """The RFF factorization is mathematically correct — accurate where the
    feature range is a few σ — but a measured negative result at reference
    CRF bandwidths (±51σ color range), where per-entry absolute MC noise
    swamps O(1) kernel sums (see ops/pallas_bilateral.py). Both halves are
    asserted so the documented regime boundary stays true."""
    from weaklysuperviseddl_tpu.ops.pallas_bilateral import (
        rff_basis, gaussian_filter_rff)
    rng = np.random.default_rng(3)
    N = 600

    def golden_and_est(scale, dim):
        feats = rng.uniform(0, scale, (N, 5))
        v = rng.uniform(0, 1, (N, 2))
        d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
        gold = np.exp(-0.5 * d2) @ v
        phi = rff_basis(jnp.asarray(feats, jnp.float32), dim=dim)
        est = np.asarray(gaussian_filter_rff(phi, jnp.asarray(v, jnp.float32)))
        return np.abs(est - gold).max() / np.abs(gold).max()

    assert golden_and_est(scale=2.0, dim=4096) < 0.1      # the working regime
    assert golden_and_est(scale=51.0, dim=4096) > 0.3     # the reference regime


@pytest.mark.skipif(
    jnp.zeros(()).devices().pop().platform != "tpu",
    reason="regression is only reachable on real Mosaic lowering; interpret "
           "mode and CPU XLA run true-fp32 gemms and cannot reproduce it",
)
@pytest.mark.parametrize("plan", ["vpu", "mxu"])
def test_pallas_exact_on_device_at_reference_magnitudes(plan):
    """On-device regression for the Mosaic bf16-truncation bug: rounds 1-2
    shipped the exponent as a default-precision MXU dot, which truncates fp32
    inputs to bf16 — O(30) absolute exponent error at reference bilateral
    magnitudes, exp() → ~1e13 garbage — while every CPU test (interpret mode,
    true-fp32 XLA gemms) stayed green. Both plans are pinned to an fp64
    golden on the real device: 'vpu' (fp32 broadcast FMAs) and 'mxu' (the
    split-bf16 single-matmul exponent, which additionally depends on
    reduce_precision not being elided — see
    test_split3_encoding_is_exact_bf16_splitting)."""
    from weaklysuperviseddl_tpu.ops.pallas_bilateral import gaussian_filter_pallas
    rng = np.random.default_rng(0)
    S = 48
    img = rng.integers(0, 255, (S, S, 3)).astype(np.float64)
    yy = np.arange(S)[:, None] / 50.0
    xx = np.arange(S)[None, :] / 50.0
    feats = np.stack(
        [np.broadcast_to(xx, (S, S)), np.broadcast_to(yy, (S, S))]
        + [img[..., c] / 5.0 for c in range(3)], -1,
    ).reshape(-1, 5)
    v = rng.uniform(0, 1, (S * S, 2))
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    gold = np.exp(-0.5 * d2) @ v
    got = np.asarray(gaussian_filter_pallas(
        jnp.asarray(feats, jnp.float32), jnp.asarray(v, jnp.float32), plan=plan))
    rel = np.abs(got - gold).max() / np.abs(gold).max()
    assert rel < 5e-3, rel  # bf16 value-matmul floor; the bug gave ~1e13


def test_rff_backend_runs_end_to_end():
    """API contract: the opt-in backend jits and returns valid marginals."""
    img, _, probs, _ = make_case(2, H=16, W=16)
    q = np.asarray(densecrf_inference(
        jnp.asarray(probs)[None], jnp.asarray(img.astype(np.float32))[None],
        bilat_backend="rff", rff_dim=512, **PARAMS))[0]
    assert q.shape == probs.shape
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-5)


def test_jax_lattice_matches_brute_force():
    """Opt-in O(N)-scaling backend: the sort-based permutohedral lattice."""
    img, _, probs, unary = make_case(1)
    q_exact = native.densecrf(unary, img, exact=True, **PARAMS)
    q_jax = np.asarray(densecrf_inference(
        jnp.asarray(probs)[None], jnp.asarray(img.astype(np.float32))[None],
        bilat_backend="lattice", **PARAMS))[0]
    mae = np.abs(q_exact - q_jax).mean()
    agree = (q_exact.argmax(-1) == q_jax.argmax(-1)).mean()
    assert mae < 0.05, mae
    assert agree > 0.97, agree


def test_jax_lattice_matches_cpp_lattice_filter():
    """The device lattice is the same construction as the C++ host lattice:
    raw filter outputs must agree to float tolerance (up to the constant
    variance-compensation alpha the C++ path applies)."""
    from weaklysuperviseddl_tpu.masks.permutohedral import (
        permutohedral_precompute, permutohedral_filter)
    rng = np.random.default_rng(7)
    H, W = 20, 22
    img = rng.integers(0, 255, (H, W, 3)).astype(np.float32)
    sxy, srgb = 6.0, 20.0
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    feats = np.stack([x / sxy, y / sxy, img[..., 0] / srgb,
                      img[..., 1] / srgb, img[..., 2] / srgb], -1).reshape(-1, 5)
    vals = rng.uniform(size=(H * W, 2)).astype(np.float32)
    cpp = native.permutohedral_filter(feats, vals)
    pre = permutohedral_precompute(jnp.asarray(feats))
    mine = np.asarray(permutohedral_filter(jnp.asarray(vals), pre))
    alpha = 1.0 / (1.0 + 2.0 ** -5)  # wsdl_native.cpp:227
    rel = (np.abs(mine * alpha - cpp) / np.abs(cpp).clip(1e-9)).mean()
    assert rel < 1e-3, rel


def test_lattice_rejects_out_of_range_keys():
    probs = jnp.full((1, 8, 8, 2), 0.5)
    img = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(ValueError, match="packed-key range"):
        densecrf_inference(probs, img, bilat_srgb=0.05, bilat_backend="lattice")


def test_crf_cleans_noise_and_respects_edges():
    """The CRF must denoise the CAM into masks aligned with the color edge."""
    img, cam, _, _ = make_case(2, noise=0.45)  # raw threshold must make mistakes
    refined = np.asarray(apply_dense_crf(
        jnp.asarray(img.astype(np.float32))[None], jnp.asarray(cam)[None],
        gauss_sxy=1.0, gauss_compat=2.0, bilat_sxy=6.0, bilat_srgb=20.0,
        bilat_compat=10.0, n_iters=5))[0]
    H, W = cam.shape
    target = np.zeros((H, W), np.uint8)
    target[:, : W // 2] = 1
    raw = (cam > 0.5).astype(np.uint8)
    assert (refined == target).mean() > (raw == target).mean()
    assert (refined == target).mean() > 0.98


def test_native_cc_matches_scipy():
    rng = np.random.default_rng(3)
    field = ndimage.gaussian_filter(rng.standard_normal((40, 40)), 3.0)
    mask = (field > np.quantile(field, 0.6)).astype(np.uint8)
    got = native.keep_largest(mask)
    labeled, n = ndimage.label(mask, structure=np.ones((3, 3), np.int32))
    counts = np.bincount(labeled.ravel())
    counts[0] = 0
    ref = (labeled == counts.argmax()).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_native_cc_matches_device_cc():
    from weaklysuperviseddl_tpu.masks.components import keep_largest as device_keep
    rng = np.random.default_rng(4)
    field = ndimage.gaussian_filter(rng.standard_normal((32, 32)), 2.5)
    mask = (field > np.quantile(field, 0.65)).astype(np.uint8)
    np.testing.assert_array_equal(
        native.keep_largest(mask), np.asarray(device_keep(jnp.asarray(mask)))
    )


def test_native_cc_empty_passthrough():
    empty = np.zeros((8, 8), np.uint8)
    np.testing.assert_array_equal(native.keep_largest(empty), empty)


def test_permutohedral_overflow_fails_loudly():
    """Features whose lattice coordinates exceed the 12-bit packed-key range
    must NOT silently clip into corrupted filtering (ADVICE r2): the splat
    weights are NaN-poisoned so the output turns NaN."""
    import jax.numpy as jnp
    from weaklysuperviseddl_tpu.masks.permutohedral import (
        permutohedral_filter, permutohedral_precompute)

    rng = np.random.default_rng(3)
    ok_feats = jnp.asarray(rng.uniform(0, 10, (64, 2)).astype(np.float32))
    vals = jnp.asarray(rng.uniform(0, 1, (64, 2)).astype(np.float32))
    out_ok = np.asarray(permutohedral_filter(vals, permutohedral_precompute(ok_feats)))
    assert np.isfinite(out_ok).all()

    bad_feats = ok_feats * 1e4  # coordinates far beyond ±2047
    out_bad = np.asarray(
        permutohedral_filter(vals, permutohedral_precompute(bad_feats)))
    assert np.isnan(out_bad).any()
