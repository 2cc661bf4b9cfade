"""int8 PTQ graph pass (ops/quant.py): rewrite correctness, calibration
semantics, taint policy, and end-to-end serving quality on a trained model.

The reference has no quantized/serving path (nearest surface: the eval loop
in SegmentationModel.py:125-159); these tests define the contract of the
TPU-native serving addition. int8 conv/dot run natively on the CPU backend
too, so the REAL integer path is under test here, not a simulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weaklysuperviseddl_tpu.ops.quant import (
    Int8Quantizer,
    quantize_for_serving,
)


def _tiny_cnn():
    """Weights with wildly different per-channel magnitudes — per-tensor
    weight scales would destroy the small channels; per-channel must not."""
    rng = np.random.default_rng(0)
    w1 = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)
    w1 *= np.logspace(-2, 1, 8, dtype=np.float32)  # channel dynamic range 1e3
    w2 = rng.normal(size=(1, 1, 8, 4)).astype(np.float32)
    wd = rng.normal(size=(4, 5)).astype(np.float32)
    w1, w2, wd = jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(wd)

    def fn(x):
        h = jax.lax.conv_general_dilated(
            x, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h)
        h = jax.lax.conv_general_dilated(
            h, w2, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jnp.mean(h, axis=(1, 2))                     # [B, 4]
        return h @ wd                                     # dot_general target

    return fn


def _batches(n=3, B=4, size=8, seed=1):
    rng = np.random.default_rng(seed)
    return [(jnp.asarray(rng.normal(size=(B, size, size, 3)).astype(np.float32)),)
            for _ in range(n)]


def test_quantized_fn_matches_float_and_uses_int8():
    fn = _tiny_cnn()
    batches = _batches()
    qfn, report = quantize_for_serving(fn, batches)

    # 2 convs + 1 dot rewritten
    assert len(report.rows) == 3
    assert [r["kind"] for r in report.rows] == ["conv", "conv", "dot"]

    x = batches[0][0]
    ref = np.asarray(fn(x))
    got = np.asarray(jax.jit(qfn)(x))
    assert got.shape == ref.shape
    # int8 PTQ tolerance: relative error well under typical task noise
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, f"int8 rel err {rel:.4f}"

    # the rewritten graph must actually carry int8 MXU ops
    jpr = str(jax.make_jaxpr(qfn)(x))
    assert "i8[" in jpr and "conv_general_dilated" in jpr


def test_per_channel_weight_scales_survive_dynamic_range():
    """With a 1e3 weight-channel dynamic range, per-channel scales keep every
    channel's relative error small — the small channels must not be flushed."""
    fn = _tiny_cnn()
    qfn, _ = quantize_for_serving(fn, _batches())
    x = _batches(n=1, seed=7)[0][0]
    ref = np.asarray(fn(x))
    got = np.asarray(qfn(x))
    # column-wise (output-unit) relative error
    col = np.abs(got - ref).max(0) / (np.abs(ref).max(0) + 1e-9)
    assert col.max() < 0.08, col


def test_calibration_running_max():
    fn = _tiny_cnn()
    batches = _batches(n=4, seed=3)
    q = Int8Quantizer(fn, batches[0])
    assert q.num_targets == 3
    for b in batches:
        q.observe(*b)
    # first target = first conv: its activation input is the network input
    want = max(float(jnp.max(jnp.abs(b[0]))) for b in batches)
    np.testing.assert_allclose(q._amax[0], want, rtol=1e-6)


def test_activation_activation_dot_not_quantized():
    """Taint policy: a dot of two input-derived tensors must stay in float."""
    w = jnp.asarray(np.random.default_rng(0).normal(size=(6, 6)).astype(np.float32))

    def fn(x):
        a = x @ w          # activation @ weight -> quantizable
        return a @ a.T     # activation @ activation -> must be skipped

    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 6)).astype(np.float32))
    qfn, report = quantize_for_serving(fn, [(x,)])
    assert len(report.rows) == 1 and report.rows[0]["kind"] == "dot"
    ref, got = np.asarray(fn(x)), np.asarray(qfn(x))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05


def test_nchw_conv_layout_quantized_correctly():
    """The pass reads output-channel dims from dimension_numbers, so torch-
    style NCHW/OIHW graphs must quantize as correctly as flax NHWC/HWIO."""
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(8, 3, 3, 3)).astype(np.float32))  # OIHW
    w = w * jnp.asarray(np.logspace(-1, 1, 8, dtype=np.float32)).reshape(8, 1, 1, 1)

    def fn(x):  # x: NCHW
        h = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return jax.nn.relu(h)

    x = jnp.asarray(rng.normal(size=(2, 3, 8, 8)).astype(np.float32))
    qfn, report = quantize_for_serving(fn, [(x,)])
    assert len(report.rows) == 1 and report.rows[0]["kind"] == "conv"
    ref, got = np.asarray(fn(x)), np.asarray(qfn(x))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_pytree_output_structure_preserved():
    """qfn must return the SAME output structure as fn (dicts/tuples), not a
    flat tuple of jaxpr outvars."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(6, 6)).astype(np.float32))

    def fn(x):
        h = x @ w
        return {"a": h, "b": (h * 2.0, jnp.sum(h))}

    x = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    qfn, _ = quantize_for_serving(fn, [(x,)])
    out = qfn(x)
    assert set(out) == {"a", "b"} and isinstance(out["b"], tuple)
    ref = fn(x)
    np.testing.assert_allclose(np.asarray(out["b"][1]),
                               np.asarray(ref["b"][1]), rtol=0.05)


def test_no_calibration_raises():
    fn = _tiny_cnn()
    q = Int8Quantizer(fn, _batches(n=1)[0])
    with pytest.raises(ValueError, match="calibration"):
        q.build()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quant_fuzz_random_graphs(seed):
    """Property test: random conv/dense/elementwise chains quantize with the
    expected target count and bounded error, regardless of topology."""
    rng = np.random.default_rng(seed)
    n_layers = int(rng.integers(2, 5))
    ch = [3] + [int(rng.integers(2, 10)) for _ in range(n_layers)]
    weights, kinds = [], []
    for i in range(n_layers):
        # fan-in normalized so activations stay O(1): unnormalized random
        # chains blow up the per-tensor activation scale and the test would
        # measure int8's (expected) coarseness on pathological ranges rather
        # than the pass's structural correctness
        if rng.random() < 0.5:
            w = rng.normal(size=(3, 3, ch[i], ch[i + 1])) / np.sqrt(9 * ch[i])
            weights.append(jnp.asarray(w.astype(np.float32)))
            kinds.append("conv")
        else:
            w = rng.normal(size=(ch[i], ch[i + 1])) / np.sqrt(ch[i])
            weights.append(jnp.asarray(w.astype(np.float32)))
            kinds.append("dot")

    def fn(x):
        h = x
        for w, kind in zip(weights, kinds):
            if kind == "conv":
                h = jax.lax.conv_general_dilated(
                    h, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:
                h = jnp.einsum("bhwc,cd->bhwd", h, w)
            h = jax.nn.relu(h) if kind == "conv" else jnp.tanh(h)
        return h

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    qfn, report = quantize_for_serving(fn, [(x,)])
    # einsum lowers to dot_general with the weight on the rhs — every layer
    # must be rewritten
    assert len(report.rows) == n_layers, (kinds, report.rows)
    ref, got = np.asarray(fn(x)), np.asarray(qfn(x))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.15, (kinds, rel)


def test_calibration_state_roundtrip_and_fingerprint():
    """calibration_state() → JSON → load_calibration() reproduces the exact
    quantized program (same scales, same outputs) without any observe pass;
    a structurally different graph rejects the state."""
    import json

    fn = _tiny_cnn()
    batches = _batches()
    q1 = Int8Quantizer(fn, batches[0])
    for b in batches:
        q1.observe(*b)
    qfn1, report1 = q1.build()
    state = json.loads(json.dumps(q1.calibration_state()))  # JSON-portable

    q2 = Int8Quantizer(fn, batches[0])
    q2.load_calibration(state)
    qfn2, report2 = q2.build()
    assert [r["act_scale"] for r in report2.rows] == [
        r["act_scale"] for r in report1.rows]
    x = _batches(n=1, seed=9)[0][0]
    np.testing.assert_array_equal(np.asarray(qfn1(x)), np.asarray(qfn2(x)))

    # a different graph (extra output projection) must reject the state
    wd2 = jnp.asarray(np.eye(5, 3, dtype=np.float32))

    def other(x):
        return fn(x) @ wd2

    q3 = Int8Quantizer(other, batches[0])
    with pytest.raises(ValueError, match="does not match"):
        q3.load_calibration(state)

    # corrupted / uncalibrated states are rejected too
    q4 = Int8Quantizer(fn, batches[0])
    with pytest.raises(ValueError, match="version"):
        q4.load_calibration({**state, "version": 2})
    with pytest.raises(ValueError, match="uncalibrated"):
        q4.load_calibration({**state, "amax": [0.0] * state["n_targets"]})
    with pytest.raises(ValueError, match="finite non-negative"):
        q4.load_calibration({**state, "amax": [-1.0] + state["amax"][1:]})


def test_deeplab_serving_quality_after_quantization():
    """End-to-end: train a small DeepLabV3 on synthetic data, quantize the
    serving forward, and require near-perfect mask agreement with fp32."""
    from weaklysuperviseddl_tpu.data.dataset import download_data
    from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.train.segmentation import (
        _normalize_images,
        create_seg_state,
        train_segmentation_model,
    )

    size, n = 32, 16
    ds = download_data(None, split="trainval", synthetic_size=n, image_size=size)
    images = np.stack(ds.images)
    masks = np.stack([(t == 1).astype(np.uint8) for t in ds.trimaps])

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, tx = create_seg_state(model, jax.random.PRNGKey(0), input_size=size,
                                 lr=1e-3)
    state, _loss = train_segmentation_model(
        model, state, tx, images, masks,
        num_epochs=3, batch_size=8, seg_size=size, log=lambda s: None)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def serve(x):
        return model.apply(variables, x, train=False)

    xu, _ = preprocess_batch(jnp.asarray(images), None, size=size)
    x = _normalize_images(xu)
    calib = [(x[:8],), (x[8:],)]
    qfn, report = quantize_for_serving(serve, calib)
    assert len(report.rows) >= 10  # every backbone/head conv rewritten

    ref_masks = np.asarray(jnp.argmax(serve(x), -1))
    got_masks = np.asarray(jnp.argmax(jax.jit(qfn)(x), -1))
    agreement = (ref_masks == got_masks).mean()
    assert agreement > 0.99, f"int8 mask agreement {agreement:.4f}"
