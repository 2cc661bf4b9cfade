"""Data pipeline tests: synthetic contract, on-device preprocessing parity
with torch resize semantics, mask store round-trips."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from weaklysuperviseddl_tpu.data import download_data, load_split_data, MaskStore
from weaklysuperviseddl_tpu.data.loader import batches
from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
from weaklysuperviseddl_tpu.ops.resize import resize_bilinear, resize_nearest


def test_synthetic_contract():
    ds = download_data(None, split="trainval", synthetic_size=8, image_size=64)
    assert len(ds) == 8
    img, (label, tri) = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert 0 <= label < 37
    assert set(np.unique(tri)).issubset({1, 2, 3})
    # foreground exists
    assert (tri == 1).sum() > 50


def test_split_disjoint_and_sized():
    train, val = load_split_data(None, train_ratio=0.75, synthetic_size=16, image_size=32)
    assert len(train) == 12 and len(val) == 4


def test_batches_pad_to_full():
    ds = download_data(None, split="trainval", synthetic_size=10, image_size=32)
    bs = list(batches(ds, batch_size=4, pad_to_full=True))
    assert len(bs) == 3
    assert all(b.image.shape[0] == 4 for b in bs)
    assert bs[-1].num_valid == 2


def test_preprocess_shapes_and_labels():
    ds = download_data(None, split="trainval", synthetic_size=4, image_size=96)
    b = next(iter(batches(ds, batch_size=4)))
    x, t = preprocess_batch(
        jnp.asarray(b.image), jnp.asarray(b.trimap), size=64,
        interpolation="bilinear", shift_mask_labels=True,
    )
    assert x.shape == (4, 64, 64, 3) and x.dtype == jnp.float32
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    # trimap batch must resize H,W — not the batch axis (regression: rank-3 ambiguity)
    assert t.shape == (4, 64, 64)
    # shifted labels: {1,2,3} -> {0,1,2}
    assert set(np.unique(np.asarray(t))).issubset({0, 1, 2})


def test_bilinear_matches_torch_interpolate():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 14, 14, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (224, 224), antialias=False))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(224, 224),
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out", [(37, 41), (224, 224), (7, 7)])
def test_nearest_matches_torch_legacy(out):
    rng = np.random.default_rng(2)
    x = rng.integers(0, 255, size=(1, 23, 29), dtype=np.uint8)
    got = np.asarray(resize_nearest(jnp.asarray(x[0]), out, torch_legacy=True))
    ref = F.interpolate(
        torch.from_numpy(x).unsqueeze(0).float(), size=out, mode="nearest"
    )[0, 0].numpy().astype(np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_mask_store_roundtrip(tmp_path):
    store = MaskStore(directory=str(tmp_path))
    img = (np.random.default_rng(0).uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
    mask = (np.random.default_rng(1).uniform(0, 1, (32, 32)) > 0.5).astype(np.uint8)
    store.put("0003", img, mask)
    store.put("0001", img, 1 - mask)

    reloaded = MaskStore.load(str(tmp_path))
    assert reloaded.keys() == ["0001", "0003"]
    _, m = reloaded.get("0003")
    np.testing.assert_array_equal(m, mask)

    images, masks, keys = reloaded.as_arrays()
    assert images.shape == (2, 32, 32, 3) and masks.shape == (2, 32, 32)


def test_native_png_writer_pixel_exact(tmp_path):
    """Native zlib PNG encoder (native/wsdl_io.cpp): PIL round-trip must be
    pixel-exact for both the {0,255} grayscale masks and RGB images, sync and
    async, and io_flush must be a durability barrier."""
    from PIL import Image

    from weaklysuperviseddl_tpu import native

    rng = np.random.default_rng(7)
    mask = (rng.integers(0, 2, (41, 57)).astype(np.uint8)) * 255  # odd shape
    img = rng.integers(0, 256, (41, 57, 3)).astype(np.uint8)

    native.png_write(str(tmp_path / "sync_m.png"), mask)
    np.testing.assert_array_equal(
        np.asarray(Image.open(tmp_path / "sync_m.png").convert("L")), mask)

    for i in range(16):  # async burst through the worker pool
        native.png_write_async(str(tmp_path / f"a{i}.png"), img)
    native.io_flush()
    for i in range(16):
        np.testing.assert_array_equal(
            np.asarray(Image.open(tmp_path / f"a{i}.png").convert("RGB")), img)

    with pytest.raises(ValueError):
        native.png_write(str(tmp_path / "bad.png"), img.astype(np.uint8)[..., :2])


def test_native_io_flush_reports_failing_path(tmp_path):
    """A failed async write must surface the PATH and errno through io_flush
    (a bare failure count made real durability failures undiagnosable), and
    the failure state must reset so the next barrier is clean."""
    from weaklysuperviseddl_tpu import native

    img = np.zeros((8, 8), np.uint8)
    bad = str(tmp_path / "no_such_dir" / "x.png")  # parent dir doesn't exist
    native.png_write_async(bad, img)
    with pytest.raises(OSError, match="no_such_dir"):
        native.io_flush()
    # state cleared: a subsequent successful barrier must not re-raise
    native.png_write_async(str(tmp_path / "ok.png"), img)
    native.io_flush()


def test_mask_store_uses_async_writer_and_flush(tmp_path):
    """MaskStore persistence goes through the native pool; flush() makes the
    directory readable and load() self-flushes pending writes."""
    store = MaskStore(directory=str(tmp_path))
    rng = np.random.default_rng(3)
    for i in range(8):
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        mask = rng.integers(0, 2, (16, 16)).astype(np.uint8)
        store.put(f"{i:04d}", img, mask)
    # no explicit flush: load() must introduce the barrier itself
    reloaded = MaskStore.load(str(tmp_path))
    assert len(reloaded) == 8
    store.flush()  # idempotent after load's global flush


def test_metrics_match_reference_semantics():
    from weaklysuperviseddl_tpu.utils.metrics import compute_iou_and_acc, per_class_iou

    pred = jnp.asarray([[1, 1], [0, 0]])
    true = jnp.asarray([[1, 0], [0, 0]])
    iou, acc = compute_iou_and_acc(pred, true)
    assert abs(float(iou) - 0.5) < 1e-6
    assert abs(float(acc) - 0.75) < 1e-6

    ious, miou, pacc = per_class_iou(pred, true, num_classes=3)
    assert np.isnan(np.asarray(ious)[2])
    assert abs(float(pacc) - 0.75) < 1e-6
