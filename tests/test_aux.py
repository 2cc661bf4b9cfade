"""Auxiliary subsystems: foundation pipeline (stub backends), checkpointing,
profiling."""

import os

import numpy as np
import jax
import pytest

from weaklysuperviseddl_tpu.data import download_data
from weaklysuperviseddl_tpu.pipelines.foundation import (
    FoundationPipeline,
    calculate_iou_and_accuracy,
    convert_3channel_to_mask,
    evaluate_pipeline_on_dataset,
)


def ellipse_detector(image, prompts):
    """Stub GroundingDINO: box around pixels far from the median (background)
    color — the synthetic ellipse differs from the uniform-ish background."""
    arr = np.asarray(image).astype(np.float32)
    med = np.median(arr.reshape(-1, 3), axis=0)
    fg = np.linalg.norm(arr - med, axis=-1) > 60
    if fg.sum() < 10:
        return np.zeros((0, 4))
    ys, xs = np.where(fg)
    return np.array([[xs.min(), ys.min(), xs.max(), ys.max()]], np.float32)


def boxfill_segmenter(image, boxes):
    """Stub SAM: fills each box."""
    arr = np.asarray(image)
    H, W = arr.shape[:2]
    masks = np.zeros((len(boxes), H, W), np.float32)
    for i, (x0, y0, x1, y1) in enumerate(boxes):
        masks[i, int(y0):int(y1) + 1, int(x0):int(x1) + 1] = 1.0
    return masks


def test_foundation_pipeline_with_stub_backends(tmp_path):
    ds = download_data(None, split="test", synthetic_size=4, image_size=64)
    pipe = FoundationPipeline(detector=ellipse_detector, segmenter=boxfill_segmenter,
                              output_size=64)
    logs = []
    avg_iou, avg_acc = evaluate_pipeline_on_dataset(
        ds, pipe, num_images=4, save_outputs=True, save_dir=str(tmp_path), log=logs.append)
    # box-fill around the ellipse must beat chance comfortably
    assert avg_iou > 0.4, (avg_iou, logs)
    assert len([f for f in os.listdir(tmp_path) if f.startswith("mask_")]) == 4
    assert len([f for f in os.listdir(tmp_path) if f.startswith("viz_")]) == 4
    assert any("Final Evaluation" in s for s in logs)


def test_foundation_no_detection_path():
    pipe = FoundationPipeline(detector=lambda img, p: np.zeros((0, 4)),
                              segmenter=boxfill_segmenter, output_size=32)
    img = np.zeros((32, 32, 3), np.uint8)
    assert pipe.run_segmentation_pipeline(img) is None  # ref :58-59 continue path


def test_convert_and_metrics_helpers():
    m = convert_3channel_to_mask(np.stack([np.eye(4), np.zeros((4, 4)), np.zeros((4, 4))]))
    assert m.sum() == 4
    iou, acc = calculate_iou_and_accuracy(np.ones((4, 4)), np.ones((4, 4)))
    assert iou == 1.0 and acc == 1.0
    iou, _ = calculate_iou_and_accuracy(np.zeros((4, 4)), np.zeros((4, 4)))
    assert iou == 1.0  # union==0 convention (ref :92)


def test_checkpoint_roundtrip(tmp_path):
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.train.segmentation import create_seg_state
    from weaklysuperviseddl_tpu.utils.checkpoint import (
        load_seg_state,
        restore_state,
        save_state,
        seg_state_tree,
    )

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, _ = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)
    state.step = 17
    save_state(str(tmp_path / "ckpt"), seg_state_tree(state))

    state2, _ = create_seg_state(model, jax.random.PRNGKey(1), input_size=32)
    tree = restore_state(str(tmp_path / "ckpt"), seg_state_tree(state2))
    state2 = load_seg_state(state2, tree)
    assert state2.step == 17
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (full resume — beyond the reference's weights-only)
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_alternation_snapshot(tmp_path):
    from weaklysuperviseddl_tpu.data.mask_store import MaskStore
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.train.segmentation import create_seg_state
    from weaklysuperviseddl_tpu.utils.checkpoint import save_alternation

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, _ = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)
    store = MaskStore()
    store.put("0000", np.zeros((16, 16, 3), np.uint8), np.ones((16, 16), np.uint8))
    alt_dir = save_alternation(str(tmp_path), 2, state, store)
    assert os.path.basename(alt_dir) == "alt_002"
    assert os.path.exists(os.path.join(alt_dir, "masks", "pseudo_masks", "0000.png"))


def _tiny_seg_state():
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.train.segmentation import create_seg_state

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, _ = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)
    return state


def test_save_alternation_crash_atomic(tmp_path, monkeypatch):
    """A crash mid-checkpoint must never leave a snapshot that
    latest_alternation considers restorable (ADVICE r3 medium)."""
    from weaklysuperviseddl_tpu.data.mask_store import MaskStore
    from weaklysuperviseddl_tpu.utils.checkpoint import (
        latest_alternation,
        save_alternation,
    )

    state = _tiny_seg_state()
    store = MaskStore()
    store.put("0000", np.zeros((16, 16, 3), np.uint8), np.ones((16, 16), np.uint8))

    def boom(self):
        raise RuntimeError("simulated crash during mask flush")

    monkeypatch.setattr(MaskStore, "flush", boom)
    with pytest.raises(RuntimeError):
        save_alternation(str(tmp_path), 0, state, store)
    # the partial snapshot is invisible: only the .tmp staging dir exists
    assert not os.path.exists(os.path.join(str(tmp_path), "alt_000"))
    assert latest_alternation(str(tmp_path)) is None

    monkeypatch.undo()
    alt_dir = save_alternation(str(tmp_path), 0, state, store)
    assert os.path.isdir(alt_dir)
    assert not os.path.exists(alt_dir + ".tmp")  # staging dir reclaimed
    assert latest_alternation(str(tmp_path)) == 0


def test_precheckpoint_drain_attributes_failures(tmp_path):
    """save_alternation's leftover-.tmp drain swallows ONLY failures inside
    the aborted snapshot dir: io_flush is a global barrier, so a failed
    async write belonging to any other directory (e.g. the live mask store)
    is a real durability error and must propagate, not be cleared."""
    from weaklysuperviseddl_tpu.data.mask_store import MaskStore, _native_io
    from weaklysuperviseddl_tpu.utils.checkpoint import save_alternation

    nat = _native_io()
    if nat is None:
        pytest.skip("native IO library unavailable")

    state = _tiny_seg_state()
    store = MaskStore()
    store.put("0000", np.zeros((16, 16, 3), np.uint8), np.ones((16, 16), np.uint8))

    img = np.zeros((8, 8), np.uint8)
    tmp_dir = os.path.join(str(tmp_path), "alt_000.tmp")

    # failure OUTSIDE the leftover snapshot → must raise and not commit
    os.makedirs(tmp_dir)
    foreign = str(tmp_path / "live_store" / "x.png")  # parent doesn't exist
    nat.png_write_async(foreign, img)
    with pytest.raises(OSError, match="live_store"):
        save_alternation(str(tmp_path), 0, state, store)
    assert not os.path.exists(os.path.join(str(tmp_path), "alt_000"))

    # failure INSIDE the leftover snapshot → expected, swallowed, committed
    os.makedirs(tmp_dir, exist_ok=True)
    nat.png_write_async(os.path.join(tmp_dir, "gone", "y.png"), img)
    alt_dir = save_alternation(str(tmp_path), 0, state, store)
    assert os.path.isdir(alt_dir)
    assert not os.path.exists(tmp_dir)


def test_resume_requires_checkpoints(tmp_path):
    """resume=True must fail loudly instead of silently re-running the full
    expensive prefix (ADVICE r3)."""
    from weaklysuperviseddl_tpu.config import smoke_config
    from weaklysuperviseddl_tpu.pipelines import run_weakly_supervised_alternating

    cfg = smoke_config()
    with pytest.raises(ValueError, match="checkpoint_dir"):
        run_weakly_supervised_alternating(cfg, resume=True)
    with pytest.raises(FileNotFoundError, match="no restorable"):
        run_weakly_supervised_alternating(
            cfg, checkpoint_dir=str(tmp_path), resume=True)


def test_restore_unpadded_alt_dir(tmp_path):
    """A hand-made unpadded alt_7 dir must restore, not be reported as latest
    and then fail on the re-formatted alt_007 path (ADVICE r3)."""
    from weaklysuperviseddl_tpu.data.mask_store import MaskStore
    from weaklysuperviseddl_tpu.utils.checkpoint import (
        latest_alternation,
        restore_alternation,
        save_alternation,
    )

    state = _tiny_seg_state()
    store = MaskStore()
    store.put("0000", np.zeros((16, 16, 3), np.uint8), np.ones((16, 16), np.uint8))
    save_alternation(str(tmp_path), 7, state, store)
    os.rename(os.path.join(str(tmp_path), "alt_007"),
              os.path.join(str(tmp_path), "alt_7"))
    assert latest_alternation(str(tmp_path)) == 7
    _, restored_store, next_it = restore_alternation(str(tmp_path), state)
    assert next_it == 8
    assert len(restored_store) == 1


def test_pickle_restore_validates_tree_structure(tmp_path, monkeypatch):
    """The no-orbax pickle path must reject a checkpoint whose tree structure
    doesn't match the current config's template (ADVICE r3)."""
    from weaklysuperviseddl_tpu.utils import checkpoint as ckpt

    monkeypatch.setattr(ckpt, "_HAS_ORBAX", False)
    path = str(tmp_path / "state")
    ckpt.save_state(path, {"a": np.zeros(3), "b": {"c": np.ones(2)}})
    # matching template restores fine
    tree = ckpt.restore_state(path, {"a": np.zeros(3), "b": {"c": np.zeros(2)}})
    np.testing.assert_array_equal(tree["b"]["c"], np.ones(2))
    with pytest.raises(ValueError, match="different tree structure"):
        ckpt.restore_state(path, {"a": np.zeros(3), "b": {"DIFFERENT": 0}})
    # an orbax-written dir must not be reported restorable without orbax
    os.makedirs(str(tmp_path / "alt_001" / "state"))
    assert ckpt.latest_alternation(str(tmp_path)) is None


def test_stopwatch_and_phase():
    from weaklysuperviseddl_tpu.utils.profiling import Stopwatch, phase

    sw = Stopwatch()
    with sw.phase("cam", images=8):
        pass
    with sw.phase("cam", images=8):
        pass
    assert sw.images["cam"] == 16
    lines = []
    sw.report(log=lines.append)
    assert any("cam" in s for s in lines)
    with phase("x", log=lines.append):
        pass
    assert any(s.startswith("[profile] x") for s in lines)


def test_stopwatch_marginal_rate_excludes_first_call():
    """first_call_s / marginal_rate separate the compile-laden first call from
    the steady rate (reference-scale e2e reporting contract)."""
    import time

    from weaklysuperviseddl_tpu.utils.profiling import Stopwatch

    sw = Stopwatch()
    assert sw.marginal_rate("seg") is None and sw.first_call_s("seg") is None
    with sw.phase("seg", images=4):
        time.sleep(0.05)  # "compile"
    assert sw.marginal_rate("seg") is None  # single call: no marginal yet
    assert sw.first_call_s("seg") >= 0.05
    with sw.phase("seg", images=4):
        time.sleep(0.005)
    with sw.phase("seg", images=4):
        time.sleep(0.005)
    m = sw.marginal_rate("seg")
    assert m is not None and m > sw.rate("seg")  # first call dragged the mean
    assert sw.first_call_s("seg") >= 0.05  # unchanged by later calls


def test_warmup_device_reports_and_warns():
    """warmup_device pays the first dispatch, returns its wall seconds, and
    attributes a slow attach (the 704 s relay-queueing incident in the
    round-4 aux record) instead of stalling silently."""
    from weaklysuperviseddl_tpu.utils.profiling import warmup_device

    lines = []
    dt = warmup_device(log=lines.append)
    assert dt >= 0.0
    assert any(s.startswith("device:") for s in lines)
    assert not any("warmup took" in s for s in lines)  # CPU attach is fast

    lines = []
    warmup_device(warn_after_s=0.0, log=lines.append)
    assert any("warmup took" in s and "relay" in s for s in lines)


def test_foundation_real_sam_backend_from_config():
    """The REAL hf_segmenter (transformers SamProcessor -> SamModel forward ->
    pred_masks[:,0]) runs end-to-end through the pipeline with from-config
    random weights (no downloads; outputs are meaningless but every
    integration seam is exercised — upgrade path is from_pretrained)."""
    import numpy as np
    from weaklysuperviseddl_tpu.pipelines.foundation import (
        FoundationPipeline, hf_segmenter, tiny_sam_config)

    segment = hf_segmenter(config=tiny_sam_config())
    detector = lambda img, prompts: np.asarray([[10.0, 10.0, 100.0, 100.0]])
    pipe = FoundationPipeline(detector=detector, segmenter=segment,
                              output_size=64)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
    mask = pipe.run_segmentation_pipeline(image)
    assert mask.shape == (64, 64)
    assert set(np.unique(mask)).issubset({0, 1})


def test_foundation_both_real_backends_from_config():
    """FULL zero-download C22: real GroundingDINO detector (handmade WordPiece
    vocab + from-config model) feeding the real SAM segmenter through the
    pipeline orchestration — every integration seam of
    two_stage_foundation.py:31-74 executes; swap from_pretrained weights in
    for real quality."""
    import numpy as np
    from weaklysuperviseddl_tpu.pipelines.foundation import (
        FoundationPipeline, hf_detector, hf_segmenter,
        tiny_gdino_config, tiny_sam_config)

    detect = hf_detector(config=tiny_gdino_config(), box_threshold=0.0,
                         text_threshold=0.0)
    segment = hf_segmenter(config=tiny_sam_config())
    pipe = FoundationPipeline(detector=detect, segmenter=segment, output_size=64)
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
    mask = pipe.run_segmentation_pipeline(image, prompts=("a cat", "a dog"))
    assert mask.shape == (64, 64)
    assert set(np.unique(mask)).issubset({0, 1})


def test_hf_from_pretrained_raises_offline(monkeypatch):
    """The from_pretrained branches must fail loudly (not hang, not silently
    degrade) when weights can't be fetched — the zero-egress contract stated
    in pipelines/foundation.py's module docstring."""
    from weaklysuperviseddl_tpu.pipelines.foundation import hf_detector, hf_segmenter

    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setenv("TRANSFORMERS_OFFLINE", "1")
    with pytest.raises(Exception):
        hf_detector(model_name="IDEA-Research/grounding-dino-base")
    with pytest.raises(Exception):
        hf_segmenter(model_name="facebook/sam-vit-base")
