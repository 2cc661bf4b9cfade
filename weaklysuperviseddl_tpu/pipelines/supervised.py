"""Fully-supervised DeepLabV3 baseline (upper bound).

Reference: FullySupervisedModel/SupervisedModel.py:85-123 — DeepLabV3 (random
init, 2 classes) on true binarized masks, Adam(1e-4), CE; per-epoch val; 3
test runs → mean±std pixel-acc/IoU. The 3 "test runs" in the reference are
deterministic repeats of the same eval (no TTA); kept for printout parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.config import ExperimentConfig
from weaklysuperviseddl_tpu.data import download_data, load_split_data
from weaklysuperviseddl_tpu.data.loader import stack_dataset
from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
from weaklysuperviseddl_tpu.train.segmentation import (
    create_seg_state,
    evaluate_multiclass_dataset,
    train_segmentation_model,
)
from weaklysuperviseddl_tpu.utils.metrics import mean_std


def _true_masks(ds):
    """Binarize trimaps: fg where trimap==1 (Pet convention)."""
    images = np.stack(ds.images)
    masks = np.stack([(t == 1).astype(np.uint8) for t in ds.trimaps])
    return images, masks


def run_supervised_training(
    cfg: ExperimentConfig | None = None,
    num_epochs: int | None = None,
    train_ratio: float = 0.85,
    test_runs: int = 3,
    log=print,
):
    from weaklysuperviseddl_tpu.config import ExperimentConfig as EC

    cfg = cfg or EC()
    d = cfg.data
    epochs = num_epochs if num_epochs is not None else cfg.seg.epochs

    train_ds, val_ds = load_split_data(
        d.root, train_ratio=train_ratio, seed=d.seed,
        synthetic_size=d.synthetic_size, image_size=d.image_size,
        num_classes=d.num_classes,
    )
    test_ds = download_data(
        d.root, split="test", synthetic_size=max(16, d.synthetic_size // 4),
        image_size=d.image_size, seed=d.seed, num_classes=d.num_classes,
    )
    log(f"Train batches: {len(train_ds) // d.batch_size} | "
        f"Val batches: {len(val_ds) // d.eval_batch_size} | "
        f"Test batches: {len(test_ds) // d.eval_batch_size}")

    model = DeepLabV3(
        num_classes=cfg.seg.num_classes,
        backbone_depth=cfg.seg.backbone_depth,
        width_multiplier=cfg.seg.width_multiplier,
        bn_frozen=cfg.seg.bn_frozen,
    )
    state, tx = create_seg_state(
        model, jax.random.PRNGKey(cfg.seed), input_size=d.seg_size, lr=cfg.seg.lr
    )

    images, masks = _true_masks(train_ds)

    # val/test sets stacked once and kept device-resident: each eval is ONE
    # dispatch + ONE readback instead of a predict dispatch + two float()
    # readbacks per batch (evaluate_multiclass, kept for streaming loaders)
    val_images, _, val_trimaps = stack_dataset(val_ds)
    val_arrays = (jax.device_put(jnp.asarray(val_images)),
                  jax.device_put(jnp.asarray(val_trimaps)))
    test_images, _, test_trimaps = stack_dataset(test_ds)
    test_arrays = (jax.device_put(jnp.asarray(test_images)),
                   jax.device_put(jnp.asarray(test_trimaps)))

    def val_eval(st):
        # reference protocol: nanmean per-class IoU + pixel acc per batch
        # (SupervisedModel.py:44-83); returns (iou, acc) for the log line
        acc, iou = evaluate_multiclass_dataset(
            model, st, *val_arrays, num_classes=cfg.seg.num_classes,
            batch_size=d.eval_batch_size, seg_size=d.seg_size,
        )
        return iou, acc

    state, _ = train_segmentation_model(
        model, state, tx, images, masks,
        loss_fn=cfg.seg.loss_fn, num_epochs=epochs,
        batch_size=cfg.seg.batch_size, seg_size=d.seg_size, seed=cfg.seed,
        eval_fn=val_eval, run_id="supervised", log=log,
    )

    accs, ious = [], []
    for run in range(test_runs):
        log(f"\nTest Run {run + 1}/{test_runs}")
        acc, iou = evaluate_multiclass_dataset(
            model, state, *test_arrays, num_classes=cfg.seg.num_classes,
            batch_size=d.eval_batch_size, seg_size=d.seg_size,
        )
        accs.append(acc)
        ious.append(iou)
        log(f"Pixel Acc: {acc:.4f} | IoU: {iou:.4f}")

    acc_m, acc_s = mean_std(accs)
    iou_m, iou_s = mean_std(ious)
    log("\nFinal Test Results:")
    log(f"Avg Pixel Acc: {acc_m:.4f} ± {acc_s:.4f}")
    log(f"Avg IoU: {iou_m:.4f} ± {iou_s:.4f}")
    return state, {"acc_mean": acc_m, "acc_std": acc_s, "iou_mean": iou_m, "iou_std": iou_s}
