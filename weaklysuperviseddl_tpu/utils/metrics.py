"""Evaluation metrics, jit-friendly (pure jnp; callers .item() at the edge).

Reference semantics reproduced from:
  * binary IoU / pixel acc       — TraditionalModel/ExtraUtilities.py:4-21
  * macro-F1 per-class counters  — TraditionalModel/ClassificationModel.py:109-150
  * per-class IoU with NaN skip  — FullySupervisedModel/SupervisedModel.py:44-83
Cross-chip metric reduction is idiomatic JAX SPMD: accumulate per-shard sums and
psum them (see parallel.mesh); these functions return the raw counters so the
caller controls the reduction.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_iou_and_acc(pred_mask: jnp.ndarray, true_mask: jnp.ndarray):
    """Binary IoU + pixel accuracy; foreground is ``> 0``.

    Matches reference ExtraUtilities.py:4-21 exactly:
    iou = |pred∧true| / (|pred∨true| + 1e-8); acc counts exact value equality
    (not just fg/bg agreement).
    """
    pred_fg = pred_mask > 0
    true_fg = true_mask > 0
    intersection = jnp.sum(pred_fg & true_fg)
    union = jnp.sum(pred_fg | true_fg)
    correct = jnp.sum(pred_mask == true_mask)
    total = true_mask.size
    iou = intersection / (union + 1e-8)
    acc = correct / total
    return iou, acc


def binary_confusion_counts(pred_mask: jnp.ndarray, true_mask: jnp.ndarray):
    """Shard-reducible raw counters for binary IoU/acc (psum these across the
    data axis, then finish with ``finish_iou_and_acc``)."""
    pred_fg = pred_mask > 0
    true_fg = true_mask > 0
    return {
        "intersection": jnp.sum(pred_fg & true_fg),
        "union": jnp.sum(pred_fg | true_fg),
        "correct": jnp.sum(pred_mask == true_mask),
        "total": jnp.asarray(true_mask.size, jnp.int32),
    }


def finish_iou_and_acc(counts):
    iou = counts["intersection"] / (counts["union"] + 1e-8)
    acc = counts["correct"] / counts["total"]
    return iou, acc


def classification_counts(preds: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
                          valid: jnp.ndarray | None = None):
    """Per-class TP/FP/FN counters + correct/total, as in reference
    ClassificationModel.py:116-139 (accumulated over batches, then reduced).
    ``valid`` ([B] bool) excludes padded rows from every counter."""
    v = (jnp.ones(labels.shape[0], bool) if valid is None else valid)[:, None]
    one_hot_pred = (jnp.arange(num_classes)[None, :] == preds[:, None]) & v
    one_hot_true = (jnp.arange(num_classes)[None, :] == labels[:, None]) & v
    tp = jnp.sum(one_hot_pred & one_hot_true, axis=0)
    fp = jnp.sum(one_hot_pred & ~one_hot_true, axis=0)
    fn = jnp.sum(~one_hot_pred & one_hot_true, axis=0)
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "correct": jnp.sum((preds == labels) & v[:, 0]),
        "total": jnp.sum(v[:, 0]).astype(jnp.int32),
    }


def finish_macro_f1(counts):
    """Macro-F1 from accumulated counters (ref ClassificationModel.py:142-147)."""
    tp = counts["tp"].astype(jnp.float32)
    fp = counts["fp"].astype(jnp.float32)
    fn = counts["fn"].astype(jnp.float32)
    precision = tp / (tp + fp + 1e-8)
    recall = tp / (tp + fn + 1e-8)
    f1 = 2 * precision * recall / (precision + recall + 1e-8)
    macro_f1 = jnp.mean(f1)
    acc = 100.0 * counts["correct"] / counts["total"]
    return acc, macro_f1


def per_class_iou(preds: jnp.ndarray, masks: jnp.ndarray, num_classes: int,
                  valid: jnp.ndarray | None = None):
    """Per-class IoU with NaN for absent classes + pixel acc
    (ref SupervisedModel.py:53-79). Returns (ious[num_classes], mean_iou, pixel_acc);
    mean over classes skips NaN like np.nanmean.

    ``valid`` ([B] bool) excludes padded rows from every counter — bit-equal
    to slicing them off first, so the one-dispatch dataset eval can process
    padded static batches (jit-friendly) without perturbing the metrics."""
    v = None if valid is None else valid[:, None, None]
    ious = []
    for cls in range(num_classes):
        pred_inds = preds == cls
        target_inds = masks == cls
        if v is not None:
            pred_inds = pred_inds & v
            target_inds = target_inds & v
        intersection = jnp.sum(pred_inds & target_inds)
        union = jnp.sum(pred_inds | target_inds)
        iou = jnp.where(union == 0, jnp.nan, intersection / jnp.maximum(union, 1))
        ious.append(iou)
    ious = jnp.stack(ious)
    mean_iou = jnp.nanmean(ious)
    eq = preds == masks
    if v is None:
        pixel_acc = jnp.mean(eq.astype(jnp.float32))
    else:
        per_image = masks.shape[-1] * masks.shape[-2]
        pixel_acc = jnp.sum((eq & v).astype(jnp.float32)) / jnp.maximum(
            jnp.sum(valid.astype(jnp.float32)) * per_image, 1.0)
    return ious, mean_iou, pixel_acc


def mean_std(values):
    """Ablation-style summary: mean and sample stdev over repeats
    (ref Abalations.py:62-81 uses statistics.mean/stdev)."""
    import math

    values = list(values)
    n = len(values)
    m = sum(values) / n
    if n > 1:
        var = sum((v - m) ** 2 for v in values) / (n - 1)
        s = math.sqrt(var)
    else:
        s = 0.0
    return m, s
