"""Reference surface: TraditionalModel/ExtraUtilities.py."""

from __future__ import annotations

from weaklysuperviseddl_tpu.compat._adapt import to_array
from weaklysuperviseddl_tpu.data.dataset import download_data, load_split_data  # noqa: F401
from weaklysuperviseddl_tpu.utils import metrics as _metrics


def compute_iou_and_acc(pred_mask, true_mask):
    """Reference ExtraUtilities.py:4-21 — returns Python floats like .item()."""
    iou, acc = _metrics.compute_iou_and_acc(to_array(pred_mask), to_array(true_mask))
    return float(iou), float(acc)
