"""Reference surface: PretrainedBasnetModel/RunInference.py.

The reference is a script (load basnet.pth → per-image saliency → IoU/acc vs
trimap==1 over the first 10 test images). Here the same surface is a callable
``main`` over the batched jit'd engine, plus the reference's helpers by name.
"""

from __future__ import annotations

import numpy as np

from weaklysuperviseddl_tpu.compat._adapt import to_array
from weaklysuperviseddl_tpu.pipelines.basnet_infer import (  # noqa: F401
    build_basnet,
    run_inference,
)
from weaklysuperviseddl_tpu.pipelines import basnet_infer as _engine


def norm_pred(d):
    """Reference RunInference.py:36-40."""
    return _engine.norm_pred(to_array(d))


def compute_metrics(pred_mask, gt_mask):
    """Reference RunInference.py:42-55: threshold at 0.5, fg = trimap==1."""
    pred_bin = (np.asarray(pred_mask) > 0.5).astype(np.uint8)
    gt_bin = (np.asarray(gt_mask) == 1).astype(np.uint8)
    intersection = np.logical_and(pred_bin, gt_bin).sum()
    union = np.logical_or(pred_bin, gt_bin).sum()
    iou = intersection / union if union > 0 else 1.0
    accuracy = (pred_bin == gt_bin).sum() / pred_bin.size
    return iou, accuracy, pred_bin, gt_bin


def main(
    model_path: str = "./Weights/basnet.pth",
    dataset_root: str | None = "./OxfordIIITPetDataset/oxford-iiit-pet",
    output_folder: str = "./basnet_outputs",
    num_images: int = 10,
    log=print,
):
    """Script body (RunInference.py:9-126), batched."""
    from weaklysuperviseddl_tpu.data import download_data

    dataset = download_data(dataset_root, split="test", synthetic_size=num_images)
    return run_inference(
        dataset, weights_path=model_path, num_images=num_images,
        output_folder=output_folder, log=log,
    )


if __name__ == "__main__":
    main()
