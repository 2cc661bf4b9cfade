"""BASNet saliency-inference engine — batched, jit'd.

Reference: PretrainedBasnetModel/RunInference.py — per-image loop: resize 256²
+ ImageNet normalize → forward → take dout channel 0 → min-max ``norm_pred`` →
resize back to original size → save ``{name}_saliency.png`` → IoU/acc vs
trimap==1, mean over the first 10 test images.

Here the model runs as one jit over a batch (the BASELINE.json "batched jit'd
saliency-inference engine"); weights ingest from the reference's
``basnet.pth`` when present (gated — zero-egress environments run random-init
for smoke purposes only).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
from weaklysuperviseddl_tpu.models.basnet import BASNet
from weaklysuperviseddl_tpu.ops.resize import resize_bilinear
from weaklysuperviseddl_tpu.train.segmentation import _normalize_images
from weaklysuperviseddl_tpu.utils.metrics import mean_std

IMG_SIZE = 256


def build_basnet(rng=None, weights_path: str | None = None, dtype=jnp.float32):
    """Init BASNet(3,1); load reference .pth weights when available."""
    model = BASNet(n_channels=3, n_classes=1, dtype=dtype)
    if weights_path and os.path.exists(weights_path):
        from weaklysuperviseddl_tpu.models.torch_import import load_pth, torch_to_flax

        params, batch_stats = torch_to_flax(load_pth(weights_path))
        variables = {"params": params, "batch_stats": batch_stats}
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = model.init(rng, jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)), train=False)
    return model, variables


def norm_pred(d):
    """Min-max normalization over each map (ref RunInference.py:36-40)."""
    lo = jnp.min(d, axis=(-2, -1), keepdims=True)
    hi = jnp.max(d, axis=(-2, -1), keepdims=True)
    return (d - lo) / (hi - lo + 1e-8)


@partial(jax.jit, static_argnames=("model",))
def saliency_step(model, variables, images_uint8):
    """[B,H,W,3] uint8 → normalized saliency [B,256,256] float in [0,1]."""
    x, _ = preprocess_batch(images_uint8, None, size=IMG_SIZE)
    x = _normalize_images(x)
    dout, *_ = model.apply(variables, x, train=False)
    return norm_pred(dout[..., 0])


def run_inference(
    dataset,
    model=None,
    variables=None,
    weights_path: str | None = "./Weights/basnet.pth",
    num_images: int = 10,
    batch_size: int = 8,
    output_folder: str | None = "./basnet_outputs",
    log=print,
):
    """Batched RunInference.py: saliency maps + per-image and mean IoU/acc vs
    trimap==1. Returns (results list, mean_iou, mean_acc)."""
    from weaklysuperviseddl_tpu.data.loader import batches

    if model is None:
        model, variables = build_basnet(weights_path=weights_path)
    if output_folder:
        os.makedirs(output_folder, exist_ok=True)

    results = []
    processed = 0
    for batch in batches(dataset, batch_size, pad_to_full=True):
        if processed >= num_images:
            break
        preds = np.asarray(saliency_step(model, variables, jnp.asarray(batch.image)))
        for i in range(batch.num_valid):
            if processed >= num_images:
                break
            orig_h, orig_w = batch.trimap[i].shape
            pred = preds[i]
            # resize prediction back to the original size (ref :77)
            pred_resized = np.asarray(
                resize_bilinear(jnp.asarray(pred), (orig_h, orig_w))
            )
            if output_folder:
                from PIL import Image

                Image.fromarray((pred * 255).astype(np.uint8)).resize(
                    (orig_w, orig_h)
                ).save(os.path.join(output_folder, f"{processed}_saliency.png"))

            pred_bin = (pred_resized > 0.5).astype(np.uint8)
            gt_bin = (batch.trimap[i] == 1).astype(np.uint8)
            inter = np.logical_and(pred_bin, gt_bin).sum()
            union = np.logical_or(pred_bin, gt_bin).sum()
            iou = inter / union if union > 0 else 1.0
            acc = (pred_bin == gt_bin).mean()
            log(f"{processed} - IoU: {iou:.4f}, Pixel Accuracy: {acc:.4f}")
            results.append((float(iou), float(acc)))
            processed += 1

    mean_iou = sum(i for i, _ in results) / len(results)
    mean_acc = sum(a for _, a in results) / len(results)
    log(f"Mean IoU: {mean_iou:.4f}, Mean Pixel Accuracy: {mean_acc:.4f}")
    return results, mean_iou, mean_acc
