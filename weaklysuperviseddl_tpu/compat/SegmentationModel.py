"""Reference surface: TraditionalModel/SegmentationModel.py.

``train_segmentation_model(loss_fn, run_id, lr, num_epochs, batch_size, ...)``
keeps the reference signature (SegmentationModel.py:59): it reads the pseudo-
mask PNG directories written by compat.PsuedoMasks for ``run_id``, trains a
DeepLabV3 (2-class) and returns ``(model, final_loss)`` where ``model`` is a
callable wrapper usable by ``evaluate_model``.
"""

from __future__ import annotations

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.compat._adapt import to_nhwc
from weaklysuperviseddl_tpu.data.mask_store import MaskStore
from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
from weaklysuperviseddl_tpu.train.segmentation import (
    SegTrainState,
    _normalize_images,
    create_seg_state,
    evaluate_segmentation,
    train_segmentation_model as _train_seg,
)
from weaklysuperviseddl_tpu.utils.metrics import compute_iou_and_acc


class SegModelHandle:
    """Torch-module-flavoured wrapper: ``model(x)['out']`` returns NCHW logits
    like torchvision's deeplab (ref SegmentationModel.py:102)."""

    def __init__(self, module: DeepLabV3, state: SegTrainState, input_size: int = 256):
        self.module = module
        self.state = state
        self.input_size = input_size
        self._apply = jax.jit(
            lambda p, s, x: module.apply({"params": p, "batch_stats": s}, x, train=False)
        )

    def __call__(self, x):
        x, _ = to_nhwc(x)
        logits = self._apply(self.state.params, self.state.batch_stats, x)
        return {"out": jnp.transpose(logits, (0, 3, 1, 2))}

    def eval(self):
        return self

    def to(self, device=None):
        return self


def initialize_model(num_classes: int = 2, device=None, backbone_depth: int = 50,
                     width_multiplier: float = 1.0, input_size: int = 256,
                     lr: float = 1e-4, seed: int = 0):
    """DeepLabV3 with a num_classes 1×1 head (ref SegmentationModel.py:86-88 /
    SupervisedModel.py:13-16). Returns (handle, tx)."""
    module = DeepLabV3(num_classes=num_classes, backbone_depth=backbone_depth,
                       width_multiplier=width_multiplier)
    state, tx = create_seg_state(module, jax.random.PRNGKey(seed), input_size=input_size, lr=lr)
    return SegModelHandle(module, state, input_size), tx


def train_segmentation_model(loss_fn="cross_entropy", run_id="default", lr=1e-4,
                             num_epochs=10, batch_size=4, val_split=0.2,
                             root: str | None = None, val_loader=None,
                             backbone_depth: int = 50, width_multiplier: float = 1.0,
                             seg_size: int = 256, log=print):
    """Reference signature (SegmentationModel.py:59-122)."""
    root = root or tempfile.gettempdir()
    image_dir = os.path.join(root, f"images_{run_id}")
    mask_dir = os.path.join(root, f"pseudo_masks_{run_id}")

    from PIL import Image

    images, masks = [], []
    for fname in sorted(os.listdir(mask_dir)):
        m = np.asarray(Image.open(os.path.join(mask_dir, fname)).convert("L"))
        masks.append((m == 255).astype(np.uint8))
        images.append(np.asarray(Image.open(os.path.join(image_dir, fname)).convert("RGB")))
    images = np.stack(images)
    masks = np.stack(masks)

    handle, tx = initialize_model(2, backbone_depth=backbone_depth,
                                  width_multiplier=width_multiplier,
                                  input_size=seg_size, lr=lr)

    eval_fn = None
    if val_loader is not None:
        eval_fn = lambda st: evaluate_segmentation(
            handle.module, st, val_loader(), seg_size=seg_size, eval_size=None
        )

    handle.state, final_loss = _train_seg(
        handle.module, handle.state, tx, images, masks,
        loss_fn=loss_fn, num_epochs=num_epochs, batch_size=batch_size,
        seg_size=seg_size, run_id=run_id, eval_fn=eval_fn, log=log,
    )
    return handle, final_loss


def evaluate_model(model: SegModelHandle, test_loader, log=print):
    """Reference signature (SegmentationModel.py:126-159): per-image binary
    IoU/acc vs trimap==1 over Batch objects."""
    ious, accs = [], []
    for batch in test_loader:
        out = model(jnp.asarray(batch.image).astype(jnp.float32) / 255.0)["out"]
        preds = jnp.argmax(out, axis=1)
        for i in range(batch.num_valid):
            true_mask = (jnp.asarray(batch.trimap[i]) == 1).astype(jnp.int32)
            p = preds[i]
            if p.shape != true_mask.shape:
                from weaklysuperviseddl_tpu.ops.resize import resize_nearest

                p = resize_nearest(p, true_mask.shape, torch_legacy=True)
            iou, acc = compute_iou_and_acc(p, true_mask)
            ious.append(float(iou))
            accs.append(float(acc))
    avg_iou = sum(ious) / len(ious)
    avg_acc = sum(accs) / len(accs)
    log(f"\n Model Evaluation on Test Set: IoU = {avg_iou:.4f} | Acc = {avg_acc:.4f}")
    return avg_iou, avg_acc
