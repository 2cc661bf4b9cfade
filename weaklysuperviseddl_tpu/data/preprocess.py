"""On-device image preprocessing pipeline.

The reference runs per-image PIL transforms on the host inside DataLoader
workers (ref ExtraUtilities.py:25-32, SegmentationDataset.py:19-28). Here the
host only decodes; the whole resize → normalize → label-shift pipeline is one
jit'd batched program (the BASELINE.json north-star item: "SegmentationDataset's
decode/resize/normalize augmentations move to an on-device image preprocessing
pipeline").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.ops.resize import resize_bicubic, resize_bilinear, resize_nearest

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


@partial(jax.jit, static_argnames=("size", "interpolation", "normalize", "shift_mask_labels", "binarize_fg"))
def preprocess_batch(
    images: jnp.ndarray,          # [B,H,W,3] uint8 or float
    trimaps: jnp.ndarray | None,  # [B,H,W] uint8 (Pet: 1=fg, 2=bg, 3=boundary)
    size: int = 224,
    interpolation: str = "bilinear",
    normalize: bool = False,
    shift_mask_labels: bool = True,
    binarize_fg: bool = False,
):
    """Batched device preprocessing.

    * image: uint8 → float/255 → resize → optional ImageNet normalize
      (bilinear = ref AlternatingDirectionCutLoss.py:13 train variant;
       bicubic  = ref ExtraUtilities.py:26 eval variant)
    * trimap: NEAREST resize (ref AlternatingDirectionCutLoss.py:17), then
      optionally ``(t - 1).clamp(0)`` (ref :19 → 0=fg, 1=bg, 2=boundary) or
      binarize to fg∈{1,3} (the LayerCAM.py:96-style fg==1 binarize is done by
      callers on the *unshifted* trimap).
    """
    x = images.astype(jnp.float32)
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = x / 255.0
    if x.shape[1] != size or x.shape[2] != size:
        if interpolation == "bicubic":
            x = resize_bicubic(x, (size, size))
        else:
            x = resize_bilinear(x, (size, size), antialias=x.shape[1] > size)
    x = jnp.clip(x, 0.0, 1.0)
    if normalize:
        x = (x - IMAGENET_MEAN) / IMAGENET_STD

    t = None
    if trimaps is not None:
        t = trimaps
        if t.shape[1] != size or t.shape[2] != size:
            # trimaps are [B,H,W]: spatial axes explicit (rank-3 default is HWC)
            t = resize_nearest(t, (size, size), torch_legacy=False, axes=(1, 2))
        t = t.astype(jnp.int32)
        if shift_mask_labels:
            t = jnp.clip(t - 1, 0, None)
        if binarize_fg:
            t = (t == 1).astype(jnp.int32)
    return x, t


def to_device_batch(images_np: np.ndarray, sharding=None):
    """Host→device transfer, optionally with a NamedSharding (batch on 'data')."""
    if sharding is None:
        return jnp.asarray(images_np)
    return jax.device_put(images_np, sharding)
