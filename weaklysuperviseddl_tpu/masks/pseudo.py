"""Pseudo-mask generation: CAM → threshold → largest component → store.

Reference pipeline: ``generate_pseudo_masks`` (TraditionalModel/PsuedoMasks.py:23-79)
runs per image on the host, round-tripping through skimage. Here the whole
batch — LayerCAM, thresholding, connected components — is device work; only
the optional PNG persistence touches the host (data/mask_store.py keeps the
reference's file contract).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.cam.layercam import layercam
from weaklysuperviseddl_tpu.data.mask_store import MaskStore
from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
from weaklysuperviseddl_tpu.masks.components import keep_largest_batch


@partial(jax.jit, static_argnames=("keep_largest_masks",))
def cam_to_mask(cam: jnp.ndarray, cam_thresh: float, keep_largest_masks: bool = True):
    """[B,H,W] CAM in [0,1] → uint8 {0,1} masks.

    Reference semantics (PsuedoMasks.py:58-65): zero below threshold, binarize
    (>0), optionally keep only the largest connected component.
    """
    cam = jnp.where(cam < cam_thresh, 0.0, cam)
    mask = (cam > 0.0).astype(jnp.uint8)
    if keep_largest_masks:
        mask = keep_largest_batch(mask)
    return mask


def generate_pseudo_masks(
    loader,
    model,
    variables,
    cam_thresh: float = 0.3,
    alpha: float = 1.0,
    keep_largest_masks: bool = True,
    run_id: str = "default",
    target_layers=("layer3", "layer4"),
    alpha_mode: str = "per_layer",
    image_size: int = 224,
    max_images: int = 500,
    store_dir: str | None = None,
    use_crf: bool = False,
    crf_kwargs: dict | None = None,
) -> MaskStore:
    """Batched pseudo-mask generation over a loader of Batch objects.

    Matches the reference contract (PsuedoMasks.py:23-79): ground-truth class
    labels drive CAM selection; output capped at ``max_images``; masks and
    min-max-unnormalized images land in a (optionally PNG-backed) MaskStore
    keyed by zero-padded running id.
    """
    store = MaskStore(directory=store_dir)
    img_id = 0
    for batch in loader:
        if img_id >= max_images:
            break
        x, _ = preprocess_batch(jnp.asarray(batch.image), None, size=image_size)
        cam, _ = layercam(
            model, variables, x, jnp.asarray(batch.label),
            target_layers=tuple(target_layers), alpha=alpha,
            alpha_mode=alpha_mode, output_size=image_size,
        )
        if use_crf:
            # script-path variant (AlternatingDirectionCutLoss.py:530-558):
            # zero the CAM below threshold, then refine with the dense CRF
            from weaklysuperviseddl_tpu.masks.densecrf import apply_dense_crf

            cam = jnp.where(cam < cam_thresh, 0.0, cam)
            masks = apply_dense_crf(x * 255.0, cam, **(crf_kwargs or {}))
            if keep_largest_masks:
                masks = keep_largest_batch(masks)
        else:
            masks = cam_to_mask(cam, cam_thresh, keep_largest_masks)
        masks_np = np.asarray(masks)
        images_np = np.asarray(x)
        for i in range(batch.num_valid):
            if img_id >= max_images:
                break
            store.put(f"{img_id:05d}", images_np[i], masks_np[i])
            img_id += 1
    return store
