"""Reference surface: TraditionalModel/PsuedoMasks.py (filename typo preserved).

``generate_pseudo_masks(loader, layercam_gen, cam_thresh, alpha,
keep_largest_masks, run_id)`` keeps the reference signature and its file
contract — returns ``(image_save_dir, save_dir)`` of PNG directories — but
runs the CAM→threshold→largest-component pipeline batched on device.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.compat._adapt import to_array, to_hw_batch
from weaklysuperviseddl_tpu.masks.components import keep_largest as _device_keep_largest
from weaklysuperviseddl_tpu.masks.pseudo import cam_to_mask
from weaklysuperviseddl_tpu.data.mask_store import MaskStore


def delete_dir_recursive(path):
    """Reference PsuedoMasks.py:5-12."""
    if os.path.exists(path):
        shutil.rmtree(path)


def keep_largest(mask):
    """Reference PsuedoMasks.py:15-21 (skimage CC → device CC). Accepts
    numpy/torch/jnp [H,W]; returns uint8 numpy like the reference."""
    m, _ = to_hw_batch(mask)
    out = _device_keep_largest(m[0])
    return np.asarray(out, np.uint8)


def generate_pseudo_masks(
    loader,
    layercam_gen,
    cam_thresh: float = 0.3,
    alpha: float = 1.0,
    keep_largest_masks: bool = True,
    run_id: str = "default",
    root: str | None = None,
    max_images: int = 500,
):
    """Reference signature + directory contract (PsuedoMasks.py:23-79): saves
    ``{root}/pseudo_masks_{run_id}`` and ``{root}/images_{run_id}`` PNG dirs
    (root defaults to a temp dir rather than the reference's hardcoded
    /content), capped at 500 images, keyed by running id."""
    root = root or tempfile.gettempdir()
    save_dir = os.path.join(root, f"pseudo_masks_{run_id}")
    image_save_dir = os.path.join(root, f"images_{run_id}")
    for d in (save_dir, image_save_dir):
        delete_dir_recursive(d)

    store_dir = os.path.join(root, f"_store_{run_id}")
    delete_dir_recursive(store_dir)
    store = MaskStore(directory=store_dir)

    img_id = 0
    for batch in loader:
        if img_id >= max_images:
            break
        cams = layercam_gen.generate(jnp.asarray(batch.image), class_idx=jnp.asarray(batch.label),
                                     alpha=alpha)
        masks = cam_to_mask(cams, cam_thresh, keep_largest_masks)
        masks_np = np.asarray(masks)
        x = to_array(batch.image).astype(jnp.float32) / 255.0
        for i in range(batch.num_valid):
            if img_id >= max_images:
                break
            store.put(f"{img_id}", np.asarray(x[i]), masks_np[i])
            img_id += 1

    # rename the store's subdirs into the reference layout (flush first: the
    # async writers hold absolute paths into the pre-rename directories)
    store.flush()
    os.rename(store.mask_dir, save_dir)
    os.rename(store.image_dir, image_save_dir)
    delete_dir_recursive(store_dir)
    print(f"Pseudo masks saved to: {save_dir}")
    print(f"Images saved to: {image_save_dir}")
    return image_save_dir, save_dir
