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


def _store_image_u8(x):
    """Per-image min-max unnormalize to uint8 ON DEVICE — same math the
    MaskStore applies on host (reference PsuedoMasks.py:72-74), moved into the
    generation program so the readback ships uint8, not float32."""
    lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return ((x - lo) / jnp.maximum(hi - lo, 1e-8) * 255).astype(jnp.uint8)


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
    batches_per_dispatch: int | None = None,
) -> MaskStore:
    """Device-resident batched pseudo-mask generation over a loader of Batch
    objects.

    Matches the reference contract (PsuedoMasks.py:23-79): ground-truth class
    labels drive CAM selection; output capped at ``max_images``; masks and
    min-max-unnormalized images land in a (optionally PNG-backed) MaskStore
    keyed by zero-padded running id.

    Epoch-loop structure (round-2 lesson, BASELINE.md "Real epoch-loop
    throughput"): the per-batch host→device loop is transfer/dispatch-bound on
    an attached relay (~15 img/s against 600+ img/s compute). Here the loader
    is drained ONCE into host arrays, uploaded ONCE, and the whole
    CAM→threshold→(CRF)→largest-component sweep runs as
    ``batches_per_dispatch`` scanned batches per device program (None = the
    entire dataset in one dispatch); outputs come back as two bulk uint8
    transfers. Per-batch traffic is zero.
    """
    store = MaskStore(directory=store_dir)

    # drain the loader once (host): raw uint8 images + labels, capped
    imgs_np, labels_np = [], []
    n = 0
    batch_size = None
    for batch in loader:
        if n >= max_images:
            break
        batch_size = batch.image.shape[0] if batch_size is None else batch_size
        take = min(batch.num_valid, max_images - n)
        imgs_np.append(np.asarray(batch.image[:take], np.uint8))
        labels_np.append(np.asarray(batch.label[:take], np.int32))
        n += take
    if n == 0:
        return store
    images_all = np.concatenate(imgs_np)      # [N,H,W,3] uint8
    labels_all = np.concatenate(labels_np)    # [N]

    # pad to a full [T,B] index table (padded rows recompute the last image;
    # their outputs are dropped on the host side)
    B = batch_size
    T = (n + B - 1) // B
    idx_flat = np.concatenate([np.arange(n), np.repeat(n - 1, T * B - n)])
    idx_table = idx_flat.reshape(T, B).astype(np.int32)

    dev_images = jax.device_put(jnp.asarray(images_all))
    dev_labels = jax.device_put(jnp.asarray(labels_all))

    @jax.jit
    def sweep(variables, dev_images, dev_labels, idxs):
        def body(_, idx):
            raw = dev_images[idx]
            lab = dev_labels[idx]
            x, _unused = preprocess_batch(raw, None, size=image_size)
            cam, _logits = layercam(
                model, variables, x, lab,
                target_layers=tuple(target_layers), alpha=alpha,
                alpha_mode=alpha_mode, output_size=image_size,
            )
            if use_crf:
                # script-path variant (AlternatingDirectionCutLoss.py:530-558):
                # zero the CAM below threshold, then refine with the dense CRF
                from weaklysuperviseddl_tpu.masks.densecrf import apply_dense_crf

                cam_t = jnp.where(cam < cam_thresh, 0.0, cam)
                m = apply_dense_crf(x * 255.0, cam_t, **(crf_kwargs or {}))
                if keep_largest_masks:
                    m = keep_largest_batch(m)
            else:
                m = cam_to_mask(cam, cam_thresh, keep_largest_masks)
            return None, (m.astype(jnp.uint8), _store_image_u8(x))
        _, (masks, imgs) = jax.lax.scan(body, None, idxs)
        return masks, imgs                     # [K,B,S,S], [K,B,S,S,3]

    K = T if batches_per_dispatch is None else min(batches_per_dispatch, T)
    masks_out, imgs_out = [], []
    for start in range(0, T, K):
        chunk = idx_table[start : start + K]
        if chunk.shape[0] < K:  # keep the jit shape static across chunks
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], K - chunk.shape[0], axis=0)])
        m, im = sweep(variables, dev_images, dev_labels, jnp.asarray(chunk))
        masks_out.append(np.asarray(m).reshape(-1, *m.shape[2:]))
        imgs_out.append(np.asarray(im).reshape(-1, *im.shape[2:]))
    masks_np = np.concatenate(masks_out)[: T * B]
    images_np = np.concatenate(imgs_out)[: T * B]

    for img_id in range(n):
        store.put(f"{img_id:05d}", images_np[img_id], masks_np[img_id])
    store.flush()  # durability barrier: the directory is this stage's output
    return store
