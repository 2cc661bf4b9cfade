"""Pseudo-mask generation: CAM → threshold → largest component → store.

Reference pipeline: ``generate_pseudo_masks`` (TraditionalModel/PsuedoMasks.py:23-79)
runs per image on the host, round-tripping through skimage. Here the whole
batch — LayerCAM, thresholding, connected components — is device work; only
the optional PNG persistence touches the host (data/mask_store.py keeps the
reference's file contract).

Two-stage factoring (VERDICT r3 #2): CAM extraction (the expensive LayerCAM
forward + vjp over the train set) and mask derivation (threshold → optional
CRF → largest-component — cheap device postprocessing) are separate device
programs.  ``generate_pseudo_masks`` composes them, so the one-shot path is
bit-identical to extract-once-derive-many; the ablation grid
(pipelines/ablations.py) extracts CAMs ONCE and derives masks per
(threshold, keep_largest, crf) combo instead of recomputing identical CAMs
per grid point × repeat — the reference recomputes them every time
(Abalations.py:9-29).
"""

from __future__ import annotations

from dataclasses import dataclass
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


def _index_table(n: int, batch_size: int) -> np.ndarray:
    """Padded [T,B] index table over n items (padded rows repeat the last
    index; their outputs are dropped on the host side)."""
    B = batch_size
    T = (n + B - 1) // B
    idx = np.concatenate([np.arange(n), np.repeat(n - 1, T * B - n)])
    return idx.reshape(T, B).astype(np.int32)


@dataclass
class ResidentCams:
    """CAM extraction output: everything mask derivation needs, computed
    once. Per-image CAM values are independent of batch composition
    (eval-mode BN, per-sample ops), so masks derived from a reordered view
    are bit-identical to recomputing CAMs in that order.

    ``on_device=True`` (default): arrays live in HBM, mask derivation is one
    scanned dispatch over device-resident data. ``on_device=False`` (the
    ``spill_to_host`` extraction path): arrays are host numpy and derivation
    streams windows through the device — same numerics, bounded HBM
    (see docs/SCALING.md "Device-residency memory model")."""

    images_raw: jnp.ndarray     # [N,H,W,3] uint8, the loader's raw decodes
    cams: jnp.ndarray           # [N,S,S] float32 in [0,1]
    store_images: jnp.ndarray   # [N,S,S,3] uint8 (min-max unnormalized)
    image_size: int
    batch_size: int
    on_device: bool = True

    def __len__(self):
        return int(self.cams.shape[0])

    def resident_bytes(self) -> int:
        """HBM bytes this extraction holds resident (0 in spill mode) —
        the documented budget: N·(H·W·3 + S²·4 + S²·3)."""
        if not self.on_device:
            return 0
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in (self.images_raw, self.cams, self.store_images))


def extract_cams(
    loader,
    model,
    variables,
    alpha: float = 1.0,
    target_layers=("layer3", "layer4"),
    alpha_mode: str = "per_layer",
    image_size: int = 224,
    max_images: int | None = 500,
    batches_per_dispatch: int | None = None,
    spill_to_host: bool = False,
) -> ResidentCams:
    """Stage 1: drain the loader ONCE, upload ONCE, run LayerCAM over the
    whole set as scanned batches per device program (None = everything in one
    dispatch). The expensive part of pseudo-mask generation, factored so grid
    searches run it once (reference recomputes per combo, Abalations.py:9-29).

    ``spill_to_host=True``: the streaming degradation for datasets beyond
    HBM. Each ``batches_per_dispatch`` window (default 8 batches) is uploaded,
    swept, and read back to host numpy before the next window — device
    residency is bounded at one window (B·K·~0.5 MB at 224²) instead of
    N·~0.5 MB for the whole set, at the cost of re-upload during mask
    derivation. Per-batch programs see identical shapes and values, so the
    CAMs/masks are bit-identical to the resident path (tested). The memory
    model and where the resident path breaks are documented in
    docs/SCALING.md "Device-residency memory model"."""
    imgs_np, labels_np = [], []
    n = 0
    batch_size = None
    cap = np.inf if max_images is None else max_images
    for batch in loader:
        if n >= cap:
            break
        batch_size = batch.image.shape[0] if batch_size is None else batch_size
        take = int(min(batch.num_valid, cap - n))
        imgs_np.append(np.asarray(batch.image[:take], np.uint8))
        labels_np.append(np.asarray(batch.label[:take], np.int32))
        n += take
    if n == 0:
        return ResidentCams(
            jnp.zeros((0, image_size, image_size, 3), jnp.uint8),
            jnp.zeros((0, image_size, image_size), jnp.float32),
            jnp.zeros((0, image_size, image_size, 3), jnp.uint8),
            image_size, batch_size or 1)
    images_all = np.concatenate(imgs_np)      # [N,H,W,3] uint8
    labels_all = np.concatenate(labels_np)    # [N]

    B = batch_size
    idx_table = _index_table(n, B)
    T = idx_table.shape[0]

    def cam_batch(variables, raw, lab):
        # the ONE per-batch CAM body — shared by the resident (device
        # gather) and spill (direct content) sweeps so they cannot drift
        x, _unused = preprocess_batch(raw, None, size=image_size)
        cam, _logits = layercam(
            model, variables, x, lab,
            target_layers=tuple(target_layers), alpha=alpha,
            alpha_mode=alpha_mode, output_size=image_size,
        )
        return cam.astype(jnp.float32), _store_image_u8(x)

    if spill_to_host:
        K = batches_per_dispatch or 8

        @jax.jit
        def sweep_content(variables, raws, labs):  # [K,B,H,W,3], [K,B]
            def body(_, rl):
                return None, cam_batch(variables, *rl)
            _, out = jax.lax.scan(body, None, (raws, labs))
            return out                         # [K,B,S,S], [K,B,S,S,3]

        cams_np = np.empty((T * B, image_size, image_size), np.float32)
        store_np = np.empty((T * B, image_size, image_size, 3), np.uint8)
        for start in range(0, T, K):
            chunk = idx_table[start : start + K]
            k0 = chunk.shape[0]
            if k0 < K:  # keep the jit shape static across windows
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], K - k0, axis=0)])
            c, im = sweep_content(variables,
                                  jnp.asarray(images_all[chunk]),
                                  jnp.asarray(labels_all[chunk]))
            # window readback BEFORE the next upload: host numpy is the
            # accumulator, the device never holds more than one window
            cams_np[start * B : (start + k0) * B] = np.asarray(
                c[:k0]).reshape(-1, image_size, image_size)
            store_np[start * B : (start + k0) * B] = np.asarray(
                im[:k0]).reshape(-1, image_size, image_size, 3)
        return ResidentCams(images_all, cams_np[:n], store_np[:n],
                            image_size, B, on_device=False)

    dev_images = jax.device_put(jnp.asarray(images_all))
    dev_labels = jax.device_put(jnp.asarray(labels_all))

    @jax.jit
    def sweep(variables, dev_images, dev_labels, idxs):
        def body(_, idx):
            return None, cam_batch(variables, dev_images[idx], dev_labels[idx])
        _, (cams, imgs) = jax.lax.scan(body, None, idxs)
        return cams, imgs                      # [K,B,S,S], [K,B,S,S,3]

    K = T if batches_per_dispatch is None else min(batches_per_dispatch, T)
    cams_out, imgs_out = [], []
    for start in range(0, T, K):
        chunk = idx_table[start : start + K]
        if chunk.shape[0] < K:  # keep the jit shape static across chunks
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], K - chunk.shape[0], axis=0)])
        c, im = sweep(variables, dev_images, dev_labels, jnp.asarray(chunk))
        cams_out.append(c.reshape(-1, *c.shape[2:]))
        imgs_out.append(im.reshape(-1, *im.shape[2:]))
    cams = jnp.concatenate(cams_out)[:n] if len(cams_out) > 1 else cams_out[0][:n]
    store_imgs = (jnp.concatenate(imgs_out)[:n] if len(imgs_out) > 1
                  else imgs_out[0][:n])
    return ResidentCams(dev_images, cams, store_imgs, image_size, B)


def _derive_batch(raw, cam, cam_thresh, keep_largest, crf, image_size,
                  crf_items):
    """The ONE per-batch derivation body — shared by the resident (device
    gather) and spill (direct content) programs so they cannot drift."""
    if crf:
        # script-path variant (AlternatingDirectionCutLoss.py:530-558):
        # zero the CAM below threshold, then refine with the dense CRF
        from weaklysuperviseddl_tpu.masks.densecrf import apply_dense_crf

        x, _unused = preprocess_batch(raw, None, size=image_size)
        cam_t = jnp.where(cam < cam_thresh, 0.0, cam)
        m = apply_dense_crf(x * 255.0, cam_t, **dict(crf_items))
        if keep_largest:
            m = keep_largest_batch(m)
    else:
        m = cam_to_mask(cam, cam_thresh, keep_largest)
    return m.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("keep_largest", "crf", "image_size",
                                   "crf_items"))
def _derive_masks(dev_images, cams, idxs, cam_thresh, keep_largest, crf,
                  image_size, crf_items):
    """Mask derivation program (module-level jit: the trace persists across
    grid combos — cam_thresh is a RUNTIME arg, so the 12-point reference grid
    compiles this once per (keep_largest, crf) rather than per threshold)."""
    def body(_, idx):
        raw = dev_images[idx] if crf else None
        return None, _derive_batch(raw, cams[idx], cam_thresh, keep_largest,
                                   crf, image_size, crf_items)
    _, masks = jax.lax.scan(body, None, idxs)
    return masks                               # [T,B,S,S]


@partial(jax.jit, static_argnames=("keep_largest", "crf", "image_size",
                                   "crf_items"))
def _derive_masks_direct(images_b, cams_b, cam_thresh, keep_largest, crf,
                         image_size, crf_items):
    """Spill-mode derivation: batch CONTENT arrives as arguments (one
    window's upload) instead of indices into device-resident arrays. Per
    batch it runs the identical body on identical shapes, so outputs are
    bit-identical to _derive_masks (tested)."""
    def body(_, args):
        raw, cam = args
        return None, _derive_batch(raw if crf else None, cam, cam_thresh,
                                   keep_largest, crf, image_size, crf_items)
    _, masks = jax.lax.scan(body, None, (images_b, cams_b))
    return masks                               # [K,B,S,S]


def masks_from_cams(
    resident: ResidentCams,
    cam_thresh: float = 0.3,
    keep_largest_masks: bool = True,
    use_crf: bool = False,
    crf_kwargs: dict | None = None,
    store_dir: str | None = None,
    order: np.ndarray | None = None,
    max_images: int | None = None,
) -> MaskStore:
    """Stage 2: threshold → (optional dense CRF) → largest component over
    device-resident CAMs, one scanned dispatch; results land in a MaskStore
    keyed by zero-padded running id (the reference contract).

    ``order``: optional [M] index array — derive masks for the images in this
    order (e.g. the per-repeat shuffled loader order of the ablation grid),
    bit-identical to having extracted CAMs from a loader in that order.
    ``max_images`` caps the output AFTER ordering (the reference caps its
    shuffled stream, PsuedoMasks.py:34)."""
    store = MaskStore(directory=store_dir)
    n_all = len(resident)
    if n_all == 0:
        return store
    order = np.arange(n_all) if order is None else np.asarray(order, np.int64)
    if max_images is not None:
        order = order[:max_images]
    n = order.shape[0]
    if n == 0:
        return store

    B = resident.batch_size
    pos_table = _index_table(n, B)            # positions into `order`
    idx_table = order[pos_table].astype(np.int32)  # dataset indices
    T = idx_table.shape[0]
    image_size = resident.image_size

    crf_items = tuple(sorted((crf_kwargs or {}).items())) if use_crf else ()
    if resident.on_device:
        masks = _derive_masks(
            resident.images_raw, resident.cams, jnp.asarray(idx_table),
            jnp.float32(cam_thresh), keep_largest_masks, use_crf, image_size,
            crf_items)
        # two bulk readbacks: masks + the (reordered) store images
        masks_np = np.asarray(masks).reshape(-1, image_size, image_size)[:n]
        if n == n_all and np.array_equal(order, np.arange(n_all)):
            images_np = np.asarray(resident.store_images)
        else:
            images_np = np.asarray(resident.store_images[jnp.asarray(order)])
    else:
        # spill mode: stream windows of K batches through the device —
        # upload window content, derive, read back; HBM holds one window
        K = min(8, T)
        masks_np = np.empty((T * B, image_size, image_size), np.uint8)
        dummy = np.zeros((K, B, 1, 1, 3), np.uint8)  # crf=False: raw unused
        for start in range(0, T, K):
            chunk = idx_table[start : start + K]
            k0 = chunk.shape[0]
            if k0 < K:  # keep the jit shape static across windows
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], K - k0, axis=0)])
            imgs_b = (jnp.asarray(resident.images_raw[chunk]) if use_crf
                      else jnp.asarray(dummy))
            m = _derive_masks_direct(
                imgs_b, jnp.asarray(resident.cams[chunk]),
                jnp.float32(cam_thresh), keep_largest_masks, use_crf,
                image_size, crf_items)
            masks_np[start * B : (start + k0) * B] = np.asarray(
                m[:k0]).reshape(-1, image_size, image_size)
        masks_np = masks_np[:n]
        images_np = resident.store_images[order]  # host numpy gather

    for img_id in range(n):
        store.put(f"{img_id:05d}", images_np[img_id], masks_np[img_id])
    store.flush()  # durability barrier: the directory is this stage's output
    return store


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
    spill_to_host: bool = False,
) -> MaskStore:
    """Device-resident batched pseudo-mask generation over a loader of Batch
    objects — extract_cams ∘ masks_from_cams (see module docstring).

    Matches the reference contract (PsuedoMasks.py:23-79): ground-truth class
    labels drive CAM selection; output capped at ``max_images``; masks and
    min-max-unnormalized images land in a (optionally PNG-backed) MaskStore
    keyed by zero-padded running id.

    Epoch-loop structure (round-2 lesson, BASELINE.md "Real epoch-loop
    throughput"): the per-batch host→device loop is transfer/dispatch-bound on
    an attached relay (~15 img/s against 600+ img/s compute). Here the loader
    is drained ONCE into host arrays, uploaded ONCE, and the
    CAM and threshold→(CRF)→largest-component sweeps each run as
    ``batches_per_dispatch`` scanned batches per device program (None = the
    entire dataset in one dispatch); outputs come back as two bulk uint8
    transfers. Per-batch traffic is zero.
    """
    del run_id  # kept for reference-signature parity
    resident = extract_cams(
        loader, model, variables, alpha=alpha, target_layers=target_layers,
        alpha_mode=alpha_mode, image_size=image_size, max_images=max_images,
        batches_per_dispatch=batches_per_dispatch,
        spill_to_host=spill_to_host,
    )
    return masks_from_cams(
        resident, cam_thresh=cam_thresh, keep_largest_masks=keep_largest_masks,
        use_crf=use_crf, crf_kwargs=crf_kwargs, store_dir=store_dir,
    )
