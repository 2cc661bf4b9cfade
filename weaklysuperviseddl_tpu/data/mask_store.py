"""Versioned pseudo-mask artifact store.

In the reference, pseudo-mask PNG directories ARE the durable pipeline state:
stages communicate via files and refinement overwrites masks in place
(ref PsuedoMasks.py:31-36,68-74; AlternatingDirectionCutLoss.py:808-809;
SURVEY.md §5 checkpoint/resume). This store keeps that contract — byte-stable
PNG round-trips, sorted-filename alignment (ref SegmentationDataset.py:12-13) —
while adding an in-memory fast path so the TPU training loop never touches the
filesystem unless asked to persist.

PNG value convention matches the reference's ``save_image(float mask)``:
masks are stored as 8-bit PNGs with {0, 255}; loading maps back to {0, 1}
(the reference's ``(mask == 255)`` reload at AlternatingDirectionCutLoss.py:726).

Writes go through the native asynchronous PNG writer (native/wsdl_io.cpp —
threaded zlib encoder; the Python loop driving the TPU never stalls on
compression), with PIL as the fallback when the native library can't build.
``flush()`` is the durability barrier; stage boundaries call it before the
directory is read (mirroring the reference's implicit file-system ordering).
"""

from __future__ import annotations

import os

import numpy as np


def _native_io():
    try:
        from weaklysuperviseddl_tpu import native

        native._load()
        return native
    except Exception:
        return None


class MaskStore:
    """Holds (image uint8 [H,W,3], mask uint8 {0,1} [H,W]) pairs by string key."""

    def __init__(self, directory: str | None = None):
        self.directory = directory
        self._images: dict[str, np.ndarray] = {}
        self._masks: dict[str, np.ndarray] = {}
        self._dirty = False
        if directory is not None:
            self.image_dir = os.path.join(directory, "images")
            self.mask_dir = os.path.join(directory, "pseudo_masks")
            os.makedirs(self.image_dir, exist_ok=True)
            os.makedirs(self.mask_dir, exist_ok=True)

    # -- write ---------------------------------------------------------------
    def put(self, key: str, image: np.ndarray | None, mask: np.ndarray):
        mask = np.asarray(mask).astype(np.uint8)
        assert mask.ndim == 2
        self._masks[key] = mask
        if image is not None:
            image = np.asarray(image)
            if image.dtype != np.uint8:
                # reference min-max unnormalizes before saving (PsuedoMasks.py:72-74)
                lo, hi = image.min(), image.max()
                image = ((image - lo) / max(hi - lo, 1e-8) * 255).astype(np.uint8)
            self._images[key] = image
        if self.directory is not None:
            self._write_png(key, image, mask)

    def update_mask(self, key: str, mask: np.ndarray):
        """Refinement overwrite (ref AlternatingDirectionCutLoss.py:808-809)."""
        self.put(key, None, mask)

    def _write_png(self, key, image, mask):
        nat = _native_io()
        if nat is not None:
            nat.png_write_async(os.path.join(self.mask_dir, f"{key}.png"), mask * 255)
            if image is not None:
                nat.png_write_async(os.path.join(self.image_dir, f"{key}.png"), image)
            self._dirty = True
            return
        from PIL import Image

        Image.fromarray(mask * 255).save(os.path.join(self.mask_dir, f"{key}.png"))
        if image is not None:
            Image.fromarray(image).save(os.path.join(self.image_dir, f"{key}.png"))

    def flush(self):
        """Durability barrier: returns once every queued PNG write landed."""
        if getattr(self, "_dirty", False):
            nat = _native_io()
            if nat is not None:
                nat.io_flush()
            self._dirty = False

    # -- read ----------------------------------------------------------------
    def keys(self):
        return sorted(self._masks.keys())

    def __len__(self):
        return len(self._masks)

    def get(self, key: str):
        return self._images.get(key), self._masks[key]

    def as_arrays(self):
        """Stacked (images [N,H,W,3] uint8, masks [N,H,W] uint8 {0,1}, keys),
        sorted by key — the in-memory fast path replacing the reference's
        PseudoSegmentationDataset directory re-listing."""
        ks = self.keys()
        images = np.stack([self._images[k] for k in ks])
        masks = np.stack([self._masks[k] for k in ks])
        return images, masks, ks

    @classmethod
    def load(cls, directory: str) -> "MaskStore":
        """Rehydrate from PNG dirs (reference reload semantics: mask pixel 255
        → fg, matching the (mask==255) binarize at AlternatingDirectionCutLoss.py:726)."""
        from PIL import Image

        nat = _native_io()
        if nat is not None:
            nat.io_flush()  # pending async writes must land before re-listing
        store = cls(directory=None)
        store.directory = None
        image_dir = os.path.join(directory, "images")
        mask_dir = os.path.join(directory, "pseudo_masks")
        for fname in sorted(os.listdir(mask_dir)):
            key = os.path.splitext(fname)[0]
            mask = np.asarray(Image.open(os.path.join(mask_dir, fname)).convert("L"))
            store._masks[key] = (mask == 255).astype(np.uint8)
            ipath = os.path.join(image_dir, fname)
            if os.path.exists(ipath):
                store._images[key] = np.asarray(Image.open(ipath).convert("RGB"))
        return store
