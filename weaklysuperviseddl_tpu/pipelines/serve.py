"""Serving path: one compiled program from raw image batch to binary masks.

The reference has no inference story beyond eval loops; for production serving
the whole pipeline — uint8 decode-normalize → DeepLabV3 forward → argmax →
(optional) largest-component cleanup — compiles into a single XLA program with
static shapes, so a server loop is one dispatch per batch.

``Predictor`` wraps it with padding to a fixed batch (static shapes ⇒ no
recompiles under ragged traffic) and exposes a simple numpy-in/numpy-out
``__call__``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
from weaklysuperviseddl_tpu.masks.components import keep_largest_batch
from weaklysuperviseddl_tpu.train.segmentation import _normalize_images


@partial(jax.jit, static_argnames=("model", "size", "clean"))
def predict_masks(model, params, batch_stats, images_uint8, size: int = 256,
                  clean: bool = False):
    """[B,h,w,3] uint8 → uint8 {0,1} masks [B,size,size], one dispatch."""
    x, _ = preprocess_batch(images_uint8, None, size=size)
    x = _normalize_images(x)
    logits = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
    masks = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
    if clean:
        masks = keep_largest_batch(masks)
    return masks


class Predictor:
    """Fixed-batch server front: pads ragged requests to ``max_batch`` so the
    compiled program is reused for every call."""

    def __init__(self, model, state, size: int = 256, max_batch: int = 16,
                 clean: bool = False):
        self.model = model
        self.params = state.params
        self.batch_stats = state.batch_stats
        self.size = size
        self.max_batch = max_batch
        self.clean = clean
        self._quantized = None  # set by quantize()

    def warmup(self, input_hw: tuple[int, int] | None = None):
        h, w = input_hw or (self.size, self.size)
        dummy = jnp.zeros((self.max_batch, h, w, 3), jnp.uint8)
        self._dispatch(dummy).block_until_ready()
        return self

    def quantize(self, calibration_images: np.ndarray, clip_ratio: float = 1.0):
        """Swap the serving program for its int8 PTQ rewrite (ops/quant.py):
        every weight conv/matmul runs on the MXU in int8 (2× the bf16 rate on
        v5e). ``calibration_images`` — uint8 [N,h,w,3], N ≥ max_batch;
        consumed in max_batch-sized windows for activation-scale calibration.
        Returns the QuantReport. Call warmup() after to pre-compile."""
        from weaklysuperviseddl_tpu.ops.quant import Int8Quantizer

        imgs = np.asarray(calibration_images)
        if imgs.shape[0] < self.max_batch:
            imgs = np.concatenate(
                [imgs] * -(-self.max_batch // imgs.shape[0]))[: self.max_batch]

        def fn(images_uint8):
            x, _ = preprocess_batch(images_uint8, None, size=self.size)
            x = _normalize_images(x)
            logits = self.model.apply(
                {"params": self.params, "batch_stats": self.batch_stats},
                x, train=False)
            masks = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            return keep_largest_batch(masks) if self.clean else masks

        example = (jnp.asarray(imgs[: self.max_batch]),)
        q = Int8Quantizer(fn, example)
        for i in range(0, imgs.shape[0] - self.max_batch + 1, self.max_batch):
            q.observe(jnp.asarray(imgs[i : i + self.max_batch]))
        qfn, report = q.build(clip_ratio=clip_ratio)
        self._quantized = jax.jit(qfn)
        return report

    def _dispatch(self, images):
        if self._quantized is not None:
            return self._quantized(images)
        return predict_masks(self.model, self.params, self.batch_stats,
                             images, size=self.size, clean=self.clean)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        n = images.shape[0]
        assert n <= self.max_batch, f"batch {n} exceeds max_batch {self.max_batch}"
        if n < self.max_batch:
            pad = np.repeat(images[-1:], self.max_batch - n, axis=0)
            images = np.concatenate([images, pad])
        masks = self._dispatch(jnp.asarray(images))
        return np.asarray(masks[:n])
