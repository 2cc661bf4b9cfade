"""Minimal host-side batcher feeding the on-device preprocessing pipeline.

Replaces the reference's torch ``DataLoader(num_workers=4)`` (ref
AlternatingDirectionCutLoss.py:476). Ragged raw decodes are host-resized once
to a common stacking size; everything downstream is device work.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator

import numpy as np


@dataclass
class Batch:
    image: np.ndarray   # [B,H,W,3] uint8
    label: np.ndarray   # [B] int32
    trimap: np.ndarray  # [B,H,W] uint8
    # count of real (non-padded) examples; == B except possibly the last batch
    num_valid: int = -1

    def __post_init__(self):
        if self.num_valid < 0:
            self.num_valid = self.image.shape[0]


def _host_resize(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((size, size), Image.BILINEAR), np.uint8
    )


def _host_resize_nearest(mask: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.fromarray(mask).resize((size, size), Image.NEAREST), np.uint8)


def _is_uniform(dataset) -> bool:
    """True when every decoded image shares one shape (stackable as-is).

    Checks EVERY shape — ``images`` holds decoded arrays, so this is a
    metadata scan, and real Pet has runs of same-shape decodes (500×375 is
    common) that a first-K sample would mistake for a uniform dataset."""
    first = dataset.images[0].shape if len(dataset) else None
    return all(img.shape == first for img in dataset.images)


def _sample_at(dataset, i: int, uniform: bool, stack_size: int):
    """(image, trimap) at index i, host-resized iff the dataset is ragged —
    the ONE resize policy behind both ``batches`` and ``stack_dataset`` (the
    'identical pixels' parity contract of the resident-vs-loader evals)."""
    img, tri = dataset.images[i], dataset.trimaps[i]
    if not uniform:
        img = _host_resize(img, stack_size)
        tri = _host_resize_nearest(tri, stack_size)
    return img, tri


def batches(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    stack_size: int | None = None,
    drop_remainder: bool = False,
    pad_to_full: bool = False,
) -> Iterator[Batch]:
    """Yield stacked uint8 batches. If images are ragged (real Pet decodes),
    they are host-resized to ``stack_size`` (default: 256) before stacking;
    uniform datasets (synthetic) stack as-is.

    ``pad_to_full`` repeats the last example to keep shapes static (jit/SPMD
    friendly); ``Batch.num_valid`` records the real count.
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    uniform = _is_uniform(dataset)
    ss = stack_size or 256

    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if drop_remainder and len(idx) < batch_size:
            return
        imgs, tris = [], []
        for i in idx:
            img, tri = _sample_at(dataset, i, uniform, ss)
            imgs.append(img)
            tris.append(tri)
        num_valid = len(idx)
        if pad_to_full and num_valid < batch_size:
            pad = batch_size - num_valid
            imgs += [imgs[-1]] * pad
            tris += [tris[-1]] * pad
            idx = np.concatenate([idx, np.repeat(idx[-1], pad)])
        yield Batch(
            image=np.stack(imgs).astype(np.uint8),
            label=dataset.labels[idx].astype(np.int32),
            trimap=np.stack(tris),
            num_valid=num_valid,
        )


def stack_dataset(dataset, stack_size: int | None = None):
    """Drain a PetDataset ONCE into stacked arrays for device-resident use:
    (images [N,H,W,3] uint8, labels [N] int32, trimaps [N,H,W] uint8).

    Ragged raw decodes (real Pet) are host-resized exactly like ``batches``
    does (bilinear images / nearest trimaps at ``stack_size``, default 256),
    so a loader over the dataset and these arrays see identical pixels — the
    parity contract behind evaluate_segmentation_dataset == the loader eval
    (tests/test_train.py)."""
    n = len(dataset)
    uniform = _is_uniform(dataset)
    ss = stack_size or 256
    imgs, tris = [], []
    for i in range(n):
        img, tri = _sample_at(dataset, i, uniform, ss)
        imgs.append(img)
        tris.append(tri)
    return (
        np.stack(imgs).astype(np.uint8),
        dataset.labels.astype(np.int32),
        np.stack(tris).astype(np.uint8),
    )


def prefetch(iterator, size: int = 2):
    """Background-thread prefetcher: host decode/stack overlaps device compute
    (the TPU-idiomatic stand-in for the reference's DataLoader(num_workers=4),
    AlternatingDirectionCutLoss.py:476)."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
