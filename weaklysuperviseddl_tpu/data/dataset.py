"""Oxford-IIIT Pet ingestion with the reference's contract.

Reference surface (kept by name, SURVEY.md §2.1 C1):
  * ``download_data(pth, split)``   — ref ExtraUtilities.py:24-41 /
    AlternatingDirectionCutLoss.py:11-29. Returns a dataset of
    ``(image, (category, trimap))`` resized to 224².
  * ``load_split_data(pth, train_ratio)`` — ref ExtraUtilities.py:43-63.
    80/20 random split of the trainval portion.

TPU-native design: decoding happens on the host (PIL), but *all* resize /
normalize / label-shift work happens on device in one jit (see
``preprocess_batch``), batched, instead of the reference's per-image PIL
transforms. When no Pet data exists on disk (zero-egress), a seeded synthetic
dataset with the same contract is used.

Pet disk layout expected under ``root``:
  images/*.jpg
  annotations/trimaps/*.png
  annotations/{trainval,test}.txt    (lines: "<image_id> <class_id 1..37> ...")
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from weaklysuperviseddl_tpu.data.synthetic import synthetic_pet_arrays

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass
class PetDataset:
    """In-memory dataset of decoded-but-unresized samples.

    ``images``: list of HWC uint8/float arrays (possibly ragged shapes, raw decode)
    ``labels``: [N] int32 category ids in [0, 37)
    ``trimaps``: list of HW uint8 arrays in {1,2,3}
    """

    images: list
    labels: np.ndarray
    trimaps: list
    split: str

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return self.images[idx], (int(self.labels[idx]), self.trimaps[idx])


def _pet_root_valid(root: str | None) -> bool:
    if root is None:
        return False
    return os.path.isdir(os.path.join(root, "images")) and os.path.isdir(
        os.path.join(root, "annotations", "trimaps")
    )


def _load_pet_from_disk(root: str, split: str, limit: int | None = None) -> PetDataset:
    from PIL import Image

    list_file = os.path.join(root, "annotations", f"{split}.txt")
    with open(list_file) as f:
        entries = [line.strip().split(" ") for line in f if line.strip() and not line.startswith("#")]
    if limit is not None:
        entries = entries[:limit]

    images, labels, trimaps = [], [], []
    for entry in entries:
        name = entry[0]
        class_id = int(entry[1]) - 1  # Pet list files are 1-indexed
        img = Image.open(os.path.join(root, "images", f"{name}.jpg")).convert("RGB")
        tri = Image.open(os.path.join(root, "annotations", "trimaps", f"{name}.png"))
        images.append(np.asarray(img, np.uint8))
        labels.append(class_id)
        trimaps.append(np.asarray(tri, np.uint8))
    return PetDataset(images, np.asarray(labels, np.int32), trimaps, split)


def _synthetic_dataset(split: str, n: int, image_size: int, seed: int, num_classes: int) -> PetDataset:
    # distinct seeds per split so train/test differ
    split_seed = seed + {"trainval": 0, "test": 10_000}.get(split, 20_000)
    images, labels, trimaps = synthetic_pet_arrays(
        n, image_size=image_size, seed=split_seed, num_classes=num_classes
    )
    return PetDataset(
        [(images[i] * 255).astype(np.uint8) for i in range(n)],
        labels,
        [trimaps[i] for i in range(n)],
        split,
    )


def download_data(
    pth: str | None = None,
    split: str = "trainval",
    synthetic_size: int = 128,
    image_size: int = 224,
    seed: int = 0,
    limit: int | None = None,
    num_classes: int = 37,
) -> PetDataset:
    """Load the Pet dataset from disk, or synthesize one with the same contract.

    Unlike the reference (which resizes inside torchvision transforms), this
    returns raw decoded samples; resizing/normalisation happens on device in
    ``preprocess_batch``.
    """
    if _pet_root_valid(pth):
        return _load_pet_from_disk(pth, split, limit=limit)
    n = synthetic_size if limit is None else min(limit, synthetic_size)
    return _synthetic_dataset(split, n, image_size, seed, num_classes)


def load_split_data(
    pth: str | None = None,
    train_ratio: float = 0.8,
    seed: int = 0,
    **kwargs,
):
    """80/20 random split of trainval (ref ExtraUtilities.py:43-63)."""
    assert 0 < train_ratio < 1, "train_ratio must be between 0 and 1 (exclusive)"
    full = download_data(pth=pth, split="trainval", seed=seed, **kwargs)
    total = len(full)
    train_size = int(train_ratio * total)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(total)
    train_idx, val_idx = perm[:train_size], perm[train_size:]

    def subset(idx):
        return PetDataset(
            [full.images[i] for i in idx],
            full.labels[idx],
            [full.trimaps[i] for i in idx],
            full.split,
        )

    return subset(train_idx), subset(val_idx)
