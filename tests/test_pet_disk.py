"""Real Oxford-Pet disk-layout ingestion (fake tiny dataset on disk)."""

import numpy as np
import pytest
from PIL import Image

from weaklysuperviseddl_tpu.data import download_data, load_split_data
from weaklysuperviseddl_tpu.data.loader import batches


@pytest.fixture
def pet_root(tmp_path):
    root = tmp_path / "pet"
    (root / "images").mkdir(parents=True)
    (root / "annotations" / "trimaps").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i, (breed, cls) in enumerate([("Abyssinian_1", 1), ("Abyssinian_2", 1),
                                      ("beagle_7", 2), ("beagle_9", 2)]):
        h, w = 40 + 7 * i, 50 + 3 * i  # ragged sizes like the real dataset
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(img).save(root / "images" / f"{breed}.jpg")
        tri = rng.integers(1, 4, (h, w)).astype(np.uint8)
        Image.fromarray(tri).save(root / "annotations" / "trimaps" / f"{breed}.png")
        names.append((breed, cls))
    with open(root / "annotations" / "trainval.txt", "w") as f:
        for breed, cls in names[:3]:
            f.write(f"{breed} {cls} 1 1\n")
    with open(root / "annotations" / "test.txt", "w") as f:
        breed, cls = names[3]
        f.write(f"{breed} {cls} 2 2\n")
    return str(root)


def test_load_pet_from_disk(pet_root):
    ds = download_data(pet_root, split="trainval")
    assert len(ds) == 3
    img, (label, tri) = ds[0]
    assert img.ndim == 3 and img.shape[2] == 3
    assert label == 0  # 1-indexed class ids shift to 0-indexed
    assert set(np.unique(tri)).issubset({1, 2, 3})

    test = download_data(pet_root, split="test")
    assert len(test) == 1 and int(test.labels[0]) == 1


def test_pet_disk_split_and_batches(pet_root):
    train, val = load_split_data(pet_root, train_ratio=0.67)
    assert len(train) == 2 and len(val) == 1
    # ragged decodes get host-resized to the stack size before batching
    b = next(iter(batches(train, batch_size=2, stack_size=64)))
    assert b.image.shape == (2, 64, 64, 3)
    assert b.trimap.shape == (2, 64, 64)
