"""Deterministic synthetic Oxford-Pet-like data.

The reference depends on downloading Oxford-IIIT Pet at runtime
(ref ExtraUtilities.py:33-40). In a zero-egress environment we generate
pet-shaped data with the same *contract*: RGB image in [0,1], a category label
in [0, 37), and a trimap in {1: fg, 2: bg, 3: boundary} (the Pet trimap
semantics noted in SURVEY.md §2.4).

Images contain an elliptical "pet" whose color correlates with the label so
classifiers/CAMs have real signal to find; the trimap marks the ellipse.
Everything is generated from a seeded numpy RNG so tests are reproducible.
"""

from __future__ import annotations

import numpy as np


def synthetic_pet_arrays(
    n: int,
    image_size: int = 224,
    num_classes: int = 37,
    seed: int = 0,
):
    """Returns (images [n,H,W,3] float32 in [0,1], labels [n] int32,
    trimaps [n,H,W] uint8 in {1,2,3})."""
    rng = np.random.default_rng(seed)
    H = W = image_size
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)

    images = np.empty((n, H, W, 3), np.float32)
    labels = rng.integers(0, num_classes, size=n).astype(np.int32)
    trimaps = np.empty((n, H, W), np.uint8)

    for i in range(n):
        label = labels[i]
        # Background: smooth low-frequency noise
        bg = rng.uniform(0.1, 0.5, size=(3,)).astype(np.float32)
        img = np.broadcast_to(bg, (H, W, 3)).copy()
        img += rng.normal(0, 0.03, size=(H, W, 3)).astype(np.float32)

        # Foreground ellipse; color keyed to the class label
        cy = rng.uniform(0.3, 0.7) * H
        cx = rng.uniform(0.3, 0.7) * W
        ry = rng.uniform(0.15, 0.3) * H
        rx = rng.uniform(0.15, 0.3) * W
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        fg = d <= 1.0
        boundary = (d > 1.0) & (d <= 1.35)

        hue = label / num_classes
        fg_color = np.array(
            [0.5 + 0.5 * np.cos(2 * np.pi * hue),
             0.5 + 0.5 * np.cos(2 * np.pi * (hue + 1 / 3)),
             0.5 + 0.5 * np.cos(2 * np.pi * (hue + 2 / 3))],
            np.float32,
        )
        img[fg] = fg_color + rng.normal(0, 0.05, size=(int(fg.sum()), 3)).astype(np.float32)
        img = np.clip(img, 0.0, 1.0)

        tri = np.full((H, W), 2, np.uint8)  # bg
        tri[boundary] = 3
        tri[fg] = 1

        images[i] = img
        trimaps[i] = tri

    return images, labels, trimaps
