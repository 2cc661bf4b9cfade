"""Reference surface: TraditionalModel/SegmentationDataset.py.

``PseudoSegmentationDataset(img_dir, mask_dir, transform)`` keeps the
reference contract: sorted-filename alignment of two PNG directories, joint
transform (resize 256², ToTensor+ImageNet-normalize image, NEAREST-resize
mask), ``__getitem__ → (image, mask)`` — with the CutLoss variant's third
filename element available via ``return_name=True``
(AlternatingDirectionCutLoss.py:431-466).

Arrays come back NHWC float32 / int32 (the TPU layout); the torch variant's
NCHW is a transpose away.
"""

from __future__ import annotations

import os

import numpy as np


class PseudoSegmentationDataset:
    def __init__(self, img_dir, mask_dir, transform=False, return_name=False):
        self.img_dir = img_dir
        self.mask_dir = mask_dir
        self.image_list = sorted(os.listdir(img_dir))
        self.mask_list = sorted(os.listdir(mask_dir))
        self.transform = transform
        self.return_name = return_name

    def __len__(self):
        return len(self.image_list)

    def joint_transform(self, image, mask):
        """Resize 256² + ImageNet normalize; NEAREST mask resize (ref :19-28)."""
        from PIL import Image as PILImage

        image = image.resize((256, 256), PILImage.BILINEAR)
        mask = mask.resize((256, 256), PILImage.NEAREST)
        img = np.asarray(image, np.float32) / 255.0
        img = (img - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
            [0.229, 0.224, 0.225], np.float32
        )
        m = np.asarray(mask).astype(np.int64)
        return img, m

    def __getitem__(self, idx):
        from PIL import Image as PILImage

        img_path = os.path.join(self.img_dir, self.image_list[idx])
        mask_path = os.path.join(self.mask_dir, self.mask_list[idx])
        image = PILImage.open(img_path).convert("RGB")
        mask = PILImage.open(mask_path).convert("L")

        if self.transform:
            image, mask = self.joint_transform(image, mask)
        else:
            image = np.asarray(image)
            mask = np.asarray(mask)

        if self.return_name:
            return image, mask, os.path.basename(img_path)
        return image, mask
