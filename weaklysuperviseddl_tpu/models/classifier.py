"""Frozen-ResNet CAM classifier — the TPU equivalent of ``FrozenResNetCAM``
(ref TraditionalModel/ClassificationModel.py:9-41).

Contract preserved: forward returns ``(logits, feature pyramid [f2, f3, f4])``.
Differences by design:
  * NHWC, flax, one jit; batch-parallel over the data mesh axis.
  * "Frozen backbone" is expressed functionally: the train step takes gradients
    only w.r.t. the fc params (see train/classifier.py) instead of mutating
    requires_grad flags.
  * BatchNorm always uses the pretrained running stats (the reference calls
    model.train() with frozen params, which would silently keep updating
    running stats — SURVEY.md §7 flags this; we pin eval-mode stats and
    document it here).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from weaklysuperviseddl_tpu.models.resnet import ResNetBackbone


class CamClassifier(nn.Module):
    num_classes: int = 37
    depth: int = 50
    width_multiplier: float = 1.0
    dilate_layer4: bool = True
    dtype: Any = jnp.float32
    cam_layers: Sequence[str] = ("layer2", "layer3", "layer4")

    def setup(self):
        self.backbone = ResNetBackbone(
            depth=self.depth,
            width_multiplier=self.width_multiplier,
            replace_stride_with_dilation=(False, False, self.dilate_layer4),
            dtype=self.dtype,
            name="backbone",
        )
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")

    def __call__(self, x, perturbations=None):
        """x: [B,H,W,3] → (logits [B,num_classes], [f2, f3, f4] NHWC).

        ``perturbations`` feeds the functional LayerCAM path (cam/layercam.py).
        BN is always in inference mode (frozen running stats).
        """
        feats = self.backbone(x, train=False, perturbations=perturbations)
        pooled = jnp.mean(feats["layer4"], axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        logits = self.fc(pooled)
        return logits, [feats["layer2"], feats["layer3"], feats["layer4"]]

    def features(self, x, perturbations=None):
        """Full named pyramid, for CAM layer selection."""
        feats = self.backbone(x, train=False, perturbations=perturbations)
        pooled = jnp.mean(feats["layer4"], axis=(1, 2))
        logits = self.fc(pooled)
        return logits, feats
