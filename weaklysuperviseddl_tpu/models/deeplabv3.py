"""DeepLabV3-ResNet50 in flax (NHWC) — the segmentation model.

Reference uses torchvision's ``deeplabv3_resnet50`` with the head swapped to a
2-class 1×1 conv (ref TraditionalModel/SegmentationModel.py:86-88,
FullySupervisedModel/SupervisedModel.py:14). Architecture reproduced:

  * ResNet-50 backbone at output-stride 8 (layer3+layer4 dilated — torchvision
    passes replace_stride_with_dilation=[False, True, True])
  * ASPP over layer4: 1×1 conv + three 3×3 atrous convs (rates 12/24/36) +
    global-average-pool branch, each → 256ch BN ReLU; concat → 1×1 project →
    BN → ReLU → Dropout(0.5)
  * head: 3×3 conv 256 → BN → ReLU → 1×1 conv to num_classes
  * bilinear upsample of logits to input resolution (align_corners=False)

All convs are MXU-shaped (channels multiples of 128 at width 1.0); the whole
train step jits into one program (train/segmentation.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from weaklysuperviseddl_tpu.models.resnet import ResNetBackbone, _conv, _norm
from weaklysuperviseddl_tpu.ops.resize import resize_bilinear


class _AtrousTapConv(nn.Module):
    """3×3 atrous conv as 9 per-tap 1×1 matmuls on their in-bounds regions.

    Mathematically identical to a zero-padded dilated conv (taps that land in
    the padding contribute exactly 0), but skips the dead work: at the
    reference geometry (32×32 layer4 map, rates 12/24/36 —
    torchvision ASPP defaults, ref SegmentationModel.py:86) rate 36 exceeds
    the map, so a full dilated conv spends 8/9 of its FLOPs multiplying
    zeros; rate 24 wastes ~3/4. Parameter layout is identical to nn.Conv
    (``kernel [3,3,C,F]``, no bias), so torch ingestion and checkpoints are
    unchanged. Gradients to dead taps are 0 on both formulations.

    Measured per-rate on v5e ([16,32,32,2048]→256): forward-only the native
    conv wins at rate 12 (0.85 vs 1.26 ms), but in the FULL train step the
    all-tap ASPP still beats the rate-12-native hybrid (26.1 vs 26.6 ms) —
    the native dilated conv's backward (wgrad over the fully padded window)
    gives back more than its forward saves. Rates 24/36 favor taps in every
    regime (0.57/0.13 vs 0.85 ms fwd). At 512-channel layer3/4 shapes
    (rates 2/4) native wins 4×. Crossover: taps when ``4·rate ≥ min(H, W)``;
    below that the same kernel param runs through the native dilated conv.
    """

    features: int
    rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, C, self.features), jnp.float32,
        )
        dt = self.dtype
        xc = x.astype(dt)
        if 4 * self.rate < min(H, W):
            return jax.lax.conv_general_dilated(
                xc, kernel.astype(dt), (1, 1),
                ((self.rate, self.rate), (self.rate, self.rate)),
                rhs_dilation=(self.rate, self.rate),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # accumulate partial tap sums in fp32 and round ONCE at the end —
        # matching the native conv's single-rounding numerics under bf16
        # (a bf16 accumulator would compound up to 9 rounding steps)
        out = jnp.zeros((B, H, W, self.features), jnp.float32)
        for iy, dy in enumerate((-self.rate, 0, self.rate)):
            oy0, oy1 = max(0, -dy), min(H, H - dy)
            if oy1 <= oy0:
                continue
            for ix, dx in enumerate((-self.rate, 0, self.rate)):
                ox0, ox1 = max(0, -dx), min(W, W - dx)
                if ox1 <= ox0:
                    continue
                w_tap = kernel[iy, ix].astype(dt)                  # [C, F]
                src = xc[:, oy0 + dy : oy1 + dy, ox0 + dx : ox1 + dx, :]
                contrib = jnp.einsum(
                    "bhwc,cf->bhwf", src, w_tap,
                    preferred_element_type=jnp.float32,
                )
                out = out.at[:, oy0:oy1, ox0:ox1, :].add(contrib)
        return out.astype(dt)


class ASPP(nn.Module):
    features: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32
    dropout: float = 0.5
    # freeze BN statistics (use running stats, no batch reductions) while the
    # rest of the module trains — see DeepLabV3.bn_frozen
    bn_frozen: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        bn_train = train and not self.bn_frozen
        branches = []

        b = _conv(self.features, 1, 1, 1, dt, "conv1x1")(x)
        b = _norm(dt, "bn1x1")(b, use_running_average=not bn_train)
        branches.append(nn.relu(b))

        for i, rate in enumerate(self.rates):
            b = _AtrousTapConv(self.features, rate, dt, name=f"atrous{i}")(x)
            b = _norm(dt, f"atrous_bn{i}")(b, use_running_average=not bn_train)
            branches.append(nn.relu(b))

        # image-pooling branch: global mean → 1×1 conv → BN → relu → broadcast
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        p = _conv(self.features, 1, 1, 1, dt, "pool_conv")(pooled)
        p = _norm(dt, "pool_bn")(p, use_running_average=not bn_train)
        p = nn.relu(p)
        branches.append(jnp.broadcast_to(p, x.shape[:3] + (self.features,)))

        y = jnp.concatenate(branches, axis=-1)
        y = _conv(self.features, 1, 1, 1, dt, "project")(y)
        y = _norm(dt, "project_bn")(y, use_running_average=not bn_train)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train, name="dropout")(y)
        return y


class DeepLabV3(nn.Module):
    num_classes: int = 2
    backbone_depth: int = 50
    width_multiplier: float = 1.0
    dtype: Any = jnp.float32
    # per-block remat measured slightly SLOWER on v5e (297 vs 318 img/s at
    # batch 16 bf16): the step is bandwidth-bound but recompute costs more
    # than the saved activation traffic. Kept available for memory-limited
    # configurations (larger batches/resolutions).
    remat: bool = False
    # stem execution plan: "direct" | "s2d" | "pack8" (models/resnet._Stem7x7)
    stem_plan: str = "s2d"
    # Frozen-BN fine-tuning mode: BN layers use their running statistics even
    # under train=True (dropout stays active; grads still flow to the BN
    # scale/bias affines). This is the standard FrozenBN recipe for
    # fine-tuning from pretrained weights at small batch; it also removes the
    # measured ~2.2 ms/step of batch-stat reductions and fusion breaks across
    # the net's ~53 BN layers (BASELINE.md train-BN vs eval-BN A/B). NOT the
    # reference semantics (SegmentationModel.py:59-122 trains BN) — opt-in.
    bn_frozen: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        bn_train = train and not self.bn_frozen
        H, W = x.shape[1], x.shape[2]
        feats = ResNetBackbone(
            depth=self.backbone_depth,
            width_multiplier=self.width_multiplier,
            replace_stride_with_dilation=(False, True, True),  # output stride 8
            dtype=dt,
            remat=self.remat,
            stem_plan=self.stem_plan,
            name="backbone",
        )(x, train=bn_train)  # backbone's only train-dependent behavior is BN

        head_ch = max(16, int(256 * self.width_multiplier))
        y = ASPP(features=head_ch, dtype=dt, bn_frozen=self.bn_frozen,
                 name="aspp")(feats["layer4"], train=train)
        y = _conv(head_ch, 3, 1, 1, dt, "head_conv")(y)
        y = _norm(dt, "head_bn")(y, use_running_average=not bn_train)
        y = nn.relu(y)
        # classifier[4] in the reference: 1×1 conv to num_classes
        logits = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=dt, name="classifier"
        )(y)
        logits = resize_bilinear(logits.astype(jnp.float32), (H, W))
        return logits  # [B,H,W,num_classes]
