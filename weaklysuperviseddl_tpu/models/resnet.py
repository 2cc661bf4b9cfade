"""ResNet backbones in flax — NHWC layouts, MXU-friendly.

TPU-first re-design of the reference's torchvision backbones:
  * classifier backbone: ResNet-50 with ``replace_stride_with_dilation =
    [False, False, True]`` → 14×14 layer4 features at 224² input
    (ref TraditionalModel/ClassificationModel.py:12)
  * DeepLabV3 backbone: output-stride 8 (layer3+layer4 dilated), the
    torchvision ``deeplabv3_resnet50`` convention (ref SegmentationModel.py:86)
  * BASNet encoder: ResNet-34 BasicBlocks (ref PretrainedBasnetModel/model/resnet_model.py)

Semantics match PyTorch exactly so pretrained ``.pth`` weights can be ingested
(models/torch_import.py): explicit symmetric conv padding (never 'SAME'),
BN eps 1e-5 / momentum 0.1 (flax momentum=0.9), -inf-padded max-pool.

Dilation follows torchvision's ``_make_layer``: when a stage is dilated its
first block keeps the *previous* dilation and stride collapses to 1; remaining
blocks use the accumulated dilation.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
BOTTLENECK_DEPTHS = (50,)


def _norm(dtype, name):
    # use_running_average is threaded at call time
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


def _conv(features, kernel, stride=1, dilation=1, dtype=jnp.float32, name=None):
    pad = (kernel // 2) * dilation
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=False, dtype=dtype, name=name,
    )


def _stem_pack8(x, kernel, features, dtype):
    """The 7×7/2 stem conv as ONE dense matmul in 8×8 space-to-depth space.

    The stride-2 7-tap conv on C_in=3 is the most layout-hostile op in the
    backbone: XLA pads the 3 (or s2d's 12) input channels to 128 lanes, so the
    conv runs at ~3 TF/s (measured 1.6 ms fwd at batch 16, 256² — for 4.9 GF
    of real work). Packing fixes the lane fill exactly:

      * zero-pad the input by 3 (the conv's own padding) to top/left and 5 to
        bottom/right, then space-to-depth by 8×8 → [B, H/8+1, W/8+1, 64C]
      * every output pixel (i = 4·bi + pi, pi∈0..3) reads padded rows
        2i..2i+6 ⊆ [8bi, 8bi+13) — i.e. a 2×2 neighborhood of 8-blocks —
        so gathering the 4 neighbor block-vectors gives a dense contraction
        axis of 4·64·C = 768 for C=3 (exactly 6 full 128-lane tiles)
      * all 16 output phases (pi, pj) of a block come from the SAME 768
        inputs, so the whole stem is einsum([B,H/8,W/8,768] @ [768, 16F]):
        M=B·HW/64, K=768, N=1024 — fully dense on the MXU
      * the phase-weight matrix scatters the 7×7 kernel at offset (2pi, 2pj)
        inside the 16×16 window; it is built IN-GRAPH from the standard
        [7,7,C,F] parameter (16 static slice-sets), so autodiff provides the
        weight gradient through the transform for free, and the image's input
        gradient (never needed — the stem is the first layer) is DCE'd.

    MEASURED NEGATIVE RESULT (kept opt-in; see BASELINE.md round 3): in the
    full train step pack8 is ~1.1 ms SLOWER than s2d (28.1 vs 26.9 ms at
    batch 16 bf16 256²) — the 26 MB X2 materialization + phase transposes
    cost more than the MXU-density win, and the isolated stem conv measures
    only ~0.5 ms fwd under 2025-era XLA layouts (the round-2 1.6 ms stem
    attribution was a prefix-delta in a contended run, not the conv alone).
    The plan stays available and parity-tested (tests/test_models.py) as the
    packing recipe for any future sub-128-channel geometry."""
    B, H, W, C = x.shape
    F = features
    # padded input: rows -3..H+4 (conv pad 3 + 2 alignment rows never read by
    # valid outputs but required so block bi+1 exists for bi = H/8-1)
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    Hb, Wb = H // 8 + 1, W // 8 + 1
    xb = (
        xp.reshape(B, Hb, 8, Wb, 8, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, Hb, Wb, 64 * C)
    )
    x2 = jnp.concatenate(
        [xb[:, :-1, :-1], xb[:, :-1, 1:], xb[:, 1:, :-1], xb[:, 1:, 1:]], axis=-1
    )  # [B, H/8, W/8, 4·64·C], neighbor order (du, dv) major

    # phase weights: W16[u, v, c, pi, pj, f] = K[u-2pi, v-2pj, c, f]
    w16 = jnp.zeros((16, 16, C, 4, 4, F), kernel.dtype)
    for pi in range(4):
        for pj in range(4):
            w16 = w16.at[2 * pi : 2 * pi + 7, 2 * pj : 2 * pj + 7, :, pi, pj, :].set(kernel)
    # flatten to X2's channel order: ((du·2+dv)·64 + ru·8+rv)·C + c
    wbig = (
        w16.reshape(2, 8, 2, 8, C, 4, 4, F)
        .transpose(0, 2, 1, 3, 4, 5, 6, 7)
        .reshape(4 * 64 * C, 16 * F)
    )
    y = jnp.einsum(
        "bijk,kp->bijp", x2.astype(dtype), wbig.astype(dtype),
        preferred_element_type=dtype,
    )
    return (
        y.reshape(B, H // 8, W // 8, 4, 4, F)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, H // 2, W // 2, F)
    )


class _Stem7x7(nn.Module):
    """The ResNet 7×7/2 stem conv with selectable execution plans. The
    parameter is ALWAYS the standard ``kernel [7,7,3,64]`` (same name/shape as
    nn.Conv, so torch ingestion and state dicts are untouched); the plans are
    mathematically identical executions:

      * ``direct``: plain stride-2 conv (XLA default)
      * ``s2d``: input rearranged to 2×2 blocks ([B,H/2,W/2,4C]), kernel
        left-padded to 8×8 and folded to [4,4,4C,F] — stride-1 on 4× the
        channels (measured 1.94 → 1.64 ms fwd at batch 16, 256²)
      * ``pack8``: one dense 768-lane matmul in 8×8 s2d space (_stem_pack8)
    """

    features: int
    dtype: Any = jnp.float32
    plan: str = "s2d"

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, C, self.features),
            jnp.float32,
        )
        B, H, W, _ = x.shape
        if self.plan == "pack8" and H % 8 == 0 and W % 8 == 0:
            return _stem_pack8(x, kernel, self.features, self.dtype)
        if self.plan == "direct" or H % 2 or W % 2:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = (
            k8.reshape(4, 2, 4, 2, C, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * C, self.features)
        )
        xr = (
            x.reshape(B, H // 2, 2, W // 2, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, H // 2, W // 2, 4 * C)
        )
        return jax.lax.conv_general_dilated(
            xr.astype(self.dtype), k.astype(self.dtype),
            (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    """2× 3×3 conv + identity residual (ResNet-18/34; ref resnet_model.py:29-58)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        out = _conv(self.planes, 3, self.stride, self.dilation, dt, "conv1")(x)
        out = _norm(dt, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dilation, dt, "conv2")(out)
        out = _norm(dt, "bn2")(out, use_running_average=not train)
        if self.has_downsample:
            res = _conv(self.planes, 1, self.stride, 1, dt, "downsample_conv")(x)
            res = _norm(dt, "downsample_bn")(res, use_running_average=not train)
        else:
            res = x
        return nn.relu(out + res)


class BasicBlockDe(nn.Module):
    """Decoder BasicBlock whose residual path is a conv+BN+ReLU instead of
    identity (ref resnet_model.py:60-96; part of the BASNet block family)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        res = _conv(self.planes, 3, self.stride, self.dilation, dt, "convRes")(x)
        res = _norm(dt, "bnRes")(res, use_running_average=not train)
        res = nn.relu(res)
        out = _conv(self.planes, 3, self.stride, self.dilation, dt, "conv1")(x)
        out = _norm(dt, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dilation, dt, "conv2")(out)
        out = _norm(dt, "bn2")(out, use_running_average=not train)
        return nn.relu(out + res)


class Bottleneck(nn.Module):
    """1-3-1 bottleneck, expansion 4 (ResNet-50; ref resnet_model.py:99-135)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        out = _conv(self.planes, 1, 1, 1, dt, "conv1")(x)
        out = _norm(dt, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, self.dilation, dt, "conv2")(out)
        out = _norm(dt, "bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, 1, dt, "conv3")(out)
        out = _norm(dt, "bn3")(out, use_running_average=not train)
        if self.has_downsample:
            res = _conv(self.planes * 4, 1, self.stride, 1, dt, "downsample_conv")(x)
            res = _norm(dt, "downsample_bn")(res, use_running_average=not train)
        else:
            res = x
        return nn.relu(out + res)


class ResNetBackbone(nn.Module):
    """Stem + 4 stages; returns the full feature pyramid.

    ``replace_stride_with_dilation`` applies to (layer2, layer3, layer4) as in
    torchvision. ``width_multiplier`` shrinks channel counts for smoke-scale
    tests (parity runs use 1.0).
    """

    depth: int = 50
    width_multiplier: float = 1.0
    replace_stride_with_dilation: Sequence[bool] = (False, False, True)
    dtype: Any = jnp.float32
    # rematerialize each residual block in the backward pass: the deep dilated
    # stages are HBM-bandwidth-bound (measured 85% of v5e bw at 30% MXU), so
    # trading activation storage for recompute speeds training up
    remat: bool = False
    # stem execution plan (identical math, same params; _Stem7x7):
    # "direct" | "s2d" | "pack8"
    stem_plan: str = "s2d"

    @nn.compact
    def __call__(self, x, train: bool = False, perturbations=None):
        """``perturbations``: optional dict {"layerN": array} added to that
        stage's output. This is the hook-free LayerCAM mechanism: differentiate
        w.r.t. a zero perturbation to get the gradient at that activation
        (replaces the reference's register_full_backward_hook machinery,
        ref LayerCAM.py:17-31) — the whole CAM path stays one jit.
        """
        dt = self.dtype
        blocks = STAGE_BLOCKS[self.depth]
        block_cls = Bottleneck if self.depth in BOTTLENECK_DEPTHS else BasicBlock
        expansion = 4 if self.depth in BOTTLENECK_DEPTHS else 1

        def width(c):
            return max(8, int(c * self.width_multiplier))

        x = _Stem7x7(width(64), dt, plan=self.stem_plan, name="conv1")(x)
        x = _norm(dt, "bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {"stem": x}
        dilation = 1
        in_ch = width(64)
        for stage_idx, (num_blocks, planes_base) in enumerate(zip(blocks, (64, 128, 256, 512))):
            planes = width(planes_base)
            stride = 1 if stage_idx == 0 else 2
            dilate = stage_idx > 0 and self.replace_stride_with_dilation[stage_idx - 1]
            previous_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            out_ch = planes * expansion
            wrapped_cls = nn.remat(block_cls, static_argnums=(2,)) if self.remat else block_cls
            for b in range(num_blocks):
                x = wrapped_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    dilation=previous_dilation if b == 0 else dilation,
                    has_downsample=(b == 0 and (stride != 1 or in_ch != out_ch)),
                    dtype=dt,
                    name=f"layer{stage_idx + 1}_{b}",
                )(x, train)
            in_ch = out_ch
            if perturbations is not None and f"layer{stage_idx + 1}" in perturbations:
                x = x + perturbations[f"layer{stage_idx + 1}"]
            feats[f"layer{stage_idx + 1}"] = x

        return feats

    @property
    def feature_channels(self):
        expansion = 4 if self.depth in BOTTLENECK_DEPTHS else 1

        def width(c):
            return max(8, int(c * self.width_multiplier))

        return {f"layer{i + 1}": width(c) * expansion for i, c in enumerate((64, 128, 256, 512))}
