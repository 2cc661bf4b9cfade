"""BASNet — boundary-aware saliency network, flax/NHWC.

Full from-scratch re-implementation of the reference's architecture
(PretrainedBasnetModel/model/BASNet.py:104-344 + resnet_model.py): input conv,
ResNet-34 encoder stages 1-4, two extra 512-ch BasicBlock stages with ceil-mode
max-pools, a 3×dilated-conv bridge, a 6-stage U-decoder with skip concats,
7 side-output heads bilinearly upsampled to input resolution, and a RefUnet
residual refiner; returns 8 sigmoid maps (dout, d1..d6, db).

Module names mirror the torch state-dict keys (inconv/inbn, encoder{1..4}_{i},
resb5_1.., convbg_1/bnbg_1.., conv6d_1/bn6d_1.., outconvb.., refunet.conv0..)
so pretrained ``basnet.pth`` weights ingest through models/torch_import.py.
BASNet's convs carry biases (unlike torchvision ResNet).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from weaklysuperviseddl_tpu.models.resnet import BasicBlock
from weaklysuperviseddl_tpu.ops.resize import resize_bilinear


def _conv_b(features, kernel=3, dilation=1, name=None, dtype=jnp.float32):
    pad = (kernel // 2) * dilation
    return nn.Conv(
        features, (kernel, kernel), padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation), use_bias=True, dtype=dtype, name=name,
    )


def _bn(name, dtype=jnp.float32):
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


def _pool2(x):
    """MaxPool2d(2,2,ceil_mode=True): pad odd spatial dims with -inf first."""
    H, W = x.shape[1], x.shape[2]
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up2(x):
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))


def _up_to(x, size):
    return resize_bilinear(x, (size, size))


class RefUnet(nn.Module):
    """Residual refinement U-Net (ref BASNet.py:9-102)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        ra = not train
        hx = _conv_b(64, name="conv0", dtype=dt)(x)

        hx1 = nn.relu(_bn("bn1", dt)(_conv_b(64, name="conv1", dtype=dt)(hx), use_running_average=ra))
        hx = _pool2(hx1)
        hx2 = nn.relu(_bn("bn2", dt)(_conv_b(64, name="conv2", dtype=dt)(hx), use_running_average=ra))
        hx = _pool2(hx2)
        hx3 = nn.relu(_bn("bn3", dt)(_conv_b(64, name="conv3", dtype=dt)(hx), use_running_average=ra))
        hx = _pool2(hx3)
        hx4 = nn.relu(_bn("bn4", dt)(_conv_b(64, name="conv4", dtype=dt)(hx), use_running_average=ra))
        hx = _pool2(hx4)
        hx5 = nn.relu(_bn("bn5", dt)(_conv_b(64, name="conv5", dtype=dt)(hx), use_running_average=ra))

        hx = _up2(hx5)
        d4 = nn.relu(_bn("bn_d4", dt)(
            _conv_b(64, name="conv_d4", dtype=dt)(jnp.concatenate([hx, hx4], -1)), use_running_average=ra))
        hx = _up2(d4)
        d3 = nn.relu(_bn("bn_d3", dt)(
            _conv_b(64, name="conv_d3", dtype=dt)(jnp.concatenate([hx, hx3], -1)), use_running_average=ra))
        hx = _up2(d3)
        d2 = nn.relu(_bn("bn_d2", dt)(
            _conv_b(64, name="conv_d2", dtype=dt)(jnp.concatenate([hx, hx2], -1)), use_running_average=ra))
        hx = _up2(d2)
        d1 = nn.relu(_bn("bn_d1", dt)(
            _conv_b(64, name="conv_d1", dtype=dt)(jnp.concatenate([hx, hx1], -1)), use_running_average=ra))

        residual = _conv_b(1, name="conv_d0", dtype=dt)(d1)
        return x + residual


class BASNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        ra = not train
        size = x.shape[1]

        def stage(name, num_blocks, planes, first_stride, in_ch):
            def run(h):
                for b in range(num_blocks):
                    stride = first_stride if b == 0 else 1
                    h = BasicBlock(
                        planes=planes, stride=stride,
                        has_downsample=(b == 0 and (stride != 1 or in_ch != planes)),
                        dtype=dt, name=f"{name}_{b}",
                    )(h, train=train)
                return h
            return run

        # ---- encoder ----
        hx = nn.relu(_bn("inbn", dt)(_conv_b(64, name="inconv", dtype=dt)(x), use_running_average=ra))
        h1 = stage("encoder1", 3, 64, 1, 64)(hx)     # full res
        h2 = stage("encoder2", 4, 128, 2, 64)(h1)    # /2
        h3 = stage("encoder3", 6, 256, 2, 128)(h2)   # /4
        h4 = stage("encoder4", 3, 512, 2, 256)(h3)   # /8

        hx = _pool2(h4)                               # /16
        hx = BasicBlock(512, dtype=dt, name="resb5_1")(hx, train=train)
        hx = BasicBlock(512, dtype=dt, name="resb5_2")(hx, train=train)
        h5 = BasicBlock(512, dtype=dt, name="resb5_3")(hx, train=train)

        hx = _pool2(h5)                               # /32
        hx = BasicBlock(512, dtype=dt, name="resb6_1")(hx, train=train)
        hx = BasicBlock(512, dtype=dt, name="resb6_2")(hx, train=train)
        h6 = BasicBlock(512, dtype=dt, name="resb6_3")(hx, train=train)

        # ---- bridge (3× dilated conv) ----
        hx = nn.relu(_bn("bnbg_1", dt)(_conv_b(512, dilation=2, name="convbg_1", dtype=dt)(h6), use_running_average=ra))
        hx = nn.relu(_bn("bnbg_m", dt)(_conv_b(512, dilation=2, name="convbg_m", dtype=dt)(hx), use_running_average=ra))
        hbg = nn.relu(_bn("bnbg_2", dt)(_conv_b(512, dilation=2, name="convbg_2", dtype=dt)(hx), use_running_average=ra))

        # ---- decoder ----
        def dec(name, inp, c1, cm, c2, dil_m=1, dil_2=1):
            h = nn.relu(_bn(f"bn{name}_1", dt)(_conv_b(c1, name=f"conv{name}_1", dtype=dt)(inp), use_running_average=ra))
            h = nn.relu(_bn(f"bn{name}_m", dt)(_conv_b(cm, dilation=dil_m, name=f"conv{name}_m", dtype=dt)(h), use_running_average=ra))
            h = nn.relu(_bn(f"bn{name}_2", dt)(_conv_b(c2, dilation=dil_2, name=f"conv{name}_2", dtype=dt)(h), use_running_average=ra))
            return h

        hd6 = dec("6d", jnp.concatenate([hbg, h6], -1), 512, 512, 512, dil_m=2, dil_2=2)
        hx = _up2(hd6)
        hd5 = dec("5d", jnp.concatenate([hx, h5], -1), 512, 512, 512)
        hx = _up2(hd5)
        hd4 = dec("4d", jnp.concatenate([hx, h4], -1), 512, 512, 256)
        hx = _up2(hd4)
        hd3 = dec("3d", jnp.concatenate([hx, h3], -1), 256, 256, 128)
        hx = _up2(hd3)
        hd2 = dec("2d", jnp.concatenate([hx, h2], -1), 128, 128, 64)
        hx = _up2(hd2)
        hd1 = dec("1d", jnp.concatenate([hx, h1], -1), 64, 64, 64)

        # ---- side outputs ----
        db = _up_to(_conv_b(self.n_classes, name="outconvb", dtype=dt)(hbg), size)
        d6 = _up_to(_conv_b(self.n_classes, name="outconv6", dtype=dt)(hd6), size)
        d5 = _up_to(_conv_b(self.n_classes, name="outconv5", dtype=dt)(hd5), size)
        d4 = _up_to(_conv_b(self.n_classes, name="outconv4", dtype=dt)(hd4), size)
        d3 = _up_to(_conv_b(self.n_classes, name="outconv3", dtype=dt)(hd3), size)
        d2 = _up_to(_conv_b(self.n_classes, name="outconv2", dtype=dt)(hd2), size)
        d1 = _conv_b(self.n_classes, name="outconv1", dtype=dt)(hd1)

        dout = RefUnet(dtype=dt, name="refunet")(d1, train=train)

        return tuple(nn.sigmoid(d) for d in (dout, d1, d2, d3, d4, d5, d6, db))
