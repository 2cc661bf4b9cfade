"""Test-only PyTorch mirrors used as numerical goldens.

torchvision is not installed in this environment, so tests build equivalent
torch modules here (torchvision-compatible state_dict key names) and compare
the flax implementations against them after weight conversion. This reproduces
the reference's *semantics* (SURVEY.md §2.1 C3, C20) without copying its code.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class TBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, dilation, dilation, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, dilation, dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = self.downsample(x) if self.downsample is not None else x
        return torch.relu(out + res)


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation, dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        res = self.downsample(x) if self.downsample is not None else x
        return torch.relu(out + res)


class TResNetCAM(nn.Module):
    """torchvision-style ResNet returning (logits, [f2, f3, f4]) — the
    FrozenResNetCAM contract (ref ClassificationModel.py:28-41)."""

    def __init__(self, depth=50, num_classes=37, width=1.0,
                 replace_stride_with_dilation=(False, False, True)):
        super().__init__()
        cfg = {18: (TBasicBlock, (2, 2, 2, 2)), 34: (TBasicBlock, (3, 4, 6, 3)),
               50: (TBottleneck, (3, 4, 6, 3))}
        block, blocks = cfg[depth]
        w = lambda c: max(8, int(c * width))

        self.inplanes = w(64)
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, w(64), 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(w(64))
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, w(64), blocks[0], 1, False)
        self.layer2 = self._make_layer(block, w(128), blocks[1], 2, replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(block, w(256), blocks[2], 2, replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(block, w(512), blocks[3], 2, replace_stride_with_dilation[2])
        self.fc = nn.Linear(w(512) * block.expansion, num_classes)

    def _make_layer(self, block, planes, num_blocks, stride, dilate):
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, previous_dilation, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, num_blocks):
            layers.append(block(self.inplanes, planes, 1, self.dilation))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        f1 = self.layer1(x)
        f2 = self.layer2(f1)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        pooled = f4.mean(dim=(2, 3))
        return self.fc(pooled), [f2, f3, f4]


class TASPP(nn.Module):
    """torchvision-style ASPP with matching state-dict keys
    (convs.0 = 1×1, convs.1-3 = atrous 12/24/36, convs.4 = pooling branch,
    project = 1×1 projection)."""

    def __init__(self, in_ch, f, rates=(12, 24, 36)):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(in_ch, f, 1, bias=False),
                              nn.BatchNorm2d(f), nn.ReLU())]
        for r in rates:
            mods.append(nn.Sequential(
                nn.Conv2d(in_ch, f, 3, padding=r, dilation=r, bias=False),
                nn.BatchNorm2d(f), nn.ReLU()))
        mods.append(nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Conv2d(in_ch, f, 1, bias=False),
            nn.BatchNorm2d(f), nn.ReLU()))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(len(mods) * f, f, 1, bias=False), nn.BatchNorm2d(f),
            nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        res = [m(x) for m in self.convs[:-1]]
        pooled = self.convs[-1](x)
        res.append(pooled.expand(-1, -1, x.shape[-2], x.shape[-1]))
        return self.project(torch.cat(res, dim=1))


class TDeepLabV3(nn.Module):
    """torchvision ``deeplabv3_resnet50``-layout mirror (state-dict keys match
    the real pretrained checkpoint, so the same ``.pth`` drives this golden and
    torch_import.deeplab_variables). Ref SegmentationModel.py:86-88."""

    def __init__(self, num_classes=2, width=1.0):
        super().__init__()
        self.backbone = TResNetCAM(
            depth=50, width=width,
            replace_stride_with_dilation=(False, True, True))
        del self.backbone.fc  # torchvision's deeplab backbone drops the fc
        in_ch = max(8, int(512 * width)) * 4
        f = max(16, int(256 * width))
        self.classifier = nn.Sequential(
            TASPP(in_ch, f),
            nn.Conv2d(f, f, 3, padding=1, bias=False),
            nn.BatchNorm2d(f),
            nn.ReLU(),
            nn.Conv2d(f, num_classes, 1),
        )

    def forward(self, x):
        size = x.shape[-2:]
        b = self.backbone
        h = b.maxpool(torch.relu(b.bn1(b.conv1(x))))
        h = b.layer4(b.layer3(b.layer2(b.layer1(h))))
        h = self.classifier(h)
        return nn.functional.interpolate(
            h, size=size, mode="bilinear", align_corners=False)


def randomize_bn_stats(model: nn.Module, seed: int = 0):
    """Give BN layers non-trivial running stats so eval-mode parity is a real test."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.running_mean.shape, generator=g) * 0.1
            m.running_var = torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75
