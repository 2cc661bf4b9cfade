"""PyTorch ``.pth`` → flax variable-tree ingestion.

The reference loads torchvision-pretrained weights everywhere
(ref ClassificationModel.py:12, SegmentationModel.py:86, BASNet.py:108) and
checkpoints via ``torch.save(state_dict)`` (SURVEY.md §2.1 C24). This module
converts those state dicts into this framework's flax trees so parity tests
and pretrained inference work. It is import-gated on torch (torch is only a
host-side conversion dependency, never on the TPU compute path).

Layout conversions:
  conv   weight (O,I,kh,kw) → kernel (kh,kw,I,O)
  linear weight (O,I)       → kernel (I,O)
  bn     weight/bias        → params.scale/params.bias
         running_mean/var   → batch_stats.mean/var
Key rewrites: ``layerX.Y.`` → ``layerX_Y.``; ``downsample.0/1`` →
``downsample_conv/downsample_bn``; reference FrozenResNetCAM's
``layer0.0/layer0.1`` stem (ClassificationModel.py:18) → ``conv1/bn1``.
"""

from __future__ import annotations

import re

import numpy as np


def _to_numpy(t):
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _set(tree: dict, path: list[str], value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _rewrite_key(key: str) -> str:
    key = re.sub(r"^layer0\.0\.", "conv1.", key)   # FrozenResNetCAM stem conv
    key = re.sub(r"^layer0\.1\.", "bn1.", key)     # FrozenResNetCAM stem bn
    key = re.sub(r"(layer\d)\.(\d+)\.", r"\1_\2.", key)
    key = re.sub(r"(encoder\d)\.(\d+)\.", r"\1_\2.", key)  # BASNet encoder stages
    key = key.replace("downsample.0.", "downsample_conv.")
    key = key.replace("downsample.1.", "downsample_bn.")
    return key


def torch_to_flax(state_dict: dict) -> tuple[dict, dict]:
    """Generic torch-module state dict → (params, batch_stats) nested dicts.

    Handles conv/linear/bn leaves by shape; skips num_batches_tracked.
    """
    params: dict = {}
    batch_stats: dict = {}
    for raw_key, raw_value in state_dict.items():
        if raw_key.endswith("num_batches_tracked"):
            continue
        key = _rewrite_key(raw_key)
        path = key.split(".")
        leaf = path[-1]
        value = _to_numpy(raw_value)

        if leaf == "weight":
            if value.ndim == 4:
                _set(params, path[:-1] + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                _set(params, path[:-1] + ["kernel"], value.transpose(1, 0))
            elif value.ndim == 1:  # batchnorm gamma
                _set(params, path[:-1] + ["scale"], value)
            else:
                raise ValueError(f"unexpected weight rank for {raw_key}: {value.shape}")
        elif leaf == "bias":
            _set(params, path[:-1] + ["bias"], value)
        elif leaf == "running_mean":
            _set(batch_stats, path[:-1] + ["mean"], value)
        elif leaf == "running_var":
            _set(batch_stats, path[:-1] + ["var"], value)
        else:
            raise ValueError(f"unhandled leaf {raw_key}")
    return params, batch_stats


def cam_classifier_variables(state_dict: dict) -> dict:
    """Torch FrozenResNetCAM (or raw torchvision resnet50) state dict → flax
    variables for models.classifier.CamClassifier.

    The torch fc (2048→37 or →1000) maps to ``fc``; everything else goes
    under ``backbone``.
    """
    params, batch_stats = torch_to_flax(state_dict)
    fc = params.pop("fc", None)
    # torchvision resnet's avgpool has no params; nothing else at top level
    variables = {"params": {"backbone": params}, "batch_stats": {"backbone": batch_stats}}
    if fc is not None:
        variables["params"]["fc"] = fc
    return variables


def _rewrite_deeplab_key(key: str) -> str | None:
    """torchvision ``deeplabv3_resnet50`` state-dict key → this framework's
    module path (models/deeplabv3.py). Returns None for keys to drop.

    torchvision layout (ref SegmentationModel.py:86 loads this model):
      backbone.*                     ResNet-50, os-8
      classifier.0.convs.0.{0,1}     ASPP 1×1 conv + BN
      classifier.0.convs.{1,2,3}.*   ASPP atrous convs (rates 12/24/36) + BN
      classifier.0.convs.4.{1,2}     ASPP pooling branch conv + BN
      classifier.0.project.{0,1}     ASPP projection conv + BN
      classifier.{1,2}               head 3×3 conv + BN
      classifier.4                   final 1×1 conv (the reference swaps this
                                     to 2 classes, SegmentationModel.py:88)
      aux_classifier.*               unused auxiliary head → dropped
    """
    if key.startswith("aux_classifier."):
        return None
    m = re.match(r"^classifier\.0\.convs\.0\.([01])\.(.*)$", key)
    if m:
        return ("aspp.conv1x1." if m.group(1) == "0" else "aspp.bn1x1.") + m.group(2)
    m = re.match(r"^classifier\.0\.convs\.([123])\.([01])\.(.*)$", key)
    if m:
        i = int(m.group(1)) - 1
        base = f"aspp.atrous{i}." if m.group(2) == "0" else f"aspp.atrous_bn{i}."
        return base + m.group(3)
    m = re.match(r"^classifier\.0\.convs\.4\.([12])\.(.*)$", key)
    if m:
        return ("aspp.pool_conv." if m.group(1) == "1" else "aspp.pool_bn.") + m.group(2)
    m = re.match(r"^classifier\.0\.project\.([01])\.(.*)$", key)
    if m:
        return ("aspp.project." if m.group(1) == "0" else "aspp.project_bn.") + m.group(2)
    m = re.match(r"^classifier\.([124])\.(.*)$", key)
    if m:
        name = {"1": "head_conv.", "2": "head_bn.", "4": "classifier."}[m.group(1)]
        return name + m.group(2)
    return key  # backbone.* (generic rewrites apply later)


def deeplab_variables(state_dict: dict) -> dict:
    """torchvision ``deeplabv3_resnet50`` state dict → flax variables for
    models.deeplabv3.DeepLabV3 (the reference's segmentation checkpoint
    format, SegmentationModel.py:86-88 / SupervisedModel.py:107)."""
    renamed = {}
    for key, value in state_dict.items():
        new = _rewrite_deeplab_key(key)
        if new is not None:
            renamed[new] = value
    params, batch_stats = torch_to_flax(renamed)
    return {"params": params, "batch_stats": batch_stats}


def load_pth(path: str) -> dict:
    """Load a torch checkpoint file (host-side, gated on torch)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)
