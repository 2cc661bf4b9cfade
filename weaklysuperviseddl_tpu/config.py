"""Single config layer feeding every entry point.

The reference has no config system — every knob is a function kwarg or a
hardcoded constant (SURVEY.md §5, e.g. reference
``AlternatingDirectionBoundaryLoss.py:153-167`` is the fullest config surface).
Here every pipeline consumes one of these dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Oxford-IIIT-Pet-style data ingestion.

    Mirrors reference ``TraditionalModel/ExtraUtilities.py:24-63`` (224² bicubic
    eval variant) and ``AlternatingDirectionCutLoss.py:11-29`` (bilinear +
    mask-index-shift train variant).
    """

    root: str | None = None          # Pet dataset root; None => synthetic data
    image_size: int = 224
    seg_size: int = 256              # PseudoSegmentationDataset resize (ref SegmentationDataset.py:20)
    num_classes: int = 37
    train_ratio: float = 0.8         # ref ExtraUtilities.py:43
    batch_size: int = 32
    eval_batch_size: int = 8
    interpolation: str = "bilinear"  # 'bilinear' (train variant) | 'bicubic' (eval variant)
    shift_mask_labels: bool = True   # (trimap - 1).clamp(0): ref AlternatingDirectionCutLoss.py:19
    normalize: bool = False          # ToTensor only in ref download_data; seg dataset normalizes
    seed: int = 0
    synthetic_size: int = 128        # number of synthetic samples when root is None


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    """Frozen-ResNet50 CAM classifier (ref ClassificationModel.py:9-41)."""

    num_classes: int = 37
    dilate_layer4: bool = True       # replace_stride_with_dilation=[False, False, True]
    lr: float = 1e-3                 # Adam on fc only (ref ClassificationModel.py:72)
    epochs: int = 10
    dtype: str = "float32"           # compute dtype ('bfloat16' for MXU speed)
    depth: int = 50                  # ResNet depth (50 for parity; smaller for tests)
    width_multiplier: float = 1.0    # <1.0 shrinks channels (test/smoke scale)


@dataclasses.dataclass(frozen=True)
class CamConfig:
    """LayerCAM / CAM extraction (ref LayerCAM.py:7-81, AlternatingDirectionCutLoss.py:216-318)."""

    target_layers: Sequence[str] = ("layer3", "layer4")
    alpha: float = 1.0
    # 'final'    : normalize once per layer, mean over layers, clamp(0)**alpha
    #              (ref LayerCAM.py:61-76)
    # 'per_layer': normalize -> **alpha -> renormalize per layer, then mean
    #              (ref AlternatingDirectionCutLoss.py:270-286)
    alpha_mode: str = "per_layer"
    output_size: int = 224


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    """Pseudo-mask generation (ref PsuedoMasks.py:23-79)."""

    cam_thresh: float = 0.3
    keep_largest: bool = True
    use_crf: bool = False            # AlternatingDirectionCutLoss.py:558 path uses CRF, PsuedoMasks.py does not
    # bilateral message-pass backend (masks/densecrf.py). "subsampled" =
    # full-res queries x stride-`crf_key_stride` key subgrid through the
    # exact attention kernel — measured 2.3x faster than exact at stride 2
    # with 1.0000/0.9996 mask agreement (synthetic-Pet / noise worst case,
    # BASELINE.md round 5); "attention" = the exact O(N^2) backend.
    crf_backend: str = "subsampled"
    crf_key_stride: int = 2
    crf_iters: int = 5
    crf_gaussian_sxy: float = 1.0
    crf_gaussian_compat: float = 2.0
    crf_bilateral_sxy: float = 50.0
    crf_bilateral_srgb: float = 5.0
    crf_bilateral_compat: float = 10.0
    max_images: int = 500            # ref PsuedoMasks.py:49 cap
    store_dir: str | None = None     # None => in-memory store (fast path)


@dataclasses.dataclass(frozen=True)
class SegConfig:
    """DeepLabV3 segmentation training (ref SegmentationModel.py:59-122)."""

    num_classes: int = 2
    lr: float = 1e-4
    epochs: int = 5
    batch_size: int = 4
    loss_fn: str = "cross_entropy"   # 'cross_entropy' | 'lovasz_softmax'
    dtype: str = "float32"
    backbone_depth: int = 50
    width_multiplier: float = 1.0
    output_stride: int = 8           # torchvision deeplabv3 uses os=8 ([False, True, True])
    # FrozenBN fine-tuning: BN uses running stats under train (grads still
    # reach the BN affines; dropout stays live). Standard recipe when
    # fine-tuning pretrained weights at small batch; removes the measured
    # ~2.2 ms/step of batch-stat machinery (BASELINE.md). Off by default —
    # the reference trains BN (SegmentationModel.py:59-122).
    bn_frozen: bool = False


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    """Alternating-direction mask refinement (ref AlternatingDirectionCutLoss.py:709-767)."""

    lambda_boundary: float = 0.1
    threshold: float = 0.5
    lr: float = 1e-2
    num_steps: int = 20
    sigma_color: float = 0.1
    sigma_space: float = 5.0
    window_size: int = 5
    loss: str = "ncut"               # 'ncut' (LocalNormalizedCutLoss) | 'boundary' (ConstrainToBoundary)
    use_pallas: bool = True          # fused Pallas window-affinity kernel vs XLA reference


@dataclasses.dataclass(frozen=True)
class AlternatingConfig:
    """Outer alternating train<->refine loop (ref AlternatingDirectionCutLoss.py:791-818)."""

    num_alternations: int = 10
    epochs_per_round: int = 10
    refine_repeats: int = 5          # ref :803 'for repeated in range(5)'
    refine: RefineConfig = dataclasses.field(default_factory=RefineConfig)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """SPMD mesh layout. The reference is single-device (SURVEY.md §2.3);
    this is the TPU-native scaling axis: batch on 'data' over ICI, optional
    channel sharding on 'model'."""

    data: int = -1                   # -1 => all devices on the data axis
    model: int = 1


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    classifier: ClassifierConfig = dataclasses.field(default_factory=ClassifierConfig)
    cam: CamConfig = dataclasses.field(default_factory=CamConfig)
    mask: MaskConfig = dataclasses.field(default_factory=MaskConfig)
    seg: SegConfig = dataclasses.field(default_factory=SegConfig)
    alternating: AlternatingConfig = dataclasses.field(default_factory=AlternatingConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    seed: int = 0


def smoke_config() -> ExperimentConfig:
    """Tiny config used by tests and smoke runs (the reference's own
    10-image-truncation pattern, SURVEY.md §4)."""
    return ExperimentConfig(
        data=DataConfig(image_size=64, seg_size=64, batch_size=4, synthetic_size=16),
        classifier=ClassifierConfig(depth=18, width_multiplier=0.25, epochs=1),
        cam=CamConfig(output_size=64),
        mask=MaskConfig(max_images=16),
        seg=SegConfig(epochs=1, batch_size=4, width_multiplier=0.25, backbone_depth=18),
        alternating=AlternatingConfig(
            num_alternations=1, epochs_per_round=1, refine_repeats=1,
            refine=RefineConfig(num_steps=2),
        ),
    )
