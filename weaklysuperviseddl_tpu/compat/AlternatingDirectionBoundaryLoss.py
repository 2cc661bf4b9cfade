"""Reference surface: TraditionalModel/AlternatingDirectionBoundaryLoss.py."""

from __future__ import annotations

import os

from weaklysuperviseddl_tpu.compat._adapt import to_nhwc
from weaklysuperviseddl_tpu.compat.AlternatingDirectionCutLoss import (  # noqa: F401
    refine_pseudo_mask,
    to_nhwc_any_channels,
)
from weaklysuperviseddl_tpu.losses.window import boundary_loss


class ConstrainToBoundaryLossSingle:
    """Reference :12-70 — single-image boundary affinity loss.

    (preds [C,H,W] softmax output, image [3,H,W]) → scalar. The reference's
    ``compute_affinities_single`` (a defective @staticmethod, SURVEY.md §2.4)
    is folded into the fused loss.
    """

    def __init__(self, sigma_color=0.1, sigma_space=5, window_size=5, eps=1e-8):
        self.sigma_color = sigma_color
        self.sigma_space = sigma_space
        self.window_size = window_size
        self.eps = eps

    def __call__(self, preds, image):
        preds, _ = to_nhwc_any_channels(preds)
        image, _ = to_nhwc(image)
        return boundary_loss(
            preds, image, sigma_color=self.sigma_color,
            sigma_space=self.sigma_space, window_size=self.window_size,
        )

    forward = __call__


def setup_dirs(mask_dir="./pseudo_masks", image_dir="./images"):
    """Reference :74-77 (default paths made relative, not /content)."""
    os.makedirs(mask_dir, exist_ok=True)
    os.makedirs(image_dir, exist_ok=True)
    return mask_dir, image_dir


def initialize_model(num_classes: int = 2, **kwargs):
    """Reference :106-110."""
    from weaklysuperviseddl_tpu.compat.SegmentationModel import initialize_model as _init

    handle, _ = _init(num_classes=num_classes, **kwargs)
    return handle


def run_alternating_training(
    loader,
    layercam_gen,
    joint_transform=True,
    num_alternations: int = 5,
    epochs_per_round: int = 15,
    lambda_boundary: float = 0.5,
    momentum: float = 0.9,
    sigma_color: float = 0.1,
    sigma_space: float = 10,
    cam_thresh: float = 0.5,
    alpha: float = 1.0,
    keep_largest_masks: bool = True,
    visualize_idx: int = 0,
    eval_loader=None,
    seg_kwargs: dict | None = None,
    log=print,
):
    """Reference :153-206 — generate initial pseudo-masks, then alternate
    train ↔ refine (refinement uses num_steps=75, threshold=0.5, ref :146).

    Returns (model handle, MaskStore) instead of mutating global PNG dirs;
    the store still persists the reference's PNG contract when given a dir.
    """
    import jax
    import numpy as np

    from weaklysuperviseddl_tpu.config import (
        AlternatingConfig, DataConfig, ExperimentConfig, RefineConfig, SegConfig,
    )
    from weaklysuperviseddl_tpu.data.mask_store import MaskStore
    from weaklysuperviseddl_tpu.masks.pseudo import cam_to_mask
    from weaklysuperviseddl_tpu.train.alternating import run_alternating_training as _run
    from weaklysuperviseddl_tpu.train.segmentation import create_seg_state, evaluate_segmentation

    seg_kwargs = seg_kwargs or {}
    seg_size = seg_kwargs.get("seg_size", 256)

    # step 1: initial pseudo-masks into a store
    store = MaskStore()
    img_id = 0
    for batch in loader:
        import jax.numpy as jnp

        cams = layercam_gen.generate(jnp.asarray(batch.image),
                                     class_idx=jnp.asarray(batch.label), alpha=alpha)
        masks = np.asarray(cam_to_mask(cams, cam_thresh, keep_largest_masks))
        for i in range(batch.num_valid):
            store.put(f"{img_id:05d}", batch.image[i], masks[i])
            img_id += 1

    # steps 2-5: alternating loop over the store
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3

    module = DeepLabV3(num_classes=2,
                       backbone_depth=seg_kwargs.get("backbone_depth", 50),
                       width_multiplier=seg_kwargs.get("width_multiplier", 1.0))
    state, tx = create_seg_state(module, jax.random.PRNGKey(0), input_size=seg_size,
                                 lr=seg_kwargs.get("lr", 1e-4))

    cfg = ExperimentConfig(
        data=DataConfig(seg_size=seg_size),
        seg=SegConfig(batch_size=seg_kwargs.get("batch_size", 4),
                      backbone_depth=seg_kwargs.get("backbone_depth", 50),
                      width_multiplier=seg_kwargs.get("width_multiplier", 1.0)),
        alternating=AlternatingConfig(
            num_alternations=num_alternations,
            epochs_per_round=epochs_per_round,
            refine_repeats=1,  # BoundaryLoss variant refines once per round
            refine=RefineConfig(
                lambda_boundary=lambda_boundary, threshold=0.5, num_steps=75,
                sigma_color=sigma_color, sigma_space=sigma_space,
            ),
        ),
    )
    eval_fn = None
    if eval_loader is not None:
        eval_fn = lambda st: evaluate_segmentation(
            module, st, eval_loader(), seg_size=seg_size, eval_size=None)
    state, store = _run(module, state, tx, store, cfg, eval_fn=eval_fn, log=log)
    log("Alternating training and pseudo mask updates completed.")

    from weaklysuperviseddl_tpu.compat.SegmentationModel import SegModelHandle

    return SegModelHandle(module, state, seg_size), store
