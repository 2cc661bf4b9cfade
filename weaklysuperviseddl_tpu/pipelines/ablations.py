"""Ablation grid harness.

Reference: TraditionalModel/Abalations.py:9-96 — grid over (cam_method,
cam_thresh, alpha, lr, keep_largest) × 3 repeats; per combo: load classifier
checkpoint → generate pseudo-masks → train DeepLabV3 5 epochs → eval; summary
mean/stdev per combo. Same surface here, driven by ExperimentConfig overrides.
"""

from __future__ import annotations

import itertools

import jax

from weaklysuperviseddl_tpu.config import ExperimentConfig
from weaklysuperviseddl_tpu.data import download_data, load_split_data
from weaklysuperviseddl_tpu.data.loader import batches
from weaklysuperviseddl_tpu.masks.pseudo import generate_pseudo_masks
from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
from weaklysuperviseddl_tpu.train.segmentation import (
    create_seg_state,
    evaluate_segmentation,
    train_segmentation_model,
)
from weaklysuperviseddl_tpu.utils.metrics import mean_std


def run_ablation(
    classifier_model,
    classifier_variables,
    train_loader,
    test_loader,
    cam_method: str,
    cam_thresh: float,
    alpha: float,
    lr: float,
    keep_largest: bool,
    run_id: str,
    cfg: ExperimentConfig,
    log=print,
):
    """One grid point (ref Abalations.py:9-29). Returns the result dict."""
    del cam_method  # LayerCAM is the only method the reference grid enables
    d = cfg.data
    store = generate_pseudo_masks(
        train_loader, classifier_model, classifier_variables,
        cam_thresh=cam_thresh, alpha=alpha, keep_largest_masks=keep_largest,
        run_id=run_id, target_layers=cfg.cam.target_layers,
        alpha_mode=cfg.cam.alpha_mode, image_size=d.image_size,
        max_images=cfg.mask.max_images,
    )
    seg_model = DeepLabV3(
        num_classes=cfg.seg.num_classes, backbone_depth=cfg.seg.backbone_depth,
        width_multiplier=cfg.seg.width_multiplier,
    )
    state, tx = create_seg_state(
        seg_model, jax.random.PRNGKey(hash(run_id) % (2**31)), input_size=d.seg_size, lr=lr
    )
    images, masks, _ = store.as_arrays()
    state, final_loss = train_segmentation_model(
        seg_model, state, tx, images, masks, loss_fn=cfg.seg.loss_fn,
        num_epochs=cfg.seg.epochs, batch_size=cfg.seg.batch_size,
        seg_size=d.seg_size, run_id=run_id, log=log,
    )
    iou, acc = evaluate_segmentation(
        seg_model, state, test_loader(), seg_size=d.seg_size, eval_size=d.image_size,
    )
    return {"run_id": run_id, "iou": iou, "acc": acc, "final_loss": final_loss}


def run_ablation_experiment(
    all_combinations,
    classifier_model,
    classifier_variables,
    cfg: ExperimentConfig,
    num_repeats: int = 3,
    log=print,
):
    """Grid × repeats with mean/stdev summaries (ref Abalations.py:32-81)."""
    d = cfg.data
    train_ds, _ = load_split_data(
        d.root, train_ratio=d.train_ratio, seed=d.seed,
        synthetic_size=d.synthetic_size, image_size=d.image_size,
        num_classes=d.num_classes,
    )
    test_ds = download_data(
        d.root, split="test", synthetic_size=max(16, d.synthetic_size // 4),
        image_size=d.image_size, seed=d.seed, num_classes=d.num_classes,
    )

    results = []
    for combo_id, (method, cam_thresh, alpha, lr, keep_largest_opt) in enumerate(all_combinations):
        run_results = []
        for repeat in range(num_repeats):
            run_id = f"abl_{combo_id:03d}_r{repeat}"
            log(f"\n Running {run_id}...")
            result = run_ablation(
                classifier_model, classifier_variables,
                train_loader=batches(train_ds, d.batch_size, shuffle=True,
                                     seed=repeat, pad_to_full=True),
                test_loader=lambda: batches(test_ds, d.eval_batch_size),
                cam_method=method, cam_thresh=cam_thresh, alpha=alpha, lr=lr,
                keep_largest=keep_largest_opt, run_id=run_id, cfg=cfg, log=log,
            )
            result.update({
                "cam_method": method, "cam_thresh": cam_thresh, "alpha": alpha,
                "learning_rate": lr, "keep_largest": keep_largest_opt,
            })
            results.append(result)
            run_results.append(result)

        ious = [r["iou"] for r in run_results]
        accs = [r["acc"] for r in run_results]
        losses = [r["final_loss"] for r in run_results]
        iou_m, iou_s = mean_std(ious)
        acc_m, acc_s = mean_std(accs)
        loss_m, loss_s = mean_std(losses)
        results.append({
            "combo_id": combo_id, "cam_method": method, "cam_thresh": cam_thresh,
            "alpha": alpha, "learning_rate": lr, "keep_largest": keep_largest_opt,
            "iou_mean": iou_m, "iou_std": iou_s,
            "acc_mean": acc_m, "acc_std": acc_s,
            "loss_mean": loss_m, "loss_std": loss_s,
        })
    return results


def default_grid():
    """The reference's grid (Abalations.py:86-95)."""
    cam_methods = ["LayerCAM"]
    cam_thresholds = [0.3, 0.5, 0.7]
    alphas = [1.0]
    lrs = [1e-2, 1e-3, 1e-4, 1e-5]
    keep_largest_opts = [True]
    return list(itertools.product(cam_methods, cam_thresholds, alphas, lrs, keep_largest_opts))
