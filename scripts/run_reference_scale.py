"""Reference-scale end-to-end run of the full weakly-supervised alternating
pipeline on the real TPU, with per-phase wall-clock profiling (VERDICT r2
missing #2 / next-round item 1).

Reference protocol (AlternatingDirectionCutLoss.py:468-821): train the frozen-
backbone classifier (15 epochs) → LayerCAM → threshold (→ optional dense CRF,
:530-558) → pseudo-masks (≤200 test images at :604, ≤500 at PsuedoMasks.py:49)
→ DeepLabV3 on pseudo-masks → 10 alternations × (train 10 epochs → eval → 5
refinement sweeps over every training mask, :791-818).

This script runs that protocol end to end at reference scale on synthetic Pet
(zero-egress environment — real Pet plugs in via --pet-root) and records:
  * wall-clock + images/sec per phase (utils/profiling.Stopwatch),
  * the eval-IoU/acc trajectory across alternations (does the alternating
    refinement actually improve masks — the reference's scientific claim),
  * a JSON blob (E2E_REFERENCE_SCALE.json) for BASELINE.md.

Usage:
  python scripts/run_reference_scale.py [--images 250] [--alternations 10]
      [--use-crf] [--seg-batch 16] [--out E2E_REFERENCE_SCALE.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=250,
                    help="synthetic dataset size (train split = 80%%)")
    ap.add_argument("--alternations", type=int, default=10)
    ap.add_argument("--epochs-per-round", type=int, default=10)
    ap.add_argument("--refine-repeats", type=int, default=5)
    ap.add_argument("--refine-steps", type=int, default=10,
                    help="Adam-on-X steps per refinement (ref :803 num_steps=10)")
    ap.add_argument("--refine-lr", type=float, default=1e-2,
                    help="Adam-on-X lr. NOTE the reference script path passes "
                         "lr=1e-4 (:803), which moves the one-hot X by ~1e-3 "
                         "in 10 steps — near-identity refinement; the default "
                         "here is the RefineConfig lr that visibly refines")
    ap.add_argument("--refine-threshold", type=float, default=0.5,
                    help="fg-prob threshold (ref :803 passes 0.3)")
    ap.add_argument("--classifier-epochs", type=int, default=15)
    ap.add_argument("--seg-batch", type=int, default=16)
    ap.add_argument("--use-crf", action="store_true",
                    help="CRF-refine the pseudo-masks (the :530-558 script path)")
    ap.add_argument("--pretrain-epochs", type=int, default=0,
                    help="supervised-pretrain the seg model on a DISJOINT "
                         "synthetic split (true masks) before the alternating "
                         "loop — the in-environment proxy for the reference's "
                         "deeplabv3_resnet50(pretrained=True) "
                         "(SegmentationModel.py:86): the refinement loop's "
                         "KL term anchors masks to the net's predictions, so "
                         "its mask-improvement claim needs a competent net")
    ap.add_argument("--pretrain-images", type=int, default=200)
    ap.add_argument("--pet-root", default=None)
    ap.add_argument("--max-masks", type=int, default=200,
                    help="pseudo-mask cap (ref :604 uses 200)")
    ap.add_argument("--out", default=os.path.join(REPO, "E2E_REFERENCE_SCALE.json"))
    args = ap.parse_args()

    from weaklysuperviseddl_tpu.utils.profiling import (
        Stopwatch, enable_compile_cache, warmup_device)
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from weaklysuperviseddl_tpu.config import (
        AlternatingConfig, ClassifierConfig, DataConfig, ExperimentConfig,
        MaskConfig, RefineConfig, SegConfig)
    from weaklysuperviseddl_tpu.data import download_data, load_split_data
    from weaklysuperviseddl_tpu.data.loader import batches
    from weaklysuperviseddl_tpu.masks.pseudo import generate_pseudo_masks
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.pipelines.weakly import build_classifier
    from weaklysuperviseddl_tpu.train.alternating import (
        _sweep_index_table, make_refine_sweep, upload_store_resident)
    from weaklysuperviseddl_tpu.train.classifier import train_fc_only
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, evaluate_segmentation_dataset,
        train_segmentation_model)

    cfg = ExperimentConfig(
        data=DataConfig(root=args.pet_root, synthetic_size=args.images,
                        batch_size=32),
        classifier=ClassifierConfig(epochs=args.classifier_epochs,
                                    dtype="bfloat16"),
        mask=MaskConfig(max_images=args.max_masks, use_crf=args.use_crf),
        seg=SegConfig(epochs=args.epochs_per_round, batch_size=args.seg_batch,
                      dtype="bfloat16"),
        alternating=AlternatingConfig(
            num_alternations=args.alternations,
            epochs_per_round=args.epochs_per_round,
            refine_repeats=args.refine_repeats,
            refine=RefineConfig(num_steps=args.refine_steps,
                                lr=args.refine_lr,
                                threshold=args.refine_threshold),
        ),
    )
    d = cfg.data
    sw = Stopwatch()
    t_start = time.perf_counter()
    # first device contact on the axon relay can stall for minutes (tunnel
    # handshake / a concurrent holder); pay it in its own phase so the
    # pipeline phases measure the pipeline, not the relay
    with sw.phase("device_warmup"):
        warmup_device()

    with sw.phase("data", images=args.images):
        train_ds, val_ds = load_split_data(
            d.root, train_ratio=d.train_ratio, seed=d.seed,
            synthetic_size=d.synthetic_size, image_size=d.image_size,
            num_classes=d.num_classes)
        test_ds = download_data(
            d.root, split="test", synthetic_size=max(16, d.synthetic_size // 4),
            image_size=d.image_size, seed=d.seed, num_classes=d.num_classes)
    n_train = len(train_ds)
    print(f"data: train {n_train}, val {len(val_ds)}, test {len(test_ds)}", flush=True)

    # --- phase 1: classifier (reference HOT LOOP #1) -------------------------
    model, variables = build_classifier(cfg)
    n_clf_images = n_train * cfg.classifier.epochs  # reference accounting:
    # every epoch re-runs the backbone; ours runs it once (cached features)
    with sw.phase("classifier_fc_training", images=n_clf_images):
        variables = train_fc_only(
            model, variables,
            train_loader_fn=lambda: batches(train_ds, d.batch_size, shuffle=True,
                                            seed=d.seed, pad_to_full=True),
            val_loader_fn=lambda: batches(val_ds, d.eval_batch_size),
            epochs=cfg.classifier.epochs, lr=cfg.classifier.lr,
            num_classes=d.num_classes, image_size=d.image_size,
            interpolation=d.interpolation, cache_features=True, log=print)

    # --- phase 2+3: LayerCAM -> pseudo-masks ---------------------------------
    n_masks = min(args.max_masks, n_train)
    with sw.phase("pseudo_mask_generation", images=n_masks):
        store = generate_pseudo_masks(
            batches(train_ds, d.batch_size, pad_to_full=True),
            model, variables,
            cam_thresh=cfg.mask.cam_thresh, alpha=cfg.cam.alpha,
            keep_largest_masks=cfg.mask.keep_largest,
            target_layers=cfg.cam.target_layers, alpha_mode=cfg.cam.alpha_mode,
            image_size=d.image_size, max_images=cfg.mask.max_images,
            use_crf=cfg.mask.use_crf,
            crf_kwargs=dict(
                gauss_sxy=cfg.mask.crf_gaussian_sxy,
                gauss_compat=cfg.mask.crf_gaussian_compat,
                bilat_sxy=cfg.mask.crf_bilateral_sxy,
                bilat_srgb=cfg.mask.crf_bilateral_srgb,
                bilat_compat=cfg.mask.crf_bilateral_compat,
                n_iters=cfg.mask.crf_iters,
            ) if cfg.mask.use_crf else None)
    print(f"pseudo masks: {len(store)}", flush=True)

    # --- phase 4: alternating train <-> refine (reference :791-818) ----------
    seg_model = DeepLabV3(
        num_classes=cfg.seg.num_classes, backbone_depth=cfg.seg.backbone_depth,
        width_multiplier=cfg.seg.width_multiplier,
        dtype=jnp.dtype(cfg.seg.dtype))
    state, tx = create_seg_state(
        seg_model, jax.random.PRNGKey(cfg.seed + 1), input_size=d.seg_size,
        lr=cfg.seg.lr)

    if args.pretrain_epochs:
        # disjoint image distribution (different seed): no leakage into the
        # weakly-supervised train set, like ImageNet/COCO pretraining
        with sw.phase("seg_pretraining",
                      images=args.pretrain_images * args.pretrain_epochs):
            pre_ds = download_data(
                d.root, split="trainval", synthetic_size=args.pretrain_images,
                image_size=d.image_size, seed=d.seed + 1000,
                num_classes=d.num_classes)
            pre_images = np.stack([np.asarray(pre_ds.images[i])
                                   for i in range(len(pre_ds))])
            pre_masks = np.stack(
                [(np.asarray(pre_ds.trimaps[i]) == 1).astype(np.uint8)
                 for i in range(len(pre_ds))])
            state, _ = train_segmentation_model(
                seg_model, state, tx, pre_images, pre_masks,
                loss_fn=cfg.seg.loss_fn, num_epochs=args.pretrain_epochs,
                batch_size=cfg.seg.batch_size, seg_size=d.seg_size,
                seed=cfg.seed + 77, run_id="pretrain", log=lambda *a: None)
        print(f"pretrained {args.pretrain_epochs} epochs on "
              f"{len(pre_ds)} disjoint supervised images", flush=True)

    # test set resident on device once; each eval is ONE dispatch
    test_images = jax.device_put(jnp.asarray(
        np.stack([np.asarray(test_ds.images[i]) for i in range(len(test_ds))])))
    test_trimaps = jax.device_put(jnp.asarray(
        np.stack([np.asarray(test_ds.trimaps[i]) for i in range(len(test_ds))])))

    def eval_fn(state):
        return evaluate_segmentation_dataset(
            seg_model, state, test_images, test_trimaps,
            batch_size=d.eval_batch_size, seg_size=d.seg_size,
            eval_size=d.image_size)

    alt = cfg.alternating
    dev_images, dev_masks, keys = upload_store_resident(store, d.seg_size)
    sweep = make_refine_sweep(seg_model, alt.refine, seg_size=d.seg_size)
    idx_table = jnp.asarray(_sweep_index_table(len(keys), cfg.seg.batch_size))
    trajectory = []
    n_store = len(keys)

    # direct pseudo-mask quality vs the TRUE trimaps (fg==1), measured on the
    # resident masks — the refinement claim on the masks themselves, not
    # through the (weak without pretrained weights) downstream net
    from weaklysuperviseddl_tpu.ops.resize import resize_nearest
    from weaklysuperviseddl_tpu.utils.metrics import (
        binary_confusion_counts, finish_iou_and_acc)

    tri_true = np.stack([np.asarray(train_ds.trimaps[i]) for i in range(n_store)])
    dev_true = jax.device_put(jnp.asarray((tri_true == 1).astype(np.int32)))

    # dev_true is a jit ARG — closed over it would be embedded in the HLO as
    # a multi-MB literal constant at reference scale
    @jax.jit
    def mask_iou(dev_masks, dev_true):
        m = resize_nearest(dev_masks, dev_true.shape[1:3],
                           torch_legacy=False, axes=(1, 2)).astype(jnp.int32)
        return finish_iou_and_acc(binary_confusion_counts(m, dev_true))

    m_iou, m_acc = (float(v) for v in mask_iou(dev_masks, dev_true))
    mask_trajectory = [{"stage": "initial_pseudo_masks",
                        "iou": round(m_iou, 4), "acc": round(m_acc, 4)}]
    print(f"pseudo-mask quality vs trimaps: IoU {m_iou:.4f} acc {m_acc:.4f}",
          flush=True)

    # pre-alternation baseline eval (IoU of the untrained model is noise; the
    # trajectory starts after the first training round, like the reference's
    # per-iteration printout)
    for iteration in range(alt.num_alternations):
        with sw.phase("seg_training", images=n_store * alt.epochs_per_round):
            state, _ = train_segmentation_model(
                seg_model, state, tx, dev_images, dev_masks,
                loss_fn=cfg.seg.loss_fn, num_epochs=alt.epochs_per_round,
                batch_size=cfg.seg.batch_size, seg_size=d.seg_size,
                seed=cfg.seed + iteration, run_id=f"alt{iteration}",
                log=lambda *a: None)
        with sw.phase("eval", images=len(test_ds)):
            iou, acc = eval_fn(state)
        trajectory.append({"alternation": iteration + 1,
                           "iou": round(iou, 4), "acc": round(acc, 4)})
        print(f"Iteration {iteration + 1}: Evaluation -> "
              f"Mean IoU: {iou:.4f}, Mean Acc: {acc:.4f}", flush=True)
        with sw.phase("refinement_sweeps",
                      images=n_store * alt.refine_repeats):
            for _ in range(alt.refine_repeats):
                dev_masks, _loss = sweep(
                    state.params, state.batch_stats, dev_masks, dev_images,
                    idx_table)
            _ = float(jnp.sum(dev_masks.astype(jnp.int32)))  # force readback
        m_iou, m_acc = (float(v) for v in mask_iou(dev_masks, dev_true))
        mask_trajectory.append({"stage": f"after_alt_{iteration + 1}",
                                "iou": round(m_iou, 4), "acc": round(m_acc, 4)})
        print(f"  mask quality after sweeps: IoU {m_iou:.4f} acc {m_acc:.4f}",
              flush=True)

    with sw.phase("final_eval", images=len(test_ds)):
        final_iou, final_acc = eval_fn(state)
    wall = time.perf_counter() - t_start
    print(f"FINAL: IoU {final_iou:.4f} acc {final_acc:.4f}", flush=True)
    sw.report()

    out = {
        "protocol": {
            "images": args.images, "train": n_train, "masks": n_store,
            "alternations": alt.num_alternations,
            "epochs_per_round": alt.epochs_per_round,
            "refine_repeats": alt.refine_repeats,
            "refine_steps": alt.refine.num_steps,
            "refine_lr": alt.refine.lr,
            "refine_threshold": alt.refine.threshold,
            "classifier_epochs": cfg.classifier.epochs,
            "seg_batch": cfg.seg.batch_size, "use_crf": args.use_crf,
            "pretrain_epochs": args.pretrain_epochs,
            "pretrain_images": args.pretrain_images if args.pretrain_epochs else 0,
            "image_size": d.image_size, "seg_size": d.seg_size,
            "device": str(jax.devices()[0]),
        },
        "wall_clock_s": round(wall, 2),
        "phases": {
            name: {
                "seconds": round(sw.times[name], 3),
                "calls": sw.counts[name],
                "img_per_s": round(sw.rate(name), 2),
                **({"first_call_s": round(sw.first_call_s(name), 3),
                    "marginal_img_per_s": round(sw.marginal_rate(name), 2)}
                   if sw.marginal_rate(name) is not None else {}),
            } for name in sw.times
        },
        "iou_trajectory": trajectory,
        "mask_iou_trajectory": mask_trajectory,
        "final": {"iou": round(final_iou, 4), "acc": round(final_acc, 4)},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
