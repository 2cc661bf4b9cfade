"""Alternating train ↔ refine orchestration.

Two reference variants, both covered:
  * AlternatingDirectionCutLoss.py:791-818 — 10 alternations × (train 10
    epochs → eval → 5 refinement sweeps over every training mask,
    threshold=0.3, lr=1e-4, 10 steps).
  * AlternatingDirectionBoundaryLoss.py:153-206 — generate initial masks, then
    per alternation train + a single refinement sweep (threshold=0.5, 75 steps).

Masks live in a MaskStore; each refinement sweep overwrites them in place
(the reference's durable-PNG contract), so training always sees the newest
masks. Refinement itself is batched (train/refine.py) instead of per-image.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.config import AlternatingConfig, ExperimentConfig
from weaklysuperviseddl_tpu.data.mask_store import MaskStore
from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
from weaklysuperviseddl_tpu.ops.resize import resize_nearest
from weaklysuperviseddl_tpu.train.refine import refine_pseudo_masks
from weaklysuperviseddl_tpu.train.segmentation import (
    SegTrainState,
    _normalize_images,
    train_segmentation_model,
)


def refine_store(
    model,
    state: SegTrainState,
    store: MaskStore,
    cfg,
    seg_size: int = 256,
    batch_size: int = 8,
):
    """One refinement sweep over every mask in the store (batched), writing
    refined masks back (ref :803-810 inner loop)."""
    images, masks, keys = store.as_arrays()
    n = images.shape[0]
    total = 0.0
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        num_valid = len(idx)
        if num_valid < batch_size:  # static shapes
            idx = np.concatenate([idx, np.repeat(idx[-1], batch_size - num_valid)])
        x, _ = preprocess_batch(jnp.asarray(images[idx]), None, size=seg_size)
        x = _normalize_images(x)
        m = jnp.asarray(masks[idx], jnp.int32)
        if m.shape[1] != seg_size:
            m = resize_nearest(m, (seg_size, seg_size), torch_legacy=False, axes=(1, 2))
        refined, loss = refine_pseudo_masks(
            model, state.params, state.batch_stats, x, m,
            lambda_boundary=cfg.lambda_boundary, threshold=cfg.threshold,
            lr=cfg.lr, num_steps=cfg.num_steps, sigma_color=cfg.sigma_color,
            sigma_space=cfg.sigma_space, window_size=cfg.window_size, loss=cfg.loss,
            # cfg True → auto (Pallas on TPU backends only); False → force XLA
            use_pallas=None if cfg.use_pallas else False,
        )
        refined_np = np.asarray(refined)
        for j in range(num_valid):
            store.update_mask(keys[idx[j]], refined_np[j])
        total += float(loss)
    return total


def run_alternating_training(
    seg_model,
    state: SegTrainState,
    tx,
    store: MaskStore,
    cfg: ExperimentConfig,
    eval_fn=None,
    checkpoint_dir: str | None = None,
    start_iteration: int = 0,
    mesh=None,
    log=print,
):
    """Outer alternating loop (ref AlternatingDirectionCutLoss.py:791-818).

    ``eval_fn(state) -> (iou, acc)`` is called once per alternation, matching
    the reference's per-iteration evaluation printout. With ``checkpoint_dir``
    set, each alternation persists the full train state + a versioned mask
    snapshot (resume via utils.checkpoint.restore_state + MaskStore.load —
    beyond the reference's weights-only torch.save, SURVEY.md §5).
    """
    alt: AlternatingConfig = cfg.alternating
    for iteration in range(start_iteration, alt.num_alternations):
        state, _ = train_segmentation_model(
            seg_model, state, tx, *store.as_arrays()[:2],
            loss_fn=cfg.seg.loss_fn, num_epochs=alt.epochs_per_round,
            batch_size=cfg.seg.batch_size, seg_size=cfg.data.seg_size,
            seed=cfg.seed + iteration, run_id=f"alt{iteration}", mesh=mesh, log=log,
        )
        if eval_fn is not None:
            avg_iou, avg_acc = eval_fn(state)
            log(
                f"Iteration {iteration + 1}: Evaluation -> "
                f"Mean IoU: {avg_iou:.4f}, Mean Acc: {avg_acc:.4f}"
            )
        for _ in range(alt.refine_repeats):
            refine_store(
                seg_model, state, store, alt.refine,
                seg_size=cfg.data.seg_size, batch_size=cfg.seg.batch_size,
            )
        if checkpoint_dir is not None:
            from weaklysuperviseddl_tpu.utils.checkpoint import save_alternation

            save_alternation(checkpoint_dir, iteration, state, store)
    log("Alternating training and pseudo mask updates completed.")
    return state, store
