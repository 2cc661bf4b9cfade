"""Demonstrate that the alternating-direction refinement IMPROVES masks when
the segmentation model's soft predictions are good — isolating the loop
mechanics from pretrained-weight quality (which is environment-gated).

The reference's scientific claim (AlternatingDirectionCutLoss.py:791-818) is
that refinement sweeps improve pseudo-masks. Measured at reference scale with
RANDOM-init weights the claim cannot manifest: the KL term anchors X to the
weak net's S, so refined masks track a bad model (E2E_REFINE_STRONG.json
shows monotone degradation), and at the reference's own script
hyperparameters (lr=1e-4, 10 steps) refinement cannot move a one-hot X past
the threshold at all (E2E_REFERENCE_SCALE.json: bit-identical masks). This
script closes the triangle: a GOOD model (DeepLabV3 trained on true masks,
the supervised-baseline protocol) + corrupted pseudo-masks + the SAME
refinement sweep => mask IoU climbs.

Run: python scripts/demo_refinement_improves.py  (writes REFINE_DEMO.json)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


def corrupt_masks(masks: np.ndarray, rng, n_blobs: int = 6, r: int = 18):
    """Degrade true masks: random disk insert/delete — IoU drops to ~0.5."""
    H, W = masks.shape[1:]
    yy, xx = np.mgrid[0:H, 0:W]
    out = masks.copy()
    for i in range(masks.shape[0]):
        for _ in range(n_blobs):
            cy, cx = rng.integers(0, H), rng.integers(0, W)
            rad = rng.integers(r // 2, r)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= rad ** 2
            out[i][blob] = rng.integers(0, 2)
    return out


def main():
    from weaklysuperviseddl_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from weaklysuperviseddl_tpu.config import RefineConfig
    from weaklysuperviseddl_tpu.data import download_data
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.train.alternating import (
        _sweep_index_table, make_refine_sweep)
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, train_segmentation_model)
    from weaklysuperviseddl_tpu.utils.metrics import (
        binary_confusion_counts, finish_iou_and_acc)

    S, N, B = 256, 128, 16
    ds = download_data(None, split="trainval", synthetic_size=N, image_size=S,
                      seed=7, num_classes=37)
    images = np.stack([np.asarray(ds.images[i]) for i in range(N)])
    true = np.stack([(np.asarray(ds.trimaps[i]) == 1).astype(np.uint8)
                     for i in range(N)])
    rng = np.random.default_rng(11)
    corrupted = corrupt_masks(true, rng)

    model = DeepLabV3(num_classes=2, backbone_depth=50, width_multiplier=1.0,
                      dtype=jnp.bfloat16)
    state, tx = create_seg_state(model, jax.random.PRNGKey(1), input_size=S,
                                 lr=1e-4)
    # supervised protocol (SupervisedModel.py:85-123): train on TRUE masks
    state, _ = train_segmentation_model(
        model, state, tx, images, true, num_epochs=8, batch_size=B,
        seg_size=S, seed=3, run_id="sup", log=print)

    dev_true = jnp.asarray(true.astype(np.int32))

    @jax.jit
    def quality(dev_masks, dev_true=dev_true):
        return finish_iou_and_acc(
            binary_confusion_counts(dev_masks.astype(jnp.int32), dev_true))

    cfg = RefineConfig(num_steps=75)  # boundary-variant strength (ref :145)
    sweep = make_refine_sweep(model, cfg, seg_size=S)
    idx_table = jnp.asarray(_sweep_index_table(N, B))
    dev_images = jnp.asarray(images)
    dev_masks = jnp.asarray(corrupted)

    iou0, _ = (float(v) for v in quality(dev_masks))
    traj = [{"sweep": 0, "mask_iou": round(iou0, 4)}]
    print(f"corrupted masks IoU vs truth: {iou0:.4f}", flush=True)
    for s in range(5):
        dev_masks, _loss = sweep(state.params, state.batch_stats, dev_masks,
                                 dev_images, idx_table)
        iou, _ = (float(v) for v in quality(dev_masks))
        traj.append({"sweep": s + 1, "mask_iou": round(iou, 4)})
        print(f"after sweep {s + 1}: mask IoU {iou:.4f}", flush=True)

    out = {"protocol": {"images": N, "size": S, "refine_steps": cfg.num_steps,
                        "corrupted_iou": round(iou0, 4)},
           "trajectory": traj,
           "improved": traj[-1]["mask_iou"] > iou0}
    with open(os.path.join(REPO, "REFINE_DEMO.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
