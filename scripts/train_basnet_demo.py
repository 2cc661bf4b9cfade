"""Functional validation of the BASNet port by training it in-framework.

The reference uses BASNet purely as a pretrained inference engine
(PretrainedBasnetModel/RunInference.py loads ./Weights/basnet.pth) — an
asset that cannot exist in zero-egress environments, so the engine's
quality bar has been un-demonstrable here. This demo closes the loop from
the other side: train the flax port from scratch with the recipe that
produced basnet.pth (hybrid BCE+SSIM+IoU deep supervision over all 8 side
outputs, Adam(3e-4, clip 1.0, cosine→1e-5; the paper's 1e-3 diverges from random init); train/basnet.py), overfit a small synthetic-Pet set,
and push the trained weights through the SAME inference engine
(pipelines/basnet_infer.run_inference) that the reference protocol uses.
Random-init IoU ~0.1-0.3 → trained IoU ≥0.9 demonstrates every stage of
the architecture (encoder, bridge, U-decoder, 7 side heads, RefUnet) and
the engine itself are functionally correct; only the exact pretrained
numerics remain weight-gated.

Records E2E_BASNET_TRAIN.json.

Usage: python scripts/train_basnet_demo.py [--images 32] [--epochs 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--clip-norm", type=float, default=1.0)
    ap.add_argument("--lr-end", type=float, default=1e-5)
    ap.add_argument("--pet-root", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "E2E_BASNET_TRAIN.json"))
    args = ap.parse_args()

    from weaklysuperviseddl_tpu.utils.profiling import Stopwatch, enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from weaklysuperviseddl_tpu.data import download_data
    from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
    from weaklysuperviseddl_tpu.pipelines.basnet_infer import build_basnet, run_inference
    from weaklysuperviseddl_tpu.train.basnet import train_basnet
    from weaklysuperviseddl_tpu.train.segmentation import _normalize_images

    sw = Stopwatch()
    t0 = time.perf_counter()
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    ds = download_data(args.pet_root, split="test", synthetic_size=args.images,
                       image_size=args.image_size, seed=0)
    model, variables = build_basnet(weights_path=None)

    with sw.phase("eval_random_init", images=args.images):
        _, iou0, acc0 = run_inference(
            ds, model=model, variables=variables, num_images=args.images,
            output_folder=None, log=lambda *a: None)
    print(f"random-init engine IoU {iou0:.4f} acc {acc0:.4f}", flush=True)

    # training tensors: same preprocessing the engine applies (256² resize +
    # ImageNet normalize); target = trimap fg (==1), the engine's own GT
    images = jnp.asarray(np.stack([ds.images[i] for i in range(args.images)]))
    trimaps = jnp.asarray(np.stack([ds.trimaps[i] for i in range(args.images)]))
    x, tri = preprocess_batch(images, trimaps, size=args.image_size,
                              shift_mask_labels=False)
    x = _normalize_images(x)
    targets = (tri == 1).astype(jnp.float32)

    history = []
    with sw.phase("train", images=args.images * args.epochs):
        variables, history = train_basnet(
            model, variables, np.asarray(x), np.asarray(targets),
            epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
            clip_norm=args.clip_norm, lr_end=args.lr_end,
            log=lambda s: print(s, flush=True))

    with sw.phase("eval_trained", images=args.images):
        _, iou1, acc1 = run_inference(
            ds, model=model, variables=variables, num_images=args.images,
            output_folder=os.path.join(REPO, "basnet_outputs_trained"),
            log=lambda *a: None)
    print(f"trained engine IoU {iou1:.4f} acc {acc1:.4f}", flush=True)

    record = {
        "protocol": {
            "images": args.images, "epochs": args.epochs,
            "batch_size": args.batch_size, "image_size": args.image_size,
            "lr": args.lr, "clip_norm": args.clip_norm, "lr_end": args.lr_end, "loss": "hybrid bce+ssim+iou × 8 side outputs",
            "device": f"{dev.platform} {dev.device_kind}",
        },
        "random_init": {"engine_iou": round(iou0, 4), "engine_acc": round(acc0, 4)},
        "trained": {"engine_iou": round(iou1, 4), "engine_acc": round(acc1, 4)},
        "loss_first_epoch": round(history[0], 4),
        "loss_last_epoch": round(history[-1], 4),
        "loss_every_10": [round(v, 4) for v in history[::10]],
        "wall_clock_s": round(time.perf_counter() - t0, 2),
        "phases": {n: {"seconds": round(sw.times[n], 3),
                       "img_per_s": round(sw.rate(n), 2)} for n in sw.times},
    }
    sw.report()
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
