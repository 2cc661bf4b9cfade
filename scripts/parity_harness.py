"""Real-weights / real-data parity harness (VERDICT round-2 item 8).

Given the reference's actual pretrained artifacts — none of which can be
downloaded in this environment (zero egress), so the harness is gated and
skips loudly per missing asset — run the full parity suite against PyTorch
goldens driven by the SAME checkpoint bytes, and write PARITY.md:

  * classifier .pth  (reference ``./saves/classifier_weights*.pth``,
    AlternatingDirectionCutLoss.py:483-492, or a raw torchvision resnet50):
    logits parity + LayerCAM map parity (torch hook golden vs cam/layercam).
  * deeplabv3 .pth  (torchvision ``deeplabv3_resnet50`` layout,
    SegmentationModel.py:86-88 / SupervisedModel.py:107): logits parity;
    with 2-class weights + Pet on disk, binary IoU/acc on the test split.
  * basnet.pth  (PretrainedBasnetModel/RunInference.py:10): saliency-map
    parity — per-image MAE vs a golden dir (e.g. the reference's committed
    ``PretrainedBasnetModel/basnet_outputs``) + the RunInference IoU/acc
    protocol on Pet test images.

Usage:
  python scripts/parity_harness.py --weights-dir ./Weights [--pet-root ./data]
      [--basnet-golden-dir .../basnet_outputs] [--num-images 8] [--out PARITY.md]

Without real Pet images the image-driven checks fall back to synthetic inputs
(still a true same-bytes implementation-parity check; noted in the report).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

LINES: list[str] = []


def report(line: str = ""):
    print(line, flush=True)
    LINES.append(line)


def find_weights(weights_dir, patterns):
    for pat in patterns:
        hits = sorted(glob.glob(os.path.join(weights_dir, pat)))
        if hits:
            return hits[0]
    return None


def load_pet_images(pet_root, n, size=224):
    """A few real Pet images + trimaps from disk, or None."""
    from PIL import Image

    img_dir = os.path.join(pet_root, "oxford-iiit-pet", "images")
    if not os.path.isdir(img_dir):
        img_dir = os.path.join(pet_root, "images")
    if not os.path.isdir(img_dir):
        return None
    files = sorted(glob.glob(os.path.join(img_dir, "*.jpg")))[:n]
    if not files:
        return None
    imgs, tris = [], []
    for f in files:
        img = Image.open(f).convert("RGB").resize((size, size), Image.BILINEAR)
        imgs.append(np.asarray(img, np.uint8))
        tri_f = f.replace("images", os.path.join("annotations", "trimaps")).replace(
            ".jpg", ".png")
        if os.path.exists(tri_f):
            tri = Image.open(tri_f).resize((size, size), Image.NEAREST)
            tris.append(np.asarray(tri, np.uint8))
        else:
            tris.append(None)
    return np.stack(imgs), tris


def normalize_classifier_keys(state):
    """Reference FrozenResNetCAM prefixes (layer0.0/layer0.1 stem,
    ClassificationModel.py:18) → torchvision resnet names for the torch
    golden; raw torchvision checkpoints pass through unchanged."""
    out = {}
    for k, v in state.items():
        k = k.replace("layer0.0.", "conv1.").replace("layer0.1.", "bn1.")
        out[k] = v
    return out


def check_classifier(path, images_u8, num_images):
    import torch
    import jax
    import jax.numpy as jnp
    from torch_ref import TResNetCAM
    from test_cam import TorchHookLayerCAM
    from weaklysuperviseddl_tpu.cam.layercam import layercam
    from weaklysuperviseddl_tpu.models.classifier import CamClassifier
    from weaklysuperviseddl_tpu.models.torch_import import (
        cam_classifier_variables, load_pth)

    report("## Classifier + LayerCAM")
    state = normalize_classifier_keys(load_pth(path))
    num_classes = state["fc.weight"].shape[0]
    tmodel = TResNetCAM(depth=50, num_classes=num_classes)
    tmodel.load_state_dict(state)
    tmodel.eval()

    variables = jax.tree.map(jnp.asarray, cam_classifier_variables(state))
    fmodel = CamClassifier(num_classes=num_classes, depth=50)

    x = images_u8[:num_images].astype(np.float32) / 255.0
    with torch.no_grad():
        tlogits, _ = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    flogits, _ = fmodel.apply(variables, jnp.asarray(x))
    logit_mad = float(np.abs(np.asarray(flogits) - tlogits.numpy()).max())
    report(f"- logits max-abs-diff over {len(x)} images: {logit_mad:.2e} "
           f"({'PASS' if logit_mad < 1e-2 else 'FAIL'})")

    cls = np.asarray(tlogits.argmax(1))
    hook_golden = TorchHookLayerCAM(tmodel)
    golden = hook_golden.generate(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(cls),
        alpha=0.5, mode="per_layer", out_size=224)
    cam, _ = layercam(fmodel, variables, jnp.asarray(x), jnp.asarray(cls),
                      alpha=0.5, alpha_mode="per_layer", output_size=224)
    diff = np.abs(np.asarray(cam) - golden.numpy())

    # The per-layer min-max normalization divides by the raw CAM's dynamic
    # range. Untrained/degenerate weights produce nearly-flat raw CAMs
    # (measured range ≈ 3% of mean on random ResNet-50), so normalized-map
    # MAE then amplifies benign cross-framework conv rounding ~30-400×.
    # Trained weights (the real use of this harness) have O(1) range.
    import torch.nn.functional as F
    rel_range = min(
        float((raw.max() - raw.min()) / raw.abs().mean().clamp_min(1e-12))
        for raw in (
            F.relu(hook_golden.grads[n] * hook_golden.acts[n]).sum(1).detach()
            for n in hook_golden.layers
        )
    )
    if diff.mean() < 5e-3:
        verdict = "PASS"
    elif rel_range < 0.25:
        verdict = (f"INDETERMINATE — raw CAM dynamic range is {rel_range:.2f} "
                   f"of its mean (degenerate/untrained weights); rerun with "
                   f"trained weights")
    else:
        verdict = "FAIL"
    report(f"- LayerCAM mean-abs-diff: {diff.mean():.2e} "
           f"(max {diff.max():.2e}) ({verdict})")


def check_deeplab(path, images_u8, trimaps, num_images):
    import torch
    import jax
    import jax.numpy as jnp
    from torch_ref import TDeepLabV3
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.models.torch_import import (
        deeplab_variables, load_pth)

    report("## DeepLabV3")
    state = load_pth(path)
    state = {k: v for k, v in state.items() if not k.startswith("aux_classifier.")}
    num_classes = state["classifier.4.weight"].shape[0]
    tmodel = TDeepLabV3(num_classes=num_classes)
    tmodel.load_state_dict(state)
    tmodel.eval()

    variables = jax.tree.map(jnp.asarray, deeplab_variables(state))
    fmodel = DeepLabV3(num_classes=num_classes)

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (images_u8[:num_images].astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        tlogits = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    flogits = fmodel.apply(variables, jnp.asarray(x), train=False)
    mad = float(np.abs(np.asarray(flogits) - tlogits.permute(0, 2, 3, 1).numpy()).max())
    report(f"- logits max-abs-diff over {len(x)} images: {mad:.2e} "
           f"({'PASS' if mad < 5e-2 else 'FAIL'})")
    agree = float((np.asarray(flogits).argmax(-1)
                   == tlogits.argmax(1).numpy()).mean())
    report(f"- argmax-prediction agreement: {agree:.4f} "
           f"({'PASS' if agree > 0.999 else 'FAIL'})")

    if num_classes == 2 and any(t is not None for t in trimaps):
        preds = np.asarray(flogits).argmax(-1)
        ious, accs = [], []
        for p, t in zip(preds, trimaps):
            if t is None:
                continue
            gt = (t == 1).astype(np.uint8)
            inter = np.logical_and(p, gt).sum()
            union = np.logical_or(p, gt).sum()
            ious.append(inter / union if union else 1.0)
            accs.append((p == gt).mean())
        report(f"- Pet binary IoU {np.mean(ious):.4f}, acc {np.mean(accs):.4f} "
               f"(reference protocol SegmentationModel.py:126-159; compare to "
               f"the torch run of the same checkpoint, parity budget ±0.5 mIoU)")


def check_basnet(path, pet_root, golden_dir, num_images):
    import jax.numpy as jnp
    from weaklysuperviseddl_tpu.pipelines.basnet_infer import (
        build_basnet, saliency_step)
    from PIL import Image

    report("## BASNet saliency")
    model, variables = build_basnet(weights_path=path)
    report(f"- ingested {path} into the flax BASNet")

    data = load_pet_images(pet_root, num_images, size=256) if pet_root else None
    if data is None:
        report("- SKIP image checks: no Pet images on disk")
        return
    images, trimaps = data
    preds = np.asarray(saliency_step(model, variables, jnp.asarray(images)))

    ious, accs = [], []
    for p, t in zip(preds, trimaps):
        if t is None:
            continue
        pb = (p > 0.5).astype(np.uint8)
        gt = (t == 1).astype(np.uint8)
        inter = np.logical_and(pb, gt).sum()
        union = np.logical_or(pb, gt).sum()
        ious.append(inter / union if union else 1.0)
        accs.append((pb == gt).mean())
    if ious:
        report(f"- RunInference protocol (ref :124-126): mean IoU "
               f"{np.mean(ious):.4f}, mean acc {np.mean(accs):.4f}")

    if golden_dir and os.path.isdir(golden_dir):
        goldens = sorted(glob.glob(os.path.join(golden_dir, "*.png")))[:len(preds)]
        maes = []
        for p, g in zip(preds, goldens):
            gold = np.asarray(Image.open(g).convert("L").resize((256, 256)),
                              np.float32) / 255.0
            maes.append(float(np.abs(p - gold).mean()))
        report(f"- saliency MAE vs golden dir ({len(maes)} images): "
               f"{np.mean(maes):.4f} "
               f"({'PASS' if np.mean(maes) < 0.02 else 'CHECK ORDERING'})")
    else:
        report("- SKIP golden-dir comparison: --basnet-golden-dir not given")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", default="./Weights")
    ap.add_argument("--pet-root", default=None)
    ap.add_argument("--basnet-golden-dir", default=None)
    ap.add_argument("--num-images", type=int, default=8)
    ap.add_argument("--out", default="PARITY.md")
    args = ap.parse_args()

    report("# PARITY — real pretrained weights vs PyTorch goldens")
    report()
    report(f"weights dir: `{args.weights_dir}`  pet root: `{args.pet_root}`")
    report()

    data = load_pet_images(args.pet_root, args.num_images) if args.pet_root else None
    if data is None:
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (args.num_images, 224, 224, 3)).astype(np.uint8)
        trimaps = [None] * args.num_images
        report("NOTE: no Pet images found — image-driven checks use synthetic "
               "inputs (same-bytes implementation parity only).")
        report()
    else:
        images, trimaps = data

    clf = find_weights(args.weights_dir,
                       ["classifier_weights*.pth", "resnet50*.pth"])
    dl = find_weights(args.weights_dir, ["deeplabv3*.pth"])
    bn = find_weights(args.weights_dir, ["basnet.pth"])

    if clf:
        check_classifier(clf, images, args.num_images)
    else:
        report("## Classifier + LayerCAM\n- SKIP: no classifier_weights*.pth "
               "or resnet50*.pth in weights dir")
    report()
    if dl:
        check_deeplab(dl, images, trimaps, args.num_images)
    else:
        report("## DeepLabV3\n- SKIP: no deeplabv3*.pth in weights dir")
    report()
    if bn:
        check_basnet(bn, args.pet_root, args.basnet_golden_dir, args.num_images)
    else:
        report("## BASNet saliency\n- SKIP: no basnet.pth in weights dir")

    with open(args.out, "w") as f:
        f.write("\n".join(LINES) + "\n")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
