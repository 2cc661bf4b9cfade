"""Measure the PyTorch-CPU reference baseline for bench.py.

The reference publishes no numbers (BASELINE.md), so we measure the repaired
reference pipeline's hot path ourselves on CPU, per BASELINE.json: per-image
hook-based LayerCAM generation (the reference is strictly batch-1,
LayerCAM.py:38) on a ResNet-50 with dilated layer4, plus a DeepLabV3-style
(ResNet-50 os=8 + ASPP) train step at 256². torchvision is unavailable here,
so architecture-equivalent torch modules are constructed locally (same layer
shapes → same FLOPs).

Writes BASELINE_TORCH.json; bench.py computes vs_baseline against it.

Run: python scripts/measure_torch_baseline.py [num_images]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from torch_ref import TResNetCAM  # noqa: E402


class TorchASPPHead(nn.Module):
    """DeepLabV3 head with torchvision's shapes (ASPP rates 12/24/36, 256ch)."""

    def __init__(self, in_ch=2048, num_classes=2):
        super().__init__()
        def branch(k, d):
            pad = (k // 2) * d
            return nn.Sequential(
                nn.Conv2d(in_ch, 256, k, padding=pad, dilation=d, bias=False),
                nn.BatchNorm2d(256), nn.ReLU(),
            )
        self.b0 = branch(1, 1)
        self.b1 = branch(3, 12)
        self.b2 = branch(3, 24)
        self.b3 = branch(3, 36)
        self.pool = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Conv2d(in_ch, 256, 1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(),
        )
        self.project = nn.Sequential(
            nn.Conv2d(5 * 256, 256, 1, bias=False), nn.BatchNorm2d(256), nn.ReLU(),
            nn.Dropout(0.5),
        )
        self.head = nn.Sequential(
            nn.Conv2d(256, 256, 3, padding=1, bias=False), nn.BatchNorm2d(256), nn.ReLU(),
            nn.Conv2d(256, num_classes, 1),
        )

    def forward(self, x, out_size):
        p = self.pool(x)
        p = F.interpolate(p, size=x.shape[-2:], mode="bilinear", align_corners=False)
        y = torch.cat([self.b0(x), self.b1(x), self.b2(x), self.b3(x), p], dim=1)
        y = self.head(self.project(y))
        return F.interpolate(y, size=out_size, mode="bilinear", align_corners=False)


def measure_cam(n_images: int):
    """Per-image hook LayerCAM (reference protocol: batch 1, layers 3+4)."""
    torch.manual_seed(0)
    model = TResNetCAM(depth=50, width=1.0, num_classes=37).eval()
    acts, grads = {}, {}
    for name in ("layer3", "layer4"):
        layer = getattr(model, name)
        layer.register_forward_hook(lambda m, i, o, n=name: acts.__setitem__(n, o))
        layer.register_full_backward_hook(lambda m, gi, go, n=name: grads.__setitem__(n, go[0]))

    rng = np.random.default_rng(0)

    def one(img):
        img = img.requires_grad_()
        logits, _ = model(img)
        score = logits[0, int(logits.argmax())]
        model.zero_grad()
        score.backward()
        cams = []
        for name in ("layer3", "layer4"):
            with torch.no_grad():
                cam = F.relu(grads[name] * acts[name]).sum(1)
                cam = F.relu(cam)
                cam = cam - cam.min()
                cam = cam / (cam.max() + 1e-8)
                cams.append(F.interpolate(cam.unsqueeze(1), size=(224, 224),
                                          mode="bilinear", align_corners=False))
        final = (sum(cams) / len(cams)).clamp(min=0) ** 0.5
        # threshold + binarize (PsuedoMasks.py:60-62); largest-CC omitted
        # (scipy/skimage cost is small vs the backbone) — favours the baseline
        return (final > 0.3).to(torch.uint8)

    one(torch.from_numpy(rng.uniform(0, 1, (1, 3, 224, 224)).astype(np.float32)))  # warm
    t0 = time.perf_counter()
    for _ in range(n_images):
        one(torch.from_numpy(rng.uniform(0, 1, (1, 3, 224, 224)).astype(np.float32)))
    dt = time.perf_counter() - t0
    return n_images / dt


def measure_seg(n_images: int, batch: int = 4):
    """DeepLabV3 train step at 256² (reference batch_size=4, SegModel.py:59)."""
    torch.manual_seed(0)
    backbone = TResNetCAM(depth=50, width=1.0, num_classes=2,
                          replace_stride_with_dilation=(False, True, True))
    head = TorchASPPHead(2048, 2)
    params = list(backbone.parameters()) + list(head.parameters())
    opt = torch.optim.Adam(params, lr=1e-4)
    ce = nn.CrossEntropyLoss()
    rng = np.random.default_rng(1)

    def step():
        x = torch.from_numpy(rng.uniform(0, 1, (batch, 3, 256, 256)).astype(np.float32))
        m = torch.from_numpy(rng.integers(0, 2, (batch, 256, 256))).long()
        backbone.train(); head.train()
        logits, feats = backbone(x)
        out = head(feats[-1], (256, 256))
        loss = ce(out, m)
        opt.zero_grad(); loss.backward(); opt.step()

    step()  # warm
    iters = max(1, n_images // batch)
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    return iters * batch / dt


def measure_fc(n_images: int, epochs: int = 15, batch: int = 32):
    """Classifier fc-only training (reference HOT LOOP #1,
    ClassificationModel.py:70-106 / AlternatingDirectionCutLoss.py:116-141):
    every epoch re-runs the frozen ResNet-50 forward over the whole dataset;
    only the fc layer gets gradients. Returns DATASET images / total training
    time (i.e. the per-image cost of the complete ``epochs``-epoch training,
    the same accounting bench.py uses for its cached-features fc stage)."""
    torch.manual_seed(0)
    model = TResNetCAM(depth=50, width=1.0, num_classes=37)
    for name, p in model.named_parameters():
        p.requires_grad = name.startswith("fc")
    opt = torch.optim.Adam([p for p in model.parameters() if p.requires_grad], lr=1e-3)
    ce = nn.CrossEntropyLoss()
    rng = np.random.default_rng(3)

    def step():
        x = torch.from_numpy(rng.uniform(0, 1, (batch, 3, 224, 224)).astype(np.float32))
        y = torch.from_numpy(rng.integers(0, 37, batch))
        logits, _ = model(x)
        loss = ce(logits, y)
        opt.zero_grad(); loss.backward(); opt.step()

    step()  # warm
    iters = max(1, n_images // batch)
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    per_image_per_epoch = (time.perf_counter() - t0) / (iters * batch)
    return 1.0 / (per_image_per_epoch * epochs)


def measure_crf(n_images: int = 1, size: int = 224, n_iters: int = 5,
                gauss_sxy=1.0, gauss_compat=2.0,
                bilat_sxy=50.0, bilat_srgb=5.0, bilat_compat=10.0):
    """Dense-CRF mean field with the reference's parameters
    (AlternatingDirectionCutLoss.py:183-204) as SAME-MATH brute-force kernel
    attention on CPU (pydensecrf is not installable here): symmetric-
    normalized Gaussian + bilateral message passes, blocked torch matmuls so
    the N×N kernel never fully materializes. NOTE this is the exact O(N²)
    form; pydensecrf's permutohedral is O(N) — the repo's own C++ lattice
    (native/wsdl_native.cpp, 310-430 ms/img at 224²) is the
    algorithm-equivalent baseline for that and is recorded separately in
    BASELINE.md."""
    rng = np.random.default_rng(4)
    N = size * size
    ys, xs_ = np.mgrid[0:size, 0:size].astype(np.float32)

    def filter_apply(feats, vals, block=2048):
        """exp(-||f_i - f_j||²/2) @ vals, blocked over rows."""
        sq = (feats ** 2).sum(1)
        out = torch.empty((N, vals.shape[1]))
        for s in range(0, N, block):
            e = min(s + block, N)
            d = sq[s:e, None] + sq[None, :] - 2.0 * feats[s:e] @ feats.T
            out[s:e] = torch.exp(-0.5 * d.clamp(min=0)) @ vals
        return out

    def one():
        img = rng.uniform(0, 255, (size, size, 3)).astype(np.float32)
        cam = rng.uniform(0.05, 0.95, (size, size)).astype(np.float32)
        probs = np.stack([1.0 - cam, cam], -1).reshape(N, 2).clip(1e-8, 1.0)
        unary = -np.log(probs)
        fg = torch.from_numpy(
            np.stack([xs_.ravel() / gauss_sxy, ys.ravel() / gauss_sxy], 1))
        fb = torch.from_numpy(np.concatenate([
            np.stack([xs_.ravel() / bilat_sxy, ys.ravel() / bilat_sxy], 1),
            img.reshape(N, 3) / bilat_srgb], 1))
        with torch.no_grad():
            ones = torch.ones((N, 1))
            inv_g = (filter_apply(fg, ones).clamp(min=1e-20)) ** -0.5
            inv_b = (filter_apply(fb, ones).clamp(min=1e-20)) ** -0.5
            # same math as masks/densecrf.densecrf_inference: symmetric-
            # normalized SELF-INCLUDED messages, Q0 = softmax(-unary)
            U = torch.from_numpy(unary)
            Q = torch.softmax(-U, dim=1)
            for _ in range(n_iters):
                mg = filter_apply(fg, Q * inv_g) * inv_g
                mb = filter_apply(fb, Q * inv_b) * inv_b
                pair = gauss_compat * mg + bilat_compat * mb
                Q = torch.softmax(-U + pair, dim=1)
        return Q

    one()  # warm (and the first call pays allocator growth)
    t0 = time.perf_counter()
    for _ in range(n_images):
        one()
    return n_images / (time.perf_counter() - t0)


def _torch_ncut(preds_nchw, images_nchw, sigma_color=0.1, window=5):
    """Reference LocalNormalizedCutLoss semantics
    (AlternatingDirectionCutLoss.py:65-105): 24-offset shifted-slice sum."""
    B, C, H, W = preds_nchw.shape
    pad = window // 2
    probs = F.softmax(preds_nchw, dim=1)
    probs_p = F.pad(probs, (pad,) * 4, mode="reflect")
    img_p = F.pad(images_nchw, (pad,) * 4, mode="reflect")
    loss, count = 0.0, 0
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            if dy == 0 and dx == 0:
                continue
            sp = probs_p[:, :, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            si = img_p[:, :, pad + dy : pad + dy + H, pad + dx : pad + dx + W]
            aff = torch.exp(-(images_nchw - si).pow(2).sum(1, keepdim=True) / (2 * sigma_color**2))
            for c in range(C):
                loss = loss + (aff * (probs[:, c : c + 1] - sp[:, c : c + 1]) ** 2).mean()
            count += 1
    return loss / (count * C)


def measure_refine(n_images: int, num_steps: int = 10, size: int = 256):
    """Per-image alternating-direction refinement — the reference's hottest
    loop (AlternatingDirectionCutLoss.py:709-767): Adam on a one-hot mask
    variable X, KL(softmax(X)‖S) + λ_dyn·ncut(softmax(X), image)."""
    rng = np.random.default_rng(2)

    def one():
        S = torch.from_numpy(rng.uniform(0.1, 1, (1, 2, size, size)).astype(np.float32))
        S = S / S.sum(1, keepdim=True)
        img = torch.from_numpy(rng.uniform(-1, 1, (1, 3, size, size)).astype(np.float32))
        mask = torch.from_numpy((rng.uniform(0, 1, (size, size)) > 0.5).astype(np.int64))
        X = F.one_hot(mask, 2).permute(2, 0, 1).float().unsqueeze(0).requires_grad_(True)
        opt = torch.optim.Adam([X], lr=1e-2)
        for _ in range(num_steps):
            opt.zero_grad()
            Xn = F.softmax(X, dim=1)
            loss_kl = F.kl_div((Xn + 1e-8).log(), S, reduction="batchmean")
            loss_b = _torch_ncut(Xn, img)
            lam = 0.1 * (loss_kl.item() / (loss_b.item() + 1e-6))
            (loss_kl + lam * loss_b).backward()
            opt.step()
        return (F.softmax(X, dim=1)[0, 1] > 0.5).to(torch.uint8)

    one()  # warm
    t0 = time.perf_counter()
    for _ in range(n_images):
        one()
    return n_images / (time.perf_counter() - t0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    torch.set_num_threads(os.cpu_count() or 1)
    cam_rate = measure_cam(n)
    seg_rate = measure_seg(n)
    refine_rate = measure_refine(max(2, n // 2))
    fc_rate = measure_fc(n)
    crf_rate = measure_crf(1)
    cycle = 1.0 / (1.0 / cam_rate + 1.0 / seg_rate)
    cycle3 = 1.0 / (1.0 / cam_rate + 1.0 / seg_rate + 1.0 / refine_rate)
    cycle4 = 1.0 / (1.0 / fc_rate + 1.0 / cam_rate + 1.0 / seg_rate
                    + 1.0 / refine_rate)
    cycle5 = 1.0 / (1.0 / fc_rate + 1.0 / cam_rate + 1.0 / crf_rate
                    + 1.0 / seg_rate + 1.0 / refine_rate)
    out = {
        "torch_cpu_cam_img_per_s": cam_rate,
        "torch_cpu_seg_train_img_per_s": seg_rate,
        "torch_cpu_refine_img_per_s": refine_rate,
        "torch_cpu_fc_img_per_s": fc_rate,
        "torch_cpu_crf_img_per_s": crf_rate,
        "torch_cpu_cycle_img_per_s": cycle,
        "torch_cpu_cycle3_img_per_s": cycle3,
        "torch_cpu_cycle4_img_per_s": cycle4,
        "torch_cpu_cycle5_img_per_s": cycle5,
        "n_images": n,
        "threads": torch.get_num_threads(),
        "torch_version": torch.__version__,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "BASELINE_TORCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
