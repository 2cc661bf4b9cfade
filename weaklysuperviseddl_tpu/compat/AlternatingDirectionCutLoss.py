"""Reference surface: TraditionalModel/AlternatingDirectionCutLoss.py —
the importable pieces of the script (classes/functions; the module-level
training script is pipelines.weakly + train.alternating)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.cam.cam import cam_bg, class_cams
from weaklysuperviseddl_tpu.compat._adapt import to_array, to_hw_batch, to_nhwc
from weaklysuperviseddl_tpu.compat.ClassificationModel import FrozenResNetCAM  # noqa: F401
from weaklysuperviseddl_tpu.compat.LayerCAM import LayerCAMGenerator  # noqa: F401
from weaklysuperviseddl_tpu.compat.PsuedoMasks import keep_largest  # noqa: F401
from weaklysuperviseddl_tpu.losses.window import (
    local_normalized_cut_loss,
    window_affinities,
)
from weaklysuperviseddl_tpu.masks import densecrf as _densecrf
from weaklysuperviseddl_tpu.train.refine import refine_from_soft_predictions
from weaklysuperviseddl_tpu.data.dataset import download_data  # noqa: F401  (bilinear variant)


class LocalNormalizedCutLoss:
    """Reference :65-105 — callable module: (preds, images) → scalar.

    preds: logits (softmax applied inside, like the reference), NCHW or NHWC,
    with or without a batch dim.
    """

    def __init__(self, sigma_color: float = 0.05, window_size: int = 5):
        self.sigma_color = sigma_color
        self.window_size = window_size

    def __call__(self, preds, images):
        preds, _ = to_nhwc_any_channels(preds)
        images, _ = to_nhwc(images)
        return local_normalized_cut_loss(
            preds, images, sigma_color=self.sigma_color, window_size=self.window_size
        )

    forward = __call__


def to_nhwc_any_channels(x):
    """Like _adapt.to_nhwc but for C-channel prediction maps (C may be 2)."""
    x = to_array(x)
    if x.ndim == 3:
        x = x[None]
        batched = False
    else:
        batched = True
    # NCHW → NHWC when the channel dim is small and trailing dim is not
    if x.shape[1] <= 8 and x.shape[-1] > 8:
        x = jnp.transpose(x, (0, 2, 3, 1))
    return x, batched


def compute_affinities(image, sigma_color=0.1, sigma_space=5, window_size=5):
    """Reference :612-637 — list of (B,1,H,W) affinity maps per offset."""
    image, _ = to_nhwc(image)
    aff = window_affinities(image, sigma_color=sigma_color, sigma_space=sigma_space,
                            window_size=window_size)  # [B,K,H,W]
    return [aff[:, k : k + 1] for k in range(aff.shape[1])]


def apply_dense_crf(img_np, cam_np, **kwargs):
    """Reference :183-204 — single image HWC uint8 + cam [H,W] → uint8 mask."""
    img = to_array(img_np).astype(jnp.float32)
    cam, _ = to_hw_batch(cam_np)
    refined = _densecrf.apply_dense_crf(img[None], cam, **kwargs)
    return np.asarray(refined[0], np.uint8)


class CAMGenerator:
    """Reference :320-403 — classic fc-weight CAM."""

    def __init__(self, model: FrozenResNetCAM):
        self.model = model

    def generate_all_cams(self, image_tensor):
        x, _ = to_nhwc(image_tensor)
        cams, _ = class_cams(self.model.module, self.model.variables, x)
        return cams[0]  # (num_classes, h, w) like the reference's squeeze

    def generate_bg_cam(self, image_tensor, valid_class_indices, alpha: float = 1.0):
        x, _ = to_nhwc(image_tensor)
        num_classes = self.model.num_classes
        mask = np.zeros((1, num_classes), np.float32)
        for idx in np.asarray(to_array(valid_class_indices)).reshape(-1):
            mask[0, int(idx)] = 1.0
        m_bg, max_obj = cam_bg(self.model.module, self.model.variables, x,
                               jnp.asarray(mask), alpha=float(alpha))
        return m_bg[0], max_obj[0]


def train_model(model, optimizer_state_or_tx, criterion_ce=None, num_epochs: int = 3,
                train_loader=None, log=print):
    """Reference :684-707 — epoch loop over (images, masks, name) batches.

    ``model`` is a compat SegModelHandle; training routes through the jit'd
    step (the reference's explicit torch loop). ``criterion_ce`` accepted for
    signature parity; CE is the loss either way.
    """
    import numpy as np

    from weaklysuperviseddl_tpu.train.segmentation import train_segmentation_model

    assert train_loader is not None, "pass train_loader=(images, masks) arrays or Batch iterable"
    if isinstance(train_loader, tuple):
        images, masks = train_loader
    else:
        ims, ms = [], []
        for batch in train_loader:
            ims.append(batch.image[: batch.num_valid])
            ms.append((batch.trimap[: batch.num_valid] == 1).astype(np.uint8))
        images, masks = np.concatenate(ims), np.concatenate(ms)
    model.state, final_loss = train_segmentation_model(
        model.module, model.state, optimizer_state_or_tx, images, masks,
        num_epochs=num_epochs, seg_size=model.input_size, log=log,
    )
    return final_loss


def evaluate_model(model, test_loader, log=lambda s: None):
    """Reference :639-682 — the script variant that binarizes SHIFTED labels
    (fg = 1 - clip(shifted,0,1), ref :658-662) instead of trimap==1."""
    import jax.numpy as jnp
    import numpy as np

    from weaklysuperviseddl_tpu.ops.resize import resize_nearest
    from weaklysuperviseddl_tpu.utils.metrics import compute_iou_and_acc

    ious, accs = [], []
    for batch in test_loader:
        out = model(jnp.asarray(batch.image).astype(jnp.float32) / 255.0)["out"]
        preds = jnp.argmax(out, axis=1)
        for i in range(batch.num_valid):
            t = jnp.asarray(batch.trimap[i], jnp.int32)
            shifted = jnp.clip(t - 1, 0, None)
            true_fg = 1 - jnp.clip(shifted, 0, 1)
            p_ = preds[i]
            if p_.shape != true_fg.shape:
                p_ = resize_nearest(p_, true_fg.shape, torch_legacy=True)
            iou, acc = compute_iou_and_acc(p_, true_fg)
            ious.append(float(iou))
            accs.append(float(acc))
    return sum(ious) / len(ious), sum(accs) / len(accs)


def infer_and_plot(model, img_path, pseudo_mask_path, save_path=None):
    """Reference :835-861 — load an image + its pseudo mask, predict, plot."""
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    img = Image.open(img_path).convert("RGB").resize((256, 256))
    x = np.asarray(img, np.float32) / 255.0
    x = (x - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
        [0.229, 0.224, 0.225], np.float32
    )
    out = model(jnp.asarray(x)[None])["out"]
    pred = np.asarray(jnp.argmax(out[0], axis=0))
    if save_path:
        from weaklysuperviseddl_tpu.compat.Visualisation import visualize_mask

        visualize_mask(np.asarray(img), pred, title="Predicted Segmentation",
                       save_path=save_path)
    return pred


def refine_pseudo_mask(model, image, mask, lambda_boundary=0.1, threshold=0.5,
                       lr=1e-2, num_steps=20, sigma_color=0.1, window_size=5):
    """Reference :709-767 — single-image signature over the batched core.

    ``mask`` may be {0,1} or {0,255} (PNG-loaded; the reference binarizes with
    ==255 at :726). ``model`` is a compat SegModelHandle.
    """
    x, _ = to_nhwc(image)
    m, _ = to_hw_batch(mask)
    m = jnp.where(m > 1, (m == 255).astype(jnp.int32), m.astype(jnp.int32))
    logits = model(x)["out"]                       # NCHW
    S = jax.nn.softmax(jnp.transpose(logits, (0, 2, 3, 1)), axis=-1)
    refined, _ = refine_from_soft_predictions(
        S, x, m, lambda_boundary=lambda_boundary, threshold=threshold, lr=lr,
        num_steps=num_steps, sigma_color=sigma_color, window_size=window_size,
        loss="ncut",
    )
    return refined[0].astype(jnp.float32)
