"""Reference surface: TraditionalModel/LayerCAM.py (+ the 3-layer variant in
AlternatingDirectionCutLoss.py:216-318).

``LayerCAMGenerator`` keeps the reference constructor and ``generate``
signature but is hook-free: it closes over the functional CAM path
(cam/layercam.py) — one jit, batched. ``generate`` accepts the CutLoss-variant
argument order ``(images, class_idx=None, alpha=1.0)`` (the consistent one per
SURVEY.md §2.4) and both single-image [3,H,W] and batched inputs.
"""

from __future__ import annotations

import jax.numpy as jnp

from weaklysuperviseddl_tpu.cam.layercam import layercam, layercam_bg
from weaklysuperviseddl_tpu.compat._adapt import to_array, to_nhwc
from weaklysuperviseddl_tpu.utils.metrics import compute_iou_and_acc


class LayerCAMGenerator:
    def __init__(self, model, target_layer_names=("layer3", "layer4"),
                 alpha_mode: str = "per_layer", output_size: int = 224):
        # model: compat FrozenResNetCAM (or anything exposing .module/.variables)
        self.model = model
        self.target_layer_names = tuple(target_layer_names)
        self.alpha_mode = alpha_mode
        self.output_size = output_size

    def generate(self, images, class_idx=None, alpha: float = 1.0):
        """images: [3,H,W] | [H,W,3] | batched; returns CAM [B,H,W] in [0,1]
        (the reference always returns a batch dim, LayerCAM.py:81)."""
        x, _ = to_nhwc(images)
        cls = None if class_idx is None else to_array(class_idx).reshape(-1).astype(jnp.int32)
        cam, _ = layercam(
            self.model.module, self.model.variables, x, cls,
            target_layers=self.target_layer_names, alpha=float(alpha),
            alpha_mode=self.alpha_mode, output_size=self.output_size,
        )
        return cam

    def generate_bg_cam(self, image_tensor, valid_class_indices, alpha: float = 2.0):
        """Reference :296-318 — returns (m_bg [H,W], max_obj_cam [H,W])."""
        x, _ = to_nhwc(image_tensor)
        cls = to_array(valid_class_indices).reshape(-1).astype(jnp.int32)[:1]
        m_bg, cam = layercam_bg(
            self.model.module, self.model.variables, x, cls,
            target_layers=self.target_layer_names, alpha=float(alpha),
            output_size=self.output_size,
        )
        return m_bg[0], cam[0]


def evaluate_layercam_on_test_set(layercam_gen, test_loader, alpha: float = 1.0,
                                  cam_thresh: float = 0.3, max_images: int = 10, log=print):
    """Reference LayerCAM.py:84-130: IoU/acc of the thresholded CAM fg mask vs
    binarized trimap (fg = trimap==1), capped at ~10 images."""
    ious_fg, accs_fg = [], []
    done = 0
    for batch in test_loader:
        x = jnp.asarray(batch.image)
        labels = jnp.asarray(batch.label)
        cams = layercam_gen.generate(x, class_idx=labels, alpha=alpha)
        cams = jnp.where(cams < cam_thresh, 0.0, cams)
        pred_fg = (cams > 0.0).astype(jnp.int32)
        for i in range(batch.num_valid):
            true_mask = (jnp.asarray(batch.trimap[i]) == 1).astype(jnp.int32)
            pf = pred_fg[i]
            if pf.shape != true_mask.shape:
                from weaklysuperviseddl_tpu.ops.resize import resize_nearest

                pf = resize_nearest(pf, true_mask.shape, torch_legacy=True)
            iou, acc = compute_iou_and_acc(pf, true_mask)
            ious_fg.append(float(iou))
            accs_fg.append(float(acc))
            done += 1
            if done > max_images:
                break
        if done > max_images:
            break

    log("\n Evaluation of CAMs on test set:")
    log(f" - LayerCam FG: Avg IoU: {sum(ious_fg)/len(ious_fg):.4f} | "
        f"Acc: {sum(accs_fg)/len(accs_fg):.4f}")
    return {
        "layercam_fg_iou": sum(ious_fg) / len(ious_fg),
        "layercam_fg_acc": sum(accs_fg) / len(accs_fg),
    }
