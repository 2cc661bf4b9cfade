"""Classic CAM — fc-weight × final features (no backward pass needed).

Reference: ``CAMGenerator`` (AlternatingDirectionCutLoss.py:320-403):
per-class CAM = einsum(fc_weight[class], layer4_features) → ReLU → per-map
min-max; background map ``M_bg = 1 - (1 - max_valid CAM)^alpha``. Here the
einsum covers all classes at once on the MXU and the whole thing is one jit,
batched over images (the reference loops classes in Python, :350).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from weaklysuperviseddl_tpu.cam.layercam import _minmax
from weaklysuperviseddl_tpu.ops.resize import resize_bilinear


@partial(jax.jit, static_argnames=("model",))
def class_cams(model, variables, images):
    """All-class CAMs: [B, num_classes, h, w], each ReLU'd + min-max normalized
    (ref generate_all_cams, AlternatingDirectionCutLoss.py:343-372)."""
    logits, feats = model.apply(variables, images)
    f4 = feats[-1]                                   # [B,h,w,C] NHWC
    fc_kernel = variables["params"]["fc"]["kernel"]  # [C, num_classes]
    cams = jnp.einsum("bhwc,ck->bkhw", f4, fc_kernel)
    cams = jax.nn.relu(cams)
    cams = _minmax(cams)                             # per (image, class) map
    return cams, logits


@partial(jax.jit, static_argnames=("model", "alpha", "output_size"))
def cam_bg(model, variables, images, valid_class_mask, alpha: float = 1.0, output_size: int = 224):
    """Background + max-foreground CAM (ref generate_bg_cam, :374-403).

    valid_class_mask: [B, num_classes] float {0,1} — classes present in each
    image (the reference zeroes out irrelevant class CAMs, :383-386).
    Returns (m_bg [B,S,S], max_obj_cam [B,S,S]).
    """
    cams, _ = class_cams(model, variables, images)
    masked = cams * valid_class_mask[:, :, None, None]
    max_obj = jnp.max(masked, axis=1)                              # [B,h,w]
    m_bg = 1.0 - jnp.clip(1.0 - max_obj, 0.0, None) ** alpha
    m_bg = resize_bilinear(m_bg, (output_size, output_size), axes=(1, 2))
    max_obj = resize_bilinear(max_obj, (output_size, output_size), axes=(1, 2))
    return m_bg, max_obj
