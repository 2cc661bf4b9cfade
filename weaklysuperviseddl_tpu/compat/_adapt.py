"""Array/layout adapters shared by the compat shims."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def to_array(x):
    """torch tensor / numpy / jnp → jnp array."""
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return jnp.asarray(np.asarray(x))


def to_nhwc(x):
    """Accept [B,3,H,W], [3,H,W], [B,H,W,3], [H,W,3] → [B,H,W,3] + was_batched."""
    x = to_array(x)
    if x.ndim == 3:
        x = x[None]
        batched = False
    else:
        batched = True
    if x.shape[1] == 3 and x.shape[-1] != 3:
        x = jnp.transpose(x, (0, 2, 3, 1))
    return x, batched


def to_hw_batch(x):
    """Masks: [H,W] or [B,H,W] (or with a leading channel dim of 1) → [B,H,W]."""
    x = to_array(x)
    if x.ndim == 2:
        return x[None], False
    if x.ndim == 3 and x.shape[0] == 1 and x.shape[1] > 4:
        # ambiguous [1,H,W]: treat as single image with channel squeezed
        return x, True
    if x.ndim == 4:  # [B,1,H,W]
        return x[:, 0], True
    return x, True
