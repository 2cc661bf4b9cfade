"""On-device image resizing with PyTorch-parity semantics.

The reference resizes in three places with three different semantics
(SURVEY.md §2.1 C1/C2, §7 hard parts):

* ``F.interpolate(mode='bilinear', align_corners=False)`` for CAM upsampling
  (ref LayerCAM.py:69) — half-pixel centers, no antialias. Matches
  ``jax.image.resize(method='linear', antialias=False)``.
* ``F.interpolate(mode='nearest')`` for mask resizing (ref LayerCAM.py:111) —
  PyTorch's *legacy* nearest: ``src = floor(dst * in/out)`` (no half-pixel
  shift). jax.image's 'nearest' uses half-pixel centers, so we implement the
  torch variant explicitly with a gather.
* PIL ``Resize`` inside torchvision transforms (ref ExtraUtilities.py:26) —
  antialiased; approximated by ``antialias=True``.

All functions take NHWC or HWC/HW arrays and resize the spatial dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _spatial_axes(x: jnp.ndarray, axes=None):
    """Rank-3 arrays are ambiguous ([H,W,C] vs [B,H,W]); pass ``axes`` to
    disambiguate. Defaults: rank2=[H,W], rank3=[H,W,C], rank4=[B,H,W,C]."""
    if axes is not None:
        return axes
    if x.ndim == 2:
        return 0, 1
    if x.ndim == 3:
        return 0, 1
    if x.ndim == 4:
        return 1, 2
    raise ValueError(f"unsupported rank {x.ndim}")


def _resize_jax(x, size, method, antialias, axes=None):
    h_ax, w_ax = _spatial_axes(x, axes)
    shape = list(x.shape)
    shape[h_ax], shape[w_ax] = size
    orig_dtype = x.dtype
    y = jax.image.resize(x.astype(jnp.float32), shape, method=method, antialias=antialias)
    return y.astype(orig_dtype) if jnp.issubdtype(orig_dtype, jnp.floating) else y


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int], antialias: bool = False, axes=None):
    """Bilinear, half-pixel centers == torch align_corners=False.

    antialias=False matches ``F.interpolate``; antialias=True approximates the
    PIL/torchvision ``Resize`` downsampling path.
    """
    return _resize_jax(x, size, "linear", antialias, axes)


def resize_bicubic(x: jnp.ndarray, size: tuple[int, int], antialias: bool = True, axes=None):
    """Bicubic; antialias=True approximates PIL BICUBIC (ref ExtraUtilities.py:26)."""
    return _resize_jax(x, size, "cubic", antialias, axes)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int], torch_legacy: bool = True, axes=None):
    """Nearest-neighbour resize.

    torch_legacy=True reproduces ``F.interpolate(mode='nearest')``:
    ``src_idx = floor(dst_idx * in/out)``. torch_legacy=False uses half-pixel
    centers (``floor((dst_idx + 0.5) * in/out)``), which is what PIL's NEAREST
    does for the reference's mask transforms.
    """
    h_ax, w_ax = _spatial_axes(x, axes)
    in_h, in_w = x.shape[h_ax], x.shape[w_ax]
    out_h, out_w = size

    def src_idx(out_n, in_n):
        i = jnp.arange(out_n, dtype=jnp.float32)
        scale = in_n / out_n
        idx = jnp.floor(i * scale) if torch_legacy else jnp.floor((i + 0.5) * scale)
        return jnp.clip(idx.astype(jnp.int32), 0, in_n - 1)

    rows = src_idx(out_h, in_h)
    cols = src_idx(out_w, in_w)
    y = jnp.take(x, rows, axis=h_ax)
    y = jnp.take(y, cols, axis=w_ax)
    return y
