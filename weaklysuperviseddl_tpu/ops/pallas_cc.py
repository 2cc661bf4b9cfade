"""Pallas connected-components labeling — the whole fixed point in VMEM.

The XLA implementation (masks/components.py) round-trips HBM on every
fixed-point iteration (4 segmented cummins + a 3×3 min per step). This kernel
keeps the label plane resident in VMEM and runs the entire while-loop
on-chip: segmented min-scans are Hillis–Steele doubling over ``pltpu.roll``
shifts (log₂ steps per direction), the 3×3 neighbour min is four rolls, and
convergence is checked in-register. HBM traffic: one mask read, one label
write — per image, total.

Semantics identical to masks/components.label_components (8-connectivity,
labels = linear index of each component's minimal pixel, bg = -1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _cc_kernel(fg_ref, out_ref, *, H, W, Ha, Wa, max_iters, interpret):
    # pltpu.roll's interpret path can't be traced inside while_loop; jnp.roll
    # has identical semantics and is only used in interpreter mode
    roll = jnp.roll if interpret else pltpu.roll
    fg = fg_ref[0] != 0                                   # [Ha,Wa] bool
    BIG = jnp.int32(Ha * Wa)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (Ha, Wa), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (Ha, Wa), 1)
    seeds = row_ids * W + col_ids                         # linear index in the REAL W
    labels0 = jnp.where(fg, seeds, BIG)
    reset_i = (~fg).astype(jnp.int32)  # Mosaic can't rotate non-32-bit vectors

    def seg_scan(v, axis, reverse):
        """Segmented min-scan via Hillis–Steele doubling with rolls."""
        n = Ha if axis == 0 else Wa
        ids = row_ids if axis == 0 else col_ids
        f = reset_i

        d = 1
        while d < n:
            # pltpu.roll requires non-negative shifts; roll by n-d ≡ roll by -d
            shift = d if not reverse else n - d
            v_sh = roll(v, shift, axis=axis)
            f_sh = roll(f, shift, axis=axis)
            valid = (ids >= d) if not reverse else (ids < n - d)
            take = valid & (f == 0)
            v = jnp.where(take, jnp.minimum(v, v_sh), v)
            f = jnp.where(valid, jnp.maximum(f, f_sh), f)
            d *= 2
        return jnp.where(fg, v, BIG)

    def neighbor_min(v):
        up = roll(v, 1, axis=0)
        down = roll(v, Ha - 1, axis=0)     # ≡ roll by -1
        up = jnp.where(row_ids >= 1, up, BIG)
        down = jnp.where(row_ids < Ha - 1, down, BIG)
        vert = jnp.minimum(jnp.minimum(up, v), down)
        left = roll(vert, 1, axis=1)
        right = roll(vert, Wa - 1, axis=1)  # ≡ roll by -1
        left = jnp.where(col_ids >= 1, left, BIG)
        right = jnp.where(col_ids < Wa - 1, right, BIG)
        m = jnp.minimum(jnp.minimum(left, vert), right)
        return jnp.where(fg, m, BIG)

    def step(v):
        v = neighbor_min(v)
        v = seg_scan(v, axis=1, reverse=False)
        v = seg_scan(v, axis=1, reverse=True)
        v = seg_scan(v, axis=0, reverse=False)
        v = seg_scan(v, axis=0, reverse=True)
        return v

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        v, _, it = state
        new = step(v)
        return new, jnp.any(new != v), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), 0))
    out_ref[0] = jnp.where(fg, labels, -1)


@partial(jax.jit, static_argnames=("max_iters", "interpret"))
def pallas_label_components_batch(masks: jnp.ndarray, max_iters: int | None = None,
                                  interpret: bool = False):
    """[B,H,W] binary → int32 labels [B,H,W] (bg=-1), VMEM-resident loop."""
    return _run(masks, max_iters, interpret)


def _run(masks, max_iters, interpret):
    B, H, W = masks.shape
    Ha, Wa = _round_up(H, 8), _round_up(W, 128)
    limit = max_iters if max_iters is not None else H + W
    fg = jnp.pad(masks.astype(jnp.int32), ((0, 0), (0, Ha - H), (0, Wa - W)))

    kernel = partial(_cc_kernel, H=H, W=W, Ha=Ha, Wa=Wa, max_iters=limit,
                     interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Ha, Wa), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Ha, Wa), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ha, Wa), jnp.int32),
        interpret=interpret,
    )(fg)
    return out[:, :H, :W]


def pallas_keep_largest_batch(masks: jnp.ndarray, max_iters: int | None = None,
                              interpret: bool = False):
    """Largest-component filter using the VMEM labeling kernel. Selection is
    sort-based (masks/components.largest_label_by_sort): the former
    H*W-bin bincount was a scatter-add costing 14 of the 17 ms/batch32."""
    from weaklysuperviseddl_tpu.masks.components import largest_label_by_sort

    B, H, W = masks.shape
    labels = pallas_label_components_batch(masks, max_iters=max_iters, interpret=interpret)

    def select(lab):
        largest = largest_label_by_sort(lab, H * W)
        return ((lab == largest) & (lab >= 0)).astype(jnp.uint8)

    return jax.vmap(select)(labels)
