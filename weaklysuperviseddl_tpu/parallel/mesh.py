"""SPMD mesh + sharding helpers — the framework's communication backend.

The reference has NO distributed code (SURVEY.md §2.3: single
``cuda-if-available`` device everywhere). The TPU-native equivalent is not a
comm library but a layout: a ``jax.sharding.Mesh`` over ICI with

  * ``data``  — batch axis for classifier training, CAM extraction,
    pseudo-mask generation and segmentation training (the workload's natural
    parallelism),
  * ``model`` — optional channel sharding for the DeepLab/ASPP head (tensor
    parallelism as a mesh-axis change, not special code).

jit + NamedSharding makes XLA insert the collectives (psum for loss/metric
reductions, all-gathers where layouts demand) — nothing hand-written rides
DCN. Metric counters from utils.metrics are plain sums, so a sharded eval
reduces with one psum.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. data=-1 → all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(np.asarray(devices).reshape(data, model), ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis on 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """device_put each [B,...] array with batch-on-'data' sharding."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, np.ndim(a))) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (e.g. model variables) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
