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


def mesh_from_config(mesh_cfg) -> Mesh | None:
    """Mesh from a config.MeshConfig; None on a single device with no model
    axis requested (keeps the common single-chip path sharding-free)."""
    n = len(jax.devices())
    if n == 1 and mesh_cfg.model == 1:
        return None
    return make_mesh(data=mesh_cfg.data, model=mesh_cfg.model)


def tp_leaf_sharding(mesh: Mesh, x, min_channels: int = 64) -> NamedSharding:
    """Tensor-parallel sharding rule for one parameter leaf: shard the
    output-channel (last) axis of conv/dense kernels on 'model' when it
    divides evenly and is large enough to be worth the collective; replicate
    everything else (biases, BN scales, small kernels).

    This is the single TP policy for the whole framework — create_seg_state,
    the pipelines and __graft_entry__.dryrun_multichip all route through it,
    so the driver dryrun exercises the production layout.
    """
    model_axis = mesh.shape.get("model", 1)
    if model_axis == 1:
        return NamedSharding(mesh, P())
    if (
        hasattr(x, "ndim") and x.ndim >= 2
        and x.shape[-1] % model_axis == 0 and x.shape[-1] >= min_channels
    ):
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), "model"))
    return NamedSharding(mesh, P())


def shard_params_tp(mesh: Mesh, tree, min_channels: int = 64):
    """device_put a parameter/optimizer pytree with the TP layout above."""
    return jax.tree.map(
        lambda x: jax.device_put(x, tp_leaf_sharding(mesh, x, min_channels)), tree
    )
