"""SPMD layer: device mesh, sharded inference/training steps.

The reference's distributed story is Lightning DDP data parallelism
(train.py:60, NCCL all-reduce). The TPU-native equivalent is a
``jax.sharding.Mesh`` over ICI: batches are sharded on the 'data' axis,
trainable parameters are replicated, and gradient/metric reductions are
mean-reduced by the partitioner (the in-jit psum the reference gets from
DDP). Image-pair inference is embarrassingly parallel — pairs are sharded
across chips.

Beyond the reference's DDP, the frozen DINOv2 backbone (304M params, the
bulk of both HBM and FLOPs) can additionally be tensor-parallel over a
second 'model' mesh axis: Megatron-style column/row sharding of the
attention qkv/proj and MLP fc1/fc2 weights (``vit_tp_shardings``), with the
flash-attention kernel shard_mapped over local heads (nn/dinov2.py). This
shrinks per-chip backbone HBM by the tp factor and rides ICI for the two
per-block all-reduces XLA inserts after the row-parallel matmuls.

The trainable heads/matcher (~20M) stay replicated at any mesh shape.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over ICI."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def get_mesh_2d(
    tp: int = 1,
    num_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(data, model) mesh: dp = n_devices // tp data-parallel groups of tp
    tensor-parallel chips. tp chips of a group should be ICI neighbors — the
    default device order gives that on a standard slice topology."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    dp = len(devs) // tp
    assert dp * tp == len(devs), f"{len(devs)} devices not divisible by tp={tp}"
    return Mesh(np.array(devs[: dp * tp]).reshape(dp, tp), (DATA_AXIS, MODEL_AXIS))


def mesh_tp(mesh: Optional[Mesh]) -> int:
    """Size of the tensor-parallel axis (1 when absent / no mesh)."""
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return 1
    return int(mesh.shape[MODEL_AXIS])


def vit_tp_shardings(mesh: Mesh, vit_params: Dict[str, Any]):
    """NamedSharding pytree for the stacked DINOv2 params (nn/dinov2.py).

    Megatron column/row pattern per transformer block (leading dim is the
    lax.scan stack over layers): qkv and fc1 split the output features over
    'model' (column-parallel, biases sharded with them); proj and fc2 split
    the input features (row-parallel, partial sums all-reduced by XLA,
    replicated bias added after). The fused qkv weight stores its 3C output
    dim HEAD-MAJOR (checkpoint._qkv_to_head_major), so contiguous column
    shards equal whole head groups and the (B, S, 3C) -> (B, S, H, 3, D)
    reshape in nn/dinov2.py needs no resharding collective.
    LayerNorms/LayerScale/patch-embed/pos-embed are replicated. The SwiGLU
    variant keeps its fused w12 replicated (the half-split crosses shard
    boundaries; MicKey's DINOv2 uses the plain MLP).
    """
    specs = jax.tree.map(lambda _: P(), vit_params)
    blocks = vit_params["blocks"]
    bspecs = specs["blocks"]
    bspecs["attn"] = {
        "qkv": {"w": P(None, None, MODEL_AXIS), "b": P(None, MODEL_AXIS)},
        "proj": {"w": P(None, MODEL_AXIS, None), "b": P()},
    }
    if "fc1" in blocks["mlp"]:
        bspecs["mlp"] = {
            "fc1": {"w": P(None, None, MODEL_AXIS), "b": P(None, MODEL_AXIS)},
            "fc2": {"w": P(None, MODEL_AXIS, None), "b": P()},
        }
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda s: isinstance(s, P)
    )


def shard_backbone(mesh: Optional[Mesh], vit_params: Dict[str, Any]):
    """device_put the frozen backbone: tensor-parallel when the mesh has a
    'model' axis of size > 1, replicated otherwise."""
    if mesh is None:
        return vit_params
    if mesh_tp(mesh) > 1:
        return jax.device_put(vit_params, vit_tp_shardings(mesh, vit_params))
    return jax.device_put(vit_params, NamedSharding(mesh, P()))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of host arrays with batch-dim sharding."""
    return jax.device_put(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def pad_batch(tree: Dict[str, np.ndarray], multiple: int):
    """Pad the leading dim of every array to a multiple (repeat last element);
    returns (padded_tree, real_batch). Static shapes for pjit."""
    b = next(iter(tree.values())).shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return tree, b
    out = {}
    for k, v in tree.items():
        v = np.asarray(v)
        out[k] = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
    return out, b
