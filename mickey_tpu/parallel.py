"""SPMD layer: device mesh, sharded inference/training steps.

The reference's distributed story is Lightning DDP data parallelism
(train.py:60, NCCL all-reduce). The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over ICI: batches are sharded on the 'data' axis,
parameters are replicated, and gradient/metric reductions are mean-reduced
by the partitioner (the in-jit psum the reference gets from DDP). Image-pair
inference is embarrassingly parallel — pairs are sharded across chips.

At MicKey's model scale (~20M trainable + frozen 304M backbone) nothing but
the batch is worth sharding; see SURVEY.md §2 parallelism inventory.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over ICI."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


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
