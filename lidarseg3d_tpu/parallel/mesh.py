"""Device mesh + sharding helpers (SPMD data parallelism).

The reference's DDP/NCCL stack (det3d/torchie/apis/train.py:345-352,
apis/env.py:13-48) maps to: a 1-D `jax.sharding.Mesh` over all devices,
batches sharded on the leading axis, parameters replicated. Gradient
all-reduce and SyncBN statistics come out of XLA SPMD automatically —
no explicit collectives in user code.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="data"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """device_put a dict of host arrays with the leading dim sharded."""
    sh = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh):
    return jax.device_put(tree, replicated(mesh))
