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
    """Ship a dict of HOST-LOCAL arrays to devices, leading dim sharded.

    Multi-process: each host contributes its own batch shard (the loader
    already shards frames by host), assembled into one global array —
    the jax equivalent of DistributedSampler + DDP scatter."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def _to_global_replicated(x, sh):
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return x  # already a multi-process global array (e.g. from init)
    return jax.make_array_from_process_local_data(sh, np.asarray(x))


def replicate_tree(tree, mesh):
    if jax.process_count() > 1:
        sh = replicated(mesh)
        return jax.tree.map(lambda x: _to_global_replicated(x, sh), tree)
    return jax.device_put(tree, replicated(mesh))


def fetch_local_rows(tree):
    """Host view of sharded outputs: THIS process's rows only (in input
    order). Replaces the reference's pickle all_gather for eval — each host
    keeps its shard and metric reduction happens on [C, C] histograms
    (parallel/dist.py). Falls back to device_get in single-process runs."""
    if jax.process_count() == 1:
        return jax.device_get(tree)

    def one(x):
        if not isinstance(x, jax.Array):
            return np.asarray(x)
        if x.is_fully_replicated:
            return np.asarray(jax.device_get(x))
        shards = sorted(
            x.addressable_shards,
            key=lambda s: (s.index[0].start or 0) if x.ndim else 0,
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    return jax.tree.map(one, tree)
