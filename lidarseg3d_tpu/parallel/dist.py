"""Multi-host (multi-process) runtime helpers.

TPU-native replacement for the reference's NCCL init + rank plumbing
(/root/reference/det3d/torchie/apis/env.py:13-48) and its pickle-based
all_gather eval reduction (torchie/trainer/utils.py:114-153):

- ``init_distributed`` wires ``jax.distributed.initialize`` from CLI args or
  the standard JAX env vars; after it, every jit computation is SPMD over the
  GLOBAL device set and gradient/SyncBN reductions ride the ICI/DCN
  collectives XLA inserts.
- eval reduction is a [C, C] confusion-histogram allreduce
  (``allreduce_hist``) instead of gathering per-point predictions.
- checkpoint writes are process-0-guarded (``is_main_process``) with a
  barrier so other hosts don't race ahead before the write is durable.
"""

import numpy as np
import jax


def init_distributed(coordinator=None, num_processes=None, process_id=None,
                     local_device_ids=None):
    """Initialize JAX multi-process runtime if requested.

    No-op when neither CLI args nor env (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) request it. MUST run before any jax
    computation creates the backend. Returns (process_index, process_count).
    """
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    return jax.process_index(), jax.process_count()


def is_main_process():
    return jax.process_index() == 0


def barrier(name="barrier"):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def allreduce_hist(hist):
    """Sum a host-side numpy array (e.g. a [C, C] confusion histogram)
    across all processes. Identity in single-process runs."""
    if jax.process_count() == 1:
        return hist
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(hist))
    return np.asarray(gathered).sum(axis=0)
