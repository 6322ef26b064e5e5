"""Device mesh construction and sharding specs — the framework's `dist` module.

The reference has zero in-repo communication code: Lightning maps --gpus/
--num_nodes onto torch DataParallel/DDP over NCCL (SURVEY.md §2.9, §5.8).
The TPU-native replacement owns three things:

  * `initialize_distributed()` — jax.distributed for multi-host (DCN) runs;
  * `build_mesh(num_devices, model_parallel)` — a 2-D ('data', 'model')
    jax.sharding.Mesh over ICI; pure data parallelism is model_parallel=1,
    and the 'model' axis shards the giant roadmap/encoder heads (the
    latent->640000 and 940032->hidden matmuls, the dominant weights per
    SURVEY.md §2.4) without touching task code;
  * NamedSharding helpers for batches (split on 'data') and parameters
    (replicated by default; per-task rules may shard specific leaves).

XLA inserts all collectives (gradient psum over 'data', activation
all-gathers for 'model'-sharded heads); there is no hand-written transport.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(num_nodes: int = 1, coordinator_address: str | None = None,
                           num_processes: int | None = None, process_id: int | None = None):
    """Multi-host JAX runtime init (no-op for single host).

    On TPU pods / managed clusters, `jax.distributed.initialize()` self-
    configures from the environment. For explicit topologies (and the
    two-process CPU smoke test, tests/test_multihost.py), pass the
    coordinator directly or set DD_COORDINATOR_ADDRESS / DD_NUM_PROCESSES /
    DD_PROCESS_ID.
    """
    import os

    ca = coordinator_address or os.environ.get("DD_COORDINATOR_ADDRESS")
    if num_nodes <= 1 and not ca:
        return
    kwargs = {}
    if ca:
        kwargs = dict(
            coordinator_address=ca,
            num_processes=int(num_processes if num_processes is not None
                              else os.environ.get("DD_NUM_PROCESSES", num_nodes)),
            process_id=int(process_id if process_id is not None
                           else os.environ.get("DD_PROCESS_ID", 0)),
        )
    jax.distributed.initialize(**kwargs)


def build_mesh(num_devices: int | None = None, model_parallel: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    bs = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, bs), batch)


def param_shardings(mesh: Mesh, params, rules=None):
    """Pytree of NamedShardings for params. `rules(path_tuple, leaf)` may
    return a PartitionSpec to shard a particular leaf over 'model'; default
    replicates everything (pure DP)."""
    def spec_for(path, leaf):
        if rules is not None:
            s = rules(tuple(str(p) for p in path), leaf)
            if s is not None:
                return NamedSharding(mesh, s)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for(_path_keys(path), leaf), params
    )


def _path_keys(path):
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(p.key)
        elif hasattr(p, "idx"):
            keys.append(p.idx)
        else:
            keys.append(str(p))
    return keys
