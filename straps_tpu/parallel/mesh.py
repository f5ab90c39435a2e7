"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.5: one pinned CUDA
device, no torch.distributed anywhere).  The TPU-native framework instead
exposes a first-class `jax.sharding.Mesh` with a `data` axis: the training
batch is sharded across chips, parameters are replicated (the model is ~12M
params), and XLA's SPMD partitioner inserts the gradient all-reduce over ICI
automatically.  Multi-host (DCN) joins the same mesh via
`jax.distributed.initialize` + per-host data sharding
(`straps_tpu.data.epoch_batches(host_id=..., num_hosts=...)`).

TP/PP/SP/EP are explicit non-goals: the workload has no attention, no
sequence axis and no experts (SURVEY.md §2.5); the mesh abstraction is the
extension point if that ever changes.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (DCN). No-op for single-process runs."""
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices (0 = all).

    Asking for more devices than exist is an error — silently shrinking the
    mesh would run a "fanned-out" job on fewer chips than the user believes.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        if num_devices > len(devs):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devs)} device(s) are available")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch dict with the batch dim sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
