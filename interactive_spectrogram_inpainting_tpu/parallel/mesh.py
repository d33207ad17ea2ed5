"""Device mesh + sharding utilities (the NCCL/DDP replacement).

The reference scales with ``torch.distributed`` NCCL DDP: per-process
models, gradient all-reduce, explicit ``dist.all_reduce``/``barrier``
calls (``train_vqvae.py:431-437,770-775,342-356``; SURVEY.md section 5.8).
Here the whole training step is ONE SPMD program under ``jit`` over a
``jax.sharding.Mesh``:

- ``('data', 'model')`` mesh; batches sharded over ``data``, parameters
  replicated (these models are 10-100M params — tensor parallelism is
  available through the ``model`` axis for the transformer's feed-forward
  and heads but defaults to 1);
- gradients/metrics are reduced by XLA-inserted collectives over ICI —
  no explicit barriers, no DDP wrapper, no SyncBatchNorm (no BN at all);
- multi-host: ``jax.distributed.initialize`` + the same program; I/O is
  gated on ``jax.process_index() == 0`` (the reference's
  ``is_master_process``, ``utils/distributed.py:9-10``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with leading dim sharded over 'data'."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def is_master_process() -> bool:
    return jax.process_index() == 0


def pad_for_eval(batch_size: int, n_shards: int) -> int:
    """Padding needed so eval batches divide the data axis; combined with
    a validity mask this reproduces the reference's exact-count
    ``DistributedEvalSampler`` semantics (``utils/distributed.py:13-22``)."""
    return (-batch_size) % n_shards
