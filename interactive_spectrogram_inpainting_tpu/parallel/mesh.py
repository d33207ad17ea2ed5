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


def prior_param_spec(path_names: Sequence[str], leaf) -> P:
    """Megatron-style tensor-parallel PartitionSpec for one prior
    transformer parameter, identified by its flax path.

    Rules (per-head / per-FFN-column sharding over the 'model' axis; XLA
    inserts the psum after the o-projection and the second MLP matmul):

    - q/k/v kernels ``(d_model, heads, head_dim)`` -> shard heads;
      their biases ``(heads, head_dim)`` -> shard heads;
    - o kernel ``(heads, head_dim, d_model)`` -> shard heads;
    - relative-attention bias tables ``(heads, ch_q, ch_k, rel)`` ->
      shard heads;
    - MLP ``Dense_0`` kernel ``(d_model, d_ff)`` -> shard d_ff (and its
      bias); ``Dense_1`` kernel ``(d_ff, d_model)`` -> shard d_ff;
    - everything else (embeddings, layernorms, output heads) replicated.

    The reference has no tensor parallelism (its biggest prior is ~30M
    params under ``nn.DataParallel``, ``train_autoregressive_model.py:145``);
    this is the TPU-native extension for scaling d_model/d_ff.
    """
    names = list(path_names)
    last2 = "/".join(names[-2:])
    if last2 in ("q/kernel", "k/kernel", "v/kernel") and leaf.ndim == 3:
        return P(None, "model", None)
    if last2 in ("q/bias", "k/bias", "v/bias") and leaf.ndim == 2:
        return P("model", None)
    if last2 == "o/kernel" and leaf.ndim == 3:
        return P("model", None, None)
    if names[-1] == "rel_bias" and leaf.ndim == 4:
        return P("model", None, None, None)
    if "mlp" in names and names[-1] == "kernel" and leaf.ndim == 2:
        if "Dense_0" in names:
            return P(None, "model")
        if "Dense_1" in names:
            return P("model", None)
    if "mlp" in names and "Dense_0" in names and names[-1] == "bias":
        return P("model")
    return P()


def prior_param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for a prior transformer's params: tensor-
    parallel over the mesh's 'model' axis per :func:`prior_param_spec`.

    Heads (and d_ff) must divide the model-axis size; with
    ``n_model == 1`` this degrades to full replication.
    """
    def spec(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        s = prior_param_spec(names, leaf)
        if "model" in s and mesh.shape.get("model", 1) > 1:
            axis = s.index("model")
            if leaf.shape[axis] % mesh.shape["model"] != 0:
                s = P()  # indivisible -> replicate rather than fail
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)


def is_master_process() -> bool:
    return jax.process_index() == 0


def pad_for_eval(batch_size: int, n_shards: int) -> int:
    """Padding needed so eval batches divide the data axis; combined with
    a validity-weight vector this reproduces the reference's exact-count
    ``DistributedEvalSampler`` semantics (``utils/distributed.py:13-22``).
    Both trainers implement this contract: remainder eval batches are
    zero-padded to the compiled batch size with weight-0 rows, and the
    eval steps return (weighted sums, valid count) so padding contributes
    nothing (``train_prior.iterate_batches(include_remainder=True)`` /
    ``train_vqvae.make_eval_step``)."""
    return (-batch_size) % n_shards
