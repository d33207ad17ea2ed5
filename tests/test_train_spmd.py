"""SPMD training tests on the virtual 8-device CPU mesh: the trainer's
step must shard batches over 'data' and produce finite, device-count-
invariant results (the DDP-replacement contract, SURVEY.md section 2.4/5.8)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from interactive_spectrogram_inpainting_tpu.models.vqvae import (
    VQVAE, VQVAEConfig)
from interactive_spectrogram_inpainting_tpu.parallel.mesh import (
    data_sharding, make_mesh)
from interactive_spectrogram_inpainting_tpu.signal import SpectrogramsHelper
from interactive_spectrogram_inpainting_tpu.train.train_vqvae import (
    make_train_step)
from interactive_spectrogram_inpainting_tpu.train.losses import mse_loss


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == 8


def test_vqvae_spmd_step_matches_single_device():
    """One train step with the batch sharded over 8 devices must produce
    the same params/codebook as the unsharded step (global EMA semantics)."""
    helper = SpectrogramsHelper(n_fft=256, window_length=256, hop_length=64)
    cfg = VQVAEConfig(num_hidden_channels=8, n_res_block=1,
                      num_residual_channels=4, embed_dim=4,
                      num_embeddings=16,
                      resolution_factors={"bottom": 4, "top": 2})
    model = VQVAE(cfg)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((8, 4000)).astype(np.float32) * 0.1

    probe_spec = helper.to_spectrogram(jnp.asarray(audio))
    variables = model.init({"params": jax.random.PRNGKey(0)}, probe_spec)
    params0, codebook0 = variables["params"], variables["codebook"]
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(params0)
    step = make_train_step(model, optimizer, mse_loss, 0.25, helper,
                           needs_rng=False)

    # unsharded
    p1, c1, _, m1 = step(params0, codebook0, opt_state0,
                         jnp.asarray(audio), jax.random.PRNGKey(1))

    # sharded over the 8-device mesh
    mesh = make_mesh()
    sharded_audio = jax.device_put(jnp.asarray(audio), data_sharding(mesh))
    p2, c2, _, m2 = step(params0, codebook0, opt_state0, sharded_audio,
                         jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["vqvae_loss"]),
                               float(m2["vqvae_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(c1),
                    jax.tree_util.tree_leaves(c2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    leaves1 = jax.tree_util.tree_leaves(p1)
    leaves2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)


def test_bf16_step_runs_and_is_finite():
    helper = SpectrogramsHelper(n_fft=256, window_length=256, hop_length=64)
    cfg = VQVAEConfig(num_hidden_channels=8, n_res_block=1,
                      num_residual_channels=4, embed_dim=4,
                      num_embeddings=16,
                      resolution_factors={"bottom": 4, "top": 2})
    model = VQVAE(cfg)
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((4, 4000)).astype(np.float32) * 0.1
    probe_spec = helper.to_spectrogram(jnp.asarray(audio))
    variables = model.init({"params": jax.random.PRNGKey(0)}, probe_spec)
    optimizer = optax.adam(1e-3)
    step = make_train_step(model, optimizer, mse_loss, 0.25, helper,
                           needs_rng=False, bf16=True)
    p, c, _, metrics = step(variables["params"], variables["codebook"],
                            optimizer.init(variables["params"]),
                            jnp.asarray(audio), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["vqvae_loss"]))
    # params stay f32 master copies
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(p)
               if jnp.issubdtype(l.dtype, jnp.floating))
