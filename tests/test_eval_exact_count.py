"""Exact-count validation semantics (reference DistributedEvalSampler,
``/root/reference/interactive_spectrogram_inpainting/utils/distributed.py:13-22``):
every sample contributes exactly once to eval metrics — the batch-size
remainder is neither dropped (old prior trainer) nor averaged in as
zero-padding (old VQ-VAE trainer). Both trainers' eval steps return
(weighted sums, valid count) against a [B] validity-weight vector."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from interactive_spectrogram_inpainting_tpu.models.vqvae import (
    VQVAE, VQVAEConfig)
from interactive_spectrogram_inpainting_tpu.models.prior import (
    TransformerConfig, UpsamplingVQTransformer)
from interactive_spectrogram_inpainting_tpu.models.prior.transformer import (
    VQNSynthTransformer)
from interactive_spectrogram_inpainting_tpu.signal import SpectrogramsHelper
from interactive_spectrogram_inpainting_tpu.train.losses import mse_loss
from interactive_spectrogram_inpainting_tpu.train.train_vqvae import (
    make_eval_step)
from interactive_spectrogram_inpainting_tpu.train.train_prior import (
    iterate_batches, make_steps)


BATCH = 4
N_SAMPLES = 7  # deliberately not a multiple of BATCH


class _FakeCodesDataset:
    """Minimal CodemapDataset stand-in (read_batch + len)."""

    def __init__(self, n, rng):
        self.tops = rng.integers(0, 16, size=(n, 4, 2))
        self.bottoms = rng.integers(0, 16, size=(n, 8, 4))
        self.pitch = rng.integers(0, 8, size=(n,))

    def __len__(self):
        return len(self.tops)

    def read_batch(self, idx):
        idx = np.asarray(idx)
        return (self.tops[idx], self.bottoms[idx],
                {"pitch": self.pitch[idx]})


def test_iterate_batches_remainder_weights():
    ds = _FakeCodesDataset(N_SAMPLES, np.random.default_rng(0))
    batches = list(iterate_batches(ds, BATCH, False, 0,
                                   include_remainder=True))
    assert len(batches) == 2
    tops, bottoms, cc, w = batches[-1]
    assert tops.shape[0] == BATCH and bottoms.shape[0] == BATCH
    np.testing.assert_array_equal(np.asarray(w), [1.0, 1.0, 1.0, 0.0])
    assert cc["pitch"].shape == (BATCH,)
    # training mode still drops the remainder (all-ones weights)
    train_batches = list(iterate_batches(ds, BATCH, False, 0))
    assert len(train_batches) == 1
    np.testing.assert_array_equal(np.asarray(train_batches[0][3]), 1.0)


def test_iterate_batches_seeded_shuffle():
    ds = _FakeCodesDataset(8, np.random.default_rng(0))
    first = np.asarray(next(iterate_batches(ds, 4, True, 0, seed=0))[0])
    again = np.asarray(next(iterate_batches(ds, 4, True, 0, seed=0))[0])
    other = np.asarray(next(iterate_batches(ds, 4, True, 0, seed=1))[0])
    np.testing.assert_array_equal(first, again)
    assert not np.array_equal(first, other)


def _tiny_bottom_prior():
    cfg = TransformerConfig(
        shape=(8, 4), condition_shape=(4, 2), use_aligned_decoder=True,
        n_class=16, d_model=32, embeddings_dim=8,
        positional_embeddings_dim=8, dropout=0.0,
        conditional_model_num_encoder_layers=1,
        conditional_model_num_decoder_layers=1,
        conditional_model_nhead=4, d_ff=64)
    model = UpsamplingVQTransformer(cfg)
    rng = np.random.default_rng(3)
    tops0 = jnp.asarray(rng.integers(0, 16, (1, 4, 2)), jnp.int32)
    bottoms0 = jnp.asarray(rng.integers(0, 16, (1, 8, 4)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           bottoms0, tops0,
                           method=VQNSynthTransformer.full_init)
    return model, variables["params"]


def test_prior_eval_is_exact_per_sample_mean():
    """Accumulated (sums, count) over batches — including the padded
    remainder — must equal the exact mean of per-sample metrics."""
    model, params = _tiny_bottom_prior()
    optimizer = optax.adam(1e-3)
    _, eval_step = make_steps(model, optimizer, "bottom", None,
                              label_smoothing=0.1)
    ds = _FakeCodesDataset(N_SAMPLES, np.random.default_rng(1))
    ds.tops = ds.tops % 16
    rng = jax.random.PRNGKey(0)

    # accumulate over padded batches (the trainer's run_eval loop)
    sums, count = {}, 0.0
    for tops, bottoms, cc, w in iterate_batches(
            ds, BATCH, False, 0, include_remainder=True):
        m, c = eval_step(params, rng, tops, bottoms, cc, w)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += float(c)
    assert count == N_SAMPLES
    got = {k: v / count for k, v in sums.items()}

    # exact per-sample values via one-hot weight vectors
    per_sample = {k: [] for k in got}
    for i in range(N_SAMPLES):
        idx = [i] * BATCH
        tops, bottoms, cc = ds.read_batch(idx)
        w = np.zeros(BATCH, np.float32)
        w[0] = 1.0
        m, c = eval_step(params, rng, jnp.asarray(tops),
                         jnp.asarray(bottoms),
                         {k: jnp.asarray(v) for k, v in cc.items()},
                         jnp.asarray(w))
        assert float(c) == 1.0
        for k, v in m.items():
            per_sample[k].append(float(v))
    for k, vals in per_sample.items():
        np.testing.assert_allclose(got[k], np.mean(vals), rtol=1e-5,
                                   err_msg=k)


def test_reference_debug_loss_restrictions():
    """--train_num_steps_sequences_DEBUG / --drop_loss_half_DEBUG restrict
    the LOSS only (reference ``train_autoregressive_model.py:235-252``).
    With teacher forcing the last flattened position's token is
    label-only, so a loss restricted away from it must be bitwise
    invariant to that token, while the unrestricted loss is not;
    ``loss_num_steps=L`` reproduces the default loss exactly."""
    model, params = _tiny_bottom_prior()
    optimizer = optax.adam(1e-3)
    helper = model.config.target_codemaps_helper()
    L = helper.sequence_length
    f_last, t_last = helper.positions()[-1]
    assert t_last >= helper.duration // 2  # inside the dropped time half

    rng0 = np.random.default_rng(5)
    tops = jnp.asarray(rng0.integers(0, 16, (1, 4, 2)), jnp.int32)
    bottoms = np.asarray(rng0.integers(0, 16, (1, 8, 4)), np.int32)
    bottoms2 = bottoms.copy()
    bottoms2[0, f_last, t_last] = (bottoms2[0, f_last, t_last] + 1) % 16
    w = jnp.ones(1, jnp.float32)
    rng = jax.random.PRNGKey(0)

    def run(step, bs):
        m, _ = step(params, rng, tops, jnp.asarray(bs), {}, w)
        return {k: float(v) for k, v in m.items()}

    _, full = make_steps(model, optimizer, "bottom", None,
                         label_smoothing=0.1)
    _, first_all = make_steps(model, optimizer, "bottom", None,
                              label_smoothing=0.1, loss_num_steps=L)
    _, first_nm1 = make_steps(model, optimizer, "bottom", None,
                              label_smoothing=0.1, loss_num_steps=L - 1)
    _, half = make_steps(model, optimizer, "bottom", None,
                         label_smoothing=0.1, drop_loss_half=True)

    base = run(full, bottoms)["loss"]
    np.testing.assert_allclose(run(first_all, bottoms)["loss"], base,
                               rtol=1e-6)
    # the label-only last token is invisible to the restricted losses...
    assert run(first_nm1, bottoms)["loss"] == run(first_nm1,
                                                  bottoms2)["loss"]
    assert run(half, bottoms)["loss"] == run(half, bottoms2)["loss"]
    # ...but visible to the unrestricted loss, and the restrictions
    # genuinely change the training objective
    assert run(full, bottoms2)["loss"] != base
    assert run(half, bottoms)["loss"] != base


def test_prior_eval_padding_rows_are_inert():
    """Garbage in weight-0 rows must not change the metrics."""
    model, params = _tiny_bottom_prior()
    optimizer = optax.adam(1e-3)
    _, eval_step = make_steps(model, optimizer, "bottom", None,
                              label_smoothing=0.0)
    rng_np = np.random.default_rng(2)
    tops = rng_np.integers(0, 16, (BATCH, 4, 2))
    bottoms = rng_np.integers(0, 16, (BATCH, 8, 4))
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    rng = jax.random.PRNGKey(0)
    m1, c1 = eval_step(params, rng, jnp.asarray(tops),
                       jnp.asarray(bottoms), {}, w)
    tops2, bottoms2 = tops.copy(), bottoms.copy()
    tops2[2:] = (tops2[2:] + 7) % 16
    bottoms2[2:] = (bottoms2[2:] + 3) % 16
    m2, c2 = eval_step(params, rng, jnp.asarray(tops2),
                       jnp.asarray(bottoms2), {}, w)
    assert float(c1) == float(c2) == 2.0
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   err_msg=k)


def test_vqvae_eval_is_exact_per_sample_mean():
    helper = SpectrogramsHelper(n_fft=256, window_length=256,
                                hop_length=64)
    cfg = VQVAEConfig(num_hidden_channels=8, n_res_block=1,
                      num_residual_channels=4, embed_dim=4,
                      num_embeddings=16,
                      resolution_factors={"bottom": 4, "top": 2})
    model = VQVAE(cfg)
    rng_np = np.random.default_rng(0)
    audio = rng_np.standard_normal((N_SAMPLES, 4000)).astype(np.float32)
    spec = np.asarray(helper.to_spectrogram(jnp.asarray(audio)))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(spec[:2]))
    params, codebook = variables["params"], variables["codebook"]
    eval_step = make_eval_step(model, mse_loss, 0.25, helper,
                               spec_precomputed=True)

    # accumulate: one full batch + one padded remainder batch
    sums, count = {}, 0.0
    for start in range(0, N_SAMPLES, BATCH):
        chunk = spec[start:start + BATCH]
        w = np.ones(BATCH, np.float32)
        if chunk.shape[0] < BATCH:
            pad = BATCH - chunk.shape[0]
            w[chunk.shape[0]:] = 0.0
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        m, c = eval_step(params, codebook, jnp.asarray(chunk),
                         jnp.asarray(w))
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += float(c)
    assert count == N_SAMPLES
    got = {k: v / count for k, v in sums.items()}

    # exact per-sample values
    per_sample = {k: [] for k in got}
    for i in range(N_SAMPLES):
        batch = np.broadcast_to(spec[i], (BATCH,) + spec[i].shape)
        w = np.zeros(BATCH, np.float32)
        w[0] = 1.0
        m, _ = eval_step(params, codebook, jnp.asarray(batch),
                         jnp.asarray(w))
        for k, v in m.items():
            per_sample[k].append(float(v))
    for k, vals in per_sample.items():
        np.testing.assert_allclose(got[k], np.mean(vals), rtol=1e-4,
                                   err_msg=k)


def test_vqvae_eval_device_count_invariant():
    """Same contract for the VQ-VAE eval step: the trainer's eval loop
    device_puts batches + weights under data_sharding (mirroring the
    prior trainer), and the sharded step must match the unsharded one
    bit-for-bit in semantics (exact count, identical weighted sums)."""
    from interactive_spectrogram_inpainting_tpu.parallel.mesh import (
        data_sharding, make_mesh)

    helper = SpectrogramsHelper(n_fft=256, window_length=256,
                                hop_length=64)
    cfg = VQVAEConfig(num_hidden_channels=8, n_res_block=1,
                      num_residual_channels=4, embed_dim=4,
                      num_embeddings=16,
                      resolution_factors={"bottom": 4, "top": 2})
    model = VQVAE(cfg)
    rng_np = np.random.default_rng(6)
    audio = rng_np.standard_normal((8, 4000)).astype(np.float32)
    spec = jnp.asarray(helper.to_spectrogram(jnp.asarray(audio)))
    variables = model.init({"params": jax.random.PRNGKey(0)}, spec[:2])
    params, codebook = variables["params"], variables["codebook"]
    eval_step = make_eval_step(model, mse_loss, 0.25, helper,
                               spec_precomputed=True)
    w = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)

    m1, c1 = eval_step(params, codebook, spec, w)

    mesh = make_mesh()
    shard = data_sharding(mesh)
    m2, c2 = eval_step(params, codebook,
                       jax.device_put(spec, shard),
                       jax.device_put(w, shard))
    assert float(c1) == float(c2) == 5.0
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=1e-5, err_msg=k)


def test_prior_eval_device_count_invariant():
    """The weighted eval step sharded over the 8-device 'data' mesh must
    produce the same sums/count as the unsharded step (weight-0 padding
    rows land on real shards; XLA's collectives must not change the
    exact-count semantics)."""
    from interactive_spectrogram_inpainting_tpu.parallel.mesh import (
        data_sharding, make_mesh)

    model, params = _tiny_bottom_prior()
    optimizer = optax.adam(1e-3)
    _, eval_step = make_steps(model, optimizer, "bottom", None,
                              label_smoothing=0.1)
    rng_np = np.random.default_rng(5)
    tops = jnp.asarray(rng_np.integers(0, 16, (8, 4, 2)), jnp.int32)
    bottoms = jnp.asarray(rng_np.integers(0, 16, (8, 8, 4)), jnp.int32)
    w = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)
    rng = jax.random.PRNGKey(0)

    m1, c1 = eval_step(params, rng, tops, bottoms, {}, w)

    mesh = make_mesh()
    shard = data_sharding(mesh)
    m2, c2 = eval_step(params, rng,
                       jax.device_put(tops, shard),
                       jax.device_put(bottoms, shard), {},
                       jax.device_put(w, shard))
    assert float(c1) == float(c2) == 6.0
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=1e-5, err_msg=k)
