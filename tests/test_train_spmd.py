"""SPMD training tests on the virtual 8-device CPU mesh: the trainer's
step must shard batches over 'data' and produce finite, device-count-
invariant results (the DDP-replacement contract, SURVEY.md section 2.4/5.8)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from interactive_spectrogram_inpainting_tpu.models.prior import (
    TransformerConfig, SelfAttentiveVQTransformer, UpsamplingVQTransformer)
from interactive_spectrogram_inpainting_tpu.models.prior.transformer import (
    VQNSynthTransformer)
from interactive_spectrogram_inpainting_tpu.models.vqvae import (
    VQVAE, VQVAEConfig)
from interactive_spectrogram_inpainting_tpu.parallel.mesh import (
    data_sharding, make_mesh, prior_param_shardings)
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


def test_train_step_masks_input_phase():
    """With the masked-phase input transform threaded into the step
    (the reference's MaskedPhaseWavToSpectrogramDataLoader,
    train_vqvae.py:585-589), the step must be INVARIANT to IF values in
    sub-threshold bins — both model input and loss target see the masked
    view — while above-threshold IF still matters."""
    from interactive_spectrogram_inpainting_tpu.signal import (
        make_masked_phase_transform)

    min_magnitude = 0.1
    log_thr = float(np.log(min_magnitude))
    cfg = VQVAEConfig(num_hidden_channels=8, n_res_block=1,
                      num_residual_channels=4, embed_dim=4,
                      num_embeddings=16,
                      resolution_factors={"bottom": 4, "top": 2},
                      output_spectrogram_min_magnitude=min_magnitude)
    model = VQVAE(cfg)
    rng = np.random.default_rng(7)
    spec = rng.standard_normal((4, 2, 64, 32)).astype(np.float32)
    sub = spec[:, 0] <= log_thr
    assert sub.any() and not sub.all()

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(spec))
    params0, codebook0 = variables["params"], variables["codebook"]
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(params0)
    step = make_train_step(
        model, optimizer, mse_loss, 0.25, spectrograms_helper=None,
        needs_rng=False, spec_precomputed=True,
        input_transform=make_masked_phase_transform(min_magnitude))

    p1, _, _, m1 = step(params0, codebook0, opt_state0,
                        jnp.asarray(spec), jax.random.PRNGKey(1))

    # scramble IF ONLY in sub-threshold bins: bitwise-identical step
    spec2 = spec.copy()
    spec2[:, 1][sub] = rng.standard_normal(int(sub.sum())) * 10.0
    p2, _, _, m2 = step(params0, codebook0, opt_state0,
                        jnp.asarray(spec2), jax.random.PRNGKey(1))
    assert float(m1["vqvae_loss"]) == float(m2["vqvae_loss"])
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # scramble IF in ABOVE-threshold bins: the loss must move
    spec3 = spec.copy()
    spec3[:, 1][~sub] = spec3[:, 1][~sub] + 3.0
    _, _, _, m3 = step(params0, codebook0, opt_state0,
                       jnp.asarray(spec3), jax.random.PRNGKey(1))
    assert float(m1["vqvae_loss"]) != float(m3["vqvae_loss"])


def test_reconstruction_metric_trio_in_logged_step_and_eval():
    """The reference evaluates MSE + DDSP + Jukebox as metrics at every
    log step regardless of the training criterion
    (reference train_vqvae.py:788-795, 252-258). The with-metrics step
    variant must emit all three, agree with the standalone criterion
    functions, and produce the SAME parameter update as the plain step
    (metrics ride the aux output, not the gradient)."""
    from interactive_spectrogram_inpainting_tpu.train.losses import (
        get_reconstruction_criterion, make_reconstruction_metrics)
    from interactive_spectrogram_inpainting_tpu.train.train_vqvae import (
        make_eval_step)

    helper = SpectrogramsHelper(n_fft=256, window_length=256,
                                hop_length=64)
    cfg = VQVAEConfig(num_hidden_channels=8, n_res_block=1,
                      num_residual_channels=4, embed_dim=4,
                      num_embeddings=16,
                      resolution_factors={"bottom": 4, "top": 2})
    model = VQVAE(cfg)
    rng = np.random.default_rng(3)
    audio = rng.standard_normal((4, 4000)).astype(np.float32) * 0.1
    spec = helper.to_spectrogram(jnp.asarray(audio))

    variables = model.init({"params": jax.random.PRNGKey(0)}, spec)
    params0, codebook0 = variables["params"], variables["codebook"]
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(params0)
    metrics_fn = make_reconstruction_metrics(helper)
    common = dict(optimizer=optimizer, reconstruction_criterion=mse_loss,
                  latent_loss_weight=0.25, spectrograms_helper=helper,
                  needs_rng=False)
    plain = make_train_step(model, **common)
    logged = make_train_step(model, reconstruction_metrics=metrics_fn,
                             **common)

    a = jnp.asarray(audio)
    k = jax.random.PRNGKey(1)
    p1, _, _, m1 = plain(params0, codebook0, opt_state0, a, k)
    p2, _, _, m2 = logged(params0, codebook0, opt_state0, a, k)
    assert {"metric_MSE", "metric_DDSP", "metric_Jukebox"} <= set(m2)
    assert not {"metric_MSE", "metric_DDSP", "metric_Jukebox"} & set(m1)
    for v in (m2["metric_MSE"], m2["metric_DDSP"], m2["metric_Jukebox"]):
        assert np.isfinite(float(v))
    # metrics agree with the standalone criterion functions on the same
    # (dec, spec) pair — checked via MSE == the step's own mse path
    np.testing.assert_allclose(float(m2["metric_MSE"]),
                               float(m2["reconstruction_loss"]),
                               rtol=1e-6)
    ddsp = get_reconstruction_criterion("DDSP", helper)
    # a direct forward reproduces dec for the metric cross-check
    dec, *_ = model.apply({"params": params0, "codebook": codebook0},
                          spec, train=True, mutable=["codebook"])[0]
    np.testing.assert_allclose(float(m2["metric_DDSP"]),
                               float(ddsp(dec, spec)), rtol=1e-4)
    # identical updates: metrics must not perturb the gradient
    for x, y in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-6)

    # eval: the trio is averaged per-sample alongside the existing keys
    eval_step = make_eval_step(model, mse_loss, 0.25, helper,
                               reconstruction_metrics=metrics_fn)
    sums, count = eval_step(params0, codebook0, a,
                            jnp.ones(4, jnp.float32))
    assert {"metric_MSE", "metric_DDSP", "metric_Jukebox"} <= set(sums)
    assert float(count) == 4.0
    assert np.isfinite(float(sums["metric_Jukebox"]))


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


def _tiny_prior(hier: str):
    common = dict(n_class=32, d_model=64, embeddings_dim=16,
                  positional_embeddings_dim=8, dropout=0.0,
                  conditional_model_num_encoder_layers=2,
                  conditional_model_num_decoder_layers=2,
                  conditional_model_nhead=4, d_ff=128)
    if hier == "top":
        cfg = TransformerConfig(shape=(8, 4), condition_shape=(8, 4),
                                self_conditional_model=True, **common)
        return SelfAttentiveVQTransformer(cfg)
    cfg = TransformerConfig(shape=(8, 4), condition_shape=(4, 2),
                            use_aligned_decoder=True, **common)
    return UpsamplingVQTransformer(cfg)


def _prior_setup(hier: str):
    from interactive_spectrogram_inpainting_tpu.train.train_prior import (
        make_mask_sampler, make_steps)

    model = _tiny_prior(hier)
    cfg = model.config
    rng = np.random.default_rng(7)
    tops = jnp.asarray(rng.integers(0, 32, size=(8, 8, 4)), jnp.int32) \
        if hier == "top" else \
        jnp.asarray(rng.integers(0, 32, size=(8, 4, 2)), jnp.int32)
    bottoms = jnp.asarray(rng.integers(0, 32, size=(8, 8, 4)), jnp.int32)
    target0 = tops if hier == "top" else bottoms
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           target0, tops,
                           method=VQNSynthTransformer.full_init)
    params = variables["params"]
    optimizer = optax.adam(1e-3)
    mask_sampler = None
    if hier == "top":
        mask_sampler = make_mask_sampler(
            "uniform-probability", cfg.source_sequence_length,
            cfg.mask_token_index, 0.5, 0.0)
    train_step, _ = make_steps(model, optimizer, hier, mask_sampler,
                               label_smoothing=0.1)
    return params, optimizer, train_step, tops, bottoms


@pytest.mark.parametrize("hier", ["top", "bottom"])
def test_prior_spmd_step_matches_single_device(hier):
    """The prior train step must be device-count invariant: one step with
    the batch sharded over the 8-device 'data' mesh equals the unsharded
    step (the nn.DataParallel replacement,
    train_autoregressive_model.py:145)."""
    params, optimizer, train_step, tops, bottoms = _prior_setup(hier)
    opt_state = optimizer.init(params)
    step_rng = jax.random.PRNGKey(3)

    p1, _, m1 = train_step(params, opt_state, step_rng, tops, bottoms, {})

    mesh = make_mesh()
    shard = data_sharding(mesh)
    p2, _, m2 = train_step(params, opt_state, step_rng,
                           jax.device_put(tops, shard),
                           jax.device_put(bottoms, shard), {})

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        # sharded reductions reorder float sums -> slightly looser atol
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_rbg_dropout_step_is_device_count_invariant():
    """--dropout_rng rbg must keep the train step device-count invariant:
    the RngBitGenerator dropout bits (and therefore the whole step) must
    not depend on how the batch is sharded (the threefry path guarantees
    this by construction; rbg relies on deterministic counter-based
    partitioning, pinned here)."""
    from interactive_spectrogram_inpainting_tpu.train.train_prior import (
        make_steps)

    model = _tiny_prior("bottom")
    rng = np.random.default_rng(7)
    tops = jnp.asarray(rng.integers(0, 32, size=(8, 4, 2)), jnp.int32)
    bottoms = jnp.asarray(rng.integers(0, 32, size=(8, 8, 4)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           bottoms, tops,
                           method=VQNSynthTransformer.full_init)
    params = variables["params"]
    optimizer = optax.adam(1e-3)
    train_step, _ = make_steps(model, optimizer, "bottom", None,
                               label_smoothing=0.1, rbg_dropout=True)
    opt_state = optimizer.init(params)
    step_rng = jax.random.PRNGKey(3)

    p1, _, m1 = train_step(params, opt_state, step_rng, tops, bottoms, {})
    mesh = make_mesh()
    shard = data_sharding(mesh)
    p2, _, m2 = train_step(params, opt_state, step_rng,
                           jax.device_put(tops, shard),
                           jax.device_put(bottoms, shard), {})
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_prior_tensor_parallel_matches_replicated():
    """A 2-way model-axis (tensor-parallel) prior step must equal the
    replicated 1-way step numerically: heads/FFN sharded via
    prior_param_shardings, XLA inserts the collectives."""
    params, optimizer, train_step, tops, bottoms = _prior_setup("bottom")
    opt_state = optimizer.init(params)
    step_rng = jax.random.PRNGKey(3)

    p1, _, m1 = train_step(params, opt_state, step_rng, tops, bottoms, {})

    mesh = make_mesh(n_data=4, n_model=2)
    shardings = prior_param_shardings(mesh, params)
    # the rules must actually shard something over 'model'
    assert any("model" in s.spec
               for s in jax.tree_util.tree_leaves(shardings))
    tp_params = jax.device_put(params, shardings)
    tp_opt_state = optimizer.init(tp_params)
    shard = data_sharding(mesh)
    p2, _, m2 = train_step(tp_params, tp_opt_state, step_rng,
                           jax.device_put(tops, shard),
                           jax.device_put(bottoms, shard), {})

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        # sharded reductions reorder float sums -> slightly looser atol
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_remat_train_step_matches_exact():
    """config.remat=True (per-layer jax.checkpoint) must change memory,
    not math: one train step produces the same params and metrics."""
    import dataclasses
    import jax.numpy as jnp
    from interactive_spectrogram_inpainting_tpu.train.train_prior import (
        make_steps)

    def run(remat):
        model = _tiny_prior("bottom")
        # dropout > 0 matters: flax Dropout branches on `deterministic`
        # in Python, so remat must mark it static (caught on TPU first)
        model = UpsamplingVQTransformer(
            dataclasses.replace(model.config, remat=remat, dropout=0.1))
        rng = np.random.default_rng(7)
        tops = jnp.asarray(rng.integers(0, 32, (8, 4, 2)), jnp.int32)
        bottoms = jnp.asarray(rng.integers(0, 32, (8, 8, 4)), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               bottoms, tops,
                               method=VQNSynthTransformer.full_init)
        optimizer = optax.adam(1e-3)
        train_step, _ = make_steps(model, optimizer, "bottom", None,
                                   label_smoothing=0.1)
        params = variables["params"]
        p, _, m = train_step(params, optimizer.init(params),
                             jax.random.PRNGKey(3), tops, bottoms, {})
        return p, m

    p0, m0 = run(False)
    p1, m1 = run(True)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_spectral_loss_step_on_dft_path(monkeypatch):
    """The spectral (Jukebox) reconstruction criterion — which inverts
    the spectrogram through to_audio INSIDE the jitted step (reference
    train_vqvae.py:177-179) — must trace, shard and produce a finite
    loss with the real-arithmetic DFT path forced (ISI_FFT_DFT=1): the
    configuration that runs on the axon TPU backend (verdict r3 #1)."""
    monkeypatch.setenv("ISI_FFT_DFT", "1")
    from interactive_spectrogram_inpainting_tpu.train.losses import (
        get_reconstruction_criterion)

    helper = SpectrogramsHelper(n_fft=256, window_length=256, hop_length=64)
    cfg = VQVAEConfig(num_hidden_channels=8, n_res_block=1,
                      num_residual_channels=4, embed_dim=4,
                      num_embeddings=16,
                      resolution_factors={"bottom": 4, "top": 2})
    model = VQVAE(cfg)
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((8, 4000)).astype(np.float32) * 0.1
    probe_spec = helper.to_spectrogram(jnp.asarray(audio))
    variables = model.init({"params": jax.random.PRNGKey(0)}, probe_spec)
    optimizer = optax.adam(1e-3)
    criterion = get_reconstruction_criterion("spectral_jukebox", helper)
    step = make_train_step(model, optimizer, criterion, 0.25, helper,
                           needs_rng=False)
    mesh = make_mesh()
    sharded = jax.device_put(jnp.asarray(audio), data_sharding(mesh))
    p, c, _, metrics = step(variables["params"], variables["codebook"],
                            optimizer.init(variables["params"]),
                            sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["vqvae_loss"]))
    assert np.isfinite(float(metrics["reconstruction_loss"]))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(p))


def test_spectral_dft_step_tpu_hlo_is_complex_free(monkeypatch):
    """Cross-lower the spectral (Jukebox) train step for the TPU
    platform with the DFT path forced and assert the HLO contains NO
    fft op and NO complex dtype — the exact invariant the axon backend
    needs (any complex-FFT dispatch poisons its PJRT client,
    CLAUDE.md). Catches regressions that would only surface on
    hardware."""
    monkeypatch.setenv("ISI_FFT_DFT", "1")
    from interactive_spectrogram_inpainting_tpu.train.losses import (
        get_reconstruction_criterion)

    helper = SpectrogramsHelper(n_fft=256, window_length=256, hop_length=64)
    cfg = VQVAEConfig(num_hidden_channels=8, n_res_block=1,
                      num_residual_channels=4, embed_dim=4,
                      num_embeddings=16,
                      resolution_factors={"bottom": 4, "top": 2})
    model = VQVAE(cfg)
    audio = jnp.zeros((4, 4000), jnp.float32)
    probe_spec = helper.to_spectrogram(audio)
    variables = model.init({"params": jax.random.PRNGKey(0)}, probe_spec)
    optimizer = optax.adam(1e-3)
    criterion = get_reconstruction_criterion("spectral_jukebox", helper)
    step = make_train_step(model, optimizer, criterion, 0.25, helper,
                           needs_rng=False)
    lowered = step.trace(variables["params"], variables["codebook"],
                         optimizer.init(variables["params"]), audio,
                         jax.random.PRNGKey(1)).lower(
                             lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert "stablehlo.fft" not in text and "fft" not in text.lower()
    assert "complex<" not in text
