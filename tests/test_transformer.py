"""Prior transformer tests: forward shapes, causality, the KV-cached decode
path's exact equivalence with the full forward, masks, serialization."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactive_spectrogram_inpainting_tpu.models.prior import (
    TransformerConfig, VQNSynthTransformer,
    SelfAttentiveVQTransformer, UpsamplingVQTransformer,
    BernoulliSequenceMask, UniformProbabilityBernoulliSequenceMask,
    UniformMaskedAmountSequenceMask, ContiguousZonesSequenceMask)


def tiny_config(**kwargs):
    base = dict(
        shape=(8, 4), n_class=16, d_model=32, embeddings_dim=8,
        positional_embeddings_dim=8, dropout=0.0,
        conditional_model=True, condition_shape=(4, 2),
        conditional_model_num_encoder_layers=2,
        conditional_model_num_decoder_layers=2,
        conditional_model_nhead=4, d_ff=64)
    base.update(kwargs)
    return TransformerConfig(**base)


def top_config(**kwargs):
    cfg = tiny_config(**kwargs)
    return dataclasses.replace(cfg, self_conditional_model=True,
                               condition_shape=cfg.shape, shape=cfg.shape)


def init_model(model, cfg, batch=2, class_conditioning={}):
    tgt = jnp.zeros((batch, cfg.target_frequencies, cfg.target_duration),
                    jnp.int32)
    src = jnp.zeros((batch, cfg.source_frequencies, cfg.source_duration),
                    jnp.int32)
    return model.init({"params": jax.random.PRNGKey(0)}, tgt, src,
                      class_conditioning=class_conditioning,
                      method=VQNSynthTransformer.full_init)


def test_bottom_forward_shapes():
    cfg = tiny_config()
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    rng = np.random.default_rng(0)
    codemap = jnp.asarray(rng.integers(0, 16, (2, 8, 4)))
    condition = jnp.asarray(rng.integers(0, 16, (2, 4, 2)))
    src_seq, tgt_seq = model.apply(
        variables, codemap, condition,
        method=VQNSynthTransformer.to_sequences)
    assert src_seq.shape == (2, 8 + 1, 32)
    assert tgt_seq.shape == (2, 32 + cfg.target_num_channels, 32)
    logits, memory = model.apply(variables, tgt_seq, src_seq)
    assert logits.shape == (2, 32, 16)
    assert memory.shape == (2, 9, 32)


def test_top_forward_shapes_and_mask_token():
    cfg = top_config()
    model = SelfAttentiveVQTransformer(cfg)
    assert model.config.use_inpainting_mask_on_source
    assert model.config.n_class_source == 17  # +1 mask token
    assert model.config.target_num_channels == 1
    variables = init_model(model, model.config)
    rng = np.random.default_rng(1)
    codemap = jnp.asarray(rng.integers(0, 16, (2, 8, 4)))
    mask = jnp.asarray(rng.integers(0, 2, (2, 8, 4)).astype(bool))
    src_seq, tgt_seq = model.apply(
        variables, codemap, codemap, mask=mask,
        method=VQNSynthTransformer.to_sequences)
    logits, _ = model.apply(variables, tgt_seq, src_seq)
    assert logits.shape == (2, 32, 16)


def test_decoder_is_causal():
    """Changing target token k must not affect logits at positions <= k."""
    cfg = tiny_config()
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 16, (1, 32))
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    helper = cfg.target_codemaps_helper()

    def logits_for(seq_tokens):
        codemap = helper.to_time_frequency_map(jnp.asarray(seq_tokens))
        src, tgt = model.apply(variables, codemap, condition,
                               method=VQNSynthTransformer.to_sequences)
        logits, _ = model.apply(variables, tgt, src)
        return np.asarray(logits)

    base = logits_for(tokens)
    k = 13
    perturbed_tokens = tokens.copy()
    perturbed_tokens[0, k] = (tokens[0, k] + 5) % 16
    perturbed = logits_for(perturbed_tokens)
    np.testing.assert_allclose(base[0, :k + 1], perturbed[0, :k + 1],
                               atol=1e-5)
    assert not np.allclose(base[0, k + 1], perturbed[0, k + 1])


def test_top_encoder_is_anti_causal():
    """Changing source token k must not affect memory at positions > k
    (this is what makes the cached memory valid during sampling)."""
    cfg = top_config()
    model = SelfAttentiveVQTransformer(cfg)
    variables = init_model(model, model.config)
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 16, (1, 32))
    helper = model.config.source_codemaps_helper()

    def memory_for(seq_tokens):
        codemap = helper.to_time_frequency_map(jnp.asarray(seq_tokens))
        src, _ = model.apply(variables, codemap, codemap,
                             method=VQNSynthTransformer.to_sequences)
        return np.asarray(model.apply(
            variables, src, method=VQNSynthTransformer.encode_source))

    base = memory_for(tokens)
    k = 20
    perturbed_tokens = tokens.copy()
    perturbed_tokens[0, k] = (tokens[0, k] + 3) % 16
    perturbed = memory_for(perturbed_tokens)
    # memory position for source token k is k + 1 (start symbol offset);
    # positions strictly after it must be unchanged
    np.testing.assert_allclose(base[0, k + 2:], perturbed[0, k + 2:],
                               atol=1e-5)
    assert not np.allclose(base[0, k + 1], perturbed[0, k + 1])


@pytest.mark.parametrize("aligned", [False, True])
def test_kv_cached_decode_matches_full_forward(aligned):
    """The sampler's KV-cached step path must reproduce the full decoder
    bit-for-bit (up to fp tolerance) at every position."""
    cfg = tiny_config(use_aligned_decoder=aligned)
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    rng = np.random.default_rng(4)
    codemap = jnp.asarray(rng.integers(0, 16, (2, 8, 4)))
    condition = jnp.asarray(rng.integers(0, 16, (2, 4, 2)))
    src_seq, tgt_seq = model.apply(
        variables, codemap, condition,
        method=VQNSynthTransformer.to_sequences)
    memory = model.apply(variables, src_seq,
                         method=VQNSynthTransformer.encode_source)
    full_logits, _ = model.apply(variables, tgt_seq, src_seq, memory=memory)

    c = cfg.target_num_channels
    length = cfg.target_sequence_length
    caches = model.apply(variables, memory, 2,
                         method=VQNSynthTransformer.init_decode_caches)
    step_logits = []
    for p in range(length + c - 1):
        x_p = tgt_seq[:, p]
        logits_p, caches = model.apply(
            variables, x_p, jnp.asarray(p), caches,
            method=VQNSynthTransformer.decode_step)
        if p >= c - 1:
            step_logits.append(np.asarray(logits_p))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits),
                               atol=2e-4, rtol=1e-3)


def test_class_conditioning_changes_output():
    cfg = tiny_config(
        class_conditioning_num_classes_per_modality={
            "pitch": 61, "instrument_family_str": 11},
        class_conditioning_embedding_dim_per_modality={
            "pitch": 8, "instrument_family_str": 8},
        class_conditioning_prepend_to_dummy_input=True)
    model = UpsamplingVQTransformer(cfg)
    rng = np.random.default_rng(5)
    codemap = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))

    variables = init_model(model, cfg, batch=1, class_conditioning={
        "pitch": jnp.asarray([0]), "instrument_family_str": jnp.asarray([0])})

    def run(pitch):
        cc = {"pitch": jnp.asarray([pitch]),
              "instrument_family_str": jnp.asarray([3])}
        src, tgt = model.apply(variables, codemap, condition,
                               class_conditioning=cc,
                               method=VQNSynthTransformer.to_sequences)
        logits, _ = model.apply(variables, tgt, src)
        return np.asarray(logits)

    assert not np.allclose(run(10), run(40))


def test_time_indexes_reindex_positions():
    cfg = tiny_config()
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    rng = np.random.default_rng(6)
    codemap = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    # identity indexes reproduce the default
    src_a, tgt_a = model.apply(
        variables, codemap, condition,
        time_indexes_target=jnp.arange(4), time_indexes_source=jnp.arange(2),
        method=VQNSynthTransformer.to_sequences)
    src_b, tgt_b = model.apply(variables, codemap, condition,
                               method=VQNSynthTransformer.to_sequences)
    np.testing.assert_allclose(np.asarray(tgt_a), np.asarray(tgt_b))
    # stretched indexes change the positional features
    src_c, tgt_c = model.apply(
        variables, codemap, condition,
        time_indexes_target=jnp.asarray([0, 0, 1, 3]),
        time_indexes_source=jnp.asarray([0, 1]),
        method=VQNSynthTransformer.to_sequences)
    assert not np.allclose(np.asarray(tgt_c), np.asarray(tgt_b))


def test_serialization_round_trip(tmp_path):
    from interactive_spectrogram_inpainting_tpu.models.prior.transformer \
        import save_model, from_parameters_and_weights
    cfg = tiny_config()
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    save_model(tmp_path, model.config, variables, prefix="bottom")
    model2, variables2 = from_parameters_and_weights(
        tmp_path / "bottom-model_parameters.json",
        tmp_path / "bottom-weights.msgpack")
    rng = np.random.default_rng(7)
    codemap = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    src, tgt = model.apply(variables, codemap, condition,
                           method=VQNSynthTransformer.to_sequences)
    l1, _ = model.apply(variables, tgt, src)
    l2, _ = model2.apply(variables2, tgt, src)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_mask_samplers():
    rng = jax.random.PRNGKey(0)
    for sampler in [
            BernoulliSequenceMask(0.5, 32, 16),
            UniformProbabilityBernoulliSequenceMask(0.2, 0.8, 32, 16),
            UniformMaskedAmountSequenceMask(0.25, 32, 16),
            ContiguousZonesSequenceMask(0.25, 32, 16)]:
        mask = sampler.sample_mask(rng, batch_size=4)
        assert mask.shape == (4, 32)
        assert mask.dtype == jnp.bool_

    # exact-amount sampler: same count in every row
    amount = UniformMaskedAmountSequenceMask(0.5, 32, 16)
    m = np.asarray(amount.sample_mask(jax.random.PRNGKey(3), batch_size=8))
    counts = m.sum(axis=1)
    assert (counts == counts[0]).all()
    assert counts[0] >= 16

    # contiguous sampler: one contiguous run per row
    cz = ContiguousZonesSequenceMask(0.25, 32, 16)
    m = np.asarray(cz.sample_mask(jax.random.PRNGKey(4), batch_size=8))
    for row in m:
        idx = np.nonzero(row)[0]
        assert len(idx) >= 8
        assert (np.diff(idx) == 1).all()

    # apply_mask writes the mask token
    b = BernoulliSequenceMask(1.0, 32, 16)
    filled = np.asarray(b.apply_mask(
        jax.random.PRNGKey(5), jnp.zeros((2, 32), jnp.int32)))
    assert (filled == 16).all()


def test_config_rejects_oversized_embedding_budget():
    """Embedding blocks are concatenated up to d_model; configs where
    they don't fit must fail loudly at construction (the reference
    silently mis-shapes the start symbol, transformer.py:659-673)."""
    import pytest
    from interactive_spectrogram_inpainting_tpu.models.prior import (
        TransformerConfig)

    with pytest.raises(ValueError, match="class-conditioning"):
        TransformerConfig(
            shape=(16, 8), condition_shape=(16, 8),
            self_conditional_model=True, n_class=32, d_model=32,
            positional_embeddings_dim=16,
            class_conditioning_num_classes_per_modality={
                "pitch": 61, "instrument_family_str": 11},
            class_conditioning_embedding_dim_per_modality={
                "pitch": 64, "instrument_family_str": 64})
    with pytest.raises(ValueError, match="no room"):
        TransformerConfig(
            shape=(16, 8), condition_shape=(16, 8),
            self_conditional_model=True, n_class=32, d_model=16,
            positional_embeddings_dim=16)
