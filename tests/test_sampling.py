"""Sampler tests: inpainting semantics, filtering, hierarchical cascade,
greedy equivalence between the scan path and a full-recompute loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactive_spectrogram_inpainting_tpu.models.prior import (
    TransformerConfig, VQNSynthTransformer,
    SelfAttentiveVQTransformer, UpsamplingVQTransformer)
from interactive_spectrogram_inpainting_tpu.sampling import (
    sample_model, top_k_top_p_filtering, sample_hierarchical)

from tests.test_transformer import tiny_config, top_config, init_model


def test_top_k_filtering():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.0]])
    out = np.asarray(top_k_top_p_filtering(logits, top_k=2))
    assert out[0, 1] == 3.0 and out[0, 2] == 2.0
    assert out[0, 0] < -1e8 and out[0, 3] < -1e8


def test_top_p_filtering():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(top_k_top_p_filtering(logits, top_p=0.7))
    # keep 0.5 then 0.3 (first above threshold kept); drop the rest
    assert np.isfinite(out[0, 0]) and out[0, 0] > -1e8
    assert out[0, 1] > -1e8
    assert out[0, 2] < -1e8 and out[0, 3] < -1e8


def test_unconditional_top_sampling_shapes_and_range():
    cfg = top_config()
    model = SelfAttentiveVQTransformer(cfg)
    variables = init_model(model, model.config)
    codemap = sample_model(model, variables, jax.random.PRNGKey(0),
                           batch_size=2)
    assert codemap.shape == (2, 8, 4)
    vals = np.asarray(codemap)
    assert vals.min() >= 0 and vals.max() < 16  # no mask token in output


def test_inpainting_preserves_unmasked_cells():
    cfg = top_config()
    model = SelfAttentiveVQTransformer(cfg)
    variables = init_model(model, model.config)
    rng = np.random.default_rng(0)
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), dtype=bool)
    mask[2:5, 1:3] = True  # regenerate a small region only
    out = sample_model(model, variables, jax.random.PRNGKey(1),
                       batch_size=1, initial_code=initial,
                       mask=jnp.asarray(mask))
    out = np.asarray(out)[0]
    initial = np.asarray(initial)[0]
    np.testing.assert_array_equal(out[~mask], initial[~mask])


def test_bottom_sampling_conditioned_on_top():
    cfg = tiny_config(use_aligned_decoder=True)
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    rng = np.random.default_rng(1)
    top = jnp.asarray(rng.integers(0, 16, (2, 4, 2)))
    out = sample_model(model, variables, jax.random.PRNGKey(2),
                       batch_size=2, condition=top)
    assert out.shape == (2, 8, 4)
    # different conditions give different outputs (same rng)
    top2 = jnp.asarray(rng.integers(0, 16, (2, 4, 2)))
    out2 = sample_model(model, variables, jax.random.PRNGKey(2),
                        batch_size=2, condition=top2)
    assert not np.array_equal(np.asarray(out), np.asarray(out2))


def test_greedy_scan_matches_full_recompute():
    """With temperature -> 0 (greedy), the KV-cached scan must produce the
    same tokens as an explicit full-forward-per-token loop."""
    cfg = tiny_config()
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    rng = np.random.default_rng(2)
    top = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))

    fast = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(0), batch_size=1,
        condition=top, temperature=1e-6))[0]

    # reference-style loop: one full forward per token, greedy argmax
    helper = cfg.target_codemaps_helper()
    src_helper = cfg.source_codemaps_helper()
    length = cfg.target_sequence_length
    tokens = jnp.zeros((1, length), jnp.int32)
    src_seq = model.apply(
        variables, src_helper.to_sequence(top), "source",
        method=VQNSynthTransformer.prepare_sequence)
    memory = model.apply(variables, src_seq,
                         method=VQNSynthTransformer.encode_source)
    for i in range(length):
        codemap_i = helper.to_time_frequency_map(tokens)
        tgt_seq = model.apply(
            variables, helper.to_sequence(codemap_i), "target",
            method=VQNSynthTransformer.prepare_sequence)
        logits, _ = model.apply(variables, tgt_seq, src_seq, memory=memory)
        tokens = tokens.at[:, i].set(jnp.argmax(logits[:, i], axis=-1
                                                ).astype(jnp.int32))
    slow = np.asarray(helper.to_time_frequency_map(tokens))[0]
    np.testing.assert_array_equal(fast, slow)


def test_predictive_sampling_greedy_matches_scan():
    cfg = top_config()
    model = SelfAttentiveVQTransformer(cfg)
    variables = init_model(model, model.config)
    rng = np.random.default_rng(3)
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), dtype=bool)
    mask[:, 2:] = True
    greedy_scan = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(5), batch_size=1,
        initial_code=initial, mask=jnp.asarray(mask), temperature=1e-6))
    greedy_pred = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(5), batch_size=1,
        initial_code=initial, mask=jnp.asarray(mask), temperature=1e-6,
        use_predictive_sampling=True))
    np.testing.assert_array_equal(greedy_scan, greedy_pred)


def test_predictive_sampling_diagnostics():
    """``return_diagnostics=True`` surfaces the forward count the
    reference prints after every predictive run (``sample.py:335-342``):
    same codemap, ``0 < num_forwards <= num_steps``; the scan path
    reports its static step bound."""
    cfg = top_config()
    model = SelfAttentiveVQTransformer(cfg)
    variables = init_model(model, model.config)
    rng = np.random.default_rng(3)
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), dtype=bool)
    mask[:, 2:] = True
    plain = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(5), batch_size=1,
        initial_code=initial, mask=jnp.asarray(mask), temperature=1e-6,
        use_predictive_sampling=True))
    code, diag = sample_model(
        model, variables, jax.random.PRNGKey(5), batch_size=1,
        initial_code=initial, mask=jnp.asarray(mask), temperature=1e-6,
        use_predictive_sampling=True, return_diagnostics=True)
    np.testing.assert_array_equal(plain, np.asarray(code))
    nf, ns = int(diag["num_forwards"]), int(diag["num_steps"])
    assert ns == cfg.target_sequence_length
    assert 0 < nf <= ns
    # scan path: the static [scan_from, scan_until) bound derived from
    # the concrete mask (span of masked sequence positions)
    _, diag_scan = sample_model(
        model, variables, jax.random.PRNGKey(5), batch_size=1,
        initial_code=initial, mask=jnp.asarray(mask), temperature=1e-6,
        return_diagnostics=True)
    helper = cfg.target_codemaps_helper()
    mask_seq = np.asarray(helper.to_sequence(jnp.asarray(mask)[None])[0])
    nz = np.nonzero(mask_seq)[0]
    assert (int(diag_scan["num_forwards"])
            == int(nz.max()) + 1 - int(nz.min()))


def test_hierarchical_cascade():
    top_cfg = top_config(shape=(4, 2), condition_shape=(4, 2))
    model_top = SelfAttentiveVQTransformer(top_cfg)
    vars_top = init_model(model_top, model_top.config)
    bot_cfg = tiny_config()
    model_bot = UpsamplingVQTransformer(bot_cfg)
    vars_bot = init_model(model_bot, bot_cfg)

    rng = np.random.default_rng(4)
    initial_top = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    initial_bottom = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask_top = np.zeros((4, 2), dtype=bool)
    mask_top[1:3, 0] = True

    top_code, bottom_code = sample_hierarchical(
        model_top, vars_top, model_bot, vars_bot,
        jax.random.PRNGKey(6), batch_size=1,
        initial_code_top=initial_top, initial_code_bottom=initial_bottom,
        mask_top=jnp.asarray(mask_top))
    assert top_code.shape == (1, 4, 2)
    assert bottom_code.shape == (1, 8, 4)
    # unmasked top cells preserved
    np.testing.assert_array_equal(
        np.asarray(top_code)[0][~mask_top], np.asarray(initial_top)[0][~mask_top])
    # bottom mask = upsampled top mask: unmasked bottom patches preserved
    mask_bottom = np.repeat(np.repeat(mask_top, 2, axis=0), 2, axis=1)
    np.testing.assert_array_equal(
        np.asarray(bottom_code)[0][~mask_bottom],
        np.asarray(initial_bottom)[0][~mask_bottom])


def test_sharded_sampling_matches_per_shard_runs():
    """make_sharded_sampling_fn (SPMD DataParallel replacement): each
    data shard's output must EXACTLY equal a single-device run of that
    sub-batch with the shard's key; unmasked cells preserved."""
    from interactive_spectrogram_inpainting_tpu.parallel.mesh import (
        make_mesh)
    from interactive_spectrogram_inpainting_tpu.sampling import (
        make_sharded_sampling_fn)
    cfg = tiny_config(use_aligned_decoder=True)
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    mesh = make_mesh(n_data=4, n_model=1)
    batch = 8
    per = batch // 4
    rng = np.random.default_rng(29)
    condition = jnp.asarray(rng.integers(0, 16, (batch, 4, 2)))
    initial = jnp.asarray(rng.integers(0, 16, (batch, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[2:6, 1:3] = True
    keys = jax.random.split(jax.random.PRNGKey(31), 4)

    fn = make_sharded_sampling_fn(model, batch, mesh, temperature=1.0)
    out = np.asarray(fn(variables, keys, condition, initial,
                        jnp.asarray(mask), {}))
    assert out.shape == (batch, 8, 4)
    np.testing.assert_array_equal(
        out[:, ~mask], np.asarray(initial)[:, ~mask])
    for s in range(4):
        single = np.asarray(sample_model(
            model, variables, keys[s], per,
            condition=condition[s * per:(s + 1) * per],
            initial_code=initial[s * per:(s + 1) * per],
            mask=jnp.asarray(mask), temperature=1.0))
        np.testing.assert_array_equal(out[s * per:(s + 1) * per], single)


def test_sharded_sampling_device_count_invariant_shapes():
    """The same request on a 2-way and 8-way data mesh both produce
    valid codemaps (shapes/ranges), scaling without code changes."""
    from interactive_spectrogram_inpainting_tpu.parallel.mesh import (
        make_mesh)
    from interactive_spectrogram_inpainting_tpu.sampling import (
        make_sharded_sampling_fn)
    cfg = tiny_config(use_aligned_decoder=True)
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    rng = np.random.default_rng(37)
    condition = jnp.asarray(rng.integers(0, 16, (8, 4, 2)))
    for n_data in (2, 8):
        mesh = make_mesh(n_data=n_data, n_model=1)
        fn = make_sharded_sampling_fn(model, 8, mesh)
        out = np.asarray(fn(
            variables, jax.random.split(jax.random.PRNGKey(5), n_data),
            condition, None, None, {}))
        assert out.shape == (8, 8, 4)
        assert out.min() >= 0 and out.max() < cfg.n_class_target


def test_dense_prefix_priming_matches_unprimed():
    """The top-k/top-p-capable dense scan now primes its KV caches with
    one parallel prefix_kv forward and starts at the first masked token
    (reference replays the whole prefix per request, sample.py:268-306).
    Primed output must equal the unprimed full scan — greedy AND
    stochastic (counter-indexed split keys), with filtering active."""
    cfg = tiny_config(use_aligned_decoder=True)
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    rng = np.random.default_rng(4)
    top = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), dtype=bool)
    mask[3:6, 2] = True  # mid-sequence: known prefix AND suffix

    for top_k, temp in ((2, 1.0), (0, 1e-6)):
        primed = np.asarray(sample_model(
            model, variables, jax.random.PRNGKey(7), batch_size=1,
            condition=top, initial_code=initial, mask=jnp.asarray(mask),
            temperature=temp, top_k_sampling_k=top_k))
        # scan_from=0 explicitly disables priming (scan the full prefix)
        unprimed = np.asarray(sample_model(
            model, variables, jax.random.PRNGKey(7), batch_size=1,
            condition=top, initial_code=initial, mask=jnp.asarray(mask),
            temperature=temp, top_k_sampling_k=top_k, scan_from=0))
        np.testing.assert_array_equal(primed, unprimed)
    # and unmasked cells are untouched
    np.testing.assert_array_equal(primed[0][~mask],
                                  np.asarray(initial)[0][~mask])


def test_dense_prefix_priming_self_conditional_top():
    """Priming through the identity-memory-mask / masked-source top prior
    (prefix_kv's memory-mask rows sliced to the prefix length)."""
    cfg = top_config()
    model = SelfAttentiveVQTransformer(cfg)
    variables = init_model(model, model.config)
    rng = np.random.default_rng(5)
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), dtype=bool)
    mask[4:, 2:] = True
    primed = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(9), batch_size=1,
        initial_code=initial, mask=jnp.asarray(mask),
        temperature=1.0, top_k_sampling_k=3))
    unprimed = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(9), batch_size=1,
        initial_code=initial, mask=jnp.asarray(mask),
        temperature=1.0, top_k_sampling_k=3, scan_from=0))
    np.testing.assert_array_equal(primed, unprimed)
