"""Fused decode-step megakernel vs the XLA decode path (interpret mode).

Note: the fused step donates its KV-cache buffer (input_output_aliases).
In eager interpret mode a donated buffer can be recycled by unrelated
computations between calls, so the two paths are run in separate
non-interleaved phases here; in production the step runs inside one
jitted lax.scan where XLA owns buffer lifetimes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_transformer import tiny_config, init_model
from interactive_spectrogram_inpainting_tpu.models.prior import (
    UpsamplingVQTransformer)
from interactive_spectrogram_inpainting_tpu.models.prior.transformer import (
    VQNSynthTransformer as T)
from interactive_spectrogram_inpainting_tpu.ops.decode_step_kernel import (
    fused_decode_step, pack_decode_params, precompute_bias_rows,
    precompute_position_features, _round_up)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(use_aligned_decoder=True,
                      conditional_model_num_decoder_layers=2)
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg, batch=1)
    rng = np.random.default_rng(0)
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    src_helper = cfg.source_codemaps_helper()
    src_seq = model.apply(variables, src_helper.to_sequence(condition),
                          "source", method=T.prepare_sequence)
    memory = model.apply(variables, src_seq, method=T.encode_source)
    return cfg, model, variables, memory


def build_fused_inputs(cfg, model, variables, memory, l_pad):
    params = pack_decode_params(model, variables, dtype=jnp.float32)
    pos_features = model.apply(variables, "target", None,
                               method=T._positional_sequence)
    start_block = model.apply(variables, "target", {}, 1,
                              method=T._start_block)
    posfull = precompute_position_features(
        model, variables, start_block, pos_features, dtype=jnp.float32)
    bias_rows = precompute_bias_rows(model, variables, l_pad)
    from interactive_spectrogram_inpainting_tpu.ops.decode_step_kernel \
        import precompute_mem_values
    mem_k, mem_v = precompute_mem_values(model, variables, memory)
    e_pad = _round_up(mem_v.shape[2], 16)
    pad_cfg = [(0, 0), (0, 0), (0, e_pad - mem_v.shape[2]), (0, 0)]
    return (params, posfull, bias_rows,
            (jnp.pad(mem_k, pad_cfg), jnp.pad(mem_v, pad_cfg)))


def test_fused_step_matches_decode_step(setup):
    cfg, model, variables, memory = setup
    c = cfg.target_num_channels
    length = cfg.target_sequence_length
    l_pad = _round_up(length + c, 128)
    n_layers = cfg.conditional_model_num_decoder_layers
    params, posfull, bias_rows, mem_v = build_fused_inputs(
        cfg, model, variables, memory, l_pad)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.n_class_target, length)
    pos_features = model.apply(variables, "target", None,
                               method=T._positional_sequence)
    start_block = model.apply(variables, "target", {}, 1,
                              method=T._start_block)

    # phase 1: XLA reference — all logits + final caches
    caches = model.apply(variables, memory, 1, pad_multiple=128,
                         layout="blhd", method=T.init_decode_caches)
    ref_logits_all = []
    for p in range(length + c - 1):
        x_p = model.apply(
            variables, jnp.asarray([tokens[p - c] if p >= c else 0]),
            jnp.asarray(p), pos_features, start_block, None,
            method=T.target_input_embedding)
        ref_logits, caches = model.apply(
            variables, x_p, jnp.asarray(p), caches, layout="blhd",
            method=T.decode_step)
        ref_logits_all.append(np.asarray(ref_logits))
    ref_k_final = [np.asarray(caches["self"][layer][0])
                   for layer in range(n_layers)]

    # phase 2: fused loop (no interleaved XLA work)
    kv = jnp.zeros((n_layers, 2, 1, l_pad, cfg.d_model), jnp.float32)
    fused_choices = []
    for p in range(length + c - 1):
        token_in = (jnp.full((1, 1), cfg.n_class_target, jnp.int32)
                    if p < c else
                    jnp.asarray([[tokens[p - c]]], jnp.int32))
        cur = jnp.asarray([[123]], jnp.int32)
        new_tok, kv = fused_decode_step(
            params, bias_rows[:, p], posfull, mem_v, kv, token_in, cur,
            jnp.asarray(p), jnp.asarray(p - (c - 1)),
            jnp.asarray(1), jnp.zeros((1, cfg.n_class_target)),
            1e-6, n_class=cfg.n_class_target, channels=c, interpret=True)
        fused_choices.append(int(np.asarray(new_tok)[0, 0]))
    kv_final = np.asarray(kv)

    # K/V parity at every position, every layer
    for layer in range(n_layers):
        ref_k = ref_k_final[layer][0][: length + c - 1].reshape(
            length + c - 1, -1)
        fused_k = kv_final[layer, 0, 0, : length + c - 1]
        np.testing.assert_allclose(ref_k, fused_k, atol=3e-4, rtol=1e-3)

    # greedy parity at every sampling position
    for p in range(c - 1, length + c - 1):
        ref_choice = int(np.argmax(ref_logits_all[p][0]))
        assert fused_choices[p] == ref_choice, (
            f"greedy mismatch at position {p}")

    # unmasked positions keep the current token
    new_tok, _ = fused_decode_step(
        params, bias_rows[:, c], posfull, mem_v, kv,
        jnp.asarray([[3]], jnp.int32), jnp.asarray([[123]], jnp.int32),
        jnp.asarray(c), jnp.asarray(1), jnp.asarray(0),
        jnp.zeros((1, cfg.n_class_target)), 1.0,
        n_class=cfg.n_class_target, channels=c, interpret=True)
    assert int(np.asarray(new_tok)[0, 0]) == 123


def test_fused_sampler_greedy_matches_dense(setup):
    """End-to-end sample_model(use_fused_step=True) greedy == dense."""
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(2)
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    dense = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(0), 1, condition=condition,
        temperature=1e-6))
    fused = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(0), 1, condition=condition,
        temperature=1e-6, use_fused_step=True))
    np.testing.assert_array_equal(dense, fused)


def test_fused_sampler_inpainting_preserves_unmasked(setup):
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(3)
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[2:5, 1:3] = True
    out = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(1), 1, condition=condition,
        initial_code=initial, mask=jnp.asarray(mask),
        use_fused_step=True))[0]
    np.testing.assert_array_equal(out[~mask], np.asarray(initial)[0][~mask])


def test_fused_sampler_top_model_greedy_matches_dense():
    """Non-aligned cross attention path: the self-conditional top prior."""
    from tests.test_transformer import top_config
    from interactive_spectrogram_inpainting_tpu.models.prior import (
        SelfAttentiveVQTransformer)
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    cfg = top_config(conditional_model_num_decoder_layers=2)
    model = SelfAttentiveVQTransformer(cfg)
    variables = init_model(model, model.config, batch=1)
    rng = np.random.default_rng(5)
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[:, 1:3] = True
    dense = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(2), 1, initial_code=initial,
        mask=jnp.asarray(mask), temperature=1e-6))
    fused = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(2), 1, initial_code=initial,
        mask=jnp.asarray(mask), temperature=1e-6, use_fused_step=True))
    np.testing.assert_array_equal(dense, fused)


def test_scan_bound_inpainting_equivalence(setup):
    """With a concrete mask the scan stops after the last masked token;
    results must match the unbounded scan exactly."""
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(7)
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[1:4, 1] = True  # early region only -> large scan saving
    # concrete numpy mask (bounded) vs traced-equivalent full run with
    # the same key: the bounded scan uses fewer rng splits, so compare
    # against greedy (key-independent) sampling instead
    bounded = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(3), 1, condition=condition,
        initial_code=initial, mask=mask, temperature=1e-6))
    full = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(4), 1, condition=condition,
        initial_code=initial, mask=jnp.asarray(mask), temperature=1e-6,
        use_fused_step=True))
    np.testing.assert_array_equal(bounded, full)
    np.testing.assert_array_equal(bounded[0][~mask],
                                  np.asarray(initial)[0][~mask])


def test_batched_fused_sampler_greedy_matches_dense(setup):
    """Batched megakernel (B=8, streamed caches) greedy == dense."""
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(9)
    condition = jnp.asarray(rng.integers(0, 16, (8, 4, 2)))
    dense = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(5), 8, condition=condition,
        temperature=1e-6))
    fused = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(5), 8, condition=condition,
        temperature=1e-6, use_fused_step=True))
    np.testing.assert_array_equal(dense, fused)


def test_prefix_priming_equivalence(setup):
    """Mid-sequence mask with initial code: the primed+bounded scan must
    produce exactly the full fused scan's greedy output."""
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(11)
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[2:6, 2] = True  # mid-sequence region: prefix AND suffix skipped
    primed = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(6), 1, condition=condition,
        initial_code=initial, mask=mask, temperature=1e-6,
        use_fused_step=True))
    full = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(7), 1, condition=condition,
        initial_code=initial, mask=jnp.asarray(mask), temperature=1e-6,
        use_fused_step=True))
    np.testing.assert_array_equal(primed, full)
    # dense reference too
    dense = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(8), 1, condition=condition,
        initial_code=initial, mask=jnp.asarray(mask), temperature=1e-6))
    np.testing.assert_array_equal(primed, dense)


def test_prefix_priming_stochastic_bitwise_identity(setup):
    """Primed+bounded sampling at temperature 1 must be BITWISE identical
    to the unprimed fused scan under the same key (per-position rng keys
    are indexed by absolute position, split keys are counter-indexed)."""
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(13)
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[2:6, 2] = True
    key = jax.random.PRNGKey(21)
    primed = np.asarray(sample_model(
        model, variables, key, 1, condition=condition,
        initial_code=initial, mask=mask, temperature=1.0,
        use_fused_step=True))
    # suppress the host-side span derivation by passing explicit trivial
    # bounds (full scan, no priming)
    unprimed = np.asarray(sample_model(
        model, variables, key, 1, condition=condition,
        initial_code=initial, mask=jnp.asarray(mask), temperature=1.0,
        use_fused_step=True, scan_from=0,
        scan_until=cfg.target_sequence_length))
    np.testing.assert_array_equal(primed, unprimed)


def test_precomputed_decode_state_matches_inline(setup):
    """sample_model with a prebuilt decode_state (the serving pattern —
    model-constant tables hoisted out of the per-request jit) must be
    bitwise identical to the inline-precompute path."""
    from interactive_spectrogram_inpainting_tpu.sampling import (
        precompute_decode_state, sample_model)
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(23)
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[2:6, 2] = True
    state = precompute_decode_state(model, variables)
    key = jax.random.PRNGKey(41)
    with_state = np.asarray(sample_model(
        model, variables, key, 1, condition=condition,
        initial_code=initial, mask=mask, temperature=1.0,
        use_fused_step=True, decode_state=state))
    inline = np.asarray(sample_model(
        model, variables, key, 1, condition=condition,
        initial_code=initial, mask=mask, temperature=1.0,
        use_fused_step=True))
    np.testing.assert_array_equal(with_state, inline)


def test_prefix_prime_kernel_matches_prefix_kv(setup):
    """fused_prefix_prime's cache rows [0, p0) must equal the XLA
    prefix_kv forward; rows [p0, P_pad) must be zeroed."""
    from interactive_spectrogram_inpainting_tpu.ops.decode_step_kernel \
        import precompute_mem_values
    from interactive_spectrogram_inpainting_tpu.ops.prefix_prime_kernel \
        import fused_prefix_prime
    cfg, model, variables, memory = setup
    c = cfg.target_num_channels
    length = cfg.target_sequence_length
    l_pad = _round_up(length + c, 128)
    n_layers = cfg.conditional_model_num_decoder_layers
    params, posfull, bias_rows, _ = build_fused_inputs(
        cfg, model, variables, memory, l_pad)
    mem_k, mem_v = precompute_mem_values(model, variables, memory)
    e_pad = _round_up(mem_v.shape[2], 128)
    pad_cfg = [(0, 0), (0, 0), (0, e_pad - mem_v.shape[2]), (0, 0)]
    e_src_real = mem_v.shape[2]
    mem_k, mem_v = jnp.pad(mem_k, pad_cfg), jnp.pad(mem_v, pad_cfg)

    rng = np.random.default_rng(19)
    tokens = jnp.asarray(rng.integers(0, cfg.n_class_target, (1, length)),
                         jnp.int32)
    p0 = c - 1 + 7  # prime through token index 6
    p_pad = min(_round_up(p0, 128), l_pad)
    with_start = jnp.concatenate(
        [jnp.full((1, c), cfg.n_class_target, jnp.int32), tokens], axis=1)
    prefix_tokens = jnp.pad(
        with_start, ((0, 0), (0, l_pad - with_start.shape[1])))[:, :p_pad]
    x_prefix = (jnp.take(params["emb_padded"], prefix_tokens, axis=0)
                + posfull[:p_pad][None])
    bias_prefix = jnp.transpose(bias_rows[:, :p_pad, :p_pad, :],
                                (0, 3, 1, 2))
    kv = jnp.zeros((n_layers, 2, 1, l_pad, cfg.d_model), jnp.float32)
    kv = fused_prefix_prime(params, bias_prefix, x_prefix,
                            (mem_k, mem_v), kv, p0=p0, channels=c,
                            e_src_real=e_src_real, interpret=True)
    kv = np.asarray(kv)

    ref = model.apply(variables, x_prefix[:, :p0].astype(jnp.float32),
                      memory, method=T.prefix_kv)
    for li, (k_p, v_p) in enumerate(ref):
        np.testing.assert_allclose(
            kv[li, 0, 0, :p0], np.asarray(k_p).reshape(1, p0, -1)[0],
            atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(
            kv[li, 1, 0, :p0], np.asarray(v_p).reshape(1, p0, -1)[0],
            atol=3e-4, rtol=1e-3)
        np.testing.assert_array_equal(kv[li, :, 0, p0:p_pad], 0.0)


def test_traced_mask_with_static_bounds_matches_unbounded(setup):
    """The serving path jits with the mask TRACED and static
    scan_from/scan_until baked in (ServerState.sample_fn); it must equal
    the unbounded traced-mask compilation under the same key."""
    import functools
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(17)
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[2:6, 2] = True
    helper = cfg.target_codemaps_helper()
    mask_seq = np.asarray(helper.to_sequence(jnp.asarray(mask[None])))[0]
    nz = np.nonzero(mask_seq)[0]
    sf, su = int(nz.min()), int(nz.max()) + 1
    assert 0 < sf and su < cfg.target_sequence_length

    def run(scan_from, scan_until):
        @jax.jit
        def fn(rng, mask):
            return sample_model(
                model, variables, rng, 1, condition=condition,
                initial_code=initial, mask=mask, temperature=1.0,
                use_fused_step=True,
                scan_from=scan_from, scan_until=scan_until)
        return np.asarray(fn(jax.random.PRNGKey(33), jnp.asarray(mask)))

    bounded = run(sf, su)
    unbounded = run(None, None)
    np.testing.assert_array_equal(bounded, unbounded)
    # masked region regenerated, known cells untouched
    np.testing.assert_array_equal(bounded[0][~mask],
                                  np.asarray(initial)[0][~mask])


def test_fused_time_index_remap_matches_dense(setup):
    """Long-sound time-index remapping on the fused path: remapped
    positional rows flow into the kernels as traced inputs
    (pos_features -> posfull), so fused+remap greedy must equal
    dense+remap (reference flask_server.py:670-682 / transformer
    positional re-indexing, transformer.py:598-603)."""
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    from interactive_spectrogram_inpainting_tpu.serve.server import (
        make_time_indexes)
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(29)
    condition = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[2:6, 1:3] = True
    # a 2x-duration sound windowed at start_index 1 (top columns); the
    # tiny source duration (2) is below make_time_indexes' minimum
    # (attack + release + >=1 repeated middle step), so remap it by hand
    ti_src = jnp.asarray([1, 1])
    ti_tgt = jnp.asarray(make_time_indexes(2, 2 * 4, 4))
    assert ti_src.shape == (2,) and ti_tgt.shape == (4,)
    dense = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(31), 1, condition=condition,
        initial_code=initial, mask=jnp.asarray(mask),
        time_indexes_source=ti_src, time_indexes_target=ti_tgt,
        temperature=1e-6))
    fused = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(31), 1, condition=condition,
        initial_code=initial, mask=jnp.asarray(mask),
        time_indexes_source=ti_src, time_indexes_target=ti_tgt,
        temperature=1e-6, use_fused_step=True))
    np.testing.assert_array_equal(dense, fused)
    # the remap actually perturbs the positional features feeding the
    # kernel (greedy argmax of a tiny random model may not flip, so the
    # sanity check targets the input, not the sampled tokens)
    pos_id = np.asarray(model.apply(variables, "target", None,
                                    method=T._positional_sequence))
    pos_remap = np.asarray(model.apply(variables, "target", ti_tgt,
                                       method=T._positional_sequence))
    assert not np.array_equal(pos_id, pos_remap)
    np.testing.assert_array_equal(fused[0][~mask],
                                  np.asarray(initial)[0][~mask])


def test_batched_fused_time_index_remap_matches_dense(setup):
    """Same remap equivalence through the batched megakernel (B=8)."""
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    from interactive_spectrogram_inpainting_tpu.serve.server import (
        make_time_indexes)
    cfg, model, variables, memory = setup
    rng = np.random.default_rng(37)
    condition = jnp.asarray(rng.integers(0, 16, (8, 4, 2)))
    ti_src = jnp.asarray([0, 1])
    ti_tgt = jnp.asarray(make_time_indexes(0, 2 * 4, 4))
    dense = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(43), 8, condition=condition,
        time_indexes_source=ti_src, time_indexes_target=ti_tgt,
        temperature=1e-6))
    fused = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(43), 8, condition=condition,
        time_indexes_source=ti_src, time_indexes_target=ti_tgt,
        temperature=1e-6, use_fused_step=True))
    np.testing.assert_array_equal(dense, fused)


def test_top_fused_time_index_remap_matches_dense():
    """Remap equivalence for the self-conditional top prior (per-step
    fused kernel with full cross attention)."""
    from tests.test_transformer import top_config
    from interactive_spectrogram_inpainting_tpu.models.prior import (
        SelfAttentiveVQTransformer)
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model
    from interactive_spectrogram_inpainting_tpu.serve.server import (
        make_time_indexes)
    cfg = top_config(conditional_model_num_decoder_layers=2)
    model = SelfAttentiveVQTransformer(cfg)
    variables = init_model(model, model.config, batch=1)
    rng = np.random.default_rng(41)
    initial = jnp.asarray(rng.integers(0, 16, (1, 8, 4)))
    mask = np.zeros((8, 4), bool)
    mask[:, 1:3] = True
    ti = jnp.asarray(make_time_indexes(1, 2 * 4, 4))
    dense = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(47), 1, initial_code=initial,
        mask=jnp.asarray(mask), time_indexes_source=ti,
        time_indexes_target=ti, temperature=1e-6))
    fused = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(47), 1, initial_code=initial,
        mask=jnp.asarray(mask), time_indexes_source=ti,
        time_indexes_target=ti, temperature=1e-6, use_fused_step=True))
    np.testing.assert_array_equal(dense, fused)
