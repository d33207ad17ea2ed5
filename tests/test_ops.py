"""Pallas op tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactive_spectrogram_inpainting_tpu.ops.decode_attention import (
    flash_decode_attention, reference_decode_attention)


@pytest.mark.parametrize("pos", [0, 5, 127, 128, 300, 511])
def test_flash_decode_matches_reference(pos):
    rng = np.random.default_rng(0)
    B, L, H, Dh = 4, 512, 8, 64
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, L, H, Dh)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((H, L)).astype(np.float32))
    ref = reference_decode_attention(q, k, v, pos, bias)
    out = flash_decode_attention(q, k, v, pos, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_decode_bf16():
    rng = np.random.default_rng(1)
    B, L, H, Dh = 2, 256, 4, 32
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, H, Dh))).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, H, Dh))).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, H, Dh))).astype(jnp.bfloat16)
    ref = reference_decode_attention(q, k, v, 100, None)
    out = flash_decode_attention(q, k, v, 100, None, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_flash_decode_odd_batch():
    rng = np.random.default_rng(2)
    B, L, H, Dh = 3, 128, 8, 64  # batch not divisible by 8 -> bt falls back
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, L, H, Dh)).astype(np.float32))
    ref = reference_decode_attention(q, k, v, 60, None)
    out = flash_decode_attention(q, k, v, 60, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_sampler_with_flash_matches_dense():
    """End-to-end: greedy sampling with use_flash must equal the dense
    path (interpret mode)."""
    from tests.test_transformer import tiny_config, init_model
    from interactive_spectrogram_inpainting_tpu.models.prior import (
        UpsamplingVQTransformer)
    from interactive_spectrogram_inpainting_tpu.sampling import sample_model

    cfg = tiny_config()
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, cfg)
    rng = np.random.default_rng(3)
    top = jnp.asarray(rng.integers(0, 16, (1, 4, 2)))
    dense = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(0), 1, condition=top,
        temperature=1e-6))
    flash = np.asarray(sample_model(
        model, variables, jax.random.PRNGKey(0), 1, condition=top,
        temperature=1e-6, use_flash=True))
    np.testing.assert_array_equal(dense, flash)


def test_fused_vq_lookup_matches_reference():
    from interactive_spectrogram_inpainting_tpu.ops.vq_lookup import (
        fused_vq_lookup, reference_vq_lookup)
    rng = np.random.default_rng(0)
    n, dim, k = 700, 64, 512  # n not a block multiple
    flat = jnp.asarray(rng.standard_normal((n, dim)).astype(np.float32))
    embed = jnp.asarray(rng.standard_normal((dim, k)).astype(np.float32))
    ids_r, quant_r, counts_r, esum_r = reference_vq_lookup(flat, embed)
    ids_f, quant_f, counts_f, esum_f = fused_vq_lookup(flat, embed,
                                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_r))
    np.testing.assert_allclose(np.asarray(quant_f), np.asarray(quant_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts_f), np.asarray(counts_r),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(esum_f), np.asarray(esum_r),
                               atol=1e-3)


def test_bottleneck_pallas_flag_matches_dense():
    from interactive_spectrogram_inpainting_tpu.models.vqvae import (
        QuantizedBottleneck)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    dense = QuantizedBottleneck(dim=16, n_embed=64)
    fused = QuantizedBottleneck(dim=16, n_embed=64,
                                use_pallas_lookup=True)
    variables = dense.init({"params": jax.random.PRNGKey(0)}, x)
    (q1, d1, i1, p1), m1 = dense.apply(variables, x, train=True,
                                       mutable=["codebook"])
    (q2, d2, i2, p2), m2 = fused.apply(variables, x, train=True,
                                       mutable=["codebook"])
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(float(p1), float(p2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(m1["codebook"]),
                    jax.tree_util.tree_leaves(m2["codebook"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)
