"""VQ-VAE model tests: shapes, quantization semantics, EMA updates,
serialization round-trip, straight-through gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactive_spectrogram_inpainting_tpu.models.vqvae import (
    VQVAE, VQVAEConfig, QuantizedBottleneck)
from interactive_spectrogram_inpainting_tpu.models.vqvae.vqvae import (
    save_model, from_parameters_and_weights)


def small_config(**kwargs):
    defaults = dict(
        in_channel=2, num_hidden_channels=16, n_res_block=1,
        num_residual_channels=8, embed_dim=8, num_embeddings=32,
        resolution_factors={"bottom": 4, "top": 2})
    defaults.update(kwargs)
    return VQVAEConfig(**defaults)


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = small_config()
    model = VQVAE(cfg)
    x = jnp.zeros((2, 2, 32, 16), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2, 32, 16)).astype(np.float32))
    dec, diff, perp_t, perp_b, id_t, id_b = model.apply(variables, x)
    assert dec.shape == (2, 2, 32, 16)
    assert id_b.shape == (2, 8, 4)   # /4 bottom
    assert id_t.shape == (2, 4, 2)   # /8 total
    assert diff.shape == ()
    assert float(perp_t) > 0 and float(perp_b) > 0


def test_decode_code_round_trip(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 2, 32, 16)).astype(np.float32))
    (quant_t, quant_b, _, id_t, id_b, _, _) = model.apply(
        variables, x, method=VQVAE.encode)
    dec_from_quant = model.apply(variables, quant_t, quant_b,
                                 method=VQVAE.decode)
    dec_from_code = model.apply(variables, id_t, id_b,
                                method=VQVAE.decode_code)
    # decoding from integer codes must equal decoding from quantized maps
    np.testing.assert_allclose(np.asarray(dec_from_code),
                               np.asarray(dec_from_quant), atol=1e-5)


def test_ema_updates_only_when_training(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 2, 32, 16)).astype(np.float32))
    # eval: no mutation requested, codebook untouched
    model.apply(variables, x)
    # train: codebook collection must change
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["codebook"])
    old = variables["codebook"]
    new = mutated["codebook"]
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)), old, new)
    assert any(jax.tree_util.tree_leaves(changed))


def test_ema_math_matches_reference_formula():
    """One EMA step must follow bottleneck.py:79-92 exactly."""
    dim, n_embed = 4, 8
    bn = QuantizedBottleneck(dim=dim, n_embed=n_embed, decay=0.9)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 2, 3, dim)).astype(np.float32))
    variables = bn.init({"params": jax.random.PRNGKey(0)}, x)
    (q, diff, ids, perp), mutated = bn.apply(
        variables, x, train=True, mutable=["codebook"])

    embed = np.asarray(variables["codebook"]["embed"])
    flat = np.asarray(x).reshape(-1, dim)
    dist = ((flat ** 2).sum(1, keepdims=True) - 2 * flat @ embed
            + (embed ** 2).sum(0, keepdims=True))
    ref_ids = dist.argmin(1)
    np.testing.assert_array_equal(np.asarray(ids).reshape(-1), ref_ids)

    onehot = np.eye(n_embed)[ref_ids]
    decay, eps = 0.9, 1e-5
    ref_cluster = decay * 0 + (1 - decay) * onehot.sum(0)
    ref_avg = decay * embed + (1 - decay) * (flat.T @ onehot)
    n = ref_cluster.sum()
    smoothed = (ref_cluster + eps) / (n + n_embed * eps) * n
    ref_embed = ref_avg / smoothed[None, :]
    np.testing.assert_allclose(
        np.asarray(mutated["codebook"]["cluster_size"]), ref_cluster,
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["codebook"]["embed"]), ref_embed, atol=1e-4)


def test_straight_through_gradient(model_and_vars):
    model, variables = model_and_vars

    def loss_fn(x):
        dec, diff, *_ = model.apply(variables, x)
        return jnp.mean(dec ** 2) + 0.25 * diff

    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 2, 32, 16)).astype(np.float32))
    g = jax.grad(loss_fn)(x)
    assert g.shape == x.shape
    assert float(jnp.abs(g).max()) > 0  # gradient flows through quantization


def test_corruption_changes_codes():
    dim, n_embed = 4, 16
    bn = QuantizedBottleneck(dim=dim, n_embed=n_embed,
                             corruption_weights=[1.0, 0.0, 1.0])
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 4, 4, dim)).astype(np.float32))
    variables = bn.init({"params": jax.random.PRNGKey(0)}, x)
    (_, _, ids_clean, _) = bn.apply(variables, x, train=False)
    (_, _, ids_corrupt, _), _ = bn.apply(
        variables, x, train=True, mutable=["codebook"],
        rngs={"corruption": jax.random.PRNGKey(7)})
    diff = (np.asarray(ids_clean) - np.asarray(ids_corrupt)) % n_embed
    # weights [1,0,1] force every code to shift by exactly +/-1
    assert set(np.unique(diff)).issubset({1, n_embed - 1})


def test_restarts_reseed_dead_codes():
    dim, n_embed = 4, 8
    bn = QuantizedBottleneck(dim=dim, n_embed=n_embed,
                             restart_threshold=0.5, decay=0.0)
    # all inputs identical -> one live code, all others dead
    x = jnp.ones((1, 4, 4, dim), jnp.float32) * 0.5
    variables = bn.init({"params": jax.random.PRNGKey(0)}, x)
    _, mutated = bn.apply(
        variables, x, train=True, mutable=["codebook"],
        rngs={"restart": jax.random.PRNGKey(1)})
    new_embed = np.asarray(mutated["codebook"]["embed"])
    # dead codes re-seeded from the batch (all 0.5 vectors)
    counts = np.asarray(mutated["codebook"]["cluster_size"])
    dead = counts / counts.sum() < 0.5 / n_embed
    assert dead.sum() == n_embed - 1
    np.testing.assert_allclose(new_embed[:, dead], 0.5, atol=1e-6)


def test_config_json_round_trip():
    cfg = small_config(num_embeddings=[32, 64],
                       output_spectrogram_min_magnitude=1e-3)
    cfg2 = VQVAEConfig.from_json(cfg.to_json())
    assert cfg2.n_embed_t == 32 and cfg2.n_embed_b == 64
    assert cfg2.resolution_factors == {"bottom": 4, "top": 2}
    # unknown keys from older stored files are tolerated
    blob = dict(VQVAEConfig().__dict__, legacy_unknown_flag=True)
    import json
    VQVAEConfig.from_json(json.dumps(blob))


def test_save_load_round_trip(tmp_path, model_and_vars):
    model, variables = model_and_vars
    save_model(tmp_path, model.config, variables)
    model2, variables2 = from_parameters_and_weights(
        tmp_path / "vqvae-model_parameters.json",
        tmp_path / "vqvae-weights.msgpack")
    x = jnp.asarray(np.random.default_rng(6).standard_normal(
        (1, 2, 32, 16)).astype(np.float32))
    dec1, *_ = model.apply(variables, x)
    dec2, *_ = model2.apply(variables2, x)
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2), atol=1e-6)


def test_unquantized_ablation():
    cfg = small_config(disable_quantization=True)
    model = VQVAE(cfg)
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 2, 32, 16)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    dec, diff, perp_t, perp_b, id_t, id_b = model.apply(variables, x)
    assert dec.shape == x.shape
    assert float(diff) == 0.0
    assert np.isinf(float(perp_t))


def test_normalizer_integration():
    stats = {"min_logmag": -14.0, "max_logmag": 2.0,
             "min_IF": -1.0, "max_IF": 1.0}
    cfg = small_config(normalizer_statistics=stats)
    model = VQVAE(cfg)
    x = jnp.asarray(np.random.default_rng(8).standard_normal(
        (1, 2, 32, 16)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    dec, *_ = model.apply(variables, x)
    assert dec.shape == x.shape


def test_resnet_variant():
    """--use_resnet path: XResNet encoders + skip-free PixelShuffle
    decoders produce the same interface and shapes."""
    cfg = small_config(use_resnet=True,
                       resnet_layers_per_downsampling_block=2)
    model = VQVAE(cfg)
    x = jnp.asarray(np.random.default_rng(9).standard_normal(
        (1, 2, 32, 16)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    dec, diff, perp_t, perp_b, id_t, id_b = model.apply(variables, x)
    assert dec.shape == x.shape
    assert id_b.shape == (1, 8, 4)
    assert id_t.shape == (1, 4, 2)
    # config survives the JSON round trip with the resnet flags
    cfg2 = VQVAEConfig.from_json(cfg.to_json())
    assert cfg2.use_resnet
