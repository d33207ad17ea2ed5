"""Fused training-attention kernel vs the dense XLA oracle.

Runs in Pallas interpret mode on the CPU test backend (conftest pins
jax to CPU); the same code path compiles with Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interactive_spectrogram_inpainting_tpu.ops.train_attention import (
    NEG_INF, fused_train_attention, reference_train_attention)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


def _make_inputs(seed, batch, lq, lk, heads, dh, mask=None,
                 dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = _rand(ks[0], batch, lq, heads, dh, dtype=dtype)
    k = _rand(ks[1], batch, lk, heads, dh, dtype=dtype)
    v = _rand(ks[2], batch, lk, heads, dh, dtype=dtype)
    ab = _rand(ks[3], heads, lq, lk)
    if mask is not None:
        ab = ab + mask[None]
    return q, k, v, ab


@pytest.mark.parametrize("batch,lq,lk,heads,dh", [
    (3, 37, 21, 2, 8),     # ragged everything
    (2, 129, 129, 4, 64),  # the priors' encoder geometry
    (1, 16, 129, 8, 64),   # cross-attention-like
])
def test_forward_matches_dense(batch, lq, lk, heads, dh):
    q, k, v, ab = _make_inputs(0, batch, lq, lk, heads, dh)
    got = fused_train_attention(q, k, v, ab)
    want = reference_train_attention(q, k, v, ab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_forward_with_causal_mask():
    lq = 33
    i = jnp.arange(lq)
    mask = jnp.where(i[:, None] >= i[None, :], 0.0, NEG_INF)
    q, k, v, ab = _make_inputs(1, 2, lq, lq, 2, 16, mask=mask)
    got = fused_train_attention(q, k, v, ab)
    want = reference_train_attention(q, k, v, ab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("batch,lq,lk,heads,dh", [
    (3, 37, 21, 2, 8),
    (2, 66, 129, 4, 64),
])
def test_gradients_match_dense(batch, lq, lk, heads, dh):
    q, k, v, ab = _make_inputs(2, batch, lq, lk, heads, dh)
    cot = jax.random.normal(jax.random.PRNGKey(9),
                            (batch, lq, heads, dh))

    def loss(fn):
        return lambda q, k, v, ab: jnp.sum(fn(q, k, v, ab) * cot)

    got = jax.grad(loss(fused_train_attention), argnums=(0, 1, 2, 3))(
        q, k, v, ab)
    want = jax.grad(loss(reference_train_attention), argnums=(0, 1, 2, 3))(
        q, k, v, ab)
    for g, w, name in zip(got, want, ["dq", "dk", "dv", "dab"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_gradients_with_fully_masked_rows():
    """Aligned-decoder-style mask: each query row keeps exactly one key;
    gradient flow must stay finite and match the oracle."""
    lq, lk = 12, 4
    e_q = jnp.arange(lq) // 3
    mask = jnp.where(e_q[:, None] == jnp.arange(lk)[None, :], 0.0, NEG_INF)
    q, k, v, ab = _make_inputs(3, 2, lq, lk, 2, 8, mask=mask)
    cot = jax.random.normal(jax.random.PRNGKey(4), (2, lq, 2, 8))

    def loss(fn):
        return lambda q, k, v, ab: jnp.sum(fn(q, k, v, ab) * cot)

    got = jax.grad(loss(fused_train_attention), argnums=(0, 1, 2, 3))(
        q, k, v, ab)
    want = jax.grad(loss(reference_train_attention), argnums=(0, 1, 2, 3))(
        q, k, v, ab)
    for g, w, name in zip(got, want, ["dq", "dk", "dv", "dab"]):
        assert np.isfinite(np.asarray(g)).all(), name
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_bf16_inputs():
    q, k, v, ab = _make_inputs(5, 2, 40, 40, 2, 32, dtype=jnp.bfloat16)
    got = fused_train_attention(q, k, v, ab)
    assert got.dtype == jnp.bfloat16
    want = reference_train_attention(q, k, v, ab)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_dab_is_batch_summed():
    """dab must equal the sum over the batch of per-sample score grads:
    doubling the batch by repetition doubles dab."""
    q, k, v, ab = _make_inputs(6, 2, 10, 10, 2, 8)
    q2, k2, v2 = (jnp.concatenate([t, t]) for t in (q, k, v))

    def loss(q, k, v, ab):
        return jnp.sum(fused_train_attention(q, k, v, ab) ** 2)

    dab1 = jax.grad(loss, argnums=3)(q, k, v, ab)
    dab2 = jax.grad(loss, argnums=3)(q2, k2, v2, ab)
    np.testing.assert_allclose(np.asarray(dab2), 2 * np.asarray(dab1),
                               atol=1e-5, rtol=1e-5)


# -- model-level equivalence --------------------------------------------------

def _tiny(hier, fused):
    import dataclasses
    from interactive_spectrogram_inpainting_tpu.models.prior import (
        TransformerConfig, SelfAttentiveVQTransformer,
        UpsamplingVQTransformer)
    base = dict(
        shape=(8, 4), n_class=16, d_model=32, embeddings_dim=8,
        positional_embeddings_dim=8, dropout=0.0,
        conditional_model=True, condition_shape=(4, 2),
        conditional_model_num_encoder_layers=2,
        conditional_model_num_decoder_layers=2,
        conditional_model_nhead=4, d_ff=64, fused_attention=fused)
    if hier == "top":
        cfg = TransformerConfig(**{**base, "condition_shape": (8, 4),
                                   "self_conditional_model": True})
        return SelfAttentiveVQTransformer(cfg), cfg
    cfg = TransformerConfig(**{**base, "use_aligned_decoder": True})
    return UpsamplingVQTransformer(cfg), cfg


@pytest.mark.parametrize("hier", ["top", "bottom"])
def test_transformer_fused_matches_dense(hier):
    """Same params, same logits and same parameter gradients whether
    attention runs through the fused kernel or the dense XLA path."""
    from interactive_spectrogram_inpainting_tpu.models.prior import (
        VQNSynthTransformer)
    dense_model, cfg = _tiny(hier, fused=False)
    fused_model, _ = _tiny(hier, fused=True)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.integers(
        0, 16, (2, cfg.target_frequencies, cfg.target_duration)))
    condition = jnp.asarray(rng.integers(
        0, 16, (2, cfg.source_frequencies, cfg.source_duration)))
    variables = dense_model.init(
        {"params": jax.random.PRNGKey(0)}, target, condition,
        class_conditioning={}, method=VQNSynthTransformer.full_init)

    def forward(model, params):
        src_seq, tgt_seq = model.apply(
            {"params": params}, target, condition, class_conditioning={},
            method=VQNSynthTransformer.to_sequences)
        logits, _ = model.apply({"params": params}, tgt_seq, src_seq)
        return logits

    logits_d = forward(dense_model, variables["params"])
    logits_f = forward(fused_model, variables["params"])
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_d),
                               atol=1e-4, rtol=1e-4)

    def loss(model):
        return lambda p: jnp.mean(forward(model, p) ** 2)

    gd = jax.grad(loss(dense_model))(variables["params"])
    gf = jax.grad(loss(fused_model))(variables["params"])
    flat_d = jax.tree_util.tree_leaves_with_path(gd)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    assert len(flat_d) == len(flat_f)
    for (path_d, leaf_d), (path_f, leaf_f) in zip(flat_d, flat_f):
        assert path_d == path_f
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_d), atol=2e-4, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path_d))


def test_fused_composes_with_remat():
    """--remat wraps layers in jax.checkpoint; the custom-vjp kernel must
    compose (recomputed forward, identical gradients)."""
    import dataclasses
    from interactive_spectrogram_inpainting_tpu.models.prior import (
        VQNSynthTransformer, UpsamplingVQTransformer)
    fused_model, cfg = _tiny("bottom", fused=True)
    remat_model = UpsamplingVQTransformer(
        dataclasses.replace(cfg, fused_attention=True, remat=True))
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.integers(0, 16, (2, 8, 4)))
    condition = jnp.asarray(rng.integers(0, 16, (2, 4, 2)))
    variables = fused_model.init(
        {"params": jax.random.PRNGKey(0)}, target, condition,
        class_conditioning={}, method=VQNSynthTransformer.full_init)

    def loss_fn(model):
        def loss(p):
            src_seq, tgt_seq = model.apply(
                {"params": p}, target, condition, class_conditioning={},
                method=VQNSynthTransformer.to_sequences)
            logits, _ = model.apply({"params": p}, tgt_seq, src_seq)
            return jnp.mean(logits ** 2)
        return loss

    g_plain = jax.grad(loss_fn(fused_model))(variables["params"])
    g_remat = jax.grad(loss_fn(remat_model))(variables["params"])
    for (pth, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_plain),
            jax.tree_util.tree_leaves_with_path(g_remat)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=jax.tree_util.keystr(pth))


# -- head-pair packing --------------------------------------------------------

def test_packed_odd_heads_and_small_dh():
    """Packing pads an odd head count with a zero head and sub-64 Dh with
    zero lanes; values and grads must still match the dense oracle."""
    q, k, v, ab = _make_inputs(7, 2, 23, 17, 3, 24)
    got = fused_train_attention(q, k, v, ab)
    want = reference_train_attention(q, k, v, ab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    def loss(fn):
        return lambda q, k, v, ab: jnp.sum(fn(q, k, v, ab) ** 2)

    got_g = jax.grad(loss(fused_train_attention), argnums=(0, 1, 2, 3))(
        q, k, v, ab)
    want_g = jax.grad(loss(reference_train_attention), argnums=(0, 1, 2, 3))(
        q, k, v, ab)
    for g, w, name in zip(got_g, want_g, ["dq", "dk", "dv", "dab"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_packed_matches_unpacked(monkeypatch):
    """ISI_ATTN_PACKED=0 must select the single-head-per-block kernels
    and agree with the packed default (same math, different layout)."""
    from interactive_spectrogram_inpainting_tpu.ops import train_attention

    q, k, v, ab = _make_inputs(8, 2, 30, 30, 4, 64)

    def run_all():
        out = fused_train_attention(q, k, v, ab)
        grads = jax.grad(
            lambda q, k, v, ab: jnp.sum(
                fused_train_attention(q, k, v, ab) ** 2),
            argnums=(0, 1, 2, 3))(q, k, v, ab)
        return (out,) + grads

    assert train_attention._packed_enabled()
    packed = run_all()
    monkeypatch.setenv("ISI_ATTN_PACKED", "0")
    assert not train_attention._packed_enabled()
    unpacked = run_all()
    for p, u, name in zip(packed, unpacked,
                          ["out", "dq", "dk", "dv", "dab"]):
        np.testing.assert_allclose(np.asarray(p), np.asarray(u),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_large_dh_takes_unpacked_path():
    """Dh > 64 cannot pack two heads into 128 lanes; the dispatcher must
    fall back to the padded single-head layout."""
    q, k, v, ab = _make_inputs(9, 1, 19, 19, 2, 80)
    got = fused_train_attention(q, k, v, ab)
    want = reference_train_attention(q, k, v, ab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("packed", ["1", "0"])
def test_tpu_mosaic_lowering_smoke(monkeypatch, packed):
    """The kernel must keep LOWERING for TPU (Mosaic), not just run in
    interpret mode on the CPU test backend.

    jax can trace-and-lower for a platform it has no backend for
    (``lower(lowering_platforms=('tpu',))``), and the Pallas->Mosaic
    lowering pass — where layout rules like 128-lane minor dims and
    lane-splitting-reshape bans are enforced — runs as part of it. This
    catches kernel-breaking edits in CI without TPU hardware (backend
    -stage Mosaic errors, e.g. DMA slice alignment, still need the real
    chip)."""
    from interactive_spectrogram_inpainting_tpu.ops import train_attention

    monkeypatch.setenv("ISI_ATTN_PACKED", packed)
    monkeypatch.setattr(train_attention, "_interpret_default",
                        lambda: False)
    q, k, v, ab = _make_inputs(11, 2, 130, 67, 3, 64, dtype=jnp.bfloat16)

    def loss(q, k, v, ab):
        out = fused_train_attention(q, k, v, ab)
        return jnp.sum(out.astype(jnp.float32))

    lowered = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))).trace(
        q, k, v, ab).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert "tpu_custom_call" in text
