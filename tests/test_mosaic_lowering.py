"""Pallas kernels must keep LOWERING for TPU (Mosaic), not just run in
interpret mode on the CPU test backend.

``jax.jit(f).trace(...).lower(lowering_platforms=('tpu',))`` runs the
Pallas->Mosaic lowering pass — where layout rules such as 128-lane
minor dims and the lane-splitting-reshape ban are enforced — on a host
with no TPU backend, at the FLAGSHIP model geometry the kernels were
tuned for (d_model 512, 8 heads, bottom 64x8 / top 32x4 codemaps).
Kernel-breaking edits fail here in CI instead of at first on-device
compile (backend-stage Mosaic errors, e.g. DMA slice alignment, still
need the real chip).

The sampling entry points route by batch size (sampling/sample.py
``_fused_scan_sample``), so the cases below cover every production
decode kernel: B=1 -> whole-scan megakernel (ops/decode_scan_kernel) +
prefix-prime; B=2 -> per-step fused kernel (ops/decode_step_kernel) +
prefix-prime; B=8 -> batched megakernel (ops/decode_step_batched).

Reference workload: ``/root/reference/sample.py`` /
``/root/reference/flask_server.py`` sampling endpoints.
"""

import jax
import jax.numpy as jnp
import pytest

from interactive_spectrogram_inpainting_tpu.models.prior.transformer import (
    SelfAttentiveVQTransformer, TransformerConfig, UpsamplingVQTransformer,
    VQNSynthTransformer as T)
from interactive_spectrogram_inpainting_tpu.sampling import (
    precompute_decode_state)
from interactive_spectrogram_inpainting_tpu.sampling import sample as S


def _init_model(model, tgt_shape, src_shape):
    tgt = jnp.zeros((1,) + tgt_shape, jnp.int32)
    src = jnp.zeros((1,) + src_shape, jnp.int32)
    return jax.jit(lambda r, t, s: model.init(r, t, s,
                                              method=T.full_init))(
        {"params": jax.random.PRNGKey(0)}, tgt, src)


def _flagship(kind):
    if kind == "bottom":
        cfg = TransformerConfig(shape=(64, 8), condition_shape=(32, 4),
                                n_class=512, d_model=512, dropout=0.0,
                                use_aligned_decoder=True)
        model = UpsamplingVQTransformer(cfg)
        variables = _init_model(model, (64, 8), (32, 4))
    else:
        cfg = TransformerConfig(shape=(32, 4), condition_shape=(32, 4),
                                n_class=512, d_model=512, dropout=0.0,
                                self_conditional_model=True)
        model = SelfAttentiveVQTransformer(cfg)
        variables = _init_model(model, (32, 4), (32, 4))
    return cfg, model, variables


@pytest.fixture(scope="module")
def bottom():
    cfg, model, variables = _flagship("bottom")
    # model-constant tables are built eagerly on the CPU backend BEFORE
    # the backend sniff is patched (they execute; the lowering does not)
    state = precompute_decode_state(model, variables,
                                    compute_dtype=jnp.bfloat16)
    src_helper = cfg.source_codemaps_helper()
    condition = jnp.zeros((1, 32, 4), jnp.int32)
    src_seq = model.apply(variables, src_helper.to_sequence(condition),
                          "source", method=T.prepare_sequence)
    memory = model.apply(variables, src_seq, method=T.encode_source)
    pos = model.apply(variables, "target", None,
                      method=T._positional_sequence)
    return cfg, model, variables, state, memory, pos


def _lower_fused_scan(monkeypatch, cfg, model, variables, state, memory,
                      pos, batch, scan_from):
    length = cfg.target_sequence_length
    mem = jnp.broadcast_to(memory, (batch,) + memory.shape[1:])
    start_block = model.apply(variables, "target", {}, batch,
                              method=T._start_block)
    init_toks = jnp.zeros((batch, length), jnp.int32)
    mask = jnp.ones((length,), bool)

    def run(variables, rng, mem, init_toks, mask, start_block):
        return S._fused_scan_sample(
            model, variables, rng, mem, init_toks, mask, pos,
            start_block, 1.0, compute_dtype=jnp.bfloat16,
            scan_from=scan_from, decode_state=state)

    # the kernel drivers pick interpret mode when the default backend
    # is cpu; claim tpu so the real Mosaic path is lowered
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    lowered = jax.jit(run).trace(
        variables, jax.random.PRNGKey(0), mem, init_toks, mask,
        start_block).lower(lowering_platforms=("tpu",))
    assert "tpu_custom_call" in lowered.as_text()


@pytest.mark.parametrize("batch,scan_from", [
    (1, 37),   # whole-scan megakernel + prefix-prime megakernel
    (2, 37),   # per-step fused kernel + prefix-prime megakernel
    (8, None)  # batched megakernel
])
def test_bottom_decode_kernels_lower_for_tpu(monkeypatch, bottom, batch,
                                             scan_from):
    cfg, model, variables, state, memory, pos = bottom
    _lower_fused_scan(monkeypatch, cfg, model, variables, state, memory,
                      pos, batch, scan_from)


def test_top_full_cross_kernels_lower_for_tpu(monkeypatch):
    """The self-conditioned top prior exercises the kernels' full
    cross-attention variant (cross_rows is not None)."""
    cfg, model, variables = _flagship("top")
    state = precompute_decode_state(model, variables,
                                    compute_dtype=jnp.bfloat16)
    condition = jnp.zeros((1, 32, 4), jnp.int32)
    src_helper = cfg.source_codemaps_helper()
    src_seq = model.apply(variables, src_helper.to_sequence(condition),
                          "source", method=T.prepare_sequence)
    memory = model.apply(variables, src_seq, method=T.encode_source)
    pos = model.apply(variables, "target", None,
                      method=T._positional_sequence)
    _lower_fused_scan(monkeypatch, cfg, model, variables, state, memory,
                      pos, 1, 11)


def test_vq_lookup_lowers_for_tpu(monkeypatch):
    """The fused VQ-bottleneck lookup at the flagship geometry
    (bottom codemap: N = B*64*8 rows, dim 64, K 512)."""
    from interactive_spectrogram_inpainting_tpu.ops.vq_lookup import (
        fused_vq_lookup)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    flat = jnp.zeros((8 * 64 * 8, 64), jnp.float32)
    embed = jnp.zeros((64, 512), jnp.float32)
    lowered = jax.jit(fused_vq_lookup).trace(flat, embed).lower(
        lowering_platforms=("tpu",))
    assert "tpu_custom_call" in lowered.as_text()


def test_flagship_train_step_lowers_for_tpu(monkeypatch):
    """The full B=8 prior train step — packed fused attention, rbg
    (RngBitGenerator) dropout keys, reduction-form smoothed xent, adam —
    cross-lowers for TPU. Guards the whole training HLO, not just the
    kernel in isolation."""
    import optax
    from interactive_spectrogram_inpainting_tpu.ops import train_attention
    from interactive_spectrogram_inpainting_tpu.train.train_prior import (
        make_steps)

    cfg = TransformerConfig(shape=(64, 8), condition_shape=(32, 4),
                            n_class=512, d_model=512, dropout=0.1,
                            use_aligned_decoder=True,
                            fused_attention=True)
    model = UpsamplingVQTransformer(cfg)
    variables = _init_model(model, (64, 8), (32, 4))
    params = variables["params"]
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)
    train_step, _ = make_steps(model, optimizer, "bottom", None,
                               label_smoothing=0.1, bf16=True,
                               rbg_dropout=True)
    monkeypatch.setattr(train_attention, "_interpret_default",
                        lambda: False)
    tops = jnp.zeros((8, 32, 4), jnp.int32)
    bottoms = jnp.zeros((8, 64, 8), jnp.int32)
    lowered = train_step.trace(
        params, opt_state, jax.random.PRNGKey(3), tops, bottoms,
        {}).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert "tpu_custom_call" in text      # the Pallas attention kernel
    assert "rng_bit_generator" in text   # stablehlo.rng_bit_generator
