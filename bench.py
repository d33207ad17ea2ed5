"""Benchmark driver: prints ONE JSON line with the headline metric.

Primary metric: bottom-prior AR sampling throughput (tokens/sec/chip) on
the flagship configuration (top 32x4 -> bottom 64x8, vocab 512, d_model
512, 8 decoder layers) — the reference's latency-critical path, which it
executes with one full decoder forward per token (sample.py:268-306).
``vs_baseline`` is the ratio against BASELINE.json's 50k tokens/sec/chip
north-star target.

Extra fields: single-note hierarchical inpaint latency (p50, batch 1,
standard + 2x-duration time-index-remapped), VQ-VAE encode throughput,
and train-step throughput for both trainers (bf16).

Env knobs: BENCH_BATCH (default 512), BENCH_SKIP_LATENCY=1,
BENCH_SKIP_VQVAE=1, BENCH_SKIP_TRAIN=1.
"""

from __future__ import annotations

import json
import os
import pathlib
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(pathlib.Path(__file__).parent / ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_spectrogram_inpainting_tpu.models.prior import (  # noqa: E402
    TransformerConfig, SelfAttentiveVQTransformer, UpsamplingVQTransformer)
from interactive_spectrogram_inpainting_tpu.models.prior.transformer import (  # noqa: E402
    VQNSynthTransformer)
from interactive_spectrogram_inpainting_tpu.sampling import (  # noqa: E402
    make_sampling_fn)

TARGET_TOKENS_PER_SEC = 50_000.0


def _materialize(x):
    """Force completion. On the axon remote backend block_until_ready
    returns at dispatch time, so a real device->host transfer is the only
    reliable sync point."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), x)


def median_time(fn, repeats=5):
    """Times fn() + ONE device->host transfer. All timed fns are single
    jit programs, so any one output leaf is a complete sync point
    (outputs of one XLA executable become ready together). Syncing the
    whole tree instead costs one ~21 ms tunnel round trip PER LEAF —
    measured: the 7-scalar VQ-VAE metrics dict added ~147 ms/step of
    pure harness artifact (the step itself is 67 ms at B=256)."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _materialize(jax.tree_util.tree_leaves(fn())[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def init_model(model, tgt_shape, src_shape):
    import functools
    tgt = jnp.zeros((1,) + tgt_shape, jnp.int32)
    src = jnp.zeros((1,) + src_shape, jnp.int32)
    # jitted: eager init costs one tunnel round trip per op (minutes)
    return jax.jit(functools.partial(
        model.init, method=VQNSynthTransformer.full_init))(
        {"params": jax.random.PRNGKey(0)}, tgt, src)


def bench_prior_throughput(batch: int):
    cfg = TransformerConfig(shape=(64, 8), condition_shape=(32, 4),
                            n_class=512, d_model=512, dropout=0.0,
                            use_aligned_decoder=True)
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, (64, 8), (32, 4))
    from interactive_spectrogram_inpainting_tpu.sampling import (
        precompute_decode_state)
    state = precompute_decode_state(model, variables,
                                    compute_dtype=jnp.bfloat16)
    fn = make_sampling_fn(model, batch_size=batch,
                          compute_dtype=jnp.bfloat16,
                          use_fused_step=True, decode_state=state)
    top = jnp.zeros((batch, 32, 4), jnp.int32)
    rng = jax.random.PRNGKey(0)
    _materialize(fn(variables, rng, top, None, None, {}))
    dt = median_time(lambda: fn(variables, jax.random.PRNGKey(1), top,
                                None, None, {}))
    tokens = batch * cfg.target_sequence_length
    return tokens / dt, model, variables


def bench_inpaint_latency(model_bottom, vars_bottom, long_sound=False):
    """Single-note masked inpaint through the fused decode-step
    megakernel: top (middle time range masked) -> bottom cascade.
    ``long_sound=True`` measures the 2x-duration windowed variant: the
    same fused kernels with time-index-remapped positional rows
    (the serving path for sounds longer than the training duration —
    reference flask_server.py:670-682)."""
    top_cfg = TransformerConfig(shape=(32, 4), n_class=512, d_model=512,
                                dropout=0.0, self_conditional_model=True,
                                condition_shape=(32, 4))
    model_top = SelfAttentiveVQTransformer(top_cfg)
    vars_top = init_model(model_top, (32, 4), (32, 4))

    mask_top = np.zeros((32, 4), dtype=bool)
    mask_top[:, 1:3] = True  # regenerate the middle time range
    mask_bottom = np.repeat(np.repeat(mask_top, 2, axis=0), 2, axis=1)

    from interactive_spectrogram_inpainting_tpu.sampling import (
        precompute_decode_state, sample_model)

    ti_top = ti_bottom = None
    if long_sound:
        from interactive_spectrogram_inpainting_tpu.serve.server import (
            make_time_indexes)
        ti_top = jnp.asarray(make_time_indexes(1, 2 * 4, 4))
        ti_bottom = jnp.asarray(make_time_indexes(2, 2 * 8, 8))

    initial_top = jnp.zeros((1, 32, 4), jnp.int32)
    initial_bottom = jnp.zeros((1, 64, 8), jnp.int32)
    # model-constant tables built once (the serving pattern:
    # ServerState.decode_state)
    state_top = precompute_decode_state(model_top, vars_top,
                                        compute_dtype=jnp.bfloat16)
    state_bottom = precompute_decode_state(model_bottom, vars_bottom,
                                           compute_dtype=jnp.bfloat16)

    # NOTE: the decode states are jit ARGUMENTS, not closure constants —
    # closed-over arrays get serialized into the compile payload (the
    # axon remote compiler rejects the ~500MB request with HTTP 413)
    @jax.jit
    def inpaint(rng, state_top, state_bottom, ti_top, ti_bottom):
        rng_top, rng_bottom = jax.random.split(rng)
        top = sample_model(
            model_top, vars_top, rng_top, 1, initial_code=initial_top,
            mask=jnp.asarray(mask_top), compute_dtype=jnp.bfloat16,
            time_indexes_source=ti_top, time_indexes_target=ti_top,
            use_fused_step=True, decode_state=state_top)
        bottom = sample_model(
            model_bottom, vars_bottom, rng_bottom, 1, condition=top,
            initial_code=initial_bottom, mask=jnp.asarray(mask_bottom),
            time_indexes_source=ti_top, time_indexes_target=ti_bottom,
            compute_dtype=jnp.bfloat16, use_fused_step=True,
            decode_state=state_bottom)
        return bottom

    _materialize(inpaint(jax.random.PRNGKey(0), state_top, state_bottom,
                         ti_top, ti_bottom))
    return median_time(lambda: inpaint(jax.random.PRNGKey(1), state_top,
                                       state_bottom, ti_top, ti_bottom))


def bench_vqvae(batch: int = 128):
    # 128 = extract_codes.py's default batch; encode is dispatch-bound,
    # so small batches understate it badly. Measured v5e-1 with the
    # single-leaf sync: 4694 specs/s at B=128 (pre-fix history, incl.
    # the multi-transfer artifact: 122/s at B=8, 1038 at B=64, 1463 at
    # B=128, 2223 at B=256)
    from interactive_spectrogram_inpainting_tpu.models.vqvae import (
        VQVAE, VQVAEConfig)
    cfg = VQVAEConfig(resolution_factors={"bottom": 16, "top": 2})
    model = VQVAE(cfg)
    x = jnp.zeros((batch, 2, 1024, 128), jnp.float32)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)
    encode = jax.jit(lambda v, x: model.apply(
        v, x, method=VQVAE.encode_codes_only))
    _materialize(encode(variables, x))
    dt = median_time(lambda: encode(variables, x), repeats=3)
    return batch / dt


def bench_vqvae_train(batch: int = 64):
    """VQ-VAE train-step throughput (specs/sec) on the flagship config —
    the reference's main workload (train_vqvae.py:133-290, DDP batch 64).
    bf16 compute (the --bf16 trainer path); the wav->spectrogram
    transform is excluded to keep the number comparable across rounds
    (it CAN run on-device now via the DFT path — the trainer fuses it
    into the step unless the host-FFT fallback is forced)."""
    import optax
    from interactive_spectrogram_inpainting_tpu.models.vqvae import (
        VQVAE, VQVAEConfig)
    from interactive_spectrogram_inpainting_tpu.train.train_vqvae import (
        make_train_step)
    from interactive_spectrogram_inpainting_tpu.train.losses import mse_loss
    cfg = VQVAEConfig(resolution_factors={"bottom": 16, "top": 2})
    model = VQVAE(cfg)
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((batch, 2, 1024, 128)),
                       jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, spec[:2])
    params, codebook = variables["params"], variables["codebook"]
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, mse_loss, 0.25, None,
                           needs_rng=False, bf16=True,
                           spec_precomputed=True)
    # keep the train state DEVICE-resident: materializing params/
    # opt_state would force a ~100s of MB host round trip per timed call
    # on the tunnel; the metrics dict is the (small) sync point and the
    # whole step must complete before it exists
    params, codebook, opt_state, m = step(
        params, codebook, opt_state, spec, jax.random.PRNGKey(1))
    _materialize(m)
    dt = median_time(
        lambda: step(params, codebook, opt_state, spec,
                     jax.random.PRNGKey(2))[3], repeats=3)
    return batch / dt


def bench_spectral_train(batch: int = 512):
    """VQ-VAE train-step throughput (specs/sec) with the Jukebox
    multiscale spectral loss — the reference's heaviest training
    criterion (train_vqvae.py:177-179, utils/losses/spectral.py:157-171),
    which backpropagates through the inverse spectrogram transform. The
    loss runs in the fused Pallas multiscale-STFT kernel
    (ops/spectral_loss_kernel.py: DFT + magnitudes + distance all
    VMEM-resident, bf16 gradient-direction residual). Measured v5e-1:
    1577.5 specs/s at B=512 (with the fused mel to_audio; 1488.0
    before it, 1413.7 at B=256, 1237.9 at B=128; 1136 at the old B=128
    knee before the kernel)."""
    import optax
    from interactive_spectrogram_inpainting_tpu.models.vqvae import (
        VQVAE, VQVAEConfig)
    from interactive_spectrogram_inpainting_tpu.train.train_vqvae import (
        make_train_step)
    from interactive_spectrogram_inpainting_tpu.train.losses import (
        get_reconstruction_criterion)
    from interactive_spectrogram_inpainting_tpu.signal.spectrogram import (
        get_spectrograms_helper)
    helper = get_spectrograms_helper(use_mel_scale=True)
    cfg = VQVAEConfig(resolution_factors={"bottom": 16, "top": 2})
    model = VQVAE(cfg)
    rng = np.random.default_rng(3)
    spec = jnp.asarray(0.1 * rng.standard_normal((batch, 2, 1024, 128)),
                       jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, spec[:2])
    params, codebook = variables["params"], variables["codebook"]
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)
    criterion = get_reconstruction_criterion("spectral_jukebox", helper)
    step = make_train_step(model, optimizer, criterion, 0.25, helper,
                           needs_rng=False, bf16=True,
                           spec_precomputed=True)
    params, codebook, opt_state, m = step(
        params, codebook, opt_state, spec, jax.random.PRNGKey(1))
    _materialize(m)
    dt = median_time(
        lambda: step(params, codebook, opt_state, spec,
                     jax.random.PRNGKey(2))[3], repeats=3)
    return batch / dt


def bench_decode_audio():
    """codemaps -> audio latency (ms, B=1): VQ-VAE decode fused with the
    inverse spectrogram transform in ONE jit dispatch — the serving
    /get-audio hot path (server.py:decode_audio_fn; reference decodes
    then runs torch iSTFT separately, flask_server.py:1003-1021).
    Measured under the 4-user load mix: p50 36.1 ms on v5e-1."""
    from interactive_spectrogram_inpainting_tpu.models.vqvae import (
        VQVAE, VQVAEConfig)
    from interactive_spectrogram_inpainting_tpu.signal.spectrogram import (
        get_spectrograms_helper)
    helper = get_spectrograms_helper(use_mel_scale=True)
    cfg = VQVAEConfig(resolution_factors={"bottom": 16, "top": 2})
    model = VQVAE(cfg)
    probe = jnp.zeros((1, 2, 1024, 128), jnp.float32)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, probe)

    @jax.jit
    def fn(top_code, bottom_code):
        spec = model.apply(variables, top_code, bottom_code,
                           method=VQVAE.decode_code)
        return helper.to_audio(spec)

    top = jnp.zeros((1, 32, 4), jnp.int32)
    bottom = jnp.zeros((1, 64, 8), jnp.int32)
    _materialize(fn(top, bottom))
    return median_time(lambda: fn(top, bottom))


def bench_decode_image():
    """codemaps -> PNG latency (ms, B=1): the serving
    /get-spectrogram-image hot path (server.py:decode_image_fn). VQ-VAE
    decode + normalize + bilinear time-upsample + uint8 LUT quantization
    run fused in ONE jit dispatch; only the 256-entry palette gather and
    the level-1 deflate stay host-side (the timed fn includes them — it
    returns the finished PNG bytes, and the uint8 transfer inside it is
    the device sync). Measured single-request on v5e-1: p50 73.6 ms
    (was 94.0 with the host float render; reference renders a
    matplotlib figure per request, flask_server.py:549-578)."""
    from interactive_spectrogram_inpainting_tpu.models.vqvae import (
        VQVAE, VQVAEConfig)
    from interactive_spectrogram_inpainting_tpu.serve.server import (
        _encode_png, _viridis_lut, spectrogram_image_indices)
    cfg = VQVAEConfig(resolution_factors={"bottom": 16, "top": 2})
    model = VQVAE(cfg)
    probe = jnp.zeros((1, 2, 1024, 128), jnp.float32)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, probe)

    @jax.jit
    def fn(top_code, bottom_code):
        spec = model.apply(variables, top_code, bottom_code,
                           method=VQVAE.decode_code)
        return spectrogram_image_indices(spec[0, 0], upsampling_factor=4)

    lut = _viridis_lut()

    def request(top_code, bottom_code) -> bytes:
        return _encode_png(lut[np.asarray(fn(top_code, bottom_code))])

    top = jnp.zeros((1, 32, 4), jnp.int32)
    bottom = jnp.zeros((1, 64, 8), jnp.int32)
    request(top, bottom)
    return median_time(lambda: request(top, bottom))


def bench_prior_train(batch: int = 32):
    """Bottom-prior train-step throughput (tokens/sec) on the flagship
    config (reference train_autoregressive_model.py, batch 32)."""
    import optax
    from interactive_spectrogram_inpainting_tpu.train.train_prior import (
        make_steps)
    cfg = TransformerConfig(shape=(64, 8), condition_shape=(32, 4),
                            n_class=512, d_model=512, dropout=0.1,
                            use_aligned_decoder=True,
                            # the trainer's --fused_attention auto default
                            fused_attention=jax.default_backend() != "cpu")
    model = UpsamplingVQTransformer(cfg)
    variables = init_model(model, (64, 8), (32, 4))
    params = variables["params"]
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)
    train_step, _ = make_steps(model, optimizer, "bottom", None,
                               label_smoothing=0.1, bf16=True,
                               # the trainer's --dropout_rng auto default
                               rbg_dropout=jax.default_backend() != "cpu")
    rng = np.random.default_rng(1)
    tops = jnp.asarray(rng.integers(0, 512, (batch, 32, 4)), jnp.int32)
    bottoms = jnp.asarray(rng.integers(0, 512, (batch, 64, 8)), jnp.int32)
    # device-resident state; metrics are the sync point (see
    # bench_vqvae_train)
    params, opt_state, m = train_step(
        params, opt_state, jax.random.PRNGKey(3), tops, bottoms, {})
    _materialize(m)
    dt = median_time(
        lambda: train_step(params, opt_state, jax.random.PRNGKey(4),
                           tops, bottoms, {})[2], repeats=3)
    return batch * cfg.target_sequence_length / dt


def measure_dispatch_floor() -> float:
    """Fixed per-call round-trip cost of the harness (the axon tunnel
    adds ~30 ms per jit call + host transfer that local hardware would
    not pay). Reported separately so latency numbers are interpretable."""
    @jax.jit
    def noop(x):
        return x + 1

    x = jnp.zeros((8, 8), jnp.int32)
    _materialize(noop(x))
    return median_time(lambda: noop(x), repeats=7)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    t_start = time.time()
    tokens_per_sec, model_bottom, vars_bottom = bench_prior_throughput(batch)
    extra = {"sampling_batch": batch,
             "devices": str(jax.devices())}
    try:
        floor_ms = measure_dispatch_floor() * 1e3
        extra["dispatch_floor_ms"] = round(floor_ms, 1)
    except Exception:  # pragma: no cover
        floor_ms = 0.0
    if not os.environ.get("BENCH_SKIP_LATENCY"):
        try:
            lat_ms = bench_inpaint_latency(model_bottom,
                                           vars_bottom) * 1e3
            extra["inpaint_latency_p50_ms"] = round(lat_ms, 1)
            extra["inpaint_latency_minus_dispatch_ms"] = round(
                max(lat_ms - floor_ms, 0.0), 1)
            long_ms = bench_inpaint_latency(model_bottom, vars_bottom,
                                            long_sound=True) * 1e3
            extra["inpaint_long2x_latency_p50_ms"] = round(long_ms, 1)
            # serving /get-audio hot path: decode + iSTFT, one dispatch
            extra["decode_to_audio_p50_ms"] = round(
                bench_decode_audio() * 1e3, 1)
            # serving /get-spectrogram-image hot path: decode + image
            # math fused in one dispatch + host palette/deflate
            extra["decode_to_image_p50_ms"] = round(
                bench_decode_image() * 1e3, 1)
        except Exception as e:  # pragma: no cover
            extra["inpaint_latency_error"] = repr(e)[:200]
    if not os.environ.get("BENCH_SKIP_VQVAE"):
        try:
            extra["vqvae_encode_specs_per_sec"] = round(bench_vqvae(), 1)
        except Exception as e:  # pragma: no cover
            extra["vqvae_bench_error"] = repr(e)[:200]
    if not os.environ.get("BENCH_SKIP_TRAIN"):
        try:
            extra["vqvae_train_specs_per_sec"] = round(
                bench_vqvae_train(), 1)
            extra["prior_train_tokens_per_sec"] = round(
                bench_prior_train(), 1)
            # B=64/B=128 reported separately for the scaling story
            # (reference recipe default is 32; with fused attention the
            # [B,H,516,516] scores are never materialized, so B=128
            # fits without remat — measured 200.2k tok/s on v5e-1)
            extra["prior_train_tokens_per_sec_b64"] = round(
                bench_prior_train(64), 1)
            extra["prior_train_tokens_per_sec_b128"] = round(
                bench_prior_train(128), 1)
            # VQ-VAE train step time grows sub-linearly in batch
            # (measured 1445.7/s at B=64, 3665.1 at B=256, 4421.9 at
            # B=512)
            extra["vqvae_train_specs_per_sec_b256"] = round(
                bench_vqvae_train(256), 1)
            # the reference's heaviest criterion, now executable on the
            # TPU backend (round-4: real-arithmetic DFT STFT/iSTFT)
            extra["spectral_train_specs_per_sec"] = round(
                bench_spectral_train(), 1)
        except Exception as e:  # pragma: no cover
            extra["train_bench_error"] = repr(e)[:200]
    extra["bench_wall_seconds"] = round(time.time() - t_start, 1)
    print(json.dumps({
        "metric": "bottom_prior_ar_sampling_throughput",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(tokens_per_sec / TARGET_TOKENS_PER_SEC, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
