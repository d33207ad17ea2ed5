"""VQ-VAE trainer CLI — SPMD pjit replacement for the reference's DDP
trainer (``/root/reference/train_vqvae.py``).

The reference launches one process per GPU, wraps the model in DDP and
pays NCCL all-reduces + explicit barriers. Here a single SPMD program is
jitted over a ('data', 'model') mesh: batches sharded over 'data',
parameters replicated, gradients reduced by XLA collectives over ICI;
the wav -> spectrogram transform runs inside the jitted step; the EMA
codebook updates see the GLOBAL batch (strictly stronger than the
reference's per-replica DDP buffers — SURVEY.md section 7.3).

CLI flags mirror ``train_vqvae.py:447-546`` (same names/semantics for
everything reachable in the reference pipeline, including ``--dry_run``'s
one-step smoke mode and the normalization-statistics workflow).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import pathlib
import time
from datetime import datetime
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loader import BatchLoader
from ..data.nsynth import NSynth
from ..models.vqvae import VQVAE, VQVAEConfig
from ..models.vqvae.vqvae import save_model
from ..parallel.mesh import (data_sharding, is_master_process, make_mesh,
                             replicated_sharding)
from ..signal.normalizer import DataNormalizer
from ..signal.spectrogram import (get_spectrograms_helper,
                                  make_masked_phase_transform)
from ..utils.metrics import MetricsWriter
from .checkpoint import Checkpointer
from .losses import (get_reconstruction_criterion,
                     make_reconstruction_metrics, mse_loss)
from .scheduler import get_optimizer


class StoreDictKeyPair(argparse.Action):
    """--resolution_factors top=2,bottom=4 (reference
    ``train_vqvae.py:439-445``)."""

    def __call__(self, parser, namespace, values, option_string=None):
        d = {}
        for kv in values.split(","):
            k, v = kv.split("=")
            d[k] = int(v)
        setattr(namespace, self.dest, d)


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--resolution_factors", action=StoreDictKeyPair,
                   default={"top": 2, "bottom": 2})
    p.add_argument("--fs_hz", type=int, default=16000)
    p.add_argument("--window_length", type=int, default=2048)
    p.add_argument("--n_fft", type=int, default=2048)
    p.add_argument("--hop_length", type=int, default=512)
    p.add_argument("--use_local_kernels", action="store_true")
    p.add_argument("--num_embeddings", type=int, default=512)
    p.add_argument("--disable_quantization", action="store_true")
    p.add_argument("--restarts_usage_threshold", type=float, default=1.0)
    p.add_argument("--embeddings_dimension", type=int, default=64)
    p.add_argument("--num_hidden_channels", type=int, default=128)
    p.add_argument("--num_residual_channels", type=int, default=32)
    p.add_argument("--num_residual_blocks", type=int, default=2)
    p.add_argument("--num_training_epochs", type=int, default=560)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--latent_loss_weight", type=float, default=0.25)
    p.add_argument("--clip_grad_norm", type=float, default=None)
    p.add_argument("--dataset", type=str, default="nsynth",
                   choices=["nsynth", "imagenet"],
                   help="reference CLI parity; only the nsynth path is "
                        "exercised by the pipeline (SURVEY.md)")
    p.add_argument("--dataset_type", type=str, default="wav",
                   choices=["wav", "hdf5"])
    p.add_argument("--use_mel_scale", action="store_true")
    p.add_argument("--mel_scale_lower_edge_hertz", type=float, default=0.0)
    p.add_argument("--mel_scale_upper_edge_hertz", type=float,
                   default=16000 / 2.0)
    p.add_argument("--mel_scale_break_frequency_hertz", type=float,
                   default=700.0)
    p.add_argument("--mel_scale_expand_resolution_factor", type=float,
                   default=1.5)
    p.add_argument("--normalize_input_images", action="store_true")
    p.add_argument("--valid_pitch_range", type=int, nargs=2,
                   default=[24, 84])
    p.add_argument("--dataset_duration_seconds", type=float, default=4.0)
    p.add_argument("--groups", type=int, default=1)
    p.add_argument("--sched", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--output_spectrogram_threshold", action="store_true")
    p.add_argument("--output_spectrogram_min_magnitude", type=float,
                   default=None)
    p.add_argument("--reconstruction_criterion", type=str, default="mse",
                   choices=["mse", "spectral_ddsp", "spectral_jukebox"])
    # DFT emulation level of the spectral losses (no reference analogue
    # — the reference's arithmetic is set by its fp16 autocast):
    # 'high' = 3-pass bf16 (~1e-6), 'default' = 1-pass (3x fewer
    # loss-kernel FLOPs, ~4e-3), 'highest' = 6-pass XLA path only
    p.add_argument("--spectral_precision", type=str, default="high",
                   choices=["highest", "high", "default"])
    p.add_argument("--dataset_audio_directory_paths", type=str, nargs="+",
                   default=[])
    p.add_argument("--train_dataset_json_data_path", type=str, default=None)
    p.add_argument("--validation_dataset_json_data_path", type=str,
                   default=None)
    p.add_argument("--validation_frequency", type=int, default=1)
    p.add_argument("--save_frequency", type=int, default=1)
    p.add_argument("--train_logs_frequency_batches", type=int, default=1)
    p.add_argument("--disable_writes_to_disk", action="store_true")
    p.add_argument("--disable_tensorboard", action="store_true")
    p.add_argument("--enable_image_dumps", action="store_true",
                   help="every 100 train batches, write per-channel PNG "
                        "grids (input | reconstruction | |diff|) under "
                        "<run>/samples (reference train_vqvae.py:260-284)")
    p.add_argument("--dry_run", action="store_true",
                   help="one train + eval step, no writes")
    p.add_argument("--input_normalization", action="store_true")
    p.add_argument("--precomputed_normalization_statistics", type=str,
                   default=None)
    p.add_argument("--corrupt_codes", type=str, default=None,
                   choices=["bottom", "top", "both"])
    p.add_argument("--corruption_weights", type=float, nargs=3,
                   default=[0.1, 0.8, 0.1])
    p.add_argument("--embeddings_initial_variance", type=float, default=1.0)
    p.add_argument("--resume_training_from", type=str, default=None)
    p.add_argument("--use_resnet", action="store_true")
    p.add_argument("--resnet_layers_per_downsampling_block", type=int,
                   default=4)
    p.add_argument("--resnet_expansion", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--runs_directory", type=str, default="runs")
    p.add_argument("--num_devices_data", type=int, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (replaces torch.cuda.amp)")
    p.add_argument("--profile", action="store_true",
                   help="write a jax.profiler trace for the first epoch")
    p.add_argument("--pallas_vq", action="store_true",
                   help="fused Pallas nearest-codebook lookup")
    p.add_argument("--num_tensorboard_audio_samples", type=int, default=3)
    p.add_argument("--watchdog_timeout_s", type=float, default=0.0,
                   help="abort (exit 42, for scheduler restart from the "
                        "orbax checkpoint) if no training step completes "
                        "within this many seconds; 0 = off")
    return p


def build_config(args) -> VQVAEConfig:
    corruption = {"top": None, "bottom": None}
    if args.corrupt_codes in ("top", "both"):
        corruption["top"] = list(args.corruption_weights)
    if args.corrupt_codes in ("bottom", "both"):
        corruption["bottom"] = list(args.corruption_weights)
    return VQVAEConfig(
        in_channel=2,
        num_hidden_channels=args.num_hidden_channels,
        n_res_block=args.num_residual_blocks,
        num_residual_channels=args.num_residual_channels,
        embed_dim=args.embeddings_dimension,
        num_embeddings=args.num_embeddings,
        groups=args.groups,
        use_local_kernels=args.use_local_kernels,
        output_spectrogram_min_magnitude=(
            args.output_spectrogram_min_magnitude
            if args.output_spectrogram_threshold else None),
        resolution_factors=args.resolution_factors,
        embeddings_initial_variance=args.embeddings_initial_variance,
        corruption_weights=corruption,
        disable_quantization=args.disable_quantization,
        restarts_usage_threshold=args.restarts_usage_threshold,
        use_resnet=args.use_resnet,
        resnet_layers_per_downsampling_block=(
            args.resnet_layers_per_downsampling_block),
        resnet_expansion=args.resnet_expansion,
        use_pallas_lookup=args.pallas_vq,
    )


def make_train_step(model: VQVAE, optimizer, reconstruction_criterion,
                    latent_loss_weight: float, spectrograms_helper,
                    needs_rng: bool, bf16: bool = False,
                    spec_precomputed: bool = False,
                    input_transform=None,
                    reconstruction_metrics=None):
    """jitted SPMD step: (params, codebook, opt_state, audio, rng) ->
    (params, codebook, opt_state, metrics). Shard ``audio`` over the
    mesh 'data' axis and XLA turns the batch reductions (loss mean, EMA
    counts) into ICI collectives — the DDP replacement.

    ``spec_precomputed``: the input is already a spectrogram (the wav ->
    spectrogram transform ran host-side because the backend cannot
    execute complex FFTs — see signal.spectrogram._fft_fallback_device);
    the default keeps the transform fused into the step.

    ``input_transform``: applied to the spectrogram batch INSIDE the jit
    before it is used as model input and loss target — the fused
    equivalent of the reference's ``MaskedPhaseWavToSpectrogramDataLoader``
    (``train_vqvae.py:585-589``), which masks the IF channel of the
    *inputs* when ``--output_spectrogram_threshold`` is set, so the loss
    compares masked output against masked input.

    ``reconstruction_metrics``: optional ``fn(dec, spec) -> dict`` (see
    ``losses.make_reconstruction_metrics``) merged into the returned
    metrics — the reference's per-log-step MSE/DDSP/Jukebox trio
    (``train_vqvae.py:788-795``). Metrics live in the aux output, so
    they add forward FLOPs but nothing to the backward pass; build TWO
    steps (with/without) and dispatch the with-metrics one only at log
    steps to keep non-logged steps at full speed."""

    def loss_fn(params, codebook, spec, rng):
        if bf16:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            spec_in = spec.astype(jnp.bfloat16)
        else:
            spec_in = spec
        rngs = ({"corruption": rng, "restart": rng} if needs_rng else {})
        (dec, diff, perp_t, perp_b, _, _), mutated = model.apply(
            {"params": params, "codebook": codebook}, spec_in, train=True,
            mutable=["codebook"], rngs=rngs)
        recon = reconstruction_criterion(dec.astype(jnp.float32), spec)
        diff = diff.astype(jnp.float32)
        loss = recon + latent_loss_weight * diff
        cfg = model.config
        metrics = {"vqvae_loss": loss, "reconstruction_loss": recon,
                   "latent_loss": diff, "perplexity_top": perp_t,
                   "perplexity_bottom": perp_b,
                   # codebook-health ratios (reference
                   # write_vqvae_scalars_to_tensorboard,
                   # train_vqvae.py:101-130)
                   "perplexity_top_ratio": perp_t / cfg.n_embed_t,
                   "perplexity_bottom_ratio": perp_b / cfg.n_embed_b}
        if reconstruction_metrics is not None:
            metrics.update(reconstruction_metrics(
                dec.astype(jnp.float32), spec))
        return loss, (mutated["codebook"], metrics)

    @jax.jit
    def step(params, codebook, opt_state, audio, rng):
        spec = (audio if spec_precomputed
                else spectrograms_helper.to_spectrogram(audio))
        if input_transform is not None:
            spec = input_transform(spec)
        grads, (new_codebook, metrics) = jax.grad(
            loss_fn, has_aux=True)(params, codebook, spec, rng)
        if bf16:
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_codebook, opt_state, metrics

    return step


def make_eval_step(model: VQVAE, reconstruction_criterion,
                   latent_loss_weight: float, spectrograms_helper,
                   spec_precomputed: bool = False,
                   input_transform=None,
                   reconstruction_metrics=None):
    """Exact-count eval step: per-sample metrics (vmapped model forward)
    weighted by a [B] validity vector, returned as (weighted sums, valid
    count). Zero-padded remainder rows carry weight 0 and contribute
    NOTHING — the caller divides accumulated sums by the accumulated
    count, giving the exact per-sample mean the reference's
    ``DistributedEvalSampler`` computes (``utils/distributed.py:13-22``;
    neither padded nor dropped). Perplexities are likewise per-sample
    (each sample's own code-usage entropy, averaged)."""

    def per_sample(params, codebook, spec1):
        spec1 = spec1[None]
        dec, diff, perp_t, perp_b, _, _ = model.apply(
            {"params": params, "codebook": codebook}, spec1)
        recon = reconstruction_criterion(dec, spec1)
        mse = mse_loss(dec, spec1)
        loss = recon + latent_loss_weight * diff
        metrics = {"vqvae_loss": loss, "reconstruction_loss": recon,
                   "latent_loss": diff, "mse": mse,
                   "perplexity_top": perp_t, "perplexity_bottom": perp_b}
        if reconstruction_metrics is not None:
            metrics.update(reconstruction_metrics(dec, spec1))
        return metrics

    @jax.jit
    def step(params, codebook, audio, weights):
        spec = (audio if spec_precomputed
                else spectrograms_helper.to_spectrogram(audio))
        if input_transform is not None:
            spec = input_transform(spec)
        metrics = jax.vmap(per_sample, in_axes=(None, None, 0))(
            params, codebook, spec)
        sums = {k: jnp.sum(v * weights) for k, v in metrics.items()}
        return sums, jnp.sum(weights)

    return step


def dump_image_samples(directory, epoch: int, batch_index: int,
                       spec, dec, sample_size: int = 25) -> None:
    """Per-channel PNG grids — input row, reconstruction row, |diff| row
    (reference ``train_vqvae.py:260-284``; one file per channel named
    ``EEEEE_BBBBB_<channel>.png``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    directory.mkdir(parents=True, exist_ok=True)
    spec = np.asarray(spec[:sample_size], np.float32)
    dec = np.asarray(dec[:sample_size], np.float32)
    rows = [spec, dec, np.abs(spec - dec)]
    for ch, name in enumerate(["spectrogram", "instantaneous_frequency"]):
        fig, axes = plt.subplots(3, len(spec),
                                 figsize=(1.2 * len(spec), 3.6),
                                 squeeze=False)
        for r, row in enumerate(rows):
            for i in range(len(spec)):
                axes[r][i].imshow(row[i, ch], origin="lower",
                                  aspect="auto", cmap="viridis")
                axes[r][i].set_axis_off()
        fig.tight_layout()
        fig.savefig(directory
                    / f"{epoch + 1:05d}_{batch_index:05d}_{name}.png")
        plt.close(fig)


def compute_normalization_statistics(spectrograms_helper, loader,
                                     max_batches: int = 50,
                                     input_transform=None):
    """``input_transform`` mirrors the reference: the normalization
    loader is the same (possibly masked-phase) dataloader class
    (``train_vqvae.py:585-589,655-663``), so statistics are computed on
    the masked spectrograms when the threshold is active."""
    from ..signal.spectrogram import _fft_fallback_device
    to_spec = (spectrograms_helper.to_spectrogram
               if _fft_fallback_device() is not None
               else jax.jit(spectrograms_helper.to_spectrogram))

    def batches():
        for i, batch in enumerate(loader):
            if i >= max_batches:
                break
            audio = batch[0] if isinstance(batch, tuple) else batch
            spec = to_spec(jnp.asarray(audio))
            if input_transform is not None:
                spec = input_transform(spec)
            yield np.asarray(spec)

    return DataNormalizer.compute_statistics(batches())


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    # cross-host rendezvous (no-op single-process): the reference's
    # torch.distributed env init (train_vqvae.py:431-437) equivalent
    from ..parallel.distributed import initialize_multihost, maybe_watchdog
    initialize_multihost()
    args = make_parser().parse_args(argv)
    if args.dataset != "nsynth" or args.dataset_type != "wav":
        raise NotImplementedError(
            "only the NSynth wav pipeline is implemented (the reference's "
            "imagenet/hdf5 options are vestigial; SURVEY.md / PARITY.md)")
    run_id = datetime.now().strftime("%Y%m%d-%H%M%S") + "-vqvae"
    run_dir = pathlib.Path(args.runs_directory) / run_id

    spectrograms_helper = get_spectrograms_helper(**vars(args))

    if (args.output_spectrogram_threshold
            and args.output_spectrogram_min_magnitude is None):
        # the reference records spectrograms_helper.safelog_eps as the
        # stored threshold when only the flag is passed
        # (train_vqvae.py:710-712)
        args.output_spectrogram_min_magnitude = (
            spectrograms_helper.safelog_eps)
    # the input half of the masked-phase pipeline: the reference swaps in
    # MaskedPhaseWavToSpectrogramDataLoader (train_vqvae.py:585-589) so
    # training/eval/normalization inputs have sub-threshold IF zeroed,
    # matching the output transform the model applies
    input_transform = (
        make_masked_phase_transform(args.output_spectrogram_min_magnitude)
        if args.output_spectrogram_threshold else None)

    dataset = NSynth(
        args.dataset_audio_directory_paths,
        args.train_dataset_json_data_path,
        valid_pitch_range=tuple(args.valid_pitch_range),
        categorical_field_list=["pitch", "instrument_family_str"],
        sample_rate=args.fs_hz,
        duration_seconds=args.dataset_duration_seconds)
    train_loader = BatchLoader(dataset, args.batch_size, shuffle=True)
    valid_loader = None
    if args.validation_dataset_json_data_path:
        valid_dataset = NSynth(
            args.dataset_audio_directory_paths,
            args.validation_dataset_json_data_path,
            valid_pitch_range=tuple(args.valid_pitch_range),
            categorical_field_list=["pitch", "instrument_family_str"],
            sample_rate=args.fs_hz,
            duration_seconds=args.dataset_duration_seconds)
        valid_loader = BatchLoader(valid_dataset, args.batch_size,
                                   shuffle=False, drop_last=False)

    config = build_config(args)

    # normalization statistics (reference train_vqvae.py:645-676)
    if args.precomputed_normalization_statistics:
        normalizer = DataNormalizer.load_statistics(
            args.precomputed_normalization_statistics)
        config = dataclasses.replace(
            config,
            normalizer_statistics=dataclasses.asdict(normalizer.statistics))
    elif args.input_normalization:
        stats = compute_normalization_statistics(
            spectrograms_helper, train_loader,
            input_transform=input_transform)
        config = dataclasses.replace(
            config, normalizer_statistics=dataclasses.asdict(stats))

    model = VQVAE(config)
    probe_audio = jnp.zeros((2, dataset.num_samples), jnp.float32)
    probe_spec = spectrograms_helper.to_spectrogram(probe_audio)
    # jitted init (eager init = one tunnel round trip per op)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, probe_spec)
    params, codebook = variables["params"], variables["codebook"]

    if len(train_loader) == 0:
        raise SystemExit(
            f"training dataset has {len(dataset)} examples, fewer than "
            f"--batch_size {args.batch_size}: no full batch to train on")
    steps_per_epoch = max(1, len(train_loader))
    total_steps = steps_per_epoch * args.num_training_epochs
    tx = [optax.clip_by_global_norm(args.clip_grad_norm)] \
        if args.clip_grad_norm else []
    # --sched cycle also cycles Adam's b1 inversely to the LR (the
    # reference CycleScheduler's momentum half)
    optimizer = optax.chain(*tx, get_optimizer(
        "adam", args.sched, args.lr, total_steps))
    opt_state = optimizer.init(params)

    criterion = get_reconstruction_criterion(
        args.reconstruction_criterion, spectrograms_helper,
        precision=args.spectral_precision)
    needs_rng = (args.corrupt_codes is not None
                 or args.restarts_usage_threshold < 1.0)
    # On backends without complex-FFT support (axon) the STFT core runs
    # as real-arithmetic DFT matmuls ON the accelerator (rfft_ri), so
    # wav->spectrogram AND the spectral losses (which backprop through
    # to_audio, reference train_vqvae.py:177-179) jit normally. Only a
    # FORCED host fallback (ISI_FFT_ON_CPU=1 / ISI_FFT_DFT=0) moves
    # wav->spectrogram host-side — spectral_* is unexecutable there.
    from ..signal.spectrogram import _fft_fallback_device
    spec_on_host = _fft_fallback_device() is not None
    if spec_on_host:
        print("forced host-side FFT fallback: wav->spectrogram runs "
              "host-side (spectral-loss criteria unavailable)")
        if args.reconstruction_criterion not in ("mse", "MSE", "L2"):
            raise SystemExit(
                "--reconstruction_criterion spectral_* inverts the "
                "spectrogram inside the jitted loss, which the forced "
                "host-FFT fallback cannot execute; unset ISI_FFT_ON_CPU/"
                "ISI_FFT_DFT or use mse")
    train_step = make_train_step(model, optimizer, criterion,
                                 args.latent_loss_weight,
                                 spectrograms_helper, needs_rng,
                                 bf16=args.bf16,
                                 spec_precomputed=spec_on_host,
                                 input_transform=input_transform)
    # the reference's per-log-step metric trio (MSE/DDSP/Jukebox,
    # train_vqvae.py:788-795): a SECOND step executable with the metrics
    # fused into the same dispatch, used only at log steps (and in eval)
    # so non-logged steps keep full speed
    metrics_fn = make_reconstruction_metrics(
        None if spec_on_host else spectrograms_helper)
    train_step_logged = make_train_step(
        model, optimizer, criterion, args.latent_loss_weight,
        spectrograms_helper, needs_rng, bf16=args.bf16,
        spec_precomputed=spec_on_host, input_transform=input_transform,
        reconstruction_metrics=metrics_fn)
    eval_step = make_eval_step(model, criterion, args.latent_loss_weight,
                               spectrograms_helper,
                               spec_precomputed=spec_on_host,
                               input_transform=input_transform,
                               reconstruction_metrics=metrics_fn)

    # SPMD: batches sharded over the mesh 'data' axis, params replicated
    n_data = args.num_devices_data
    if n_data is None:
        # largest device count that divides the batch
        n_data = len(jax.devices())
        while args.batch_size % n_data:
            n_data -= 1
    elif args.batch_size % n_data:
        raise SystemExit(f"--num_devices_data {n_data} must divide "
                         f"--batch_size {args.batch_size}")
    mesh = make_mesh(n_data=n_data)
    batch_sharding = data_sharding(mesh)

    def put_batch(audio):
        if spec_on_host:
            audio = np.asarray(
                spectrograms_helper.to_spectrogram(jnp.asarray(audio)))
        return jax.device_put(jnp.asarray(audio), batch_sharding)

    writes = not (args.disable_writes_to_disk or args.dry_run)
    writer = MetricsWriter(run_dir / "tb", enabled=writes
                           and not args.disable_tensorboard)
    checkpointer = None
    start_epoch = 0
    if writes and is_master_process():
        checkpointer = Checkpointer(run_dir, args.save_frequency)
        checkpointer.store_command_line_parameters(vars(args))
        checkpointer.store_model_parameters(config.to_json())

    if args.resume_training_from:
        resume = Checkpointer(args.resume_training_from)
        state, start_epoch = resume.restore(
            {"params": params, "codebook": codebook,
             "opt_state": opt_state})
        # orbax restores arrays COMMITTED to one device; re-place them
        # replicated over the mesh or the jitted step rejects mixing
        # them with the mesh-sharded batch
        state = jax.device_put(state, replicated_sharding(mesh))
        params, codebook, opt_state = (state["params"], state["codebook"],
                                       state["opt_state"])
        start_epoch += 1
        print(f"resumed from epoch {start_epoch - 1}")

    dump_forward = None
    if args.enable_image_dumps and writes:
        @jax.jit
        def dump_forward(params, codebook, audio):
            spec = (audio if spec_on_host
                    else spectrograms_helper.to_spectrogram(audio))
            if input_transform is not None:
                spec = input_transform(spec)
            dec, *_ = model.apply(
                {"params": params, "codebook": codebook}, spec)
            return spec, dec

    rng = jax.random.PRNGKey(20200117)
    global_step = start_epoch * steps_per_epoch
    profiler_active = False
    watchdog = maybe_watchdog(args.watchdog_timeout_s)
    for epoch in range(start_epoch, args.num_training_epochs):
        train_loader.set_epoch(epoch)
        epoch_start = time.time()
        if args.profile and epoch == start_epoch and writes:
            jax.profiler.start_trace(str(run_dir / "profile"))
            profiler_active = True
        for batch_index, batch in enumerate(train_loader):
            audio = put_batch(batch[0] if isinstance(batch, tuple)
                              else batch)
            rng, step_rng = jax.random.split(rng)
            is_log_step = (global_step
                           % args.train_logs_frequency_batches == 0)
            params, codebook, opt_state, metrics = (
                train_step_logged if is_log_step else train_step)(
                params, codebook, opt_state, audio, step_rng)
            if watchdog is not None:
                watchdog.pet()
            if is_log_step:
                writer.scalars("training", metrics, global_step)
            if dump_forward is not None and batch_index % 100 == 0:
                spec_d, dec_d = dump_forward(params, codebook, audio)
                dump_image_samples(run_dir / "samples", epoch,
                                   batch_index, spec_d, dec_d)
            global_step += 1
            if args.dry_run:
                break
        if profiler_active:
            jax.profiler.stop_trace()
            profiler_active = False
        print(f"epoch {epoch}: {time.time() - epoch_start:.1f}s, "
              f"loss={float(metrics['vqvae_loss']):.4f} "
              f"perp_t={float(metrics['perplexity_top']):.1f} "
              f"perp_b={float(metrics['perplexity_bottom']):.1f}")

        # rich-media dumps (reference add_audio_and_image_samples,
        # train_vqvae.py:373-427): original vs reconstruction audio +
        # mel/IF figure grids
        if (writes and valid_loader is not None
                and args.num_tensorboard_audio_samples > 0):
            try:
                sample_batch = next(iter(valid_loader))
                sample_audio = np.asarray(
                    sample_batch[0] if isinstance(sample_batch, tuple)
                    else sample_batch)[: args.num_tensorboard_audio_samples]
                spec = spectrograms_helper.to_spectrogram(
                    jnp.asarray(sample_audio))
                if input_transform is not None:
                    spec = input_transform(spec)
                dec, *_ = model.apply(
                    {"params": params, "codebook": codebook}, spec)
                rec_audio = np.asarray(
                    spectrograms_helper.to_audio(dec))
                for i in range(len(sample_audio)):
                    writer.audio(f"original/{i}", sample_audio[i],
                                 global_step, args.fs_hz)
                    writer.audio(f"reconstruction/{i}", rec_audio[i],
                                 global_step, args.fs_hz)
                from ..utils.visualization import (
                    plot_mel_representations_batch)
                fig = plot_mel_representations_batch(
                    np.concatenate([np.asarray(spec)[:, 0],
                                    np.asarray(dec)[:, 0]]),
                    np.concatenate([np.asarray(spec)[:, 1],
                                    np.asarray(dec)[:, 1]]),
                    hop_length=args.hop_length, fs_hz=args.fs_hz)
                media = writer.directory / "media"
                media.mkdir(exist_ok=True)
                fig.savefig(media / f"reconstructions-{global_step}.png")
            except Exception as e:  # media dumps must never kill training
                print(f"media dump failed: {e!r}")

        validation_loss = None
        if valid_loader is not None and (epoch % args.validation_frequency
                                         == 0):
            # exact-count semantics: the remainder batch is zero-padded
            # to the compiled batch size with weight-0 rows, so padding
            # contributes nothing and the mean divides by the true count
            sums: Dict[str, float] = {}
            count = 0.0
            for batch in valid_loader:
                audio = batch[0] if isinstance(batch, tuple) else batch
                audio = np.asarray(audio)
                if spec_on_host:
                    audio = np.asarray(
                        spectrograms_helper.to_spectrogram(
                            jnp.asarray(audio)))
                n_real = audio.shape[0]
                weights = np.ones(args.batch_size, np.float32)
                if n_real < args.batch_size:
                    pad = args.batch_size - n_real
                    audio = np.concatenate(
                        [audio, np.zeros((pad,) + audio.shape[1:],
                                         audio.dtype)])
                    weights[n_real:] = 0.0
                # eval is SPMD too: batch + weights sharded over the
                # mesh 'data' axis (an unsharded jnp.asarray would
                # commit the batch to one device and idle the rest)
                m, c = eval_step(
                    params, codebook,
                    jax.device_put(jnp.asarray(audio), batch_sharding),
                    jax.device_put(jnp.asarray(weights), batch_sharding))
                for k, v in m.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                count += float(c)
                if args.dry_run:
                    break
            val_metrics = {k: v / max(count, 1e-9) for k, v in sums.items()}
            validation_loss = val_metrics["vqvae_loss"]
            writer.scalars("validation", val_metrics, global_step)
            print(f"  validation: loss={validation_loss:.4f}")

        if checkpointer is not None:
            state = {"params": params, "codebook": codebook,
                     "opt_state": opt_state}
            checkpointer.save(epoch, state, validation_loss)
            save_model(run_dir, config,
                       {"params": params, "codebook": codebook})
        if args.dry_run:
            print("dry run complete")
            break

    if watchdog is not None:
        watchdog.stop()
    writer.close()
    if checkpointer is not None:
        checkpointer.close()
    return params, codebook


if __name__ == "__main__":
    main()
