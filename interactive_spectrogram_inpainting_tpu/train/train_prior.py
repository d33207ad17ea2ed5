"""Prior trainer CLI (train_autoregressive_model.py equivalent).

Reference (``/root/reference/train_autoregressive_model.py``): trains the
top (self-conditional, masked-source) or bottom (top-conditioned) prior
on stored codemaps with label-smoothed cross-entropy, token accuracy and
— for masked models — the constraint-satisfaction ratio
(``train_autoregressive_model.py:106-116,265-273``). Multi-GPU there is
``nn.DataParallel`` (``train_autoregressive_model.py:145``); here
``main()`` builds a ``('data','model')`` mesh, shards every batch over
the ``data`` axis and the attention-head/FFN parameters over ``model``
(``parallel.mesh.prior_param_shardings``), and XLA inserts the ICI
collectives — see ``tests/test_train_spmd.py`` for the device-count
invariance contract.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import time
from datetime import datetime
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.codemap_store import CodemapDataset
from ..parallel.mesh import (data_sharding, make_mesh,
                             prior_param_shardings, replicated_sharding)
from ..models.prior.masks import (BernoulliSequenceMask,
                                  ContiguousZonesSequenceMask,
                                  SequenceMask,
                                  UniformMaskedAmountSequenceMask,
                                  UniformProbabilityBernoulliSequenceMask)
from ..models.prior.transformer import (SelfAttentiveVQTransformer,
                                        TransformerConfig,
                                        UpsamplingVQTransformer,
                                        VQNSynthTransformer, save_model)
from ..utils.metrics import MetricsWriter
from .checkpoint import Checkpointer
from .losses import label_smoothing_loss
from .scheduler import get_optimizer


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_type", type=str, default="transformer",
                   choices=["transformer"])
    p.add_argument("--hier", type=str, required=True,
                   choices=["top", "bottom"])
    p.add_argument("--database_path", type=str, required=True,
                   help="CodemapStore directory (replaces the LMDB path)")
    p.add_argument("--validation_database_path", type=str, default=None)
    p.add_argument("--num_training_epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--optimizer", type=str, default="adam",
                   choices=["adam", "radam"])
    p.add_argument("--optimizer_eps", type=float, default=1e-8,
                   help="Adam/RAdam epsilon (reference "
                        "train_autoregressive_model.py:393,629)")
    p.add_argument("--scheduler", type=str, default=None,
                   choices=[None, "cycle", "warmup-cosine"])
    p.add_argument("--num_warmup_steps", type=int, default=None,
                   help="warmup-cosine warmup length (reference "
                        "train_autoregressive_model.py:431,661; default: "
                        "2%% of the total step count)")
    p.add_argument("--label_smoothing", type=float, default=0.0)
    p.add_argument("--clip_grad_norm", type=float, default=None)
    p.add_argument("--n_class", type=int, default=None,
                   help="codebook vocabulary; default: read from the codes store (falls back to the reference's 512)")
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--embeddings_dim", type=int, default=32)
    p.add_argument("--positional_embeddings_dim", type=int, default=16)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--num_encoder_layers", type=int, default=6)
    p.add_argument("--num_decoder_layers", type=int, default=8)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--d_ff", type=int, default=2048)
    p.add_argument("--use_aligned_decoder", action="store_true")
    p.add_argument("--use_identity_memory_mask", action="store_true")
    p.add_argument("--classes_for_conditioning", type=str, nargs="*",
                   default=["pitch", "instrument_family_str"])
    p.add_argument("--class_conditioning_embedding_dim", type=int,
                   default=64)
    p.add_argument("--class_conditioning_prepend_to_dummy_input",
                   action="store_true", default=True)
    p.add_argument("--positional_class_conditioning", action="store_true")
    p.add_argument("--mask_sampler", type=str, default="uniform-probability",
                   choices=["bernoulli", "uniform-probability",
                            "uniform-amount", "contiguous-zones"])
    p.add_argument("--mask_probability", type=float, default=0.5)
    p.add_argument("--mask_probability_range", type=float, nargs=2,
                   default=[0.0, 1.0],
                   help="p ~ U[low, high] for the uniform-probability "
                        "sampler (reference "
                        "--random_p_bernoulli_p_range, "
                        "train_autoregressive_model.py:452,687-690)")
    p.add_argument("--mask_min_masking_ratio", type=float, default=0.0)
    p.add_argument("--num_training_samples", type=int, default=None)
    p.add_argument("--evaluate_only", action="store_true")
    # reference debug harnesses (train_autoregressive_model.py:456-464);
    # see make_steps for semantics
    p.add_argument("--drop_loss_half_DEBUG", action="store_true")
    p.add_argument("--train_num_steps_sequences_DEBUG", type=int,
                   default=None)
    p.add_argument("--initial_weights_path", type=str, default=None)
    p.add_argument("--initial_model_parameters_path", type=str, default=None)
    p.add_argument("--resume_training_from", type=str, default=None)
    p.add_argument("--validation_frequency", type=int, default=1)
    p.add_argument("--save_frequency", type=int, default=1)
    p.add_argument("--train_logs_frequency_batches", type=int, default=10)
    p.add_argument("--disable_writes_to_disk", action="store_true")
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("--runs_directory", type=str, default="runs")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder/decoder layers in the "
                        "backward pass (jax.checkpoint): ~1/3 more "
                        "FLOPs for O(1) layer-activation HBM — the "
                        "flagship prior OOMs a 16GB v5e at batch 128 "
                        "without it")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 forward/backward (replaces apex AMP, "
                        "reference train_autoregressive_model.py:631-632)")
    p.add_argument("--fused_attention", choices=["auto", "on", "off"],
                   default="auto",
                   help="fused Pallas training attention (keeps the "
                        "[B,H,L,L] score matrices out of HBM — the "
                        "profiled train-step bandwidth bottleneck). "
                        "'auto' enables it on accelerator backends and "
                        "leaves the dense XLA path on CPU")
    p.add_argument("--dropout_rng", choices=["auto", "threefry", "rbg"],
                   default="auto",
                   help="PRNG impl for dropout masks. 'rbg' generates "
                        "the bits with the TPU hardware RNG (XLA "
                        "RngBitGenerator) — after attention fusion the "
                        "threefry mask generation is the largest "
                        "non-matmul cost. Still seeded from --seed; "
                        "'auto' = rbg on accelerators, threefry on CPU")
    p.add_argument("--num_devices_data", type=int, default=None,
                   help="data-parallel mesh size (default: largest device "
                        "count dividing the batch)")
    p.add_argument("--num_devices_model", type=int, default=1,
                   help="tensor-parallel mesh size (heads/FFN sharded)")
    p.add_argument("--profile", action="store_true",
                   help="write a jax.profiler trace for the first "
                        "epoch (same contract as train_vqvae)")
    p.add_argument("--watchdog_timeout_s", type=float, default=0.0,
                   help="abort (exit 42, for scheduler restart from the "
                        "orbax checkpoint) if no training step completes "
                        "within this many seconds; 0 = off")
    p.add_argument("--seed", type=int, default=0,
                   help="seeds params init, dropout/mask streams AND the "
                        "per-epoch shuffle (seed sweeps get distinct "
                        "data orders, not just distinct init)")
    return p


def make_mask_sampler(name: str, sequence_length: int, mask_token: int,
                      probability: float, min_ratio: float,
                      probability_range=(0.0, 1.0)) -> SequenceMask:
    if name == "bernoulli":
        return BernoulliSequenceMask(probability, sequence_length,
                                     mask_token)
    if name == "uniform-probability":
        low, high = probability_range
        return UniformProbabilityBernoulliSequenceMask(
            low, high, sequence_length, mask_token)
    if name == "uniform-amount":
        return UniformMaskedAmountSequenceMask(min_ratio, sequence_length,
                                               mask_token)
    if name == "contiguous-zones":
        return ContiguousZonesSequenceMask(min_ratio, sequence_length,
                                           mask_token)
    raise ValueError(name)


def build_model(args, dataset: CodemapDataset):
    top_shape = dataset.top_shape
    bottom_shape = dataset.bottom_shape
    modalities = None
    dims = None
    if args.classes_for_conditioning:
        modalities = {}
        dims = {}
        for name in args.classes_for_conditioning:
            encoder = dataset.label_encoders.get(name)
            modalities[name] = (len(encoder) if encoder else 128)
            dims[name] = args.class_conditioning_embedding_dim
    n_class = args.n_class
    if n_class is None:
        # size the vocabulary from the store (recorded at extraction);
        # the reference hardcodes 512 (train_autoregressive_model.py:532)
        # which silently mismatches non-512 VQ-VAEs
        nt = getattr(dataset, "n_class_top", None)
        nb = getattr(dataset, "n_class_bottom", None)
        if args.hier == "top":
            n_class = nt
        else:
            # target vocab = bottom codebook; the SOURCE embedding table
            # (sized n_class + 1) must also hold the top codemap's
            # indices — a single-n_class config cannot express
            # n_class_top > n_class_bottom
            if nt is not None and nb is not None and nt > nb:
                raise SystemExit(
                    f"store has unequal codebooks (top {nt} > bottom "
                    f"{nb}); the bottom prior's single vocabulary "
                    f"cannot cover both — pass --n_class {nt} "
                    f"explicitly (wastes {nt - nb} logits) or retrain "
                    f"the VQ-VAE with equal codebooks")
            n_class = nb
        if n_class is None:
            n_class = 512
            print("store records no n_class; defaulting to 512 "
                  "(pass --n_class to override)")
        else:
            print(f"n_class={n_class} (from the codes store)")
    common = dict(
        n_class=n_class, d_model=args.d_model,
        embeddings_dim=args.embeddings_dim,
        positional_embeddings_dim=args.positional_embeddings_dim,
        dropout=args.dropout,
        class_conditioning_num_classes_per_modality=modalities,
        class_conditioning_embedding_dim_per_modality=dims,
        class_conditioning_prepend_to_dummy_input=(
            args.class_conditioning_prepend_to_dummy_input),
        positional_class_conditioning=args.positional_class_conditioning,
        conditional_model_num_encoder_layers=args.num_encoder_layers,
        conditional_model_num_decoder_layers=args.num_decoder_layers,
        conditional_model_nhead=args.num_heads, d_ff=args.d_ff,
        use_identity_memory_mask=args.use_identity_memory_mask,
        remat=args.remat,
        fused_attention=(args.fused_attention == "on"
                         or (args.fused_attention == "auto"
                             and jax.default_backend() != "cpu")),
    )
    if args.hier == "top":
        config = TransformerConfig(shape=tuple(top_shape),
                                   condition_shape=tuple(top_shape),
                                   self_conditional_model=True, **common)
        return SelfAttentiveVQTransformer(config)
    config = TransformerConfig(shape=tuple(bottom_shape),
                               condition_shape=tuple(top_shape),
                               use_aligned_decoder=args.use_aligned_decoder,
                               **common)
    return UpsamplingVQTransformer(config)


def make_steps(model: VQNSynthTransformer, optimizer, hier: str,
               mask_sampler: Optional[SequenceMask], label_smoothing: float,
               bf16: bool = False, rbg_dropout: bool = False,
               drop_loss_half: bool = False,
               loss_num_steps: Optional[int] = None):
    """``drop_loss_half``/``loss_num_steps`` are the reference's
    ``--drop_loss_half_DEBUG``/``--train_num_steps_sequences_DEBUG``
    loss restrictions (``train_autoregressive_model.py:235-252``): the
    LOSS averages only the first ``loss_num_steps`` flattened sequence
    positions, or only the first half of the codemap columns in time
    (silence-heavy tails); accuracy/constraints stay full-map, as in the
    reference. (The reference's third debug flag,
    ``--disable_start_symbol_DEBUG``, is stored on its transformer but
    never read — ``priors/transformer.py:102,172`` — so it is not
    reproduced here.)"""
    cfg = model.config
    tgt_helper = cfg.target_codemaps_helper()
    src_helper = cfg.source_codemaps_helper()
    loss_step_weights = None
    if loss_num_steps is not None:
        loss_step_weights = (np.arange(tgt_helper.sequence_length)
                             < int(loss_num_steps)).astype(np.float32)
    elif drop_loss_half:
        loss_step_weights = (tgt_helper.positions()[:, 1]
                             < tgt_helper.duration // 2).astype(np.float32)

    def forward_loss(params, rng, tops, bottoms, class_conditioning,
                     deterministic):
        if bf16:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
        drop_rng, mask_rng = jax.random.split(rng)
        if rbg_dropout and not deterministic:
            # Dropout masks dominate the step's non-matmul HLO once
            # attention is fused (threefry on [B, 516, d_ff] per layer).
            # Re-key the dropout stream with the hardware-RNG impl
            # (XLA RngBitGenerator): bits are still deterministic in the
            # incoming threefry key and invariant under SPMD sharding
            # (tested), but generated by the TPU PRNG instruction instead
            # of ~30 u32 vector ops per element. Mask/eval streams stay
            # threefry so golden tests and resume semantics are unchanged.
            drop_rng = jax.random.wrap_key_data(
                jax.random.bits(drop_rng, (4,), jnp.uint32), impl="rbg")
        if hier == "top":
            target_map = tops
            mask_seq = mask_sampler.sample_mask(
                mask_rng, batch_size=tops.shape[0])
            mask = src_helper.to_time_frequency_map(mask_seq)
            condition_map = tops
        else:
            target_map = bottoms
            condition_map = tops
            mask = None
        src_seq, tgt_seq = model.apply(
            {"params": params}, target_map, condition_map,
            class_conditioning=class_conditioning, mask=mask,
            method=VQNSynthTransformer.to_sequences)
        logits, _ = model.apply(
            {"params": params}, tgt_seq, src_seq,
            deterministic=deterministic,
            rngs={"dropout": drop_rng})
        targets = tgt_helper.to_sequence(target_map)
        # per-sample metrics [B]: the scalar training loss is their mean,
        # and exact-count eval weights them by a validity vector.
        # bf16 logits go to the loss as-is: label_smoothing_loss reduces
        # in f32 without materializing an f32 [B, L, n_class] cast (the
        # biggest remaining HBM write block in the round-4 roofline).
        per_token = label_smoothing_loss(logits, targets,
                                         smoothing=label_smoothing,
                                         reduction="none")
        if loss_step_weights is not None:
            w = jnp.asarray(loss_step_weights)
            per_sample_loss = jnp.sum(per_token * w, axis=1) / jnp.sum(w)
        else:
            per_sample_loss = jnp.mean(per_token, axis=1)
        loss = jnp.mean(per_sample_loss)
        predictions = jnp.argmax(logits, axis=-1)
        accuracy = jnp.mean(predictions == targets, axis=1)
        metrics = {"loss": per_sample_loss, "accuracy": accuracy}
        if hier == "top":
            # constraint satisfaction: kept (unmasked) tokens correctly
            # re-predicted (reference :106-116)
            unmasked = jnp.logical_not(mask_seq)
            satisfied = jnp.sum(
                (predictions == targets) * unmasked, axis=1) / jnp.maximum(
                jnp.sum(unmasked, axis=1), 1)
            metrics["satisfied_constraints"] = satisfied
        return loss, metrics

    @jax.jit
    def train_step(params, opt_state, rng, tops, bottoms,
                   class_conditioning):
        grads, metrics = jax.grad(forward_loss, has_aux=True)(
            params, rng, tops, bottoms, class_conditioning, False)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        return params, opt_state, metrics

    @jax.jit
    def eval_step(params, rng, tops, bottoms, class_conditioning,
                  weights):
        """Exact-count eval: returns (weighted metric SUMS, valid count).
        Padding rows (weight 0) contribute nothing; the caller divides
        accumulated sums by the accumulated count, so the result is the
        exact per-sample mean regardless of batch-size remainders
        (reference ``DistributedEvalSampler``,
        ``utils/distributed.py:13-22``)."""
        _, metrics = forward_loss(params, rng, tops, bottoms,
                                  class_conditioning, True)
        sums = {k: jnp.sum(v * weights) for k, v in metrics.items()}
        return sums, jnp.sum(weights)

    return train_step, eval_step


def iterate_batches(dataset: CodemapDataset, batch_size: int,
                    shuffle: bool, epoch: int,
                    limit: Optional[int] = None, seed: int = 0,
                    include_remainder: bool = False):
    """Yield (tops, bottoms, class_conditioning, weights) batches.

    ``weights`` is a float32 [batch_size] validity vector: 1.0 for real
    samples, 0.0 for padding. Training drops the remainder (all-ones
    weights); with ``include_remainder=True`` the final partial batch is
    zero-padded to ``batch_size`` and its padding rows carry weight 0 —
    the exact-count eval semantics of the reference's
    ``DistributedEvalSampler`` (``utils/distributed.py:13-22``), which
    neither pads nor drops."""
    n = len(dataset) if limit is None else min(limit, len(dataset))
    order = (np.random.default_rng([seed, epoch]).permutation(n) if shuffle
             else np.arange(n))
    stop = n + 1 if include_remainder else n - batch_size + 1
    for start in range(0, stop, batch_size):
        idx = order[start:start + batch_size]
        if len(idx) == 0:
            break
        tops, bottoms, attrs = dataset.read_batch(idx)
        weights = np.ones(batch_size, np.float32)
        if len(idx) < batch_size:
            pad = batch_size - len(idx)
            weights[len(idx):] = 0.0
            tops = np.concatenate(
                [tops, np.zeros((pad,) + tops.shape[1:], tops.dtype)])
            bottoms = np.concatenate(
                [bottoms,
                 np.zeros((pad,) + bottoms.shape[1:], bottoms.dtype)])
            attrs = {k: np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                for k, v in attrs.items()}
        yield (jnp.asarray(tops), jnp.asarray(bottoms),
               {k: jnp.asarray(v) for k, v in attrs.items()},
               jnp.asarray(weights))


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    # cross-host rendezvous (no-op single-process): the reference's
    # torch.distributed env init (train_vqvae.py:431-437) equivalent
    from ..parallel.distributed import initialize_multihost, maybe_watchdog
    initialize_multihost()
    args = make_parser().parse_args(argv)
    run_id = (datetime.now().strftime("%Y%m%d-%H%M%S")
              + f"-prior-{args.hier}")
    run_dir = pathlib.Path(args.runs_directory) / run_id

    from ..data.lmdb_compat import open_codes_dataset
    dataset = open_codes_dataset(args.database_path,
                                 classes_for_conditioning=(
                                     args.classes_for_conditioning))
    valid_dataset = (open_codes_dataset(args.validation_database_path,
                                        classes_for_conditioning=(
                                            args.classes_for_conditioning))
                     if args.validation_database_path else None)

    if args.initial_model_parameters_path:
        # warm start rebuilds the DONOR's architecture from its stored
        # config (CLI arch flags would silently diverge from the loaded
        # weights otherwise)
        cfg = TransformerConfig.from_json(
            pathlib.Path(args.initial_model_parameters_path).read_text())
        cfg = dataclasses.replace(
            cfg, remat=args.remat,
            fused_attention=(args.fused_attention == "on"
                             or (args.fused_attention == "auto"
                                 and jax.default_backend() != "cpu")))
        model = (SelfAttentiveVQTransformer(cfg) if args.hier == "top"
                 else UpsamplingVQTransformer(cfg))
    else:
        model = build_model(args, dataset)
    cfg = model.config

    tops0, bottoms0, attrs0 = dataset.read_batch([0])
    cc0 = {k: jnp.asarray(v) for k, v in attrs0.items()}
    target0 = jnp.asarray(tops0 if args.hier == "top" else bottoms0)
    # jitted init: eager flax init dispatches ops one by one, which on a
    # remote/tunneled backend costs a round trip each (minutes of
    # startup for the full model)
    import functools
    variables = jax.jit(functools.partial(
        model.init, method=VQNSynthTransformer.full_init))(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(args.seed + 1)},
        target0, jnp.asarray(tops0), class_conditioning=cc0)
    params = variables["params"]
    if args.initial_weights_path:
        from flax import serialization
        blob = pathlib.Path(args.initial_weights_path).read_bytes()
        params = serialization.from_bytes(
            {"params": params}, blob)["params"]

    if len(dataset) < args.batch_size:
        raise SystemExit(
            f"dataset has {len(dataset)} records, fewer than "
            f"--batch_size {args.batch_size}: no full batch to train on")
    steps_per_epoch = max(1, len(dataset) // args.batch_size)
    total_steps = steps_per_epoch * args.num_training_epochs
    tx = [optax.clip_by_global_norm(args.clip_grad_norm)] \
        if args.clip_grad_norm else []
    # --scheduler cycle also cycles b1 inversely to the LR (the
    # reference CycleScheduler's momentum half)
    optimizer = optax.chain(*tx, get_optimizer(
        args.optimizer, args.scheduler, args.lr, total_steps,
        warmup_steps=args.num_warmup_steps or 0,
        eps=args.optimizer_eps))
    # opt_state is initialized AFTER the tensor-parallel device_put so
    # the moment buffers inherit the param shardings

    mask_sampler = None
    if args.hier == "top":
        mask_sampler = make_mask_sampler(
            args.mask_sampler, cfg.source_sequence_length,
            cfg.mask_token_index, args.mask_probability,
            args.mask_min_masking_ratio,
            probability_range=tuple(args.mask_probability_range))

    rbg_dropout = (args.dropout_rng == "rbg"
                   or (args.dropout_rng == "auto"
                       and jax.default_backend() != "cpu"))
    train_step, eval_step = make_steps(
        model, optimizer, args.hier, mask_sampler, args.label_smoothing,
        bf16=args.bf16, rbg_dropout=rbg_dropout,
        drop_loss_half=args.drop_loss_half_DEBUG,
        loss_num_steps=args.train_num_steps_sequences_DEBUG)

    # SPMD: batches sharded over 'data', params over 'model' (replicated
    # when --num_devices_model=1); mirrors train_vqvae.py:325-340
    n_model = args.num_devices_model
    n_data = args.num_devices_data
    if n_data is None:
        n_data = max(1, len(jax.devices()) // n_model)
        while args.batch_size % n_data:
            n_data -= 1
    elif args.batch_size % n_data:
        raise SystemExit(f"--num_devices_data {n_data} must divide "
                         f"--batch_size {args.batch_size}")
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    batch_sharding = data_sharding(mesh)
    params = jax.device_put(params, prior_param_shardings(mesh, params))
    # moment buffers are zeros_like(params) -> re-init so they inherit
    # the tensor-parallel shardings
    opt_state = optimizer.init(params)

    def put_batch(tops, bottoms, cc):
        return (jax.device_put(tops, batch_sharding),
                jax.device_put(bottoms, batch_sharding),
                {k: jax.device_put(v, batch_sharding)
                 for k, v in cc.items()})

    writes = not (args.disable_writes_to_disk or args.dry_run)
    writer = MetricsWriter(run_dir / "tb", enabled=writes)
    checkpointer = None
    start_epoch = 0
    if writes:
        checkpointer = Checkpointer(run_dir, args.save_frequency)
        checkpointer.store_command_line_parameters(vars(args))
        checkpointer.store_model_parameters(cfg.to_json())
    if args.resume_training_from:
        resume = Checkpointer(args.resume_training_from)
        state, start_epoch = resume.restore(
            {"params": params, "opt_state": opt_state})
        # orbax restores arrays committed to one device; re-place params
        # under the tensor-parallel shardings and each optimizer moment
        # under the sharding the pre-restore template (built from the
        # already-placed params) carries
        new_params = jax.device_put(
            state["params"], prior_param_shardings(mesh, state["params"]))
        opt_state = jax.tree_util.tree_map(
            lambda restored, ref: jax.device_put(
                restored,
                ref.sharding
                if isinstance(ref.sharding, jax.sharding.NamedSharding)
                else replicated_sharding(mesh)),
            state["opt_state"], opt_state)
        params = new_params
        start_epoch += 1

    rng = jax.random.PRNGKey(args.seed)
    global_step = start_epoch * steps_per_epoch

    def run_eval(params, rng):
        # exact-count semantics: every sample (including the batch-size
        # remainder, zero-weight-padded) contributes exactly once
        sums: Dict[str, float] = {}
        count = 0.0
        source = valid_dataset if valid_dataset is not None else dataset
        for tops, bottoms, cc, w in iterate_batches(
                source, args.batch_size, False, 0,
                limit=args.num_training_samples,
                include_remainder=True):
            rng, r = jax.random.split(rng)
            tops, bottoms, cc = put_batch(tops, bottoms, cc)
            w = jax.device_put(w, batch_sharding)
            m, c = eval_step(params, r, tops, bottoms, cc, w)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += float(c)
            if args.dry_run:
                break
        return {k: v / max(count, 1e-9) for k, v in sums.items()}

    if args.evaluate_only:
        metrics = run_eval(params, rng)
        print("evaluation:", json.dumps(metrics, indent=2))
        return metrics

    profiler_active = False
    watchdog = maybe_watchdog(args.watchdog_timeout_s)
    for epoch in range(start_epoch, args.num_training_epochs):
        t0 = time.time()
        if args.profile and epoch == start_epoch and writes:
            jax.profiler.start_trace(str(run_dir / "profile"))
            profiler_active = True
        for tops, bottoms, cc, _ in iterate_batches(
                dataset, args.batch_size, True, epoch,
                limit=args.num_training_samples, seed=args.seed):
            rng, r = jax.random.split(rng)
            tops, bottoms, cc = put_batch(tops, bottoms, cc)
            params, opt_state, metrics = train_step(
                params, opt_state, r, tops, bottoms, cc)
            if watchdog is not None:
                watchdog.pet()
            if global_step % args.train_logs_frequency_batches == 0:
                writer.scalars(f"{args.hier}/training", metrics,
                               global_step)
            global_step += 1
            if args.dry_run:
                break
        if profiler_active:
            jax.profiler.stop_trace()
            profiler_active = False
        msg = (f"epoch {epoch}: {time.time() - t0:.1f}s "
               f"loss={float(metrics['loss']):.4f} "
               f"acc={float(metrics['accuracy']):.3f}")
        if "satisfied_constraints" in metrics:
            msg += (f" constraints="
                    f"{float(metrics['satisfied_constraints']):.3f}")
        print(msg)

        validation_loss = None
        if epoch % args.validation_frequency == 0:
            rng, r = jax.random.split(rng)
            val = run_eval(params, r)
            validation_loss = val.get("loss")
            writer.scalars(f"{args.hier}/validation", val, global_step)

        # target-vs-predicted codemap success-map figure (reference
        # train_autoregressive_model.py:308-346)
        if writes and epoch % args.validation_frequency == 0:
            try:
                tops_f, bottoms_f, cc_f, _ = next(iterate_batches(
                    dataset, args.batch_size, False, 0))
                target_map = tops_f if args.hier == "top" else bottoms_f
                helper = cfg.target_codemaps_helper()
                src_seq, tgt_seq = model.apply(
                    {"params": params}, target_map,
                    tops_f, class_conditioning=cc_f,
                    method=VQNSynthTransformer.to_sequences)
                logits, _ = model.apply({"params": params}, tgt_seq,
                                        src_seq)
                pred = helper.to_time_frequency_map(
                    jnp.argmax(logits, axis=-1))
                from ..utils.visualization import (
                    plot_prediction_success_map)
                fig = plot_prediction_success_map(
                    np.asarray(target_map)[0], np.asarray(pred)[0])
                media = writer.directory / "media"
                media.mkdir(exist_ok=True)
                fig.savefig(media / f"codemap_prediction-{epoch}.png")
            except Exception as e:
                print(f"codemap figure failed: {e!r}")

        if checkpointer is not None:
            checkpointer.save(epoch, {"params": params,
                                      "opt_state": opt_state},
                              validation_loss)
            save_model(run_dir, cfg, {"params": params},
                       prefix=args.hier)
        if args.dry_run:
            print("dry run complete")
            break

    if watchdog is not None:
        watchdog.stop()
    writer.close()
    if checkpointer is not None:
        checkpointer.close()
    return params


if __name__ == "__main__":
    main()
