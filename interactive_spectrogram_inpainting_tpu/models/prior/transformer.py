"""Autoregressive relative-attention priors over VQ codemaps.

Behavioral equivalent of the reference ``VQNSynthTransformer`` family
(``interactive_spectrogram_inpainting/priors/transformer.py:24-872``):

- ``SelfAttentiveVQTransformer`` (top prior): self-conditional seq2seq —
  an *anti-causal* encoder reads the masked codemap (with a dedicated
  inpainting mask token appended to the source vocabulary,
  ``transformer.py:178-185``), a causal decoder regenerates it;
- ``UpsamplingVQTransformer`` (bottom prior): decoder over the zigzag
  patch-aligned flattening of the bottom codemap, conditioned on the top
  codemap, with optional *aligned* cross-attention restricted to the
  conditioning source cell;
- learned 2-D positional embeddings (frequency x time / intra-patch),
  multi-modal class conditioning injected into the start symbol or every
  position, learned start symbols (one source event, one target patch),
  ``time_indexes`` positional re-indexing for sounds longer than the
  training duration (``transformer.py:598-603``).

TPU-native design: batch-major everywhere (time-major is a torch
artifact), static shapes, and — the headline difference — a **KV-cached
single-step decode path** (``decode_step``) driven by ``lax.scan``; the
reference re-runs its full 8-layer decoder over the whole sequence for
every generated token (``sample.py:268-306``).

Serialization keeps the reference's JSON-kwargs + weights two-file
contract with the same parameter names (``transformer.py:797-829``).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, List, Mapping, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from flax import serialization

from .attention import (DecoderLayer, EncoderLayer, anti_causal_mask,
                        causal_mask, identity_mask)
from .codemaps import CodemapsHelper, SimpleCodemapsHelper, ZigZagCodemapsHelper


@dataclasses.dataclass
class TransformerConfig:
    """Constructor kwargs, JSON-compatible with the reference's parameter
    files (``transformer.py:64-103``; dead debug flags are accepted by
    ``from_json`` and ignored)."""

    shape: Tuple[int, int] = (64, 8)  # (frequencies, duration)
    n_class: int = 512
    d_model: int = 512
    embeddings_dim: int = 32
    positional_embeddings_dim: int = 16
    dropout: float = 0.1
    conditional_model: bool = True
    self_conditional_model: bool = False
    condition_shape: Optional[Tuple[int, int]] = None
    use_relative_transformer: bool = True
    predict_frequencies_first: bool = True
    predict_low_frequencies_first: bool = True
    class_conditioning_num_classes_per_modality: Optional[
        Mapping[str, int]] = None
    class_conditioning_embedding_dim_per_modality: Optional[
        Mapping[str, int]] = None
    class_conditioning_prepend_to_dummy_input: bool = False
    positional_class_conditioning: bool = False
    use_aligned_decoder: bool = False
    conditional_model_num_encoder_layers: int = 6
    conditional_model_num_decoder_layers: int = 8
    conditional_model_nhead: int = 8
    unconditional_model_num_encoder_layers: int = 6
    unconditional_model_nhead: int = 8
    use_identity_memory_mask: bool = False
    d_ff: int = 2048
    # per-layer rematerialization (jax.checkpoint): recompute each
    # encoder/decoder layer's activations during the backward pass
    # instead of keeping them in HBM. Trades ~1/3 more FLOPs for O(1)
    # layer-activation memory — the flagship prior OOMs a 16 GB v5e at
    # train batch 128 without it. Training-only (the KV-cached decode
    # paths never differentiate); inference loaders force it off.
    remat: bool = False
    # fused Pallas training attention (ops/train_attention.py): keeps
    # the [B, H, L, L] score matrices out of HBM — the profiled
    # bandwidth bottleneck of the train step. Training-only knob, same
    # checkpoint format either way; inference loaders force it off
    # (the KV-cached decode paths have their own kernels).
    fused_attention: bool = False

    def __post_init__(self):
        self.shape = tuple(self.shape)
        if self.self_conditional_model:
            self.condition_shape = self.shape
        if self.condition_shape is not None:
            self.condition_shape = tuple(self.condition_shape)
        if self.conditional_model and self.condition_shape is None:
            raise ValueError("conditional model requires condition_shape")
        if not self.conditional_model:
            raise NotImplementedError(
                "only the conditional/self-conditional paths are exercised "
                "by the reference pipeline")
        # round positional dim to even (reference transformer.py:156)
        self.positional_embeddings_dim = 2 * (
            self.positional_embeddings_dim // 2)
        # dimension budget: embeddings + positional (+ class blocks) are
        # CONCATENATED up to d_model (reference transformer.py:236-266,
        # 659-673 silently mis-shapes when they don't fit; fail loudly)
        dims = self.class_conditioning_embedding_dim_per_modality
        class_total = sum(dims.values()) if dims else 0
        if self.embeddings_effective_dim <= 0:
            raise ValueError(
                f"d_model={self.d_model} leaves no room for token "
                f"embeddings after positional_embeddings_dim="
                f"{self.positional_embeddings_dim}"
                + (f" + class conditioning ({class_total})"
                   if self.positional_class_conditioning else "")
                + "; raise d_model or lower the embedding dims")
        if class_total > self.start_symbol_dim:
            raise ValueError(
                f"total class-conditioning embedding dim {class_total} "
                f"exceeds the start-symbol dim {self.start_symbol_dim} "
                f"(d_model={self.d_model}); lower "
                f"class_conditioning_embedding_dim or raise d_model")

    # -- derived geometry (reference transformer.py:196-229) ---------------
    @property
    def use_inpainting_mask_on_source(self) -> bool:
        return self.self_conditional_model

    @property
    def n_class_source(self) -> int:
        return self.n_class + (1 if self.use_inpainting_mask_on_source else 0)

    @property
    def n_class_target(self) -> int:
        return self.n_class

    @property
    def mask_token_index(self) -> int:
        return self.n_class

    @property
    def source_frequencies(self) -> int:
        return self.condition_shape[0]

    @property
    def source_duration(self) -> int:
        return self.condition_shape[1]

    @property
    def target_frequencies(self) -> int:
        return self.shape[0]

    @property
    def target_duration(self) -> int:
        return self.shape[1]

    @property
    def source_sequence_length(self) -> int:
        return self.source_frequencies * self.source_duration

    @property
    def target_sequence_length(self) -> int:
        return self.target_frequencies * self.target_duration

    @property
    def patch_frequencies(self) -> int:
        return self.target_frequencies // self.source_frequencies

    @property
    def patch_duration(self) -> int:
        return self.target_duration // self.source_duration

    @property
    def target_num_channels(self) -> int:
        """Tokens per source patch = target start-symbol length."""
        return self.patch_frequencies * self.patch_duration

    @property
    def target_num_events(self) -> int:
        return self.target_sequence_length // self.target_num_channels

    @property
    def class_conditioning_total_dim(self) -> int:
        dims = self.class_conditioning_embedding_dim_per_modality
        return sum(dims.values()) if dims else 0

    @property
    def embeddings_effective_dim(self) -> int:
        dim = self.d_model - self.positional_embeddings_dim
        if self.positional_class_conditioning:
            dim -= self.class_conditioning_total_dim
        return dim

    @property
    def start_symbol_dim(self) -> int:
        dim = self.d_model
        if self.positional_class_conditioning:
            dim -= self.class_conditioning_total_dim
        return dim

    def source_codemaps_helper(self) -> CodemapsHelper:
        return SimpleCodemapsHelper(self.source_frequencies,
                                    self.source_duration)

    def target_codemaps_helper(self) -> CodemapsHelper:
        if self.self_conditional_model:
            return SimpleCodemapsHelper(self.target_frequencies,
                                        self.target_duration)
        return ZigZagCodemapsHelper(
            self.target_frequencies, self.target_duration,
            self.patch_frequencies, self.patch_duration)

    def to_json(self) -> str:
        d = {f.name: getattr(self, f.name)
             for f in dataclasses.fields(self)}
        return json.dumps(d, indent=4)

    @classmethod
    def from_json(cls, blob: Union[str, Mapping[str, Any]]
                  ) -> "TransformerConfig":
        d = dict(json.loads(blob) if isinstance(blob, str) else blob)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class VQNSynthTransformer(nn.Module):
    """Seq2seq prior; see module docstring. Methods:

    - ``embed_source`` / ``embed_target``: token maps -> embedded sequences
      (with positions, class conditioning and start symbols);
    - ``__call__(target_seq, source_seq, memory=None)``: full forward ->
      (logits [B, L_tgt, n_class], memory);
    - ``encode_source``: encoder only -> memory;
    - ``init_decode_caches`` / ``decode_step``: KV-cached sampling path.
    """

    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.source_embed = nn.Embed(cfg.n_class_source, cfg.embeddings_dim)
        self.source_embeddings_linear = nn.Dense(cfg.embeddings_effective_dim)
        self.target_embed = nn.Embed(cfg.n_class_target, cfg.embeddings_dim)
        self.target_embeddings_linear = nn.Dense(cfg.embeddings_effective_dim)
        self.project_logits = nn.Dense(cfg.n_class_target)

        p_half = cfg.positional_embeddings_dim // 2
        init = nn.initializers.normal(stddev=1.0)
        self.source_pos_frequency = self.param(
            "source_pos_frequency", init, (cfg.source_frequencies, p_half))
        self.target_pos_frequency = self.param(
            "target_pos_frequency", init, (cfg.target_frequencies, p_half))
        self.target_pos_patch = self.param(
            "target_pos_patch", init,
            (cfg.patch_frequencies, cfg.patch_duration, p_half))

        self.source_start_symbol = self.param(
            "source_start_symbol", init, (1, cfg.start_symbol_dim))
        self.target_start_symbol = self.param(
            "target_start_symbol", init,
            (cfg.target_num_channels, cfg.start_symbol_dim))

        modalities = cfg.class_conditioning_num_classes_per_modality or {}
        dims = cfg.class_conditioning_embedding_dim_per_modality or {}
        self.class_embeds = {
            name: nn.Embed(num, dims[name],
                           name=f"class_conditioning_{name}")
            for name, num in modalities.items()}

        src_events_ws = cfg.source_sequence_length + 1
        tgt_events_ws = cfg.target_num_events + 1
        # nn.remat transforms __call__ only; the KV-cached decode
        # methods (step/project_self_kv/init_memory_kv) stay untouched.
        # `deterministic` must be STATIC (flax Dropout branches on it in
        # Python); flax's checkpoint sees args as (scope, *call_args),
        # so it is positional index 3 (encoder: x, mask, deterministic)
        # / 5 (decoder: x, memory, tgt_mask, memory_mask, deterministic)
        # — and the transformer's layer call sites pass it positionally
        # (jax.checkpoint cannot mark kwargs static).
        EncLayer = (nn.remat(EncoderLayer, static_argnums=(3,))
                    if cfg.remat else EncoderLayer)
        DecLayer = (nn.remat(DecoderLayer, static_argnums=(5,))
                    if cfg.remat else DecoderLayer)
        self.encoder_layers = [
            EncLayer(
                d_model=cfg.d_model, num_heads=cfg.conditional_model_nhead,
                d_ff=cfg.d_ff, num_channels=1, num_events=src_events_ws,
                dropout=cfg.dropout, fused_attention=cfg.fused_attention,
                name=f"encoder_layer_{i}")
            for i in range(cfg.conditional_model_num_encoder_layers)]
        self.encoder_norm = nn.LayerNorm()
        cross_bias_type = ("no_bias" if cfg.use_identity_memory_mask
                           else "relative_attention_target_source")
        self.decoder_layers = [
            DecLayer(
                d_model=cfg.d_model, num_heads=cfg.conditional_model_nhead,
                d_ff=cfg.d_ff,
                num_channels_encoder=1, num_events_encoder=src_events_ws,
                num_channels_decoder=cfg.target_num_channels,
                num_events_decoder=tgt_events_ws,
                cross_bias_type=cross_bias_type,
                aligned=cfg.use_aligned_decoder,
                dropout=cfg.dropout, fused_attention=cfg.fused_attention,
                name=f"decoder_layer_{i}")
            for i in range(cfg.conditional_model_num_decoder_layers)]
        self.decoder_norm = nn.LayerNorm()

    # -- embedding / sequence preparation -----------------------------------
    def _class_block(self, class_conditioning: Mapping[str, jnp.ndarray],
                     batch: int) -> Optional[jnp.ndarray]:
        """[B, total_dim] concatenated modality embeddings (config order)."""
        cfg = self.config
        if not self.class_embeds:
            return None
        parts = []
        for name in cfg.class_conditioning_num_classes_per_modality:
            if name in class_conditioning:
                labels = class_conditioning[name].reshape(batch)
                parts.append(self.class_embeds[name](labels))
            else:
                dim = cfg.class_conditioning_embedding_dim_per_modality[name]
                parts.append(jnp.zeros((batch, dim)))
        return jnp.concatenate(parts, axis=-1)

    def _positional_sequence(self, kind: str,
                             time_indexes: Optional[jnp.ndarray] = None
                             ) -> jnp.ndarray:
        """[L, P] positional features in the kind's scan order
        (reference ``_get_combined_positional_embeddings`` +
        ``add_positions_to_sequence``, ``transformer.py:427-617``)."""
        cfg = self.config
        if kind == "source":
            freq = self.source_pos_frequency  # [F_s, P/2]
            grid = jnp.concatenate([
                jnp.tile(freq[:, None, :], (1, cfg.source_duration, 1)),
                jnp.tile(freq[:, None, :], (1, cfg.source_duration, 1)),
            ], axis=-1)  # [F_s, T_s, P]
            helper = cfg.source_codemaps_helper()
        else:
            freq = self.target_pos_frequency  # [F_t, P/2]
            patch = jnp.tile(self.target_pos_patch,
                             (cfg.source_frequencies,
                              cfg.source_duration, 1))  # [F_t, T_t, P/2]
            grid = jnp.concatenate([
                jnp.tile(freq[:, None, :], (1, cfg.target_duration, 1)),
                patch,
            ], axis=-1)
            helper = cfg.target_codemaps_helper()
        if time_indexes is not None:
            grid = jnp.take(grid, time_indexes, axis=1)
        return helper.to_sequence(grid[None])[0]  # [L, P]

    def _start_block(self, kind: str,
                     class_conditioning: Mapping[str, jnp.ndarray],
                     batch: int) -> jnp.ndarray:
        """[B, n_start, d_model] start symbol with class conditioning."""
        cfg = self.config
        start = (self.source_start_symbol if kind == "source"
                 else self.target_start_symbol)
        start = jnp.broadcast_to(start[None],
                                 (batch,) + start.shape)
        block = self._class_block(class_conditioning, batch)
        if block is None:
            if cfg.positional_class_conditioning:
                raise ValueError("positional class conditioning requires "
                                 "configured modalities")
            return start
        block_rep = jnp.broadcast_to(block[:, None, :],
                                     (batch, start.shape[1], block.shape[-1]))
        if cfg.positional_class_conditioning:
            # append to the (shorter) start symbol -> d_model
            return jnp.concatenate([start, block_rep], axis=-1)
        # prepend-to-dummy-input: overwrite the leading dims
        # (reference add_start_symbol, transformer.py:659-673)
        return jnp.concatenate(
            [block_rep, start[..., block.shape[-1]:]], axis=-1)

    def _embed_tokens(self, tokens: jnp.ndarray, kind: str) -> jnp.ndarray:
        if kind == "source":
            return self.source_embeddings_linear(self.source_embed(tokens))
        return self.target_embeddings_linear(self.target_embed(tokens))

    def prepare_sequence(self, tokens: jnp.ndarray, kind: str,
                         class_conditioning: Mapping[str, jnp.ndarray] = {},
                         mask: Optional[jnp.ndarray] = None,
                         time_indexes: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
        """[B, L] flattened token sequence -> [B, n_start + L, d_model].

        ``mask`` (source only): boolean [B, L], True = replace with the
        inpainting mask token before embedding."""
        cfg = self.config
        batch = tokens.shape[0]
        if mask is not None and kind == "source" \
                and cfg.use_inpainting_mask_on_source:
            tokens = jnp.where(mask, cfg.mask_token_index, tokens)
        emb = self._embed_tokens(tokens, kind)  # [B, L, eff]
        pos = self._positional_sequence(kind, time_indexes)  # [L, P]
        pos = jnp.broadcast_to(pos[None], (batch,) + pos.shape)
        seq = jnp.concatenate([emb, pos], axis=-1)
        if cfg.positional_class_conditioning:
            block = self._class_block(class_conditioning, batch)
            block_rep = jnp.broadcast_to(
                block[:, None, :], (batch, seq.shape[1], block.shape[-1]))
            seq = jnp.concatenate([seq, block_rep], axis=-1)
        start = self._start_block(kind, class_conditioning, batch)
        return jnp.concatenate([start, seq], axis=1)

    def to_sequences(self, input: jnp.ndarray,
                     condition: Optional[jnp.ndarray] = None,
                     class_conditioning: Mapping[str, jnp.ndarray] = {},
                     mask: Optional[jnp.ndarray] = None,
                     time_indexes_source: Optional[jnp.ndarray] = None,
                     time_indexes_target: Optional[jnp.ndarray] = None,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Codemaps -> embedded (source_sequence, target_sequence)
        (reference ``to_sequences``, ``transformer.py:513-536``).
        ``mask`` is a boolean codemap [B, F_s, T_s]."""
        cfg = self.config
        src_helper = cfg.source_codemaps_helper()
        tgt_helper = cfg.target_codemaps_helper()
        mask_seq = (src_helper.to_sequence(mask)
                    if mask is not None else None)
        source_sequence = self.prepare_sequence(
            src_helper.to_sequence(condition), "source",
            class_conditioning=class_conditioning, mask=mask_seq,
            time_indexes=time_indexes_source)
        target_sequence = self.prepare_sequence(
            tgt_helper.to_sequence(input), "target",
            class_conditioning=class_conditioning,
            time_indexes=time_indexes_target)
        return source_sequence, target_sequence

    def full_init(self, input: jnp.ndarray, condition: jnp.ndarray,
                  class_conditioning: Mapping[str, jnp.ndarray] = {}):
        """Initialization helper touching every parameter:
        ``model.init(rngs, codemap, condition, method=VQNSynthTransformer.
        full_init)``."""
        mask = (jnp.zeros(condition.shape, bool)
                if self.config.use_inpainting_mask_on_source else None)
        src, tgt = self.to_sequences(input, condition,
                                     class_conditioning=class_conditioning,
                                     mask=mask)
        logits, _ = self(tgt, src)
        return logits

    # -- full forward -------------------------------------------------------
    def encode_source(self, source_sequence: jnp.ndarray,
                      deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        mask = (anti_causal_mask(source_sequence.shape[1])
                if cfg.self_conditional_model else None)
        h = source_sequence
        for layer in self.encoder_layers:
            # positional args: remat marks `deterministic` static
            h = layer(h, mask, deterministic)
        return self.encoder_norm(h)

    def __call__(self, input: jnp.ndarray,
                 condition: jnp.ndarray,
                 memory: Optional[jnp.ndarray] = None,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Embedded sequences -> (logits [B, L_tgt, n_class_target], memory)
        (reference ``forward``, ``transformer.py:720-795``)."""
        cfg = self.config
        if memory is None:
            memory = self.encode_source(condition,
                                        deterministic=deterministic)
        tgt_mask = causal_mask(input.shape[1])
        memory_mask = (identity_mask(memory.shape[1])
                       if cfg.use_identity_memory_mask else None)
        h = input
        for layer in self.decoder_layers:
            # positional args: remat marks `deterministic` static
            h = layer(h, memory, tgt_mask, memory_mask, deterministic)
        h = self.decoder_norm(h)
        # trim start symbol (keep its last position: it predicts token 0)
        # and drop the last position (reference transformer.py:781-785)
        c = cfg.target_num_channels
        h = h[:, c - 1: c - 1 + cfg.target_sequence_length]
        return self.project_logits(h), memory

    def prefix_kv(self, target_prefix: jnp.ndarray, memory: jnp.ndarray):
        """Per-layer self-attention K/V for a KNOWN target prefix, computed
        with one parallel forward (prefix-cache priming: the sampling scan
        can then start at the first masked position instead of position 0).

        target_prefix: embedded with-start sequence sliced to the prefix
        [B, P, d]. Returns list of (k, v) [B, P, H, Dh] per decoder layer.
        """
        cfg = self.config
        tgt_mask = causal_mask(target_prefix.shape[1])
        # identity mask rows sliced to the prefix length (queries are
        # the first P positions; keys span the full memory)
        memory_mask = (identity_mask(memory.shape[1])[
            : target_prefix.shape[1]]
            if cfg.use_identity_memory_mask else None)
        h = target_prefix
        kvs = []
        for layer in self.decoder_layers:
            kvs.append(layer.project_self_kv(h))
            h = layer(h, memory, tgt_mask, memory_mask, True)
        return kvs

    # -- KV-cached decode path ----------------------------------------------
    def init_decode_caches(self, memory: jnp.ndarray, batch: int,
                           pad_multiple: int = 1,
                           layout: str = "bhdl") -> Dict[str, List]:
        """Per-layer memory K/V (computed once) + zeroed self caches.
        Cache dtype follows ``memory``'s dtype (bf16 when the decode path
        runs in bf16). ``pad_multiple``: round the cache length up (the
        flash-decode kernel streams 128-aligned chunks). ``layout``:
        'bhdl' (L-minor, exact TPU tiling — default) or 'blhd'
        (flash-kernel layout)."""
        cfg = self.config
        l_tgt = cfg.target_sequence_length + cfg.target_num_channels
        l_tgt = ((l_tgt + pad_multiple - 1) // pad_multiple) * pad_multiple
        n_heads = cfg.conditional_model_nhead
        head_dim = cfg.d_model // n_heads
        mem_kv = [layer.init_memory_kv(memory, layout=layout)
                  for layer in self.decoder_layers]
        shape = ((batch, n_heads, head_dim, l_tgt) if layout == "bhdl"
                 else (batch, l_tgt, n_heads, head_dim))
        zeros = jnp.zeros(shape, dtype=memory.dtype)
        self_kv = [(zeros, zeros) for _ in self.decoder_layers]
        return {"mem": mem_kv, "self": self_kv}

    def decode_step(self, x_p: jnp.ndarray, pos: jnp.ndarray,
                    caches: Dict[str, List], use_flash: bool = False,
                    layout: str = "bhdl"
                    ) -> Tuple[jnp.ndarray, Dict[str, List]]:
        """Input embedding at with-start position ``pos`` -> (logits for the
        token predicted *at* this position, updated caches)."""
        h = x_p
        new_self = []
        for layer, (k_s, v_s), (m_k, m_v) in zip(
                self.decoder_layers, caches["self"], caches["mem"]):
            h, k_s, v_s = layer.step(h, pos, k_s, v_s, m_k, m_v,
                                     use_flash=use_flash, layout=layout)
            new_self.append((k_s, v_s))
        h = self.decoder_norm(h)
        logits = self.project_logits(h)
        return logits, {"mem": caches["mem"], "self": new_self}

    def target_input_embedding(self, token: jnp.ndarray, pos: jnp.ndarray,
                               pos_features: jnp.ndarray,
                               start_block: jnp.ndarray,
                               class_block: Optional[jnp.ndarray] = None
                               ) -> jnp.ndarray:
        """Input embedding at with-start position ``pos``: a start-symbol
        row for pos < C, else the embedding of ``token`` (= target token
        ``pos - C``) plus positional features. All shapes static.

        ``pos_features``: [L_tgt, P]; ``start_block``: [B, C, d_model].
        """
        cfg = self.config
        c = cfg.target_num_channels
        emb = self._embed_tokens(token, "target")  # [B, eff]
        feat = jnp.take(pos_features,
                        jnp.clip(pos - c, 0, cfg.target_sequence_length - 1),
                        axis=0)
        feat = jnp.broadcast_to(feat[None], (emb.shape[0],) + feat.shape)
        x_tok = jnp.concatenate([emb, feat], axis=-1)
        if cfg.positional_class_conditioning:
            x_tok = jnp.concatenate([x_tok, class_block], axis=-1)
        x_start = jnp.take(start_block,
                           jnp.clip(pos, 0, c - 1), axis=1)
        return jnp.where(pos < c, x_start, x_tok)


def SelfAttentiveVQTransformer(config: TransformerConfig
                               ) -> VQNSynthTransformer:
    """Top prior factory: self-conditional, inpainting mask on source
    (reference ``transformer.py:832-845``)."""
    config = dataclasses.replace(
        config, conditional_model=True, self_conditional_model=True,
        condition_shape=config.shape)
    return VQNSynthTransformer(config)


def UpsamplingVQTransformer(config: TransformerConfig
                            ) -> VQNSynthTransformer:
    """Bottom prior factory: conditioned on top, zigzag target flattening
    (reference ``transformer.py:848-872``)."""
    if config.self_conditional_model:
        raise ValueError("bottom prior is not self-conditional")
    return VQNSynthTransformer(config)


# -- persistence --------------------------------------------------------------

def save_model(directory: Union[str, pathlib.Path],
               config: TransformerConfig, variables: Mapping[str, Any],
               prefix: str) -> None:
    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    (directory / f"{prefix}-model_parameters.json").write_text(
        config.to_json())
    (directory / f"{prefix}-weights.msgpack").write_bytes(
        serialization.to_bytes(variables))


def from_parameters_and_weights(
        parameters_json_path: Union[str, pathlib.Path],
        model_weights_path: Union[str, pathlib.Path],
) -> Tuple[VQNSynthTransformer, Dict[str, Any]]:
    config = TransformerConfig.from_json(
        pathlib.Path(parameters_json_path).read_text())
    # remat/fused attention are training-time trades; inference never
    # differentiates (and samples through the decode kernels), so force
    # both off regardless of how the checkpoint was trained (params are
    # identical either way)
    config = dataclasses.replace(config, remat=False,
                                 fused_attention=False)
    model = VQNSynthTransformer(config)
    blob = pathlib.Path(model_weights_path).read_bytes()
    tgt = jnp.zeros((1, config.target_frequencies, config.target_duration),
                    jnp.int32)
    src = jnp.zeros((1, config.source_frequencies, config.source_duration),
                    jnp.int32)
    cc = {name: jnp.zeros((1,), jnp.int32)
          for name in (config.class_conditioning_num_classes_per_modality
                       or {})}
    # jitted: the skeleton only provides structure for from_bytes, and
    # eager init on a remote/tunneled backend pays one round trip per op
    import functools
    skeleton = jax.jit(functools.partial(
        model.init, method=VQNSynthTransformer.full_init))(
        {"params": jax.random.PRNGKey(0)}, tgt, src,
        class_conditioning=cc)
    variables = serialization.from_bytes(skeleton, blob)
    return model, variables
