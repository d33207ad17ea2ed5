"""Relative attention over (events x channels) codemap grids.

The reference's only attention implementation lives in the external,
unvendored ``VQCPCB.transformer.transformer_custom`` package; its feature
set is reverse-engineered here from the construction/call sites
(``priors/transformer.py:367-417,752-779``):

- encoder self-attention with ``attention_bias_type='relative_attention'``
  parameterized by the (num_channels, num_events) codemap grid;
- decoder layers with separate self ('relative_attention') and cross
  ('relative_attention_target_source' | 'no_bias') bias types over
  (channels, events) of both sides;
- an *aligned* decoder variant whose cross-attention attends only the
  source token conditioning the current target patch;
- additive ``mask`` / ``tgt_mask`` / ``memory_mask`` support.

Design: a sequence position ``i`` sits on the grid at
``event e_i = i // C`` and ``channel c_i = i % C``. The learned bias is

    bias[h, i, j] = table[h, c_i, c_j, e_i - e_j + (E_k - 1)]

(Music-Transformer-style relative event offsets, crossed with a full
channel-pair table). Sequences here are tiny (<= ~640 tokens), so the
dense [H, Lq, Lk] bias is materialized inside jit and fused by XLA; for
the KV-cached decode path a single bias *row* is gathered per step.

Layers are pre-LN (GPT-style) - a deliberate TPU-era improvement over the
reference's post-LN torch layers (better large-batch bf16 stability); the
modeled distribution class is unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

NEG_INF = -1e9


def grid_coords(length: int, num_channels: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    idx = jnp.arange(length)
    return idx // num_channels, idx % num_channels  # events, channels


class RelativeAttentionBias(nn.Module):
    """Learned bias table indexed by (head, q-channel, k-channel, rel event)."""

    num_heads: int
    num_channels_q: int
    num_events_q: int
    num_channels_k: int
    num_events_k: int

    def setup(self):
        max_rel = self.num_events_q + self.num_events_k - 1
        self.table = self.param(
            "rel_bias",
            nn.initializers.normal(stddev=0.02),
            (self.num_heads, self.num_channels_q, self.num_channels_k,
             max_rel))

    def full(self, len_q: int, len_k: int) -> jnp.ndarray:
        """[H, len_q, len_k] dense bias."""
        e_q, c_q = grid_coords(len_q, self.num_channels_q)
        e_k, c_k = grid_coords(len_k, self.num_channels_k)
        max_rel = self.table.shape[-1]
        # clamp: padded cache positions produce out-of-range offsets, and
        # jnp.take's default fill mode would inject NaN (masked or not)
        rel = jnp.clip(e_q[:, None] - e_k[None, :]
                       + (self.num_events_k - 1), 0, max_rel - 1)
        # one flat gather: table[h, c_q[i], c_k[j], rel[i, j]] without
        # materializing a [H, Lq, Lk, max_rel] intermediate
        flat_idx = ((c_q[:, None] * self.num_channels_k + c_k[None, :])
                    * max_rel + rel)  # [len_q, len_k]
        flat_table = self.table.reshape(self.num_heads, -1)
        return jnp.take(flat_table, flat_idx, axis=1, mode="clip")

    def row(self, pos: jnp.ndarray, len_k: int) -> jnp.ndarray:
        """[H, len_k] bias for a single (traced) query position ``pos``."""
        e_q = pos // self.num_channels_q
        c_q = pos % self.num_channels_q
        e_k, c_k = grid_coords(len_k, self.num_channels_k)
        max_rel = self.table.shape[-1]
        rel = jnp.clip(e_q - e_k + (self.num_events_k - 1),
                       0, max_rel - 1)
        t = jnp.take(self.table, c_q, axis=1, mode="clip")  # [H, Ck, R]
        t = t[:, c_k, :]  # [H, len_k, max_rel]
        return jnp.take_along_axis(t, rel[None, :, None], axis=-1,
                                   mode="clip")[..., 0]


class MultiHeadAttention(nn.Module):
    """MHA with additive bias/mask; exposes a cached single-query step.

    ``use_fused=True`` routes the batched forward through the Pallas
    training-attention kernel (``ops/train_attention.py``): the score
    matrix never touches HBM and the batch-shared bias gradient is
    accumulated in VMEM. Parameters and outputs are identical either
    way (up to bf16 rounding) — checkpoints are interchangeable."""

    d_model: int
    num_heads: int
    dtype: Optional[Any] = None
    use_fused: bool = False

    def setup(self):
        assert self.d_model % self.num_heads == 0
        self.head_dim = self.d_model // self.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (self.num_heads, self.head_dim), name=name, dtype=self.dtype)
        self.q_proj = dense("q")
        self.k_proj = dense("k")
        self.v_proj = dense("v")
        self.o_proj = nn.DenseGeneral(
            self.d_model, axis=(-2, -1), name="o", dtype=self.dtype)

    def __call__(self, q_in: jnp.ndarray, kv_in: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """q_in [B, Lq, d], kv_in [B, Lk, d]; bias [H, Lq, Lk];
        mask additive [Lq, Lk] (0 = keep, NEG_INF = drop)."""
        q = self.q_proj(q_in)
        k = self.k_proj(kv_in)
        v = self.v_proj(kv_in)
        if self.use_fused:
            from ...ops.train_attention import fused_train_attention
            ab = jnp.zeros((self.num_heads, q.shape[1], k.shape[1]),
                           jnp.float32)
            if bias is not None:
                ab = ab + bias.astype(jnp.float32)
            if mask is not None:
                ab = ab + mask[None].astype(jnp.float32)
            return self.o_proj(fused_train_attention(q, k, v, ab))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(float(self.head_dim))
        if bias is not None:
            logits = logits + bias[None].astype(logits.dtype)
        if mask is not None:
            logits = logits + mask[None, None].astype(logits.dtype)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
        return self.o_proj(out)

    def project_kv(self, kv_in: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute K/V for caching ([B, Lk, H, Dh] each)."""
        return self.k_proj(kv_in), self.v_proj(kv_in)

    def project_kv_lmin(self, kv_in: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """K/V in the L-minor cache layout [B, H, Dh, Lk].

        TPU tiling pads the minor dim to 128 lanes: a [.., H, Dh=64]
        cache physically doubles its memory and every read/write pays 2x
        HBM traffic. With L (a 128-multiple) minor the layout is exact.
        """
        k, v = self.project_kv(kv_in)
        return (jnp.transpose(k, (0, 2, 3, 1)),
                jnp.transpose(v, (0, 2, 3, 1)))

    def step_lmin(self, q_in: jnp.ndarray, k_cache: jnp.ndarray,
                  v_cache: jnp.ndarray,
                  bias_row: Optional[jnp.ndarray] = None,
                  mask_row: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Single query against L-minor caches [B, H, Dh, Lk] -> [B, d]."""
        q = self.q_proj(q_in)  # [B, H, Dh]
        logits = jnp.einsum("bhd,bhdk->bhk", q, k_cache,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(float(self.head_dim))
        if bias_row is not None:
            logits = logits + bias_row[None].astype(logits.dtype)
        if mask_row is not None:
            logits = logits + mask_row[None, None].astype(logits.dtype)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhk,bhdk->bhd", weights.astype(v_cache.dtype),
                         v_cache)
        return self.o_proj(out)

    def step(self, q_in: jnp.ndarray, k_cache: jnp.ndarray,
             v_cache: jnp.ndarray,
             bias_row: Optional[jnp.ndarray] = None,
             mask_row: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Single query against cached keys.

        q_in [B, d]; k_cache/v_cache [B, Lk, H, Dh];
        bias_row [H, Lk]; mask_row additive [Lk]. -> [B, d]
        """
        q = self.q_proj(q_in)  # [B, H, Dh]
        logits = jnp.einsum("bhd,bkhd->bhk", q, k_cache,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(float(self.head_dim))
        if bias_row is not None:
            logits = logits + bias_row[None].astype(logits.dtype)
        if mask_row is not None:
            logits = logits + mask_row[None, None].astype(logits.dtype)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhk,bkhd->bhd", weights.astype(v_cache.dtype),
                         v_cache)
        return self.o_proj(out)


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        h = nn.Dense(self.d_ff, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype)(h)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    num_channels: int
    num_events: int
    dropout: float = 0.0
    dtype: Optional[Any] = None
    fused_attention: bool = False

    def setup(self):
        self.self_bias = RelativeAttentionBias(
            num_heads=self.num_heads,
            num_channels_q=self.num_channels, num_events_q=self.num_events,
            num_channels_k=self.num_channels, num_events_k=self.num_events)
        self.self_attn = MultiHeadAttention(
            d_model=self.d_model, num_heads=self.num_heads, dtype=self.dtype,
            use_fused=self.fused_attention)
        self.ln1 = nn.LayerNorm()
        self.ln2 = nn.LayerNorm()
        self.mlp = FeedForward(d_model=self.d_model, d_ff=self.d_ff,
                               dropout=self.dropout, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        length = x.shape[1]
        bias = self.self_bias.full(length, length)
        h = self.ln1(x)
        x = x + self.drop(self.self_attn(h, h, bias=bias, mask=mask),
                          deterministic=deterministic)
        x = x + self.mlp(self.ln2(x), deterministic=deterministic)
        return x


class DecoderLayer(nn.Module):
    """Pre-LN decoder layer with relative self bias and configurable cross
    bias; ``aligned=True`` restricts cross-attention to the source token
    whose patch contains the query (TransformerAlignedDecoderLayerCustom
    equivalent)."""

    d_model: int
    num_heads: int
    d_ff: int
    num_channels_encoder: int
    num_events_encoder: int
    num_channels_decoder: int
    num_events_decoder: int
    cross_bias_type: str = "relative_attention_target_source"
    aligned: bool = False
    dropout: float = 0.0
    dtype: Optional[Any] = None
    fused_attention: bool = False

    def setup(self):
        self.self_bias = RelativeAttentionBias(
            num_heads=self.num_heads,
            num_channels_q=self.num_channels_decoder,
            num_events_q=self.num_events_decoder,
            num_channels_k=self.num_channels_decoder,
            num_events_k=self.num_events_decoder)
        if self.cross_bias_type == "relative_attention_target_source":
            self.cross_bias = RelativeAttentionBias(
                num_heads=self.num_heads,
                num_channels_q=self.num_channels_decoder,
                num_events_q=self.num_events_decoder,
                num_channels_k=self.num_channels_encoder,
                num_events_k=self.num_events_encoder)
        elif self.cross_bias_type == "no_bias":
            self.cross_bias = None
        else:
            raise ValueError(self.cross_bias_type)
        self.self_attn = MultiHeadAttention(
            d_model=self.d_model, num_heads=self.num_heads, dtype=self.dtype,
            use_fused=self.fused_attention)
        self.cross_attn = MultiHeadAttention(
            d_model=self.d_model, num_heads=self.num_heads, dtype=self.dtype,
            use_fused=self.fused_attention)
        self.ln1 = nn.LayerNorm()
        self.ln2 = nn.LayerNorm()
        self.ln3 = nn.LayerNorm()
        self.mlp = FeedForward(d_model=self.d_model, d_ff=self.d_ff,
                               dropout=self.dropout, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def _aligned_mask(self, len_q: int, len_k: int) -> jnp.ndarray:
        """Allow target event e to see only source position e (source has
        one channel per event). Start-symbol source position 0 corresponds
        to target start-symbol event 0: the offset-by-one start alignment
        holds because both sides prepend exactly one event."""
        e_q, _ = grid_coords(len_q, self.num_channels_decoder)
        j = jnp.arange(len_k)
        allowed = e_q[:, None] == j[None, :]
        return jnp.where(allowed, 0.0, NEG_INF)

    def __call__(self, x: jnp.ndarray, memory: jnp.ndarray,
                 tgt_mask: Optional[jnp.ndarray] = None,
                 memory_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        len_q = x.shape[1]
        len_k = memory.shape[1]
        self_bias = self.self_bias.full(len_q, len_q)
        h = self.ln1(x)
        x = x + self.drop(self.self_attn(h, h, bias=self_bias,
                                         mask=tgt_mask),
                          deterministic=deterministic)
        cross_bias = (self.cross_bias.full(len_q, len_k)
                      if self.cross_bias is not None else None)
        cross_mask = memory_mask
        if self.aligned:
            aligned = self._aligned_mask(len_q, len_k)
            cross_mask = aligned if cross_mask is None else (
                cross_mask + aligned)
        x = x + self.drop(self.cross_attn(self.ln2(x), memory,
                                          bias=cross_bias, mask=cross_mask),
                          deterministic=deterministic)
        x = x + self.mlp(self.ln3(x), deterministic=deterministic)
        return x

    # -- KV-cached decode ---------------------------------------------------
    def init_memory_kv(self, memory: jnp.ndarray, layout: str = "blhd"):
        if layout == "bhdl":
            return self.cross_attn.project_kv_lmin(memory)
        return self.cross_attn.project_kv(memory)

    def project_self_kv(self, x: jnp.ndarray):
        """K/V of the (pre-LN'd) input for priming the self cache."""
        h = self.ln1(x)
        return self.self_attn.project_kv(h)

    def step(self, x_i: jnp.ndarray, pos: jnp.ndarray,
             k_self: jnp.ndarray, v_self: jnp.ndarray,
             mem_k: jnp.ndarray, mem_v: jnp.ndarray,
             use_flash: bool = False, layout: str = "blhd",
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One query position against caches.

        x_i [B, d]; pos scalar (query's absolute position). Cache
        ``layout`` is 'blhd' ([B, L, H, Dh], flash-kernel compatible) or
        'bhdl' ([B, H, Dh, L], exact TPU tiling — default dense path).
        Entries > pos are stale/ignored via the causal mask. Returns
        (out_i [B, d], k_cache, v_cache) with this position's fresh K/V
        written (in-place under scan donation).
        """
        lmin = layout == "bhdl"
        l_tgt = k_self.shape[-1] if lmin else k_self.shape[1]
        l_src = mem_k.shape[-1] if lmin else mem_k.shape[1]
        h = self.ln1(x_i)
        k_i = self.self_attn.k_proj(h)  # [B, H, Dh]
        v_i = self.self_attn.v_proj(h)
        # write current position before attending (query sees itself);
        # carried forward by the caller — donated buffers make it
        # in-place under lax.scan
        if lmin:
            k_cache = jax.lax.dynamic_update_index_in_dim(
                k_self, k_i, pos, axis=3)
            v_cache = jax.lax.dynamic_update_index_in_dim(
                v_self, v_i, pos, axis=3)
        else:
            k_cache = jax.lax.dynamic_update_index_in_dim(
                k_self, k_i, pos, axis=1)
            v_cache = jax.lax.dynamic_update_index_in_dim(
                v_self, v_i, pos, axis=1)
        self_bias_row = self.self_bias.row(pos, l_tgt)
        if use_flash:
            from ...ops.decode_attention import flash_decode_attention
            q = self.self_attn.q_proj(h)  # [B, H, Dh]
            a = flash_decode_attention(q, k_cache, v_cache, pos,
                                       self_bias_row)
            a = self.self_attn.o_proj(a)
        else:
            causal_row = jnp.where(jnp.arange(l_tgt) <= pos, 0.0, NEG_INF)
            step_fn = (self.self_attn.step_lmin if lmin
                       else self.self_attn.step)
            a = step_fn(h, k_cache, v_cache, bias_row=self_bias_row,
                        mask_row=causal_row)
        x_i = x_i + a
        cross_bias_row = (self.cross_bias.row(pos, l_src)
                          if self.cross_bias is not None else None)
        cross_mask_row = None
        if self.aligned:
            e_q = pos // self.num_channels_decoder
            cross_mask_row = jnp.where(jnp.arange(l_src) == e_q,
                                       0.0, NEG_INF)
        cross_fn = (self.cross_attn.step_lmin if lmin
                    else self.cross_attn.step)
        c = cross_fn(self.ln2(x_i), mem_k, mem_v,
                     bias_row=cross_bias_row, mask_row=cross_mask_row)
        x_i = x_i + c
        x_i = x_i + self.mlp(self.ln3(x_i), deterministic=True)
        return x_i, k_cache, v_cache


def causal_mask(length: int) -> jnp.ndarray:
    """Additive [L, L] mask allowing j <= i (reference
    ``transformer.py:482-500``)."""
    i = jnp.arange(length)
    return jnp.where(i[:, None] >= i[None, :], 0.0, NEG_INF)


def anti_causal_mask(length: int) -> jnp.ndarray:
    """Transpose of the causal mask: position i sees j >= i (the
    self-conditional top encoder, ``transformer.py:752-758``)."""
    i = jnp.arange(length)
    return jnp.where(i[:, None] <= i[None, :], 0.0, NEG_INF)


def identity_mask(length: int) -> jnp.ndarray:
    i = jnp.arange(length)
    return jnp.where(i[:, None] == i[None, :], 0.0, NEG_INF)
