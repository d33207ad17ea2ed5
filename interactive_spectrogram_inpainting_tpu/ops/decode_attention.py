"""Pallas flash-decode attention: single-query attention against a KV
cache, streaming only the causal prefix.

This is the hot op of the sampling engine (SURVEY.md section 6: the
reference re-runs a full decoder per token; our scan reduces that to one
cached step per token, and this kernel makes the step's attention
bandwidth-optimal). The dense XLA step reads the whole [B, L, H, Dh]
cache every step; this kernel:

- streams K/V from HBM in ``block_k`` chunks with double buffering,
- stops at the causal bound ``pos`` (on average halving HBM traffic —
  the decode step's dominant cost),
- applies the relative-attention bias row and computes a numerically
  stable online softmax entirely in VMEM,
- tiles the batch over the grid.

Layout: caches are [B, L, H*Dh] (L-major, feature-minor: contiguous
chunk DMAs, 512-wide lanes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _decode_attn_kernel(pos_ref, q_ref, bias_ref, k_hbm, v_hbm, out_ref,
                        *, block_k: int, num_heads: int, head_dim: int,
                        acc_dtype):
    """One batch tile: q [Bt, H*Dh] (VMEM); caches FULL [B, L, H*Dh] in
    HBM/ANY (TPU lowering requires un-blocked ANY refs — the batch tile
    offset is applied in the DMA slices)."""
    bt = q_ref.shape[0]
    length = k_hbm.shape[1]
    d = num_heads * head_dim
    pos = pos_ref[0]
    num_chunks = (pos + 1 + block_k - 1) // block_k
    b0 = pl.program_id(0) * bt

    def body(k_buf, v_buf, sem_k, sem_v, m_ref, l_ref, acc_ref):
        def get_k_dma(slot, chunk):
            return pltpu.make_async_copy(
                k_hbm.at[pl.ds(b0, bt),
                         pl.ds(chunk * block_k, block_k), :],
                k_buf.at[slot], sem_k.at[slot])

        def get_v_dma(slot, chunk):
            return pltpu.make_async_copy(
                v_hbm.at[pl.ds(b0, bt),
                         pl.ds(chunk * block_k, block_k), :],
                v_buf.at[slot], sem_v.at[slot])

        get_k_dma(0, 0).start()
        get_v_dma(0, 0).start()

        m_ref[:] = jnp.full((bt, num_heads), NEG_INF, acc_dtype)
        l_ref[:] = jnp.zeros((bt, num_heads), acc_dtype)
        acc_ref[:] = jnp.zeros((bt, num_heads, head_dim), acc_dtype)

        q = q_ref[:].reshape(bt, 1, num_heads, head_dim).astype(acc_dtype)
        scale = 1.0 / (head_dim ** 0.5)

        # Mosaic cannot lower multi-batch-dim dots; the op is HBM-bound,
        # so the contractions run on the VPU as broadcast-multiply-reduce.
        def chunk_step(c, _):
            slot = c % 2
            nxt = (c + 1) % 2

            @pl.when(c + 1 < num_chunks)
            def _():
                get_k_dma(nxt, c + 1).start()
                get_v_dma(nxt, c + 1).start()

            get_k_dma(slot, c).wait()
            get_v_dma(slot, c).wait()

            k = k_buf[slot].reshape(bt, block_k, num_heads, head_dim)
            v = v_buf[slot].reshape(bt, block_k, num_heads, head_dim)
            # logits [bt, block_k, H]
            logits = jnp.sum(k.astype(acc_dtype) * q, axis=-1) * scale
            # relative-attention bias row slice for this chunk: [H, block_k]
            bias = jax.lax.dynamic_slice(
                bias_ref[:], (0, c * block_k),
                (num_heads, block_k)).astype(acc_dtype)
            logits = logits + jnp.swapaxes(bias, 0, 1)[None]
            # causal bound: positions > pos masked
            col = c * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k, 1), 1)
            logits = jnp.where(col <= pos, logits, NEG_INF)

            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new[:, None, :])  # [bt, block_k, H]
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1)
            acc_ref[:] = (acc_ref[:] * alpha[..., None]
                          + jnp.sum(p[..., None] * v.astype(acc_dtype),
                                    axis=1))
            m_ref[:] = m_new
            return ()

        jax.lax.fori_loop(0, num_chunks, chunk_step, (), unroll=False)
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)[..., None]
        out_ref[:] = out.reshape(bt, d).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, bt, block_k, d), k_hbm.dtype),
        v_buf=pltpu.VMEM((2, bt, block_k, d), v_hbm.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
        m_ref=pltpu.VMEM((bt, num_heads), acc_dtype),
        l_ref=pltpu.VMEM((bt, num_heads), acc_dtype),
        acc_ref=pltpu.VMEM((bt, num_heads, head_dim), acc_dtype),
    )


def flash_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                           v_cache: jnp.ndarray, pos: jnp.ndarray,
                           bias_row: Optional[jnp.ndarray],
                           num_heads: int,
                           block_k: int = 128,
                           block_b: int = 8,
                           interpret: Optional[bool] = None) -> jnp.ndarray:
    """q [B, D], caches [B, Lp, D] (Lp a multiple of block_k),
    pos scalar int32, bias_row [H, Lp] (or None) -> [B, D].

    Computes softmax(q.K^T/sqrt(Dh) + bias + causal(pos)).V reading only
    the first ceil((pos+1)/block_k) chunks of the cache.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    batch, d = q.shape
    length = k_cache.shape[1]
    assert length % block_k == 0, (length, block_k)
    head_dim = d // num_heads
    if bias_row is None:
        bias_row = jnp.zeros((num_heads, length), q.dtype)
    bt = min(block_b, batch)
    while batch % bt:
        bt -= 1
    grid = (batch // bt,)

    kernel = functools.partial(
        _decode_attn_kernel, block_k=block_k, num_heads=num_heads,
        head_dim=head_dim, acc_dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bt, d), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bias row (full)
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((bt, d), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, d), q.dtype),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, bias_row,
      k_cache, v_cache)


def reference_decode_attention(q, k_cache, v_cache, pos, bias_row,
                               num_heads):
    """Dense XLA equivalent (for testing and as fallback)."""
    batch, d = q.shape
    length = k_cache.shape[1]
    head_dim = d // num_heads
    qh = q.reshape(batch, num_heads, head_dim)
    kh = k_cache.reshape(batch, length, num_heads, head_dim)
    vh = v_cache.reshape(batch, length, num_heads, head_dim)
    logits = jnp.einsum("bhd,bkhd->bhk", qh.astype(jnp.float32),
                        kh.astype(jnp.float32)) / (head_dim ** 0.5)
    if bias_row is not None:
        logits = logits + bias_row[None].astype(jnp.float32)
    mask = jnp.arange(length)[None, None, :] <= pos
    logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhk,bkhd->bhd", weights, vh.astype(jnp.float32))
    return out.reshape(batch, d).astype(q.dtype)
