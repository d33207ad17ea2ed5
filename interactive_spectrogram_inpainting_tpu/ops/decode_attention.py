"""Pallas flash-decode attention: single-query attention against a KV
cache, streaming only the causal prefix.

This is the hot op of the sampling engine (SURVEY.md section 6: the
reference re-runs a full decoder per token, ``sample.py:268-306``; our
scan reduces that to one cached step per token, and this kernel makes
the step's attention bandwidth-optimal). The dense XLA step reads the
whole cache every step; this kernel:

- streams K/V from HBM in ``block_k`` chunks with double-buffered DMA,
- stops at the causal bound ``pos`` (on average halving HBM traffic —
  the decode step's dominant cost),
- applies the relative-attention bias row and computes a numerically
  stable online softmax entirely in VMEM,
- tiles the batch over the grid.

Mosaic constraints shape the design: multi-batch-dim dots, lane-splitting
shape casts ((B,512)->(B,8,64)) and sub-128 minor dims don't lower. So
caches stay flat [B, L, D=H*Dh] (128-aligned lanes), and the per-head
contraction/expansion runs through a static 0/1 *head-selector* matrix:

    logits[b,k,h] = sum_d (K[b,k,d] * q[b,d]) * sel[d,h]
    weighted[b,k,d] = (p @ sel^T)[b,k,d] * V[b,k,d]

— one VPU multiply plus one [*, D] x [D, H] MXU matmul per chunk, with
only leading-dim reshapes. The op is HBM-bound; this costs nothing.
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
                        *, block_k: int, num_heads: int, acc_dtype):
    """One batch tile. q_ref [bt, D] VMEM; bias_ref [L, H] VMEM; caches
    FULL [B, L, D] in ANY/HBM (batch-tile offset applied in the DMA
    slices); out_ref [bt, D]."""
    bt, d = q_ref.shape
    head_dim = d // num_heads
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
        acc_ref[:] = jnp.zeros((bt, d), acc_dtype)

        q = q_ref[:].astype(acc_dtype)  # [bt, D]
        scale = 1.0 / (head_dim ** 0.5)
        # head-selector: sel[d, h] = 1 iff lane d belongs to head h
        lane_head = jax.lax.broadcasted_iota(
            jnp.int32, (d, num_heads), 0) // head_dim
        head_idx = jax.lax.broadcasted_iota(
            jnp.int32, (d, num_heads), 1)
        sel = (lane_head == head_idx).astype(acc_dtype)  # [D, H]

        def chunk_step(c, _):
            slot = c % 2
            nxt = (c + 1) % 2

            @pl.when(c + 1 < num_chunks)
            def _():
                get_k_dma(nxt, c + 1).start()
                get_v_dma(nxt, c + 1).start()

            get_k_dma(slot, c).wait()
            get_v_dma(slot, c).wait()

            k = k_buf[slot].astype(acc_dtype)  # [bt, block_k, D]
            v = v_buf[slot].astype(acc_dtype)
            t = (k * q[:, None, :]).reshape(bt * block_k, d)
            logits = jnp.dot(t, sel, preferred_element_type=acc_dtype,
                             precision=jax.lax.Precision.HIGHEST)
            logits = logits.reshape(bt, block_k, num_heads) * scale
            bias = bias_ref[pl.ds(c * block_k, block_k), :]  # [block_k, H]
            logits = logits + bias[None].astype(acc_dtype)
            col = c * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k, 1), 1)
            logits = jnp.where(col <= pos, logits, NEG_INF)

            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new[:, None, :])  # [bt, block_k, H]
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1)
            # expand per-head weights back to lanes: p_big [bt, block_k, D]
            p_big = jnp.dot(p.reshape(bt * block_k, num_heads), sel.T,
                            preferred_element_type=acc_dtype,
                            precision=jax.lax.Precision.HIGHEST
                            ).reshape(bt, block_k, d)
            # alpha per lane
            alpha_big = jnp.dot(alpha, sel.T,
                                preferred_element_type=acc_dtype,
                                precision=jax.lax.Precision.HIGHEST)
            acc_ref[:] = (acc_ref[:] * alpha_big
                          + jnp.sum(p_big * v, axis=1))
            m_ref[:] = m_new
            return ()

        jax.lax.fori_loop(0, num_chunks, chunk_step, (), unroll=False)
        l_big = jnp.dot(jnp.maximum(l_ref[:], 1e-20), sel.T,
                        preferred_element_type=acc_dtype,
                        precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = (acc_ref[:] / l_big).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, bt, block_k, d), k_hbm.dtype),
        v_buf=pltpu.VMEM((2, bt, block_k, d), v_hbm.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
        m_ref=pltpu.VMEM((bt, num_heads), acc_dtype),
        l_ref=pltpu.VMEM((bt, num_heads), acc_dtype),
        acc_ref=pltpu.VMEM((bt, d), acc_dtype),
    )


def flash_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                           v_cache: jnp.ndarray, pos: jnp.ndarray,
                           bias_row: Optional[jnp.ndarray],
                           block_k: int = 128,
                           block_b: int = 8,
                           interpret: Optional[bool] = None) -> jnp.ndarray:
    """q [B, H, Dh], caches [B, Lp, H, Dh] (Lp a multiple of block_k),
    pos scalar int32, bias_row [H, Lp] (or None) -> [B, H, Dh].

    Computes softmax(q.K^T/sqrt(Dh) + bias + causal(pos)).V reading only
    the first ceil((pos+1)/block_k) chunks of the cache. Head/lane
    flattening happens here (free bitcasts in XLA); the kernel works on
    flat [B, L, D].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    batch, num_heads, head_dim = q.shape
    length = k_cache.shape[1]
    d = num_heads * head_dim
    assert length % block_k == 0, (length, block_k)
    if bias_row is None:
        bias_t = jnp.zeros((length, num_heads), q.dtype)
    else:
        bias_t = jnp.swapaxes(bias_row, 0, 1)  # [Lp, H]
    bt = min(block_b, batch)
    while batch % bt:
        bt -= 1
    grid = (batch // bt,)

    kernel = functools.partial(_decode_attn_kernel, block_k=block_k,
                               num_heads=num_heads, acc_dtype=jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bt, d), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bias [Lp, H]
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((bt, d), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, d), q.dtype),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), q.reshape(batch, d), bias_t,
      k_cache.reshape(batch, length, d), v_cache.reshape(batch, length, d))
    return out.reshape(batch, num_heads, head_dim)


def reference_decode_attention(q, k_cache, v_cache, pos, bias_row):
    """Dense XLA equivalent (for testing and as fallback).
    q [B, H, Dh], caches [B, L, H, Dh] -> [B, H, Dh]."""
    head_dim = q.shape[-1]
    length = k_cache.shape[1]
    logits = jnp.einsum("bhd,bkhd->bhk", q.astype(jnp.float32),
                        k_cache.astype(jnp.float32)) / (head_dim ** 0.5)
    if bias_row is not None:
        logits = logits + bias_row[None].astype(jnp.float32)
    mask = jnp.arange(length)[None, None, :] <= pos
    logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhk,bkhd->bhd", weights,
                     v_cache.astype(jnp.float32))
    return out.astype(q.dtype)
