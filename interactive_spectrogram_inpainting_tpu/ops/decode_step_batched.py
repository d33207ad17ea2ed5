"""Batched fused decode step: throughput variant of the megakernel.

The latency megakernel (decode_step_kernel.py) holds the whole KV cache
in VMEM — fine at B<=4, impossible at B=512. This variant keeps the
FULL batch's activations in VMEM (a [B, d] residual stream makes every
weight matmul MXU-shaped) and streams the caches:

- per layer: one whole-batch qkv matmul, then flash-style attention per
  batch tile with double-buffered, causally-bounded K/V chunk DMAs
  (reads only ceil((pos+1)/block_k) chunks — on average HALF the cache),
  then whole-batch output/MLP matmuls;
- cache layout [n_layers, 2, Lp, B, d] so the per-position K/V writeback
  and chunk reads slice only leading dims (DMA-alignment safe);
- aligned cross attention via a [n_layers, E, B, d] layout (value rows
  DMA'd by leading-dim index);
- embedding, final norm, logits, temperature + Gumbel-argmax sampling
  in-kernel, exactly as the latency variant.

v1 scope: aligned bottom prior (the flagship throughput config), B a
multiple of the batch tile.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_step_kernel import _round_up, LANE

NEG_INF = -1e9


def _batched_step_kernel(scalars_ref, x_tok_ref, cur_tok_ref, temp_ref,
                         gumbel_ref, bias_step_ref,
                         emb_ref, posfull_ref, bqkv_ref, bo_ref, boc_ref,
                         b1_ref, b2_ref, ln_ref, lnf_ref, wlog_ref,
                         blog_ref,
                         wqkv_hbm, wo_hbm, woc_hbm, w1_hbm, w2_hbm,
                         mem_v_hbm, kv_hbm,
                         token_out_ref, kv_out_ref,
                         *, n_layers: int, num_heads: int, d: int,
                         d_ff: int, n_class: int, l_pad: int,
                         channels: int, block_k: int, block_b: int):
    batch = x_tok_ref.shape[0]
    head_dim = d // num_heads
    pos = scalars_ref[0]
    i_index = scalars_ref[1]
    is_masked = scalars_ref[2]
    e_q = pos // channels
    num_chunks = (pos + block_k - 1) // block_k  # strict prefix < pos

    def body(wbuf_qkv, wbuf_o, wbuf_oc, wbuf_1, wbuf_2,
             kbuf, vbuf, mv_buf, kv_scratch, acc_ref, m_ref, l_ref,
             a_ref, sems, sem):
        lane_head = jax.lax.broadcasted_iota(
            jnp.int32, (d, num_heads), 0) // head_dim
        head_iota = jax.lax.broadcasted_iota(
            jnp.int32, (d, num_heads), 1)
        sel = (lane_head == head_iota).astype(jnp.float32)

        def ln(v, scale, bias):
            v32 = v.astype(jnp.float32)
            mu = jnp.mean(v32, axis=-1, keepdims=True)
            var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
            return (v32 - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

        rows = emb_ref.shape[0]
        tok = x_tok_ref[:]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (batch, rows), 1)
                  == tok).astype(emb_ref.dtype)
        x = jnp.dot(onehot, emb_ref[:],
                    preferred_element_type=jnp.float32)
        n_posrows = posfull_ref.shape[0]
        pos_onehot = (jax.lax.broadcasted_iota(
            jnp.int32, (1, n_posrows), 1) == pos
        ).astype(posfull_ref.dtype)
        x = x + jnp.dot(pos_onehot, posfull_ref[:],
                        preferred_element_type=jnp.float32)

        scale_attn = 1.0 / (head_dim ** 0.5)

        for l in range(n_layers):
            dma_qkv = pltpu.make_async_copy(wqkv_hbm.at[l], wbuf_qkv,
                                            sems.at[0])
            dma_qkv.start()
            bias_l = bias_step_ref[l]  # [l_pad, H]
            h1 = ln(x, ln_ref[l, 0], ln_ref[l, 1])
            dma_qkv.wait()
            qkv = jnp.dot(h1.astype(wbuf_qkv.dtype), wbuf_qkv[:],
                          preferred_element_type=jnp.float32)
            qkv = qkv + bqkv_ref[l].astype(jnp.float32)
            q = qkv[:, :d]
            k_i = qkv[:, d:2 * d]
            v_i = qkv[:, 2 * d:]

            # fresh-position logit for the whole batch: [B, H]
            lp = jnp.dot((k_i * q), sel,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) * scale_attn
            pos_key_onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (1, l_pad), 1) == pos).astype(jnp.float32)
            bias_at_pos = jnp.dot(pos_key_onehot, bias_l,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
            lp = lp + bias_at_pos  # [B, H]

            # write this position's K/V (leading-dim slice: [l, ., pos])
            kv_scratch[:] = k_i.astype(kv_scratch.dtype)
            pltpu.make_async_copy(
                kv_scratch, kv_out_ref.at[l, 0, pos], sems.at[1]).start()
            pltpu.make_async_copy(
                kv_scratch, kv_out_ref.at[l, 0, pos], sems.at[1]).wait()
            kv_scratch[:] = v_i.astype(kv_scratch.dtype)
            pltpu.make_async_copy(
                kv_scratch, kv_out_ref.at[l, 1, pos], sems.at[2]).start()
            pltpu.make_async_copy(
                kv_scratch, kv_out_ref.at[l, 1, pos], sems.at[2]).wait()

            # attention: chunks outer, WHOLE batch per chunk (one K/V
            # DMA pair per chunk instead of per tile x chunk — the
            # per-step cost is DMA-wait-bound, not bandwidth-bound)
            m_ref[:] = jnp.full((batch, num_heads), NEG_INF, jnp.float32)
            l_ref[:] = jnp.zeros((batch, num_heads), jnp.float32)
            acc_ref[:] = jnp.zeros((batch, d), jnp.float32)

            def get_k(slot, c):
                return pltpu.make_async_copy(
                    kv_hbm.at[l, 0, pl.ds(c * block_k, block_k), :, :],
                    kbuf.at[slot], sems.at[3 + slot])

            def get_v(slot, c):
                return pltpu.make_async_copy(
                    kv_hbm.at[l, 1, pl.ds(c * block_k, block_k), :, :],
                    vbuf.at[slot], sems.at[5 + slot])

            @pl.when(num_chunks > 0)
            def _():
                get_k(0, 0).start()
                get_v(0, 0).start()

            # heavy [bk, B, d] intermediates follow the cache dtype:
            # bf16 halves their VMEM traffic (the large-batch bottleneck);
            # f32 caches keep the path exact for parity tests
            inter_dtype = kv_hbm.dtype
            q_i = q.astype(inter_dtype)
            sel_i = sel.astype(inter_dtype)

            def chunk_step(c, _):
                slot = c % 2
                nxt = (c + 1) % 2

                @pl.when(c + 1 < num_chunks)
                def _():
                    get_k(nxt, c + 1).start()
                    get_v(nxt, c + 1).start()

                get_k(slot, c).wait()
                get_v(slot, c).wait()
                k = kbuf[slot]  # [bk, B, d]
                v = vbuf[slot]
                tprod = (k * q_i[None]).reshape(block_k * batch, d)
                logits = jnp.dot(
                    tprod, sel_i, preferred_element_type=jnp.float32
                ).reshape(block_k, batch, num_heads) * scale_attn
                off = pl.multiple_of(c * block_k, block_k)
                bias_c = bias_step_ref[l, pl.ds(off, block_k), :]
                logits = logits + bias_c[:, None, :]
                col = c * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_k, 1, 1), 0)
                logits = jnp.where(col < pos, logits, NEG_INF)

                m_prev = m_ref[:]
                m_new = jnp.maximum(m_prev, jnp.max(logits, axis=0))
                alpha = jnp.exp(m_prev - m_new)
                pexp = jnp.exp(logits - m_new[None])
                l_ref[:] = l_ref[:] * alpha + jnp.sum(pexp, axis=0)
                p_big = jnp.dot(
                    pexp.astype(inter_dtype).reshape(
                        block_k * batch, num_heads),
                    sel_i.T, preferred_element_type=jnp.float32
                ).astype(inter_dtype).reshape(block_k, batch, d)
                alpha_big = jnp.dot(
                    alpha, sel.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                acc_ref[:] = (acc_ref[:] * alpha_big
                              + jnp.sum((p_big * v).astype(jnp.float32),
                                        axis=0))
                m_ref[:] = m_new
                return ()

            jax.lax.fori_loop(0, num_chunks, chunk_step, (),
                              unroll=False)

            # fresh-position term (whole batch)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, lp)
            alpha = jnp.exp(m_prev - m_new)
            p_fresh = jnp.exp(lp - m_new)
            denom = l_ref[:] * alpha + p_fresh
            acc = (acc_ref[:] * jnp.dot(
                alpha, sel.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
                + jnp.dot(p_fresh, sel.T,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) * v_i)
            denom_big = jnp.dot(
                denom, sel.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            a_ref[:] = acc / jnp.maximum(denom_big, 1e-20)

            dma_o = pltpu.make_async_copy(wo_hbm.at[l], wbuf_o,
                                          sems.at[0])
            dma_o.start()
            dma_o.wait()
            x = x + (jnp.dot(a_ref[:].astype(wbuf_o.dtype), wbuf_o[:],
                             preferred_element_type=jnp.float32)
                     + bo_ref[l].astype(jnp.float32))

            # aligned cross attention: value rows at e_q ([l, e_q] slice)
            pltpu.make_async_copy(mem_v_hbm.at[l, e_q], mv_buf,
                                  sems.at[1]).start()
            dma_oc = pltpu.make_async_copy(woc_hbm.at[l], wbuf_oc,
                                           sems.at[0])
            dma_oc.start()
            pltpu.make_async_copy(mem_v_hbm.at[l, e_q], mv_buf,
                                  sems.at[1]).wait()
            dma_oc.wait()
            x = x + (jnp.dot(mv_buf[:].astype(wbuf_oc.dtype), wbuf_oc[:],
                             preferred_element_type=jnp.float32)
                     + boc_ref[l].astype(jnp.float32))

            # MLP
            dma_1 = pltpu.make_async_copy(w1_hbm.at[l], wbuf_1,
                                          sems.at[0])
            dma_1.start()
            h3 = ln(x, ln_ref[l, 4], ln_ref[l, 5])
            dma_1.wait()
            mid = jnp.maximum(
                jnp.dot(h3.astype(wbuf_1.dtype), wbuf_1[:],
                        preferred_element_type=jnp.float32)
                + b1_ref[l].astype(jnp.float32), 0.0)
            dma_2 = pltpu.make_async_copy(w2_hbm.at[l], wbuf_2,
                                          sems.at[0])
            dma_2.start()
            dma_2.wait()
            x = x + (jnp.dot(mid.astype(wbuf_2.dtype), wbuf_2[:],
                             preferred_element_type=jnp.float32)
                     + b2_ref[l].astype(jnp.float32))

        hf = ln(x, lnf_ref[0], lnf_ref[1])
        logits = jnp.dot(hf.astype(wlog_ref.dtype), wlog_ref[:],
                         preferred_element_type=jnp.float32)
        logits = logits + blog_ref[:][None]
        logits = logits * (1.0 / temp_ref[0, 0])
        winner = jnp.argmax(logits + gumbel_ref[:], axis=-1
                            ).astype(jnp.int32)
        cur = cur_tok_ref[:, 0]
        take_sample = jnp.logical_and(is_masked == 1, i_index >= 0)
        token_out_ref[:] = jnp.where(take_sample, winner, cur
                                     ).reshape(batch, 1)

    pl.run_scoped(
        body,
        wbuf_qkv=pltpu.VMEM((d, 3 * d), wqkv_hbm.dtype),
        wbuf_o=pltpu.VMEM((d, d), wo_hbm.dtype),
        wbuf_oc=pltpu.VMEM((d, d), woc_hbm.dtype),
        wbuf_1=pltpu.VMEM((d, d_ff), w1_hbm.dtype),
        wbuf_2=pltpu.VMEM((d_ff, d), w2_hbm.dtype),
        kbuf=pltpu.VMEM((2, block_k, batch, d), kv_hbm.dtype),
        vbuf=pltpu.VMEM((2, block_k, batch, d), kv_hbm.dtype),
        mv_buf=pltpu.VMEM((batch, d), mem_v_hbm.dtype),
        kv_scratch=pltpu.VMEM((batch, d), kv_hbm.dtype),
        acc_ref=pltpu.VMEM((batch, d), jnp.float32),
        m_ref=pltpu.VMEM((batch, num_heads), jnp.float32),
        l_ref=pltpu.VMEM((batch, num_heads), jnp.float32),
        a_ref=pltpu.VMEM((batch, d), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((7,)),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def fused_decode_step_batched(params: Dict[str, jnp.ndarray],
                              bias_step: jnp.ndarray,
                              posfull: jnp.ndarray,
                              mem_v_t: jnp.ndarray,
                              kv_caches: jnp.ndarray,
                              token_in: jnp.ndarray,
                              cur_token: jnp.ndarray,
                              pos: jnp.ndarray, i_index: jnp.ndarray,
                              is_masked: jnp.ndarray,
                              gumbel: jnp.ndarray, temperature: float,
                              *, n_class: int, channels: int,
                              block_k: int = 128, block_b: int = 8,
                              interpret: Optional[bool] = None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched variant. kv_caches [n_layers, 2, Lp, B, d] (aliased);
    mem_v_t [n_layers, E_pad, B, d]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_layers, _, l_pad, batch, d = kv_caches.shape
    d_ff = params["b1"].shape[-1]
    num_heads = bias_step.shape[-1]
    assert l_pad % block_k == 0, (l_pad, block_k)

    scalars = jnp.stack([pos, i_index, is_masked,
                         jnp.zeros_like(pos)]).astype(jnp.int32)
    temp = jnp.full((1, 1), temperature, jnp.float32)
    kernel = functools.partial(
        _batched_step_kernel, n_layers=n_layers, num_heads=num_heads,
        d=d, d_ff=d_ff, n_class=n_class, l_pad=l_pad, channels=channels,
        block_k=block_k, block_b=block_b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # token_in
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cur_token
            pl.BlockSpec(memory_space=pltpu.VMEM),  # temperature
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gumbel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias rows (step)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # emb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # posfull
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bqkv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # boc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_final
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_logits
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_logits
            pl.BlockSpec(memory_space=pl.ANY),  # wqkv
            pl.BlockSpec(memory_space=pl.ANY),  # wo
            pl.BlockSpec(memory_space=pl.ANY),  # wo_c
            pl.BlockSpec(memory_space=pl.ANY),  # w1
            pl.BlockSpec(memory_space=pl.ANY),  # w2
            pl.BlockSpec(memory_space=pl.ANY),  # mem_v (transposed)
            pl.BlockSpec(memory_space=pl.ANY),  # kv caches
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # token_out
            pl.BlockSpec(memory_space=pl.ANY),  # kv caches out
        ],
    )
    token_out, kv_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, 1), jnp.int32),
            jax.ShapeDtypeStruct(kv_caches.shape, kv_caches.dtype),
        ],
        input_output_aliases={23: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # B=1024 overflows 100MiB by ~0.5MB, so very large batches
            # get 112MiB (v5e VMEM is 128MiB; the compiler reserves the
            # rest). B<=512 keeps the proven 100MiB params (identical
            # compiler params -> identical compile-cache keys).
            vmem_limit_bytes=(112 if batch > 512 else 100) * 1024 * 1024),
    )(scalars, token_in, cur_token, temp, gumbel.astype(jnp.float32),
      bias_step.astype(jnp.float32),
      params["emb_padded"], posfull, params["bqkv"], params["bo"],
      params["bo_c"], params["b1"], params["b2"], params["ln"],
      params["ln_final"], params["w_logits"], params["b_logits"],
      params["wqkv"], params["wo"], params["wo_c"], params["w1"],
      params["w2"], mem_v_t, kv_caches)
    return token_out, kv_out
