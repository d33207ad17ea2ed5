"""Pallas prefix-prime megakernel: fill the KV caches for a KNOWN
token prefix with ONE kernel call (all decoder layers fused).

Inpainting with a concrete mask knows every token before the first
masked position (``sample.py``'s ``scan_from``); the sampling scan can
therefore start there — but only if the self-attention caches already
hold the prefix K/V. The reference has no cache at all (it re-runs a
full forward per token, ``/root/reference/sample.py:268-306``); our XLA
``prefix_kv`` forward (``models/prior/transformer.py:442-460``) fills
the cache correctly but pays per-HLO-op dispatch overhead that eats
most of the priming win at B=1 (measured, see CLAUDE.md). This kernel
runs the whole prefix forward — LN, self attention (causal, relative
bias), cross attention (aligned gather or full relative-bias), MLP, and
the per-layer K/V projections — as one ``pallas_call``, writing rows
``[0, p0)`` of the step-kernel's KV cache layout in place.

Mosaic notes (see ops/decode_step_kernel.py for the shared pitfalls):
multi-query per-head attention cannot lane-split [P, d] into heads, so
per-head logits use a lane-masked NT dot — ``(q * head_mask_h) @ k^T``
contracts the full d lanes but only head h's lanes are non-zero, giving
exactly ``q_h @ k_h^T`` at 8x the (negligible) FLOPs. Weights stream
from HBM per layer; biases stream per layer as [H, P, P] so a head's
[P, P] tile is a static major-dim slice.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln(v, scale, bias):
    v32 = v.astype(jnp.float32)
    mu = jnp.mean(v32, axis=-1, keepdims=True)
    var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
    return (v32 - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias


def _nt_dot(a, b):
    """a [M, d] @ b [N, d]^T -> [M, N] (f32 accumulate)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _head_mask(lane, h: int, head_dim: int):
    return jnp.logical_and(lane >= h * head_dim,
                           lane < (h + 1) * head_dim).astype(jnp.float32)


def _prefix_prime_kernel(x_ref, mem_k_ref, mem_v_ref, bqkv_ref, bo_ref,
                         boc_ref, bqc_ref, b1_ref, b2_ref, ln_ref,
                         wqkv_hbm, wo_hbm, woc_hbm, wqc_hbm, w1_hbm,
                         w2_hbm, bias_hbm, cross_bias_hbm, kv_hbm,
                         kv_out_ref,
                         *, n_layers: int, num_heads: int, d: int,
                         d_ff: int, p0: int, p_pad: int, batch: int,
                         channels: int, aligned: bool, e_src_real: int):
    """x_ref [B, P_pad, d]; bias_hbm [n_layers, H, P_pad, P_pad] f32;
    cross_bias_hbm [n_layers, H, P_pad, E_pad] f32 (zeros when aligned);
    kv caches [n_layers, 2, B, l_pad, d] (aliased in/out; rows [0, P_pad)
    overwritten — [0, p0) with the prefix K/V, [p0, P_pad) with zeros,
    which the sequential scan then fills position by position)."""
    head_dim = d // num_heads
    e_pad = mem_v_ref.shape[2]
    scale_attn = 1.0 / (head_dim ** 0.5)

    def body(x_buf, kbuf, vbuf, wbuf_qkv, wbuf_o, wbuf_oc, wbuf_1,
             wbuf_2, bias_buf, cross_buf, sem, kv_sem):
        row2 = jax.lax.broadcasted_iota(jnp.int32, (p_pad, p_pad), 0)
        col2 = jax.lax.broadcasted_iota(jnp.int32, (p_pad, p_pad), 1)
        causal = row2 >= col2  # key j visible to query i iff j <= i
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
        # aligned cross gather: query at position p reads source event
        # p // channels (decode_step_kernel.py's e_q)
        ev_row = jax.lax.broadcasted_iota(
            jnp.int32, (p_pad, e_pad), 0) // channels
        ev_col = jax.lax.broadcasted_iota(jnp.int32, (p_pad, e_pad), 1)
        gather_onehot = (ev_row == ev_col)
        src_valid = ev_col < e_src_real
        # rows >= p0 belong to the sequential scan: zero their K/V
        keep = (jax.lax.broadcasted_iota(
            jnp.int32, (batch * p_pad, 1), 0) % p_pad) < p0

        x_buf[:] = x_ref[:].reshape(batch * p_pad, d).astype(jnp.float32)

        for l in range(n_layers):
            pltpu.make_async_copy(wqkv_hbm.at[l], wbuf_qkv, sem).start()
            pltpu.make_async_copy(wqkv_hbm.at[l], wbuf_qkv, sem).wait()
            pltpu.make_async_copy(bias_hbm.at[l], bias_buf, sem).start()
            pltpu.make_async_copy(bias_hbm.at[l], bias_buf, sem).wait()

            x = x_buf[:]
            h1 = _ln(x, ln_ref[l, 0], ln_ref[l, 1]).astype(wbuf_qkv.dtype)
            qkv = (jnp.dot(h1, wbuf_qkv[:],
                           preferred_element_type=jnp.float32)
                   + bqkv_ref[l].astype(jnp.float32))  # [B*P, 3d]
            q_all = qkv[:, :d]
            k_all = qkv[:, d:2 * d]
            v_all = qkv[:, 2 * d:]

            # stage the prefix K/V rows and DMA them into the cache;
            # the copies drain while the attention math runs
            kbuf[:] = jnp.where(keep, k_all, 0.0).astype(
                kbuf.dtype).reshape(batch, p_pad, d)
            vbuf[:] = jnp.where(keep, v_all, 0.0).astype(
                vbuf.dtype).reshape(batch, p_pad, d)
            k_copy = pltpu.make_async_copy(
                kbuf, kv_out_ref.at[l, 0, :, pl.ds(0, p_pad), :], kv_sem)
            v_copy = pltpu.make_async_copy(
                vbuf, kv_out_ref.at[l, 1, :, pl.ds(0, p_pad), :], kv_sem)
            k_copy.start()
            v_copy.start()

            pltpu.make_async_copy(wo_hbm.at[l], wbuf_o, sem).start()

            attn_out = []
            for b in range(batch):
                q_b = q_all[b * p_pad:(b + 1) * p_pad]
                k_b = k_all[b * p_pad:(b + 1) * p_pad]
                v_b = v_all[b * p_pad:(b + 1) * p_pad]
                acc_b = jnp.zeros((p_pad, d), jnp.float32)
                for h in range(num_heads):
                    mask_h = _head_mask(lane, h, head_dim)
                    logits = _nt_dot(q_b * mask_h, k_b) * scale_attn
                    logits = logits + bias_buf[h]
                    logits = jnp.where(causal, logits, NEG_INF)
                    m = jnp.max(logits, axis=1, keepdims=True)
                    p = jnp.exp(logits - m)
                    p = p / jnp.sum(p, axis=1, keepdims=True)
                    acc_b = acc_b + jnp.dot(
                        p, v_b * mask_h,
                        preferred_element_type=jnp.float32)
                attn_out.append(acc_b)
            a = (jnp.concatenate(attn_out, axis=0) if batch > 1
                 else attn_out[0])

            pltpu.make_async_copy(wo_hbm.at[l], wbuf_o, sem).wait()
            x = x + (jnp.dot(a.astype(wbuf_o.dtype), wbuf_o[:],
                             preferred_element_type=jnp.float32)
                     + bo_ref[l].astype(jnp.float32))

            # cross attention
            if aligned:
                mv_rows = [jnp.dot(
                    gather_onehot.astype(mem_v_ref.dtype),
                    mem_v_ref[l, b],
                    preferred_element_type=jnp.float32)
                    for b in range(batch)]
                mv = (jnp.concatenate(mv_rows, axis=0) if batch > 1
                      else mv_rows[0])
            else:
                pltpu.make_async_copy(wqc_hbm.at[l], wbuf_oc, sem).start()
                pltpu.make_async_copy(wqc_hbm.at[l], wbuf_oc, sem).wait()
                pltpu.make_async_copy(cross_bias_hbm.at[l], cross_buf,
                                      sem).start()
                pltpu.make_async_copy(cross_bias_hbm.at[l], cross_buf,
                                      sem).wait()
                h2 = _ln(x, ln_ref[l, 2], ln_ref[l, 3]
                         ).astype(wbuf_oc.dtype)
                q_c_all = (jnp.dot(h2, wbuf_oc[:],
                                   preferred_element_type=jnp.float32)
                           + bqc_ref[l].astype(jnp.float32))
                mv_rows = []
                for b in range(batch):
                    q_cb = q_c_all[b * p_pad:(b + 1) * p_pad]
                    mk = mem_k_ref[l, b].astype(jnp.float32)  # [E, d]
                    mvb = mem_v_ref[l, b].astype(jnp.float32)
                    acc_b = jnp.zeros((p_pad, d), jnp.float32)
                    for h in range(num_heads):
                        mask_h = _head_mask(lane, h, head_dim)
                        logits = _nt_dot(q_cb * mask_h, mk) * scale_attn
                        logits = logits + cross_buf[h]
                        logits = jnp.where(src_valid, logits, NEG_INF)
                        m = jnp.max(logits, axis=1, keepdims=True)
                        p = jnp.exp(logits - m)
                        p = p / jnp.sum(p, axis=1, keepdims=True)
                        acc_b = acc_b + jnp.dot(
                            p, mvb * mask_h,
                            preferred_element_type=jnp.float32)
                    mv_rows.append(acc_b)
                mv = (jnp.concatenate(mv_rows, axis=0) if batch > 1
                      else mv_rows[0])
            pltpu.make_async_copy(woc_hbm.at[l], wbuf_oc, sem).start()
            pltpu.make_async_copy(woc_hbm.at[l], wbuf_oc, sem).wait()
            x = x + (jnp.dot(mv.astype(wbuf_oc.dtype), wbuf_oc[:],
                             preferred_element_type=jnp.float32)
                     + boc_ref[l].astype(jnp.float32))

            # MLP
            pltpu.make_async_copy(w1_hbm.at[l], wbuf_1, sem).start()
            pltpu.make_async_copy(w1_hbm.at[l], wbuf_1, sem).wait()
            h3 = _ln(x, ln_ref[l, 4], ln_ref[l, 5]).astype(wbuf_1.dtype)
            mid = jnp.maximum(
                jnp.dot(h3, wbuf_1[:], preferred_element_type=jnp.float32)
                + b1_ref[l].astype(jnp.float32), 0.0)
            pltpu.make_async_copy(w2_hbm.at[l], wbuf_2, sem).start()
            pltpu.make_async_copy(w2_hbm.at[l], wbuf_2, sem).wait()
            x = x + (jnp.dot(mid.astype(wbuf_2.dtype), wbuf_2[:],
                             preferred_element_type=jnp.float32)
                     + b2_ref[l].astype(jnp.float32))
            x_buf[:] = x

            # the staging buffers are rewritten next layer: drain first
            k_copy.wait()
            v_copy.wait()

    pl.run_scoped(
        body,
        x_buf=pltpu.VMEM((batch * p_pad, d), jnp.float32),
        kbuf=pltpu.VMEM((batch, p_pad, d), kv_hbm.dtype),
        vbuf=pltpu.VMEM((batch, p_pad, d), kv_hbm.dtype),
        wbuf_qkv=pltpu.VMEM((d, 3 * d), wqkv_hbm.dtype),
        wbuf_o=pltpu.VMEM((d, d), wo_hbm.dtype),
        wbuf_oc=pltpu.VMEM((d, d), woc_hbm.dtype),
        wbuf_1=pltpu.VMEM((d, d_ff), w1_hbm.dtype),
        wbuf_2=pltpu.VMEM((d_ff, d), w2_hbm.dtype),
        bias_buf=pltpu.VMEM((num_heads, p_pad, p_pad), jnp.float32),
        cross_buf=pltpu.VMEM(
            (num_heads, p_pad, e_pad) if not aligned else (1, 8, 128),
            jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
        kv_sem=pltpu.SemaphoreType.DMA(()),
    )


def fused_prefix_prime(params: Dict[str, jnp.ndarray],
                       bias_prefix: jnp.ndarray, x_prefix: jnp.ndarray,
                       mem_kv, kv_caches: jnp.ndarray, *,
                       p0: int, channels: int,
                       cross_bias_prefix: Optional[jnp.ndarray] = None,
                       e_src_real: Optional[int] = None,
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """Prime rows [0, p0) of ``kv_caches`` from the known prefix.

    x_prefix [B, P_pad, d]: embedded with-start prefix rows (the same
    ``emb_padded[tok] + posfull`` rows the scan uses), P_pad = p0 rounded
    up to the 128-lane tile; bias_prefix [n_layers, H, P_pad, P_pad]
    (transposed slice of ``precompute_bias_rows``); cross_bias_prefix
    [n_layers, H, P_pad, E_pad] or None for aligned decoders;
    mem_kv (mem_k, mem_v) [n_layers, B, E_pad, d];
    kv_caches [n_layers, 2, B, l_pad, d], aliased in/out.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    mem_k, mem_v = mem_kv if isinstance(mem_kv, tuple) else (mem_kv, mem_kv)
    n_layers, _, batch, l_pad, d = kv_caches.shape
    d_ff = params["b1"].shape[-1]
    num_heads = bias_prefix.shape[1]
    p_pad = bias_prefix.shape[2]
    assert x_prefix.shape == (batch, p_pad, d), (x_prefix.shape, p_pad)
    assert 0 < p0 <= p_pad <= l_pad
    aligned = cross_bias_prefix is None
    if cross_bias_prefix is None:
        cross_bias_prefix = jnp.zeros(
            (n_layers, num_heads, p_pad, mem_v.shape[2]), jnp.float32)
    if e_src_real is None:
        e_src_real = mem_v.shape[2]

    kernel = functools.partial(
        _prefix_prime_kernel, n_layers=n_layers, num_heads=num_heads,
        d=d, d_ff=d_ff, p0=int(p0), p_pad=int(p_pad), batch=batch,
        channels=channels, aligned=aligned, e_src_real=int(e_src_real))

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    (kv_out,) = pl.pallas_call(
        kernel,
        in_specs=[vmem] * 10 + [any_] * 9,
        out_specs=[any_],
        out_shape=[jax.ShapeDtypeStruct(kv_caches.shape,
                                        kv_caches.dtype)],
        input_output_aliases={18: 0},  # kv_caches
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x_prefix, mem_k, mem_v, params["bqkv"], params["bo"],
      params["bo_c"], params["bq_c"], params["b1"], params["b2"],
      params["ln"],
      params["wqkv"], params["wo"], params["wo_c"], params["wq_c"],
      params["w1"], params["w2"],
      bias_prefix.astype(jnp.float32),
      cross_bias_prefix.astype(jnp.float32), kv_caches)
    return kv_out
