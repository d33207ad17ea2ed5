"""Pallas whole-scan decode megakernel: the ENTIRE autoregressive
sampling loop in ONE kernel call, with every decoder weight resident in
VMEM across steps.

The per-step megakernel (ops/decode_step_kernel.py) re-streams ~8 MB of
weights per layer from HBM every step — a ~60 MB/step DMA floor that
dominates B=1 latency (~0.17 ms/step measured; the FLOPs are trivial).
This kernel loads all layers' weights into VMEM once (~59 MB bf16 for
the full-size priors — v5e VMEM holds it, see the 100 MB limit the
batched kernel already uses) and runs the whole ``[p0, steps)`` token
loop inside the kernel with `lax.fori_loop`:

- KV caches live in VMEM scratch for the whole scan (no HBM cache
  traffic at all); an optional primed cache (ops/prefix_prime_kernel.py
  output) is DMA'd in once when inpainting knows a prefix;
- per-step relative-bias rows stream from HBM double-buffered in
  head-major [n_layers, H, l_pad] layout (minor dim 128-aligned —
  Mosaic rejects HBM DMA slices with an 8-lane minor dim), and the
  attention logits are computed head-major ([H, l_pad]) to consume
  them without in-kernel transposes;
- Gumbel noise is precomputed outside with the XLA threefry keys, so
  stochastic token streams are BITWISE identical to the XLA scan path
  (and to the per-step megakernel path) under the same rng;
- tokens and the inpainting mask are held as [l_pad, 128] f32 columns
  (dynamic row reads/writes go through one-hot matvecs / masked
  full-buffer updates — Mosaic's aligned-sublane rules, see
  ops/decode_step_kernel.py).

Replaces the reference's one-full-forward-per-token loop
(``/root/reference/sample.py:268-306``). B=1 only — the latency path;
batched throughput uses ops/decode_step_batched.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _decode_scan_kernel(tokens_ref, mask_ref, temp_ref, gumbel_ref,
                        emb_ref, posfull_ref, mem_k_ref, mem_v_ref,
                        bqkv_ref, bo_ref, boc_ref, bqc_ref, b1_ref,
                        b2_ref, ln_ref, lnf_ref, wlog_ref, blog_ref,
                        wqkv_ref, wo_ref, woc_ref, wqc_ref, w1_ref,
                        w2_ref, bias_hbm, cross_hbm, kv_in_hbm,
                        tokens_out_ref,
                        *, n_layers: int, num_heads: int, d: int,
                        d_ff: int, n_class: int, l_pad: int,
                        channels: int, p0: int, steps: int,
                        aligned: bool, e_src_real: int,
                        has_prefix: bool):
    head_dim = d // num_heads
    e_pad = mem_v_ref.shape[1]
    scale_attn = 1.0 / (head_dim ** 0.5)
    c = channels

    def body(kv_buf, bias_buf, cross_buf, sem, bias_sem, cross_sem):
        # constants hoisted out of the loop
        lane_head = jax.lax.broadcasted_iota(
            jnp.int32, (d, num_heads), 0) // head_dim
        head_iota = jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 1)
        sel = (lane_head == head_iota).astype(jnp.float32)
        row_l = jax.lax.broadcasted_iota(jnp.int32, (1, l_pad), 1)
        col_cache = jax.lax.broadcasted_iota(jnp.int32, (l_pad, 1), 0)
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (l_pad, 128), 0)
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (l_pad, 128), 1)
                 == 0).astype(jnp.float32)
        src_iota = jax.lax.broadcasted_iota(jnp.int32, (1, e_pad), 1)
        rows_emb = emb_ref.shape[0]

        tokens_out_ref[:] = tokens_ref[:]
        if has_prefix:
            pltpu.make_async_copy(kv_in_hbm, kv_buf, sem).start()
            pltpu.make_async_copy(kv_in_hbm, kv_buf, sem).wait()
        else:
            kv_buf[:] = jnp.zeros(kv_buf.shape, kv_buf.dtype)

        def bias_dma(slot, p):
            return pltpu.make_async_copy(
                bias_hbm.at[:, p], bias_buf.at[slot], bias_sem.at[slot])

        def cross_dma(slot, p):
            return pltpu.make_async_copy(
                cross_hbm.at[:, p], cross_buf.at[slot],
                cross_sem.at[slot])

        bias_dma(0, p0).start()
        if not aligned:
            cross_dma(0, p0).start()

        def ln(v, scale, bias):
            v32 = v.astype(jnp.float32)
            mu = jnp.mean(v32, axis=-1, keepdims=True)
            var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
            return (v32 - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

        def read_row(buf, idx):
            """buf [l_pad, 128] -> [1, 1] value at (idx, lane 0)."""
            onehot = (row_l == idx).astype(jnp.float32)  # [1, l_pad]
            row = jnp.dot(onehot, buf[:] * lane0,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)  # [1,128]
            return jnp.sum(row, axis=1, keepdims=True)

        def step(p, _):
            slot = (p - p0) % 2
            nxt = (p - p0 + 1) % 2

            @pl.when(p + 1 < steps)
            def _():
                bias_dma(nxt, p + 1).start()
                if not aligned:
                    cross_dma(nxt, p + 1).start()

            bias_dma(slot, p).wait()
            if not aligned:
                cross_dma(slot, p).wait()

            i = p - (c - 1)
            i_clip = jnp.clip(i, 0, l_pad - 1)
            e_q = p // c

            # --- input embedding
            tok = read_row(tokens_out_ref, jnp.clip(p - c, 0, l_pad - 1))
            tok = jnp.where(p < c, float(n_class), tok)
            emb_onehot = ((jax.lax.broadcasted_iota(
                jnp.int32, (1, rows_emb), 1)).astype(jnp.float32)
                == tok).astype(emb_ref.dtype)
            x = jnp.dot(emb_onehot, emb_ref[:],
                        preferred_element_type=jnp.float32)
            pos_onehot = (row_l == p).astype(posfull_ref.dtype)
            x = x + jnp.dot(pos_onehot[:, :posfull_ref.shape[0]],
                            posfull_ref[:],
                            preferred_element_type=jnp.float32)

            for l in range(n_layers):
                bias_l = bias_buf[slot, l]  # [H, l_pad] f32 (head-major)
                h1 = ln(x, ln_ref[l, 0], ln_ref[l, 1]
                        ).astype(wqkv_ref.dtype)
                qkv = (jnp.dot(h1, wqkv_ref[l],
                               preferred_element_type=jnp.float32)
                       + bqkv_ref[l].astype(jnp.float32))
                q = qkv[:, :d]
                k_i = qkv[:, d:2 * d]
                v_i = qkv[:, 2 * d:]

                kc = kv_buf[l, 0].astype(jnp.float32)  # [l_pad, d]
                vc = kv_buf[l, 1].astype(jnp.float32)
                # head-major logits: sel^T @ (kc*q)^T via dot_general
                # contracting d on both sides -> [H, l_pad]
                logits = jax.lax.dot_general(
                    sel, kc * q,
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                logits = logits * scale_attn + bias_l  # [H, l_pad]
                logits = jnp.where(row_l < p, logits, NEG_INF)
                lp = jax.lax.dot_general(
                    sel, (k_i * q).astype(jnp.float32),
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST
                ) * scale_attn  # [H, 1]
                pos_key = (row_l == p).astype(jnp.float32)  # [1, l_pad]
                lp = lp + jax.lax.dot_general(
                    bias_l, pos_key,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [H, 1]
                m = jnp.maximum(jnp.max(logits, axis=1, keepdims=True),
                                lp)  # [H, 1]
                p_cache = jnp.exp(logits - m)  # [H, l_pad]
                p_fresh = jnp.exp(lp - m)  # [H, 1]
                denom = (jnp.sum(p_cache, axis=1, keepdims=True)
                         + p_fresh)  # [H, 1]
                # back to key-major weights: [l_pad, d]
                p_big = jax.lax.dot_general(
                    p_cache, sel,
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                acc = jnp.sum(p_big * vc, axis=0, keepdims=True)  # [1,d]
                fresh_row = jax.lax.dot_general(
                    p_fresh, sel,
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [1, d]
                acc = acc + fresh_row * v_i
                denom_row = jax.lax.dot_general(
                    denom, sel,
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [1, d]
                a = acc / jnp.maximum(denom_row, 1e-20)
                x = x + (jnp.dot(a.astype(wo_ref.dtype), wo_ref[l],
                                 preferred_element_type=jnp.float32)
                         + bo_ref[l].astype(jnp.float32))

                # cache write at row p (masked full-buffer update)
                row_hit = col_cache == p  # [l_pad, 1]
                kv_buf[l, 0] = jnp.where(row_hit,
                                         k_i.astype(kv_buf.dtype),
                                         kv_buf[l, 0])
                kv_buf[l, 1] = jnp.where(row_hit,
                                         v_i.astype(kv_buf.dtype),
                                         kv_buf[l, 1])

                # cross attention
                if aligned:
                    e_onehot = (src_iota == e_q).astype(mem_v_ref.dtype)
                    mv = jnp.dot(e_onehot, mem_v_ref[l],
                                 preferred_element_type=jnp.float32)
                else:
                    h2 = ln(x, ln_ref[l, 2], ln_ref[l, 3]
                            ).astype(wqc_ref.dtype)
                    q_c = (jnp.dot(h2, wqc_ref[l],
                                   preferred_element_type=jnp.float32)
                           + bqc_ref[l].astype(jnp.float32))
                    mk = mem_k_ref[l].astype(jnp.float32)  # [E, d]
                    # head-major cross logits [H, E]
                    lq = jax.lax.dot_general(
                        sel, mk * q_c,
                        dimension_numbers=(((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST
                    ) * scale_attn
                    lq = lq + cross_buf[slot, l]  # [H, e_pad]
                    lq = jnp.where(src_iota < e_src_real, lq, NEG_INF)
                    mmax = jnp.max(lq, axis=1, keepdims=True)
                    pexp = jnp.exp(lq - mmax)
                    psum = jnp.sum(pexp, axis=1, keepdims=True)
                    w_big = jax.lax.dot_general(
                        pexp / psum, sel,
                        dimension_numbers=(((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # [E, d]
                    mv = jnp.sum(
                        w_big * mem_v_ref[l].astype(jnp.float32),
                        axis=0, keepdims=True)
                x = x + (jnp.dot(mv.astype(woc_ref.dtype), woc_ref[l],
                                 preferred_element_type=jnp.float32)
                         + boc_ref[l].astype(jnp.float32))

                # MLP
                h3 = ln(x, ln_ref[l, 4], ln_ref[l, 5]
                        ).astype(w1_ref.dtype)
                mid = jnp.maximum(
                    jnp.dot(h3, w1_ref[l],
                            preferred_element_type=jnp.float32)
                    + b1_ref[l].astype(jnp.float32), 0.0)
                x = x + (jnp.dot(mid.astype(w2_ref.dtype), w2_ref[l],
                                 preferred_element_type=jnp.float32)
                         + b2_ref[l].astype(jnp.float32))

            # --- logits + Gumbel-argmax sampling
            hf = ln(x, lnf_ref[0], lnf_ref[1]).astype(wlog_ref.dtype)
            logit = jnp.dot(hf, wlog_ref[:],
                            preferred_element_type=jnp.float32)
            logit = (logit + blog_ref[:][None]) / temp_ref[0, 0]
            g_onehot = (row_l == (p - p0)).astype(jnp.float32)
            g = jnp.dot(g_onehot[:, :gumbel_ref.shape[0]], gumbel_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            winner = jnp.argmax(logit + g, axis=-1
                                ).astype(jnp.float32)  # [1]
            is_masked = read_row(mask_ref, i_clip)
            take = jnp.logical_and(is_masked > 0.5, i >= 0)  # [1,1]
            write = jnp.logical_and(row_tok == i_clip, take)
            tokens_out_ref[:] = jnp.where(
                write, winner.reshape(1, 1), tokens_out_ref[:])
            return 0

        jax.lax.fori_loop(p0, steps, step, 0)

    pl.run_scoped(
        body,
        kv_buf=pltpu.VMEM((n_layers, 2, l_pad, d), kv_in_hbm.dtype),
        bias_buf=pltpu.VMEM((2, n_layers, num_heads, l_pad),
                            jnp.float32),
        cross_buf=pltpu.VMEM(
            (2, n_layers, num_heads, e_pad) if not aligned
            else (2, 1, 8, 128), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
        bias_sem=pltpu.SemaphoreType.DMA((2,)),
        cross_sem=pltpu.SemaphoreType.DMA((2,)),
    )


def fused_decode_scan(params: Dict[str, jnp.ndarray],
                      bias_rows: jnp.ndarray, posfull: jnp.ndarray,
                      mem_kv, kv_primed: Optional[jnp.ndarray],
                      tokens_col: jnp.ndarray, mask_col: jnp.ndarray,
                      gumbel: jnp.ndarray, temperature: float, *,
                      p0: int, steps: int, n_class: int, channels: int,
                      cross_rows: Optional[jnp.ndarray] = None,
                      e_src_real: Optional[int] = None,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Run the whole sampling loop for one sequence (B=1).

    tokens_col/mask_col [l_pad, 128] f32 (token index i at row i, lane 0;
    prepared by the driver); gumbel [steps - p0 rows padded to l_pad,
    n_class] f32 (row r = Gumbel noise for step p0 + r, drawn with the
    XLA scan's per-position keys); bias_rows [n_layers, steps_pad, H,
    l_pad] f32 (precompute_bias_rows output TRANSPOSED head-major —
    HBM DMA slices need the 128-aligned minor dim); cross_rows
    [n_layers, steps_pad, H, e_pad] or None (aligned);
    kv_primed [n_layers, 2, l_pad, d] or None (no known prefix);
    mem_kv (mem_k, mem_v) [n_layers, E_pad, d] (batch squeezed).
    Returns the updated tokens_col.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    mem_k, mem_v = mem_kv if isinstance(mem_kv, tuple) else (mem_kv, mem_kv)
    n_layers = params["bqkv"].shape[0]
    d = params["wo"].shape[-1]
    d_ff = params["b1"].shape[-1]
    num_heads = bias_rows.shape[2]
    l_pad = bias_rows.shape[3]
    aligned = cross_rows is None
    if e_src_real is None:
        e_src_real = mem_v.shape[1]
    dtype = params["wqkv"].dtype
    has_prefix = kv_primed is not None
    if kv_primed is None:
        kv_primed = jnp.zeros((n_layers, 2, l_pad, d), dtype)
    if cross_rows is None:
        cross_rows = jnp.zeros(
            (n_layers, bias_rows.shape[1], num_heads, mem_v.shape[1]),
            jnp.float32)
    wqc = params["wq_c"] if not aligned else jnp.zeros(
        (n_layers, 8, 128), dtype)

    kernel = functools.partial(
        _decode_scan_kernel, n_layers=n_layers, num_heads=num_heads,
        d=d, d_ff=d_ff, n_class=n_class, l_pad=l_pad, channels=channels,
        p0=int(p0), steps=int(steps), aligned=aligned,
        e_src_real=int(e_src_real), has_prefix=has_prefix)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    temp = jnp.full((1, 1), temperature, jnp.float32)
    (tokens_out,) = pl.pallas_call(
        kernel,
        in_specs=[vmem] * 24 + [any_] * 3,
        out_specs=[vmem],
        out_shape=[jax.ShapeDtypeStruct(tokens_col.shape, jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024),
    )(tokens_col.astype(jnp.float32), mask_col.astype(jnp.float32),
      temp, gumbel.astype(jnp.float32), params["emb_padded"], posfull,
      mem_k, mem_v, params["bqkv"], params["bo"], params["bo_c"],
      params["bq_c"], params["b1"], params["b2"], params["ln"],
      params["ln_final"], params["w_logits"], params["b_logits"],
      params["wqkv"], params["wo"], params["wo_c"], wqc,
      params["w1"], params["w2"],
      bias_rows.astype(jnp.float32), cross_rows.astype(jnp.float32),
      kv_primed)
    return tokens_out
