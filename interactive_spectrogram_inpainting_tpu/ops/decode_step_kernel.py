"""Pallas fused decode STEP: the entire per-token computation in one
kernel — the "KV-cached single-token decode step" kernel named in
BASELINE.json's north star.

Motivation (measured on v5e-1, see CLAUDE.md): the scan-based sampler's
per-step cost is dominated by per-HLO-op overhead (~2-4us x ~300 ops
~= 0.38 ms/step at B=1), not FLOPs or bandwidth. This kernel collapses a
full decode step — token embedding, all decoder layers (pre-LN self
attention over the KV cache, aligned cross attention, MLP), final norm,
logits projection, temperature and Gumbel-argmax sampling — into ONE
pallas_call, streaming per-layer weights from HBM and updating the KV
caches in place via input/output aliasing.

v1 scope (the single-note inpaint latency path):
- bottom-prior family: ``use_aligned_decoder=True`` (aligned cross
  attention over a single source cell reduces to a value gather — the
  softmax over one key is 1), no positional class conditioning;
- small batch (the full cache prefix is DMA'd per step; B <= 4 keeps it
  in VMEM alongside the weight buffers);
- no top-k/top-p (temperature + Gumbel argmax == categorical sampling);
  the XLA scan path remains for filtered sampling and for the
  self-conditional top prior.

Numerics: weights/caches bf16, logits and softmax f32. Sampling inside
the kernel uses the TPU PRNG (pltpu.prng_random_bits), so token streams
differ from the XLA path's threefry — distribution-equivalent, not
bitwise (RNG parity is defined as greedy parity, SURVEY.md section 7.3).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_decode_params(model, variables, dtype=jnp.bfloat16
                       ) -> Dict[str, jnp.ndarray]:
    """Stack per-layer weights from the flax tree into kernel-friendly
    arrays (heads flattened, qkv concatenated, bf16). Trace-safe (pure
    jnp): under jit the packing is hoisted as loop-invariant."""
    cfg = model.config
    p = variables["params"]
    d = cfg.d_model
    n_layers = cfg.conditional_model_num_decoder_layers

    def flat_kernel(w):  # [d, H, Dh] -> [d, d]
        return jnp.asarray(w).reshape(d, -1)

    def flat_bias(b):  # [H, Dh] -> [d]
        return jnp.asarray(b).reshape(-1)

    wqkv, bqkv, wo, bo, wo_c, bo_c = [], [], [], [], [], []
    wq_c, bq_c = [], []
    w1, b1, w2, b2, ln = [], [], [], [], []
    for i in range(n_layers):
        layer = p[f"decoder_layer_{i}"]
        sa = layer["self_attn"]
        ca = layer["cross_attn"]
        wq_c.append(flat_kernel(ca["q"]["kernel"]))
        bq_c.append(flat_bias(ca["q"]["bias"]))
        wqkv.append(jnp.concatenate(
            [flat_kernel(sa["q"]["kernel"]), flat_kernel(sa["k"]["kernel"]),
             flat_kernel(sa["v"]["kernel"])], axis=1))
        bqkv.append(jnp.concatenate(
            [flat_bias(sa["q"]["bias"]), flat_bias(sa["k"]["bias"]),
             flat_bias(sa["v"]["bias"])]))
        wo.append(jnp.asarray(sa["o"]["kernel"]).reshape(d, d))
        bo.append(jnp.asarray(sa["o"]["bias"]))
        wo_c.append(jnp.asarray(ca["o"]["kernel"]).reshape(d, d))
        bo_c.append(jnp.asarray(ca["o"]["bias"]))
        w1.append(jnp.asarray(layer["mlp"]["Dense_0"]["kernel"]))
        b1.append(jnp.asarray(layer["mlp"]["Dense_0"]["bias"]))
        w2.append(jnp.asarray(layer["mlp"]["Dense_1"]["kernel"]))
        b2.append(jnp.asarray(layer["mlp"]["Dense_1"]["bias"]))
        ln.append(jnp.stack([
            jnp.asarray(layer["ln1"]["scale"]), jnp.asarray(layer["ln1"]["bias"]),
            jnp.asarray(layer["ln2"]["scale"]), jnp.asarray(layer["ln2"]["bias"]),
            jnp.asarray(layer["ln3"]["scale"]), jnp.asarray(layer["ln3"]["bias"]),
        ]))

    eff = cfg.embeddings_effective_dim
    # effective embedding table: embed @ linear + bias, zero-padded to
    # d_model lanes; one extra all-zeros row for "no token" (start rows)
    emb = (jnp.asarray(p["target_embed"]["embedding"])
           @ jnp.asarray(p["target_embeddings_linear"]["kernel"])
           + jnp.asarray(p["target_embeddings_linear"]["bias"]))
    n_class = emb.shape[0]
    rows = _round_up(n_class + 1, LANE)
    emb_padded = jnp.zeros((rows, d), jnp.float32)
    emb_padded = emb_padded.at[:n_class, :eff].set(emb)

    return {
        "wqkv": jnp.stack(wqkv).astype(dtype),
        "bqkv": jnp.stack(bqkv).astype(dtype),
        "wo": jnp.stack(wo).astype(dtype),
        "bo": jnp.stack(bo).astype(dtype),
        "wo_c": jnp.stack(wo_c).astype(dtype),
        "bo_c": jnp.stack(bo_c).astype(dtype),
        "wq_c": jnp.stack(wq_c).astype(dtype),
        "bq_c": jnp.stack(bq_c).astype(dtype),
        "w1": jnp.stack(w1).astype(dtype),
        "b1": jnp.stack(b1).astype(dtype),
        "w2": jnp.stack(w2).astype(dtype),
        "b2": jnp.stack(b2).astype(dtype),
        "ln": jnp.stack(ln).astype(jnp.float32),
        "ln_final": jnp.stack(
            [jnp.asarray(p["decoder_norm"]["scale"]),
             jnp.asarray(p["decoder_norm"]["bias"])]).astype(jnp.float32),
        "w_logits": jnp.asarray(p["project_logits"]["kernel"]).astype(dtype),
        "b_logits": jnp.asarray(p["project_logits"]["bias"]).astype(
            jnp.float32),
        "emb_padded": emb_padded.astype(dtype),
    }


def precompute_mem_values(model, variables, memory):
    """Cross-attention K and V projections of the encoder memory,
    stacked per layer: two [n_layers, B, E_src, d] arrays."""
    cfg = model.config
    d = cfg.d_model
    ks, vs = [], []
    for i in range(cfg.conditional_model_num_decoder_layers):
        ca = variables["params"][f"decoder_layer_{i}"]["cross_attn"]
        for dst, name in ((ks, "k"), (vs, "v")):
            proj = jnp.einsum("bld,dhk->blhk", memory,
                              jnp.asarray(ca[name]["kernel"])
                              ) + jnp.asarray(ca[name]["bias"])
            dst.append(proj.reshape(memory.shape[0], memory.shape[1], d))
    return (jnp.stack(ks).astype(memory.dtype),
            jnp.stack(vs).astype(memory.dtype))


def precompute_cross_bias_rows(model, variables, e_pad: int,
                               dtype=jnp.float32):
    """cross rows [n_layers, Lp_steps, e_pad, H] (None when the decoder
    is aligned or uses no cross bias)."""
    cfg = model.config
    if cfg.use_aligned_decoder or cfg.use_identity_memory_mask:
        return None
    c = cfg.target_num_channels
    steps = _round_up(c + cfg.target_sequence_length, LANE)
    h = cfg.conditional_model_nhead
    rows = []
    for i in range(cfg.conditional_model_num_decoder_layers):
        layer_params = variables["params"][f"decoder_layer_{i}"]
        if "cross_bias" not in layer_params:
            return None
        table = layer_params["cross_bias"]["rel_bias"]  # [H, Cq, 1, R]
        _, n_cq, n_ck, max_rel = table.shape
        positions = jnp.arange(steps)
        e_q = positions // c
        c_q = positions % c
        keys = jnp.arange(e_pad)  # source has one channel per event
        n_events_src = cfg.source_sequence_length + 1
        rel = jnp.clip(e_q[:, None] - keys[None, :] + (n_events_src - 1),
                       0, max_rel - 1)
        flat_idx = (c_q[:, None] * n_ck * max_rel + 0 * max_rel + rel)
        flat_table = table.reshape(h, -1)
        row = jnp.take(flat_table, flat_idx, axis=1, mode="clip")
        rows.append(jnp.transpose(row, (1, 2, 0)))
    return jnp.stack(rows).astype(dtype)


def precompute_position_features(model, variables, start_block,
                                 pos_features, dtype=jnp.bfloat16):
    """posfull [Lp_steps, d]: start rows then positional rows (the token
    embedding is added separately in the kernel)."""
    cfg = model.config
    d = cfg.d_model
    c = cfg.target_num_channels
    length = cfg.target_sequence_length
    eff = cfg.embeddings_effective_dim
    steps = _round_up(c + length, LANE)
    posfull = jnp.zeros((steps, d), jnp.float32)
    # start rows occupy the full d_model (token contribution suppressed
    # via the zero embedding row)
    posfull = posfull.at[:c].set(start_block[0].astype(jnp.float32))
    pos_block = jnp.zeros((length, d), jnp.float32)
    pos_block = pos_block.at[:, eff:eff + pos_features.shape[-1]].set(
        pos_features.astype(jnp.float32))
    posfull = posfull.at[c:c + length].set(pos_block)
    return posfull.astype(dtype)


def precompute_bias_rows(model, variables, l_pad: int,
                         dtype=jnp.float32) -> jnp.ndarray:
    """self_rows [n_layers, Lp_steps, l_pad, H]: the relative-attention
    bias row of every query position, per layer (one-time per call)."""
    cfg = model.config
    c = cfg.target_num_channels
    length = cfg.target_sequence_length
    steps = _round_up(c + length, LANE)
    n_layers = cfg.conditional_model_num_decoder_layers
    h = cfg.conditional_model_nhead
    rows = []
    for i in range(n_layers):
        table = variables["params"][f"decoder_layer_{i}"]["self_bias"][
            "rel_bias"]  # [H, C, C, R]
        _, n_cq, n_ck, max_rel = table.shape
        positions = jnp.arange(steps)
        e_q = positions // c
        c_q = positions % c
        keys = jnp.arange(l_pad)
        e_k = keys // c
        c_k = keys % c
        rel = jnp.clip(e_q[:, None] - e_k[None, :]
                       + (cfg.target_num_events + 1 - 1),
                       0, max_rel - 1)
        flat_idx = ((c_q[:, None] * n_ck + c_k[None, :]) * max_rel + rel)
        flat_table = table.reshape(h, -1)
        row = jnp.take(flat_table, flat_idx, axis=1)  # [H, steps, l_pad]
        rows.append(jnp.transpose(row, (1, 2, 0)))  # [steps, l_pad, H]
    return jnp.stack(rows).astype(dtype)  # [n_layers, steps, l_pad, H]


def _fused_step_kernel(scalars_ref, x_tok_ref, cur_tok_ref, temp_ref,
                       gumbel_ref, bias_step_ref, cross_bias_step_ref,
                       emb_ref, posfull_ref, bqkv_ref, bo_ref, boc_ref,
                       bqc_ref, b1_ref, b2_ref, ln_ref, lnf_ref, wlog_ref,
                       blog_ref,
                       wqkv_hbm, wo_hbm, woc_hbm, wqc_hbm, w1_hbm, w2_hbm,
                       mem_k_ref, mem_v_ref, kv_hbm,
                       token_out_ref, kv_out_ref,
                       *, n_layers: int, num_heads: int, d: int,
                       d_ff: int, n_class: int, l_pad: int,
                       channels: int, aligned: bool, e_src_real: int):
    """See module docstring. scalars: [pos, i_index, is_masked, seed]."""
    batch = x_tok_ref.shape[0]
    head_dim = d // num_heads
    pos = scalars_ref[0]
    i_index = scalars_ref[1]
    is_masked = scalars_ref[2]
    e_q = pos // channels

    def body(wbuf_qkv, wbuf_o, wbuf_oc, wbuf_1, wbuf_2, kbuf, vbuf,
             sem):
        # head-selector for per-head reductions (see decode_attention.py)
        lane_head = jax.lax.broadcasted_iota(
            jnp.int32, (d, num_heads), 0) // head_dim
        head_iota = jax.lax.broadcasted_iota(
            jnp.int32, (d, num_heads), 1)
        sel = (lane_head == head_iota).astype(jnp.float32)

        def ln(v, scale, bias):
            v32 = v.astype(jnp.float32)
            mu = jnp.mean(v32, axis=-1, keepdims=True)
            var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
            return ((v32 - mu) * jax.lax.rsqrt(var + 1e-6)
                    * scale + bias)

        # ---- input embedding: one-hot(token) @ emb + posfull[pos]
        rows = emb_ref.shape[0]
        tok = x_tok_ref[:]  # [B, 1] int32
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (batch, rows), 1)
                  == tok).astype(jnp.float32)
        x = jnp.dot(onehot.astype(emb_ref.dtype), emb_ref[:],
                    preferred_element_type=jnp.float32)
        # dynamic row selection via one-hot matvec (Mosaic requires
        # static sublane alignment for dynamic vector loads)
        n_posrows = posfull_ref.shape[0]
        pos_onehot = (jax.lax.broadcasted_iota(
            jnp.int32, (1, n_posrows), 1) == pos).astype(jnp.float32)
        x = x + jnp.dot(pos_onehot.astype(posfull_ref.dtype),
                        posfull_ref[:],
                        preferred_element_type=jnp.float32)

        scale_attn = 1.0 / (head_dim ** 0.5)

        for l in range(n_layers):
            # stream this layer's weights + cache prefix + bias row
            pltpu.make_async_copy(wqkv_hbm.at[l], wbuf_qkv, sem).start()
            pltpu.make_async_copy(wqkv_hbm.at[l], wbuf_qkv, sem).wait()
            pltpu.make_async_copy(kv_hbm.at[l, 0], kbuf, sem).start()
            pltpu.make_async_copy(kv_hbm.at[l, 0], kbuf, sem).wait()
            pltpu.make_async_copy(kv_hbm.at[l, 1], vbuf, sem).start()
            pltpu.make_async_copy(kv_hbm.at[l, 1], vbuf, sem).wait()
            bias_l = bias_step_ref[l]  # [l_pad, H] (static layer index)

            h1 = ln(x, ln_ref[l, 0], ln_ref[l, 1]).astype(wbuf_qkv.dtype)
            qkv = jnp.dot(h1, wbuf_qkv[:],
                          preferred_element_type=jnp.float32)
            qkv = qkv + bqkv_ref[l].astype(jnp.float32)
            q = qkv[:, :d]
            k_i = qkv[:, d:2 * d]
            v_i = qkv[:, 2 * d:]

            # self attention over cache prefix (single-shot: whole padded
            # cache is in VMEM at small batch) + the fresh position
            kc = kbuf[:].astype(jnp.float32)  # [B, Lp, d]
            vc = vbuf[:].astype(jnp.float32)
            t = (kc * q[:, None, :]).reshape(batch * l_pad, d)
            logits = jnp.dot(t, sel, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST
                             ).reshape(batch, l_pad, num_heads)
            logits = logits * scale_attn + bias_l[None]
            col = jax.lax.broadcasted_iota(jnp.int32, (1, l_pad, 1), 1)
            logits = jnp.where(col < pos, logits, NEG_INF)  # strict <
            # fresh position term
            lp = jnp.dot((k_i * q).astype(jnp.float32), sel,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST
                         ) * scale_attn  # [B, H]
            pos_key_onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (1, l_pad), 1) == pos).astype(jnp.float32)
            bias_at_pos = jnp.dot(pos_key_onehot, bias_l,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
            lp = lp + bias_at_pos
            m = jnp.maximum(jnp.max(logits, axis=1), lp)  # [B, H]
            p_cache = jnp.exp(logits - m[:, None, :])
            p_fresh = jnp.exp(lp - m)
            denom = jnp.sum(p_cache, axis=1) + p_fresh
            p_big = jnp.dot(p_cache.reshape(batch * l_pad, num_heads),
                            sel.T, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST
                            ).reshape(batch, l_pad, d)
            acc = jnp.sum(p_big * vc, axis=1)
            acc = acc + jnp.dot(p_fresh, sel.T,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST
                                ) * v_i
            denom_big = jnp.dot(denom, sel.T,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            a = acc / jnp.maximum(denom_big, 1e-20)

            pltpu.make_async_copy(wo_hbm.at[l], wbuf_o, sem).start()
            pltpu.make_async_copy(wo_hbm.at[l], wbuf_o, sem).wait()
            x = x + (jnp.dot(a.astype(wbuf_o.dtype), wbuf_o[:],
                             preferred_element_type=jnp.float32)
                     + bo_ref[l].astype(jnp.float32))

            n_src = mem_v_ref.shape[2]
            if aligned:
                # aligned cross attention == value gather at e_q (softmax
                # over a single key is 1), as a one-hot matvec
                e_onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, n_src), 1) == e_q
                ).astype(mem_v_ref.dtype)
                mv_rows = [jnp.dot(e_onehot, mem_v_ref[l, b],
                                   preferred_element_type=jnp.float32)
                           for b in range(batch)]
                mv = (jnp.concatenate(mv_rows, axis=0) if batch > 1
                      else mv_rows[0])
            else:
                # full cross attention over the (static) encoder memory
                pltpu.make_async_copy(wqc_hbm.at[l], wbuf_oc, sem).start()
                pltpu.make_async_copy(wqc_hbm.at[l], wbuf_oc, sem).wait()
                h2 = ln(x, ln_ref[l, 2], ln_ref[l, 3]
                        ).astype(wbuf_oc.dtype)
                q_c = (jnp.dot(h2, wbuf_oc[:],
                               preferred_element_type=jnp.float32)
                       + bqc_ref[l].astype(jnp.float32))
                mv_rows = []
                src_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (n_src, 1), 0)
                cross_bias_l = cross_bias_step_ref[l]  # [n_src, H]
                for b in range(batch):
                    mk = mem_k_ref[l, b].astype(jnp.float32)  # [E, d]
                    lq = jnp.dot(mk * q_c[b][None], sel,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST
                                 ) * scale_attn  # [E, H]
                    lq = lq + cross_bias_l
                    lq = jnp.where(src_iota < e_src_real, lq, NEG_INF)
                    mmax = jnp.max(lq, axis=0, keepdims=True)
                    pexp = jnp.exp(lq - mmax)
                    psum = jnp.sum(pexp, axis=0, keepdims=True)
                    w_big = jnp.dot(pexp / psum, sel.T,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
                    mv_rows.append(jnp.sum(
                        w_big * mem_v_ref[l, b].astype(jnp.float32),
                        axis=0, keepdims=True))
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
            h3 = ln(x, ln_ref[l, 4], ln_ref[l, 5]).astype(wbuf_1.dtype)
            mid = jnp.maximum(
                jnp.dot(h3, wbuf_1[:], preferred_element_type=jnp.float32)
                + b1_ref[l].astype(jnp.float32), 0.0)
            pltpu.make_async_copy(w2_hbm.at[l], wbuf_2, sem).start()
            pltpu.make_async_copy(w2_hbm.at[l], wbuf_2, sem).wait()
            x = x + (jnp.dot(mid.astype(wbuf_2.dtype), wbuf_2[:],
                             preferred_element_type=jnp.float32)
                     + b2_ref[l].astype(jnp.float32))

            # write fresh K/V at pos (masked full-buffer update — dynamic
            # sublane stores are alignment-restricted), then write the
            # whole buffer back (0.66 MB DMA per cache per layer)
            row = jax.lax.broadcasted_iota(
                jnp.int32, (1, l_pad, 1), 1) == pos
            kbuf[:] = jnp.where(row, k_i.astype(kbuf.dtype)[:, None, :],
                                kbuf[:])
            vbuf[:] = jnp.where(row, v_i.astype(vbuf.dtype)[:, None, :],
                                vbuf[:])
            pltpu.make_async_copy(kbuf, kv_out_ref.at[l, 0], sem).start()
            pltpu.make_async_copy(kbuf, kv_out_ref.at[l, 0], sem).wait()
            pltpu.make_async_copy(vbuf, kv_out_ref.at[l, 1], sem).start()
            pltpu.make_async_copy(vbuf, kv_out_ref.at[l, 1], sem).wait()

        # final norm + logits + Gumbel sampling
        hf = ln(x, lnf_ref[0], lnf_ref[1]).astype(wlog_ref.dtype)
        logits = jnp.dot(hf, wlog_ref[:],
                         preferred_element_type=jnp.float32)
        logits = logits + blog_ref[:][None]
        logits = logits * (1.0 / temp_ref[0, 0])
        # gumbel noise generated host-side with jax.random.gumbel: with
        # the same key, argmax(logits + gumbel) is BITWISE identical to
        # jax.random.categorical in the XLA sampling path
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
        kbuf=pltpu.VMEM((batch, l_pad, d), kv_hbm.dtype),
        vbuf=pltpu.VMEM((batch, l_pad, d), kv_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def fused_decode_step(params: Dict[str, jnp.ndarray],
                      bias_step: jnp.ndarray, posfull: jnp.ndarray,
                      mem_kv, kv_caches: jnp.ndarray,
                      token_in: jnp.ndarray, cur_token: jnp.ndarray,
                      pos: jnp.ndarray, i_index: jnp.ndarray,
                      is_masked: jnp.ndarray, gumbel: jnp.ndarray,
                      temperature: float, *, n_class: int, channels: int,
                      cross_bias_step: Optional[jnp.ndarray] = None,
                      e_src_real: Optional[int] = None,
                      interpret: Optional[bool] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused decode step.

    kv_caches [n_layers, 2, B, Lp, d] (aliased in/out);
    bias_step [n_layers, Lp, H]: this position's relative-bias rows
    (sliced from precompute_bias_rows output by the driver);
    cross_bias_step [n_layers, E_pad, H] or None (aligned decoders);
    mem_kv: (mem_k, mem_v) [n_layers, B, E_pad, d] (E padded to 8);
    token_in/cur_token [B, 1] int32; returns (new_token [B, 1], caches).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if isinstance(mem_kv, tuple):
        mem_k, mem_v = mem_kv
    else:  # aligned decoders only need the values
        mem_k, mem_v = mem_kv, mem_kv
    n_layers, _, batch, l_pad, d = kv_caches.shape
    d_ff = params["b1"].shape[-1]
    num_heads = bias_step.shape[-1]
    aligned = cross_bias_step is None
    if cross_bias_step is None:
        cross_bias_step = jnp.zeros((n_layers, mem_v.shape[2], num_heads),
                                    jnp.float32)
    if e_src_real is None:
        e_src_real = mem_v.shape[2]

    scalars = jnp.stack([pos, i_index, is_masked,
                         jnp.zeros_like(pos)]).astype(jnp.int32)
    temp = jnp.full((1, 1), temperature, jnp.float32)

    kernel = functools.partial(
        _fused_step_kernel, n_layers=n_layers, num_heads=num_heads,
        d=d, d_ff=d_ff, n_class=n_class, l_pad=l_pad, channels=channels,
        aligned=aligned, e_src_real=int(e_src_real))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # token_in
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cur_token
            pl.BlockSpec(memory_space=pltpu.VMEM),  # temperature
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gumbel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias rows (step)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cross bias (step)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # emb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # posfull
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bqkv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # boc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bqc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_final
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_logits
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_logits
            pl.BlockSpec(memory_space=pl.ANY),  # wqkv
            pl.BlockSpec(memory_space=pl.ANY),  # wo
            pl.BlockSpec(memory_space=pl.ANY),  # wo_c
            pl.BlockSpec(memory_space=pl.ANY),  # wq_c
            pl.BlockSpec(memory_space=pl.ANY),  # w1
            pl.BlockSpec(memory_space=pl.ANY),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mem_k
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mem_v
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
        input_output_aliases={27: 1},  # kv_caches (flat operand index)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scalars, token_in, cur_token, temp, gumbel.astype(jnp.float32),
      bias_step.astype(jnp.float32), cross_bias_step.astype(jnp.float32),
      params["emb_padded"], posfull, params["bqkv"], params["bo"],
      params["bo_c"], params["bq_c"], params["b1"], params["b2"],
      params["ln"], params["ln_final"], params["w_logits"],
      params["b_logits"],
      params["wqkv"], params["wo"], params["wo_c"], params["wq_c"],
      params["w1"], params["w2"], mem_k, mem_v, kv_caches)
    return token_out, kv_out
