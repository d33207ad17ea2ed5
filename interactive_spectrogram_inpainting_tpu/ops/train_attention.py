"""Fused training attention: whole-row softmax(QK^T/sqrt(Dh) + ab).V in
one Pallas call per (head, batch) tile, with a custom backward kernel.

Why this exists (the reference has no analogue — its torch attention
materializes the probability matrix and lets cuDNN autograd rewrite it):
profiling the prior train step on v5e-1 showed it HBM-BOUND at 78% of
peak bandwidth with only 15% MXU use, and ~28 GB/step of the traffic is
XLA materializing the [B, H, 516, 516] attention scores/probabilities in
f32 for the forward AND the backward (the top write-traffic line:
17.45 GB across 32 f32[64,8,516,516] fusions). The prior's sequences are
short (<= 640 tokens), so an entire (head, batch-row) attention — Q, K,
V, the f32 score block and the bias — fits in VMEM at once: no streaming
flash recursion is needed, and the probability matrix NEVER touches HBM.
The backward kernel recomputes it (flash-attention style) and emits
dQ/dK/dV plus the bias gradient.

The additive term ``ab [H, Lq, Lk]`` is batch-shared (relative-attention
bias + causal/aligned/identity masks folded together at trace time, see
``models/prior/attention.py``). Its gradient is accumulated IN VMEM over
the batch grid dimension: the grid is (H, B) with b innermost, so the
dab output block for head h stays resident across all B consecutive
iterations (initialized at b == 0) — one [Lq, Lk] f32 write per head per
step instead of a [B, H, Lq, Lk] materialization.

Mosaic constraints shaping the layout (see ops/decode_attention.py):
sub-128 minor dims don't lower, so heads occupy 128-lane blocks. The
default layout packs TWO heads per block ([B, ceil(H/2), L, 128], head
2h in lanes 0:64, head 2h+1 in lanes 64:128) — with Dh=64 a one-head
block is half zeros, so packing halves every q/k/v/o/do/dq/dk/dv DMA
and the transpose-pad copies feeding them, at identical MXU FLOPs:
per-head scores come from lane-masked dots, since zeroed lanes add
nothing to a contraction (``_fwd_kernel_packed``). ``ISI_ATTN_PACKED=0``
or Dh > 64 falls back to the one-head-per-block [B, H, L, 128] layout.
Sequence lengths are padded to 128 multiples; padded
key columns carry ab = NEG_INF (softmax weight 0) and padded query rows
have zero incoming cotangents, so every gradient of a padding element
is exactly zero and slicing recovers the unpadded result.

Reference workload: ``/root/reference/train_autoregressive_model.py``
:119-371 (the training loop this kernel accelerates).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# The packed kernels hold two f32 [Lqp, Lkp] probability blocks plus the
# [2, Lqp, Lkp] bias block live at once; at Lqp = Lkp = 640 that is
# ~16.3MB of scoped VMEM — just over Mosaic's 16MB default (measured
# OOM on v5e at B=64). v5e has 128MB VMEM/core; 64MB leaves the
# double-buffered input/output windows ample room.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _packed_enabled() -> bool:
    """Head-pair packing switch (``ISI_ATTN_PACKED``, default on).

    With Dh=64, the unpacked layout zero-pads every head to 128 lanes —
    half of ALL attention-kernel HBM traffic (q/k/v/o/do/dq/dk/dv slabs
    plus their transpose-pad copies) is zeros. Packing two heads per
    128-lane block halves that traffic at identical MXU FLOPs: per-head
    scores come from lane-masked dots (zeroed lanes contribute nothing
    to a contraction), see ``_fwd_kernel_packed``.
    """
    return os.environ.get("ISI_ATTN_PACKED", "1") != "0"


def _ceil_to(x: int, mult: int) -> int:
    return (x + mult - 1) // mult * mult


def _fwd_kernel(q_ref, k_ref, v_ref, ab_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]          # [Lqp, Dp]
    k = k_ref[0, 0]          # [Lkp, Dp]
    v = v_ref[0, 0]          # [Lkp, Dp]
    ab = ab_ref[0]           # [Lqp, Lkp] f32
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + ab
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, ab_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dab_ref, *, scale: float):
    b = pl.program_id(1)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    ab = ab_ref[0]
    # recompute the probabilities (never stored)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + ab
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)          # [Lqp, Lkp] f32
    # dP = dO V^T ; dS = P * (dP - rowsum(P * dP))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)                               # [Lqp, Lkp] f32
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    # batch-shared bias gradient, accumulated across the (innermost,
    # consecutive) b iterations while the head-h block is VMEM-resident
    @pl.when(b == 0)
    def _():
        dab_ref[0] = ds

    @pl.when(b > 0)
    def _():
        dab_ref[0] = dab_ref[0] + ds


def _lane_halves(x: jnp.ndarray):
    """(lane < 64) mask plus a zero like x, for masked half-lane dots."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return lane < 64, jnp.zeros_like(x)


def _fwd_kernel_packed(q_ref, k_ref, v_ref, ab_ref, o_ref, *, scale: float):
    """Two heads per [L, 128] block: lanes 0:64 = head 2h, 64:128 = 2h+1.

    A 128-lane contraction of a half-masked operand only sums that
    head's lanes (the other half multiplies zeros), so per-head scores
    need no lane slicing — just two masked dots per pair. Identical
    FLOPs to the unpacked kernel (which runs one 128-lane dot per head
    anyway), half the DMA bytes.
    """
    q = q_ref[0, 0]          # [Lqp, 128]
    k = k_ref[0, 0]          # [Lkp, 128]
    v = v_ref[0, 0]
    ab0, ab1 = ab_ref[0], ab_ref[1]   # [Lqp, Lkp] f32
    qlo, qzero = _lane_halves(q)      # masks are per-tensor: Lqp != Lkp
    vlo, vzero = _lane_halves(v)
    contract_lanes = (((1,), (1,)), ((), ()))
    contract_keys = (((1,), (0,)), ((), ()))

    def head(qh, abh):
        logits = jax.lax.dot_general(
            qh, k, contract_lanes,
            preferred_element_type=jnp.float32) * scale + abh
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    p0 = head(jnp.where(qlo, q, qzero), ab0)
    p1 = head(jnp.where(qlo, qzero, q), ab1)
    o = jax.lax.dot_general(
        p0.astype(v.dtype), jnp.where(vlo, v, vzero), contract_keys,
        preferred_element_type=jnp.float32)
    o += jax.lax.dot_general(
        p1.astype(v.dtype), jnp.where(vlo, vzero, v), contract_keys,
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel_packed(q_ref, k_ref, v_ref, ab_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, dab_ref, *, scale: float):
    b = pl.program_id(1)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lo, zero = _lane_halves(q)
    contract_lanes = (((1,), (1,)), ((), ()))
    contract_keys = (((1,), (0,)), ((), ()))
    contract_queries = (((0,), (0,)), ((), ()))

    def head_grads(qh, doh, abh):
        logits = jax.lax.dot_general(
            qh, k, contract_lanes,
            preferred_element_type=jnp.float32) * scale + abh
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(
            doh, v, contract_lanes, preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        return p, p * (dp - delta)

    p0, ds0 = head_grads(jnp.where(lo, q, zero), jnp.where(lo, do, zero),
                         ab_ref[0])
    p1, ds1 = head_grads(jnp.where(lo, zero, q), jnp.where(lo, zero, do),
                         ab_ref[1])

    # dQ_h = dS_h K_h: an unmasked ds@k fills lanes 0:64 with dS@K_{2h}
    # and 64:128 with dS@K_{2h+1}; select the half that belongs to each.
    dq0 = jax.lax.dot_general(ds0.astype(k.dtype), k, contract_keys,
                              preferred_element_type=jnp.float32)
    dq1 = jax.lax.dot_general(ds1.astype(k.dtype), k, contract_keys,
                              preferred_element_type=jnp.float32)
    dq_ref[0, 0] = (jnp.where(lo, dq0, dq1) * scale).astype(dq_ref.dtype)

    # dK/dV: the masked q/do operand already zeroes the foreign half.
    dk = jax.lax.dot_general(
        ds0.astype(q.dtype), jnp.where(lo, q, zero), contract_queries,
        preferred_element_type=jnp.float32)
    dk += jax.lax.dot_general(
        ds1.astype(q.dtype), jnp.where(lo, zero, q), contract_queries,
        preferred_element_type=jnp.float32)
    dk_ref[0, 0] = (dk * scale).astype(dk_ref.dtype)

    dv = jax.lax.dot_general(
        p0.astype(do.dtype), jnp.where(lo, do, zero), contract_queries,
        preferred_element_type=jnp.float32)
    dv += jax.lax.dot_general(
        p1.astype(do.dtype), jnp.where(lo, zero, do), contract_queries,
        preferred_element_type=jnp.float32)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    @pl.when(b == 0)
    def _():
        dab_ref[0] = ds0
        dab_ref[1] = ds1

    @pl.when(b > 0)
    def _():
        dab_ref[0] = dab_ref[0] + ds0
        dab_ref[1] = dab_ref[1] + ds1


def _pack_qkv(x: jnp.ndarray, lp: int) -> jnp.ndarray:
    """[B, L, H, Dh<=64] -> [B, ceil(H/2), Lp, 128], head pairs in lanes."""
    b, length, h, dh = x.shape
    hp = (h + 1) // 2
    x = jnp.pad(x, ((0, 0), (0, lp - length), (0, 2 * hp - h),
                    (0, 64 - dh)))
    x = x.reshape(b, lp, hp, 128)
    return jnp.transpose(x, (0, 2, 1, 3))


def _unpack_out(x: jnp.ndarray, length: int, h: int, dh: int) -> jnp.ndarray:
    """[B, Hp, Lp, 128] -> [B, L, H, Dh] (inverse of ``_pack_qkv``)."""
    b, hp, lp, _ = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, lp, 2 * hp, 64)
    return x[:, :length, :h, :dh]


def _pad_ab_packed(ab: jnp.ndarray, lqp: int, lkp: int) -> jnp.ndarray:
    """[H, Lq, Lk] -> [2*ceil(H/2), Lqp, Lkp] f32, pad head rows zero
    (their q/k/v/do lanes are zero so every gradient vanishes; padded
    key columns still get NEG_INF like ``_pad_ab``)."""
    h = ab.shape[0]
    hp2 = 2 * ((h + 1) // 2)
    ab = jnp.pad(ab.astype(jnp.float32), ((0, hp2 - h), (0, 0), (0, 0)))
    return _pad_ab(ab, lqp, lkp)


def _pad_qkv(x: jnp.ndarray, lp: int, dp: int) -> jnp.ndarray:
    """[B, L, H, Dh] -> [B, H, Lp, Dp] zero-padded."""
    b, length, h, dh = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3))
    return jnp.pad(x, ((0, 0), (0, 0), (0, lp - length), (0, dp - dh)))


def _pad_ab(ab: jnp.ndarray, lqp: int, lkp: int) -> jnp.ndarray:
    """[H, Lq, Lk] -> [H, Lqp, Lkp] f32; padded keys masked out, padded
    query rows left at 0 (their cotangents are zero, see module doc)."""
    h, lq, lk = ab.shape
    ab = jnp.pad(ab.astype(jnp.float32), ((0, 0), (0, 0), (0, lkp - lk)),
                 constant_values=NEG_INF)
    return jnp.pad(ab, ((0, 0), (0, lqp - lq), (0, 0)))


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _fused_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               ab: jnp.ndarray,
               interpret: Optional[bool] = None) -> jnp.ndarray:
    if interpret is None:
        interpret = _interpret_default()
    batch, lq, heads, dh = q.shape
    lk = k.shape[1]
    lqp, lkp = _ceil_to(lq, 128), _ceil_to(lk, 128)
    if dh <= 64 and _packed_enabled():
        hp = (heads + 1) // 2
        scale = 1.0 / float(dh) ** 0.5
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_packed, scale=scale),
            grid=(hp, batch),
            in_specs=[
                pl.BlockSpec((1, 1, lqp, 128), lambda h, b: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, lkp, 128), lambda h, b: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, lkp, 128), lambda h, b: (b, h, 0, 0)),
                pl.BlockSpec((2, lqp, lkp), lambda h, b: (h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, lqp, 128),
                                   lambda h, b: (b, h, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, hp, lqp, 128), q.dtype),
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(_pack_qkv(q, lqp), _pack_qkv(k, lkp), _pack_qkv(v, lkp),
          _pad_ab_packed(ab, lqp, lkp))
        return _unpack_out(out, lq, heads, dh)
    dp = _ceil_to(dh, 128)
    qp = _pad_qkv(q, lqp, dp)
    kp = _pad_qkv(k, lkp, dp)
    vp = _pad_qkv(v, lkp, dp)
    abp = _pad_ab(ab, lqp, lkp)
    scale = 1.0 / float(dh) ** 0.5
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(heads, batch),
        in_specs=[
            pl.BlockSpec((1, 1, lqp, dp), lambda h, b: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, lkp, dp), lambda h, b: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, lkp, dp), lambda h, b: (b, h, 0, 0)),
            pl.BlockSpec((1, lqp, lkp), lambda h, b: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, lqp, dp), lambda h, b: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, heads, lqp, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, abp)
    return jnp.transpose(out[:, :, :lq, :dh], (0, 2, 1, 3))


def _fused_bwd_impl(q, k, v, ab, do, interpret: Optional[bool] = None
                    ) -> Tuple[jnp.ndarray, ...]:
    if interpret is None:
        interpret = _interpret_default()
    batch, lq, heads, dh = q.shape
    lk = k.shape[1]
    lqp, lkp = _ceil_to(lq, 128), _ceil_to(lk, 128)
    if dh <= 64 and _packed_enabled():
        hp = (heads + 1) // 2
        scale = 1.0 / float(dh) ** 0.5
        spec = lambda lp: pl.BlockSpec(  # noqa: E731
            (1, 1, lp, 128), lambda h, b: (b, h, 0, 0))
        ab_spec = pl.BlockSpec((2, lqp, lkp), lambda h, b: (h, 0, 0))
        dq, dk, dv, dab = pl.pallas_call(
            functools.partial(_bwd_kernel_packed, scale=scale),
            grid=(hp, batch),
            in_specs=[spec(lqp), spec(lkp), spec(lkp), ab_spec, spec(lqp)],
            out_specs=[spec(lqp), spec(lkp), spec(lkp), ab_spec],
            out_shape=[
                jax.ShapeDtypeStruct((batch, hp, lqp, 128), q.dtype),
                jax.ShapeDtypeStruct((batch, hp, lkp, 128), k.dtype),
                jax.ShapeDtypeStruct((batch, hp, lkp, 128), v.dtype),
                jax.ShapeDtypeStruct((2 * hp, lqp, lkp), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(_pack_qkv(q, lqp), _pack_qkv(k, lkp), _pack_qkv(v, lkp),
          _pad_ab_packed(ab, lqp, lkp), _pack_qkv(do, lqp))
        return (_unpack_out(dq, lq, heads, dh),
                _unpack_out(dk, lk, heads, dh),
                _unpack_out(dv, lk, heads, dh),
                dab[:heads, :lq, :lk])
    dp = _ceil_to(dh, 128)
    qp = _pad_qkv(q, lqp, dp)
    kp = _pad_qkv(k, lkp, dp)
    vp = _pad_qkv(v, lkp, dp)
    abp = _pad_ab(ab, lqp, lkp)
    dop = _pad_qkv(do, lqp, dp)
    scale = 1.0 / float(dh) ** 0.5
    qkv_spec = lambda lp: pl.BlockSpec(  # noqa: E731
        (1, 1, lp, dp), lambda h, b: (b, h, 0, 0))
    dq, dk, dv, dab = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(heads, batch),
        in_specs=[
            qkv_spec(lqp), qkv_spec(lkp), qkv_spec(lkp),
            pl.BlockSpec((1, lqp, lkp), lambda h, b: (h, 0, 0)),
            qkv_spec(lqp),
        ],
        out_specs=[
            qkv_spec(lqp), qkv_spec(lkp), qkv_spec(lkp),
            pl.BlockSpec((1, lqp, lkp), lambda h, b: (h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, heads, lqp, dp), q.dtype),
            jax.ShapeDtypeStruct((batch, heads, lkp, dp), k.dtype),
            jax.ShapeDtypeStruct((batch, heads, lkp, dp), v.dtype),
            jax.ShapeDtypeStruct((heads, lqp, lkp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, abp, dop)
    unpad = lambda x, length: jnp.transpose(  # noqa: E731
        x[:, :, :length, :dh], (0, 2, 1, 3))
    return (unpad(dq, lq), unpad(dk, lk), unpad(dv, lk),
            dab[:, :lq, :lk])


@jax.custom_vjp
def fused_train_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          ab: jnp.ndarray) -> jnp.ndarray:
    """Batched multi-head attention with a batch-shared additive term.

    q [B, Lq, H, Dh]; k, v [B, Lk, H, Dh]; ab [H, Lq, Lk] float32
    (learned relative bias + any additive masks, pre-combined).
    Returns [B, Lq, H, Dh] in q's dtype. Differentiable in all four
    arguments; dab is the batch-sum of the score gradients.
    """
    return _fused_fwd(q, k, v, ab)


def _vjp_fwd(q, k, v, ab):
    return _fused_fwd(q, k, v, ab), (q, k, v, ab)


def _vjp_bwd(res, do):
    q, k, v, ab = res
    return _fused_bwd_impl(q, k, v, ab, do)


fused_train_attention.defvjp(_vjp_fwd, _vjp_bwd)


def reference_train_attention(q, k, v, ab):
    """Dense XLA equivalent (test oracle / numerical fallback)."""
    dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(float(dh)) + ab[None].astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype),
                      v).astype(q.dtype)
