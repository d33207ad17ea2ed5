"""Fused multiscale-STFT spectral-loss kernel: one Pallas call per scale
computes the windowed DFT, magnitudes, and the (linear + log) distance
WITHOUT materializing any [B, frames, 2F] intermediate in HBM.

Why this exists (the reference computes this loss with ``torch.stft``,
``/root/reference/interactive_spectrogram_inpainting/utils/losses/
spectral.py:78-113``; XLA has no fusion that keeps a matmul output in
registers through a sqrt + reduction): profiling the spectral-criterion
VQ-VAE train step on v5e-1 showed the loss grad-and-value at 78% of the
step, ~2.7x off the combined FLOP/HBM roofline, with the gap attributed
to XLA-materialized framed/ri/mag intermediates — per scale and per
audio tensor, an f32 [B, frames, 2F] DFT output (270-540MB at B=128)
plus magnitude arrays round-trip HBM in both the forward and the
backward. Here each (batch row, scale) block runs entirely in VMEM:

- the audio is pre-chunked OUTSIDE the kernel into non-overlapping
  hop-sized pieces ``[B, k, hop_pad]`` (a plain reshape — every preset
  has ``win = m * hop``, so frame ``i`` is chunk rows ``[i, i+m)`` and
  the STFT is ``ri = sum_c chunks[c:c+frames] @ wb[c*hop:(c+1)*hop]``
  with the Hann window folded into the basis);
- the m chunk matmuls run as 3-pass bf16 f32-emulation (hi/lo split,
  matching ``lax.Precision.HIGH`` ~1e-6 — the reference computes this
  loss under fp16 autocast, so this is far tighter than the behavior
  being reproduced; ``precision='default'`` runs 1-pass);
- magnitudes, the masked frame reduction, and the per-scale loss
  contribution stay in VMEM; the ONLY backward residual written to HBM
  is ``U = (dL/dmag) * ri / mag`` in bf16 (gradient-direction tensor,
  half the bytes of ri alone), which collapses the backward to a pure
  "transposed STFT": ``d_chunks[j] = g * sum_c U[j-c] @ wb_c^T`` — m
  statically shifted dots — and ``d_audio`` is a reshape, because the
  chunks are non-overlapping.

Mosaic constraints shaping the layout (see ops/decode_attention.py):
HBM DMA slices need 128-aligned minor dims, so chunks carry
``hop_pad = ceil128(hop)`` zero lanes and the basis is laid out
``[m, hop_pad, 2*Fp]`` with cos in lanes ``[0, Fp)`` and sin in
``[Fp, 2*Fp)`` (``Fp = ceil128(n_fft//2+1)``; zero basis columns make
the padded magnitudes of pred and target bitwise equal, so they
contribute exactly zero loss and zero gradient). Scales whose hop pads
worse than 48->128 (DDSP's 64/128-sample windows) stay on the XLA path
— their FLOPs are negligible and the lane padding would dominate.

In-kernel transcendental accuracy measured on v5e-1: sqrt 1.6e-7 rel,
log 2.9e-4 rel (the DDSP log term tolerates this; the linear terms use
no transcendental beyond sqrt).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

# minimum hop eligible for the fused kernel: hop 48 pads to 128 lanes
# (2.67x, still a large win vs the XLA materialization); below that the
# pad factor dominates and those scales' FLOPs are tiny anyway
_MIN_HOP = 48


def _ceil_to(x: int, mult: int) -> int:
    return (x + mult - 1) // mult * mult


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def scale_eligible(n_fft: int, hop: int, win: int, precision: str) -> bool:
    """Whether one (n_fft, hop, win) scale can run in the fused kernel."""
    return (win % hop == 0 and hop >= _MIN_HOP
            and precision in ("high", "default"))


def _basis_hi_lo(n_fft: int, hop: int, win: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Window-folded rDFT basis as [m, hop_pad, 2*Fp] bf16 (hi, lo).

    Row layout: basis chunk c holds wb rows [c*hop, (c+1)*hop) in its
    first ``hop`` sublanes (rest zero); columns [0, F) are cos, columns
    [Fp, Fp+F) are sin, zero elsewhere. hi + lo reconstruct the f32
    basis to ~1e-6 (3-pass bf16 emulation operands). Generated
    ON-DEVICE from exact integer (n*k) mod n_fft angles (same trick as
    ``spectrogram._dft_bases``) — host constants of this size would
    bloat the HLO payload shipped to the axon remote compiler.
    """
    f = n_fft // 2 + 1
    fp = _ceil_to(f, 128)
    m = win // hop
    hop_pad = _ceil_to(hop, 128)
    n = jax.lax.iota(jnp.int32, win)[:, None]
    k = jax.lax.iota(jnp.int32, f)[None, :]
    ang = ((n * k) % n_fft).astype(jnp.float32) * np.float32(
        2.0 * np.pi / n_fft)
    window = 0.5 - 0.5 * jnp.cos(
        jax.lax.iota(jnp.float32, win) * np.float32(2.0 * np.pi / win))
    cos = window[:, None] * jnp.cos(ang)
    sin = window[:, None] * jnp.sin(ang)
    wb = jnp.concatenate([
        jnp.pad(cos, ((0, 0), (0, fp - f))),
        jnp.pad(sin, ((0, 0), (0, fp - f)))], axis=-1)  # [win, 2*Fp]
    wb = jnp.pad(wb.reshape(m, hop, 2 * fp),
                 ((0, 0), (0, hop_pad - hop), (0, 0)))
    hi = wb.astype(jnp.bfloat16)
    lo = (wb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _chunk_audio(audio: jnp.ndarray, n_fft: int, hop: int, win: int
                 ) -> Tuple[jnp.ndarray, int, int, int]:
    """[B, L] f32 -> ([B, kp, hop_pad] zero-padded chunks, frames, k, m)."""
    length = audio.shape[-1]
    frames = 1 + (length - n_fft) // hop
    if frames < 1:
        raise ValueError(f"audio too short: {length} < n_fft={n_fft}")
    m = win // hop
    start = (n_fft - win) // 2
    k = frames + m - 1
    fr_pad = _ceil_to(frames, 16)
    kp = _ceil_to(fr_pad + m - 1, 16)
    hop_pad = _ceil_to(hop, 128)
    chunks = jax.lax.dynamic_slice_in_dim(
        audio, start, k * hop, axis=-1).reshape(
            audio.shape[:-1] + (k, hop))
    chunks = jnp.pad(chunks, ((0, 0), (0, kp - k), (0, hop_pad - hop)))
    return chunks, frames, k, m


def _stft_acc(x_ref, bh_ref, bl_ref, *, m: int, fr_pad: int, passes: int):
    """sum_c chunks[c:c+fr_pad] @ wb_c with hi/lo bf16 emulation."""
    x = x_ref[0]                                   # [kp, hop_pad] f32
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = None
    for c in range(m):
        sh = xh[c:c + fr_pad]
        part = dot(sh, bh_ref[c])
        if passes >= 3:
            part += dot(sh, bl_ref[c])
            part += dot(xl[c:c + fr_pad], bh_ref[c])
        acc = part if acc is None else acc + part
    return acc                                     # [fr_pad, 2*Fp] f32


def _fwd_kernel(cp_ref, ct_ref, bh_ref, bl_ref, *out_refs,
                m: int, frames: int, fr_pad: int, fp: int, passes: int,
                mse: bool, lin_w: float, log_w: float, log_eps: float,
                need_u: bool):
    if need_u:
        u_ref, ls_ref = out_refs
    else:
        (ls_ref,) = out_refs
    b = pl.program_id(0)
    rip = _stft_acc(cp_ref, bh_ref, bl_ref, m=m, fr_pad=fr_pad,
                    passes=passes)
    rit = _stft_acc(ct_ref, bh_ref, bl_ref, m=m, fr_pad=fr_pad,
                    passes=passes)
    re_p, im_p = rip[:, :fp], rip[:, fp:]
    re_t, im_t = rit[:, :fp], rit[:, fp:]
    magp = jnp.sqrt(re_p * re_p + im_p * im_p + 1e-12)
    magt = jnp.sqrt(re_t * re_t + im_t * im_t + 1e-12)
    # frame rows beyond `frames` hold real audio from the chunk overhang
    # (not zeros) — mask them out of the loss and the gradient
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, magp.shape, 0)
               < frames).astype(jnp.float32)
    dlin = magp - magt
    total = jnp.float32(0.0)
    dmag = jnp.zeros_like(magp)
    if lin_w:
        if mse:
            total += lin_w * jnp.sum(dlin * dlin * rowmask)
            dmag += (2.0 * lin_w) * dlin
        else:
            total += lin_w * jnp.sum(jnp.abs(dlin) * rowmask)
            dmag += lin_w * jnp.sign(dlin)
    if log_w:
        dlog = jnp.log(magp + log_eps) - jnp.log(magt + log_eps)
        if mse:
            total += log_w * jnp.sum(dlog * dlog * rowmask)
            dmag += (2.0 * log_w) * dlog / (magp + log_eps)
        else:
            total += log_w * jnp.sum(jnp.abs(dlog) * rowmask)
            dmag += log_w * jnp.sign(dlog) / (magp + log_eps)
    if need_u:
        r = dmag * rowmask / magp
        u_ref[0] = jnp.concatenate([r * re_p, r * im_p],
                                   axis=-1).astype(jnp.bfloat16)
    row = jax.lax.broadcasted_iota(jnp.int32, ls_ref.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, ls_ref.shape, 1)
    part = jnp.where((row == 0) & (col == 0), total, 0.0)

    @pl.when(b == 0)
    def _():
        ls_ref[...] = part

    @pl.when(b > 0)
    def _():
        ls_ref[...] = ls_ref[...] + part


def _bwd_kernel(u_ref, bh_ref, dc_ref, *, m: int, kp: int):
    """d_chunks[j] = sum_c U[j - c] @ wb_c^T (single-pass bf16: U is the
    bf16 gradient direction already, ~0.4% — standard bf16-grad noise)."""
    u = u_ref[0]                                   # [fr_pad, 2*Fp] bf16
    fr_pad = u.shape[0]
    acc = None
    for c in range(m):
        part = jax.lax.dot_general(
            u, bh_ref[c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [fr_pad, hop_pad]
        pieces = []
        if c:
            pieces.append(jnp.zeros((c, part.shape[1]), part.dtype))
        pieces.append(part)
        if kp - fr_pad - c:
            pieces.append(jnp.zeros((kp - fr_pad - c, part.shape[1]),
                                    part.dtype))
        shifted = (jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                   else part)
        acc = shifted if acc is None else acc + shifted
    dc_ref[0] = acc


def _scale_static(audio_len: int, n_fft: int, hop: int, win: int):
    frames = 1 + (audio_len - n_fft) // hop
    m = win // hop
    fr_pad = _ceil_to(frames, 16)
    kp = _ceil_to(fr_pad + m - 1, 16)
    hop_pad = _ceil_to(hop, 128)
    fp = _ceil_to(n_fft // 2 + 1, 128)
    return frames, m, fr_pad, kp, hop_pad, fp


def _fused_fwd(audio_p, audio_t, cfg, interpret: Optional[bool],
               need_u: bool = True):
    """Returns (loss_scalar, U residual or None). cfg is the static
    tuple (n_fft, hop, win, passes, mse, lin_w, log_w, log_eps).
    ``need_u=False`` (the undifferentiated primal: metric-trio and eval
    forwards) skips the bf16 U output entirely — XLA cannot DCE a
    custom-call output, and U is hundreds of MB at training batches."""
    if interpret is None:
        interpret = _interpret_default()
    n_fft, hop, win, passes, mse, lin_w, log_w, log_eps = cfg
    batch, length = audio_p.shape
    frames, m, fr_pad, kp, hop_pad, fp = _scale_static(
        length, n_fft, hop, win)
    cp = _chunk_audio(audio_p, n_fft, hop, win)[0]
    ct = _chunk_audio(audio_t, n_fft, hop, win)[0]
    bh, bl = _basis_hi_lo(n_fft, hop, win)
    u_spec = pl.BlockSpec((1, fr_pad, 2 * fp), lambda b: (b, 0, 0))
    u_shape = jax.ShapeDtypeStruct((batch, fr_pad, 2 * fp), jnp.bfloat16)
    ls_spec = pl.BlockSpec((8, 128), lambda b: (0, 0))
    ls_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, m=m, frames=frames, fr_pad=fr_pad, fp=fp,
            passes=passes, mse=mse, lin_w=lin_w, log_w=log_w,
            log_eps=log_eps, need_u=need_u),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, kp, hop_pad), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, kp, hop_pad), lambda b: (b, 0, 0)),
            pl.BlockSpec((m, hop_pad, 2 * fp), lambda b: (0, 0, 0)),
            pl.BlockSpec((m, hop_pad, 2 * fp), lambda b: (0, 0, 0)),
        ],
        out_specs=[u_spec, ls_spec] if need_u else [ls_spec],
        out_shape=[u_shape, ls_shape] if need_u else [ls_shape],
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_LIMIT,
    )(cp, ct, bh, bl)
    if need_u:
        u, ls = out
        return ls[0, 0], u
    return out[0][0, 0], None


def _fused_bwd(audio_shape, cfg, u, g, interpret: Optional[bool]):
    if interpret is None:
        interpret = _interpret_default()
    n_fft, hop, win = cfg[0], cfg[1], cfg[2]
    batch, length = audio_shape
    frames, m, fr_pad, kp, hop_pad, fp = _scale_static(
        length, n_fft, hop, win)
    k = frames + m - 1
    start = (n_fft - win) // 2
    dc = pl.pallas_call(
        functools.partial(_bwd_kernel, m=m, kp=kp),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, fr_pad, 2 * fp), lambda b: (b, 0, 0)),
            pl.BlockSpec((m, hop_pad, 2 * fp), lambda b: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, kp, hop_pad), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, kp, hop_pad), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_LIMIT,
    )(u, _basis_hi_lo(n_fft, hop, win)[0])
    # chunks are a plain reshape of audio[start : start + k*hop], so
    # d_audio is a reshape + pad — no overlap-add needed
    flat = (g * dc[:, :k, :hop]).reshape(batch, k * hop)
    zeros = jnp.zeros((batch, length), flat.dtype)
    return jax.lax.dynamic_update_slice(zeros, flat, (0, start))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_scale_loss(audio_p: jnp.ndarray, audio_t: jnp.ndarray,
                     cfg: tuple, interpret: Optional[bool] = None
                     ) -> jnp.ndarray:
    """One scale's weighted loss contribution, fused end to end.

    audio_p, audio_t: [B, L] f32. cfg (static): (n_fft, hop, win,
    passes, mse, lin_w, log_w, log_eps) with lin_w/log_w the PER-ELEMENT
    weights (alpha / n_scales / (B * frames * F)) so the sum over scales
    of these contributions equals the full multiscale loss. Returns a
    scalar; differentiable in ``audio_p`` only (the target is data).
    """
    # the undifferentiated primal (metric trio, eval) skips the U output
    return _fused_fwd(audio_p, audio_t, cfg, interpret, need_u=False)[0]


def _vjp_fwd(audio_p, audio_t, cfg, interpret):
    loss, u = _fused_fwd(audio_p, audio_t, cfg, interpret, need_u=True)
    return loss, (u, audio_p.shape)


def _vjp_bwd(cfg, interpret, res, g):
    u, audio_shape = res
    # the target is data (stop_gradient'ed by the caller): a zeros
    # cotangent that XLA dead-code-eliminates
    return (_fused_bwd(audio_shape, cfg, u, g, interpret),
            jnp.zeros(audio_shape, jnp.float32))


fused_scale_loss.defvjp(_vjp_fwd, _vjp_bwd)


def fused_multiscale_loss(audio_p: jnp.ndarray, audio_t: jnp.ndarray,
                          n_ffts: Sequence[int], hops: Sequence[int],
                          wins: Sequence[int], distance: str,
                          lin_alpha: float, log_alpha: float,
                          log_eps: float, precision: str,
                          fallback=None,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """Multiscale loss with eligible scales fused; others via ``fallback``
    (the XLA ``_stft_mag`` path, passed in to avoid a circular import).

    Matches ``MultiscaleSpectralLoss.__call__`` exactly:
    ``lin_alpha * mean_scales(lin) + log_alpha * mean_scales(log)``.
    """
    squeeze = audio_p.ndim == 1
    if squeeze:
        audio_p, audio_t = audio_p[None], audio_t[None]
    audio_t = jax.lax.stop_gradient(audio_t)
    n_scales = len(n_ffts)
    passes = {"high": 3, "default": 1}.get(precision, 0)
    mse = distance != "l1"
    total = jnp.float32(0.0)
    xla_scales = []
    for n_fft, hop, win in zip(n_ffts, hops, wins):
        if scale_eligible(n_fft, hop, win, precision):
            frames = 1 + (audio_p.shape[-1] - n_fft) // hop
            f = n_fft // 2 + 1
            norm = 1.0 / (n_scales * audio_p.shape[0] * frames * f)
            cfg = (n_fft, hop, win, passes, mse,
                   float(lin_alpha) * norm if lin_alpha > 0 else 0.0,
                   float(log_alpha) * norm if log_alpha > 0 else 0.0,
                   float(log_eps))
            total = total + fused_scale_loss(audio_p, audio_t, cfg,
                                             interpret)
        else:
            xla_scales.append((n_fft, hop, win))
    for n_fft, hop, win in xla_scales:
        mag_p = fallback(audio_p, n_fft, hop, win, precision)
        mag_t = fallback(audio_t, n_fft, hop, win, precision)
        dist = ((lambda a, b: jnp.mean((a - b) ** 2)) if mse
                else (lambda a, b: jnp.mean(jnp.abs(a - b))))
        if lin_alpha > 0:
            total = total + (lin_alpha / n_scales) * dist(mag_p, mag_t)
        if log_alpha > 0:
            total = total + (log_alpha / n_scales) * dist(
                jnp.log(mag_p + log_eps), jnp.log(mag_t + log_eps))
    return total
