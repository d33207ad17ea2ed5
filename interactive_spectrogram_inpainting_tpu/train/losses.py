"""Reconstruction and prediction losses.

Equivalents of ``interactive_spectrogram_inpainting/utils/losses/``:

- ``MultiscaleSpectralLoss`` (``spectral.py:11-113``): multi-resolution
  STFT magnitude loss on audio, linear + log terms, with the DDSP
  (``spectral.py:130-143``) and Jukebox (``spectral.py:157-171``) presets;
- the ``*_fromSpectrogram`` variants first invert the mel/linear
  spectrogram to audio through ``SpectrogramsHelper.to_audio`` — the loss
  backpropagates through the inverse transform (``spectral.py:122-126``),
  which is fully differentiable here (cumsum + matmuls + irfft);
- ``L2Loss`` (``spectral.py:146-153``) and label-smoothed cross-entropy
  (``prediction.py:5-20``).

All losses are pure jittable functions of (prediction, target).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..signal.spectrogram import (SpectrogramsHelper, _DFT_PRECISIONS,
                                  _hann_window, _use_dft_matmul)


def _loss_dft_bases(n_fft: int, win_length: int):
    """On-device [win_length, n_fft//2+1] cos/sin rDFT bases.

    Only the ``win_length`` basis rows a non-zero window sample can
    touch: an STFT magnitude is invariant to where the windowed frame
    sits inside the zero-padded n_fft frame (time shift only rotates
    phase), so the loss never has to pay for the padding. Same exact
    integer (n*k) mod n_fft angle trick as ``spectrogram._dft_bases``."""
    f = n_fft // 2 + 1
    n = jax.lax.iota(jnp.int32, win_length)[:, None]
    k = jax.lax.iota(jnp.int32, f)[None, :]
    m = (n * k) % n_fft
    ang = m.astype(jnp.float32) * np.float32(2.0 * np.pi / n_fft)
    return jnp.cos(ang), jnp.sin(ang)


def _frame(x: jnp.ndarray, frames: int, hop: int, win_length: int,
           start: int) -> jnp.ndarray:
    """[.., L] -> [.., frames, win_length] sliding frames.

    Slice framing when win = m*hop (every preset): frames are a sliding
    window over contiguous hop-sized chunks — a reshape plus m static
    slices instead of a [frames, win] gather. The gather materializes
    the framed tensor through TPU gather HW and its BACKWARD is a
    scatter-add; slices copy contiguous lanes and their backward is
    pad+add (measured: 3-scale Jukebox grad 58.2 -> 42.6 ms at B=128,
    v5e-1). Values are identical (same frame contents)."""
    if win_length % hop == 0:
        m = win_length // hop
        k = frames + m - 1
        chunks = jax.lax.dynamic_slice_in_dim(
            x, start, k * hop, axis=-1).reshape(x.shape[:-1] + (k, hop))
        return jnp.concatenate(
            [chunks[..., c:c + frames, :] for c in range(m)], axis=-1)
    idx = (np.arange(frames)[:, None] * hop + start
           + np.arange(win_length)[None, :])
    return x[..., idx]


def _stft_mag(audio: jnp.ndarray, n_fft: int, hop: int, win_length: int,
              precision: str = "high") -> jnp.ndarray:
    """Magnitude STFT for loss purposes (``center=False``, Hann).

    Frame geometry is the reference's ``torch.stft(..., center=False)``
    call (``spectral.py:88-92``): NO boundary padding — the first frame
    covers samples ``[0, n_fft)`` with the ``win_length`` Hann window
    centered inside it (torch zero-pads the window symmetrically to
    n_fft), and ``1 + (L - n_fft) // hop`` frames total.

    Lowers to real DFT matmuls on backends without complex-FFT support
    (axon) — so the multiscale spectral losses train ON the accelerator.
    Two loss-only optimizations over the parity-grade ``rfft_ri`` path
    (both magnitude-exact in exact arithmetic):

    - frames are gathered at ``win_length``, not ``n_fft`` — the Jukebox
      preset zero-pads 1200/600/240-sample windows into 2048/1024/512
      frames, i.e. 41-53% of the full-frame DFT FLOPs multiply
      structural zeros;
    - the matmuls default to HIGH precision (3-pass bf16 f32-emulation,
      ~1e-6 relative) instead of HIGHEST (6-pass): the reference
      computes this loss under AMP autocast in fp16
      (``train_vqvae.py:174-179``), so 'high' is far tighter than the
      behavior being reproduced.
    """
    x = audio
    frames = 1 + (x.shape[-1] - n_fft) // hop
    if frames < 1:
        raise ValueError(
            f"audio too short for center=False STFT: {x.shape[-1]} "
            f"samples < n_fft={n_fft}")
    start = (n_fft - win_length) // 2
    if _use_dft_matmul():
        cos_b, sin_b = _loss_dft_bases(n_fft, win_length)
        prec = _DFT_PRECISIONS[precision]
        # fold the Hann window into the basis: window[n] scales basis
        # row n, so (framed * window) @ basis == framed @ (window*basis)
        # — one whole elementwise read+write pass over the framed tensor
        # disappears. [win, 2F] cos|sin concat halves the matmul op
        # count vs separate dots (each output column is the same
        # independent dot product either way).
        wb = (jnp.asarray(_hann_window(win_length))[:, None]
              * jnp.concatenate([cos_b, sin_b], axis=-1))
        # NOTE: accumulating m chunk matmuls instead of materializing
        # framed was MEASURED SLOWER on v5e-1 (131.4 vs 118.8 ms/step at
        # B=128): each partial [.., frames, 2F] f32 matmul output
        # materializes separately — 5x the ri traffic for 1x framed
        # saved. The framed tensor is only avoidable inside a fused
        # kernel (ops/spectral_loss_kernel.py, the accelerator path).
        ri = jnp.matmul(_frame(x, frames, hop, win_length, start), wb,
                        precision=prec)
        f = n_fft // 2 + 1
        re, im = ri[..., :f], ri[..., f:]
    else:
        framed = (_frame(x, frames, hop, win_length, start)
                  * jnp.asarray(_hann_window(win_length)))
        # rfft zero-pads on the right; |X| is shift-invariant so the
        # missing centering offset does not change the magnitude
        s = jnp.fft.rfft(framed, n=n_fft, axis=-1)
        re, im = jnp.real(s), jnp.imag(s)
    # tiny floor: d/dx sqrt(x) at x=0 is inf, and all-zero frames (padded
    # silence) would otherwise poison the loss gradient with NaNs
    return jnp.sqrt(re * re + im * im + 1e-12)


@dataclasses.dataclass(frozen=True)
class MultiscaleSpectralLoss:
    """lin_alpha * mean_i d(|S_i|, |S_i|) + log_alpha * mean_i d(log, log).

    Reference-exact aggregation (``spectral.py:106-113``): the per-scale
    linear and log losses are AVERAGED across scales (not summed) and
    each family is weighted by its alpha — so loss values are comparable
    to reference training runs, and the reconstruction term keeps the
    reference's ratio to the fixed 0.25 latent-loss weight
    (``train_vqvae.py:177-179``).
    """

    n_ffts: Sequence[int]
    hop_lengths: Sequence[int]
    window_lengths: Sequence[int]
    distance: str = "l1"  # 'l1' | 'mse'
    lin_alpha: float = 1.0
    log_alpha: float = 1.0
    log_eps: float = 1e-6
    # DFT-matmul emulation level for the loss STFTs (and, via
    # make_spectral_loss_from_spectrogram, the inverse transform the
    # loss backprops through); see _stft_mag
    precision: str = "high"

    def __call__(self, audio_pred: jnp.ndarray, audio_target: jnp.ndarray
                 ) -> jnp.ndarray:
        if self._use_fused_kernel():
            from ..ops.spectral_loss_kernel import fused_multiscale_loss
            return fused_multiscale_loss(
                audio_pred, audio_target, self.n_ffts, self.hop_lengths,
                self.window_lengths, self.distance, self.lin_alpha,
                self.log_alpha, self.log_eps, self.precision,
                fallback=_stft_mag)
        dist = (lambda a, b: jnp.mean(jnp.abs(a - b))) \
            if self.distance == "l1" else (
            lambda a, b: jnp.mean((a - b) ** 2))
        lin_losses = []
        log_losses = []
        for n_fft, hop, win in zip(self.n_ffts, self.hop_lengths,
                                   self.window_lengths):
            mag_p = _stft_mag(audio_pred, n_fft, hop, win, self.precision)
            mag_t = _stft_mag(audio_target, n_fft, hop, win,
                              self.precision)
            if self.lin_alpha > 0:
                lin_losses.append(dist(mag_p, mag_t))
            if self.log_alpha > 0:
                log_losses.append(dist(
                    jnp.log(mag_p + self.log_eps),
                    jnp.log(mag_t + self.log_eps)))

        def mean(losses):
            return sum(losses) / len(losses) if losses else 0.0

        return (self.lin_alpha * mean(lin_losses)
                + self.log_alpha * mean(log_losses))

    def _use_fused_kernel(self) -> bool:
        """Fused Pallas multiscale-STFT-loss kernel switch
        (``ops/spectral_loss_kernel.py``): ``ISI_FUSED_SPECTRAL=1``
        forces it on (interpret mode on CPU), ``=0`` off; unset = auto,
        on for accelerator backends. The kernel never materializes the
        [B, frames, 2F] DFT/magnitude intermediates in HBM — measured
        the dominant cost of the XLA spectral step (see CLAUDE.md
        round-5 notes)."""
        import os
        force = os.environ.get("ISI_FUSED_SPECTRAL")
        if force is not None:
            return force not in ("0", "false", "")
        return jax.default_backend() != "cpu"


def _overlap_hops(window_lengths: Sequence[int],
                  overlap_ratio: float) -> list:
    """``hop = ceil((1 - overlap_ratio) * window)`` — reference
    ``spectral.py:85``."""
    import math
    return [math.ceil((1.0 - overlap_ratio) * w) for w in window_lengths]


def make_ddsp_loss() -> MultiscaleSpectralLoss:
    """DDSP preset (reference ``spectral.py:130-143``): overlap 0.75,
    windows = n_ffts, L1, lin+log."""
    n_ffts = [64, 128, 256, 512, 1024, 2048]
    return MultiscaleSpectralLoss(
        n_ffts=n_ffts,
        hop_lengths=_overlap_hops(n_ffts, 0.75),
        window_lengths=list(n_ffts),
        distance="l1", lin_alpha=1.0, log_alpha=1.0)


def make_jukebox_loss() -> MultiscaleSpectralLoss:
    """Jukebox preset (reference ``spectral.py:157-163``): overlap 0.80
    -> hops {240, 120, 48}, MSE, linear term only."""
    windows = [1200, 600, 240]
    return MultiscaleSpectralLoss(
        n_ffts=[2048, 1024, 512],
        hop_lengths=_overlap_hops(windows, 0.80),
        window_lengths=windows,
        distance="mse", lin_alpha=1.0, log_alpha=0.0)


def make_spectral_loss_from_spectrogram(
        loss: MultiscaleSpectralLoss,
        spectrograms_helper: SpectrogramsHelper
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Wrap a spectral loss to act on [B, 2, F, T] mel/linear spectrograms
    by inverting both through ``to_audio`` (reference
    ``spectral.py:116-126``); differentiable end-to-end.

    The inverse transform runs at the LOSS's DFT precision (a
    dataclasses.replace copy of the helper) — the ~1e-4 HIGHEST parity
    budget only matters for code-index-exact encode paths, not for a
    training criterion the reference computes under fp16 autocast."""
    helper = dataclasses.replace(spectrograms_helper,
                                 dft_precision=loss.precision)

    def fn(spec_pred: jnp.ndarray, spec_target: jnp.ndarray) -> jnp.ndarray:
        audio_pred = helper.to_audio(spec_pred)
        audio_target = helper.to_audio(spec_target)
        return loss(audio_pred, audio_target)

    fn.loss = loss          # introspection (tests, --spectral_precision)
    fn.spectrograms_helper = helper
    return fn


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _smoothed_xent_elementwise(logits: jnp.ndarray, targets: jnp.ndarray,
                               smoothing: float) -> jnp.ndarray:
    """Per-token smoothed cross-entropy via reductions only.

    With ``sm = smoothing / (n_class - 1)`` the smoothed target
    distribution is ``one_hot * (1 - smoothing - sm) + sm`` (sums to 1),
    so ``-sum(target_dist * log_softmax(logits))`` collapses to

        logsumexp(logits) - (1-smoothing-sm) * logits[target]
                          - sm * sum(logits)

    — three [B, L] reductions over the class axis. Nothing of shape
    [B, L, n_class] is ever materialized in f32: the cast to f32 fuses
    into the reduces, and the custom backward recomputes softmax from
    the (bf16) logits instead of autodiff saving f32 log-probs. On the
    prior train step this chain was the single biggest remaining HBM
    write block (f32 [B, 516, 512] elementwise fusions, see CLAUDE.md
    round-4 roofline).
    """
    lse, tgt_logit, logit_sum = _smoothed_xent_reductions(logits, targets)
    return _smoothed_xent_combine(lse, tgt_logit, logit_sum,
                                  logits.shape[-1], smoothing)


def _smoothed_xent_reductions(logits, targets):
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    lse = jnp.squeeze(m, -1) + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1))
    tgt_logit = jnp.squeeze(
        jnp.take_along_axis(x, targets[..., None], axis=-1), -1)
    return lse, tgt_logit, jnp.sum(x, axis=-1)


def _smoothed_xent_combine(lse, tgt_logit, logit_sum, n_class, smoothing):
    sm = smoothing / (n_class - 1) if n_class > 1 else 0.0
    return lse - (1.0 - smoothing - sm) * tgt_logit - sm * logit_sum


def _smoothed_xent_fwd(logits, targets, smoothing):
    lse, tgt_logit, logit_sum = _smoothed_xent_reductions(logits, targets)
    out = _smoothed_xent_combine(lse, tgt_logit, logit_sum,
                                 logits.shape[-1], smoothing)
    return out, (logits, targets, lse)


def _smoothed_xent_bwd(smoothing, res, g):
    logits, targets, lse = res
    n_class = logits.shape[-1]
    sm = smoothing / (n_class - 1) if n_class > 1 else 0.0
    # dL/dlogits = g * (softmax(logits) - target_dist); softmax is
    # recomputed from the saved logits + lse (one fused elementwise
    # pass), target_dist = one_hot*(1-smoothing-sm) + sm.
    p = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    one_hot = jax.nn.one_hot(targets, n_class, dtype=jnp.float32)
    target_dist = one_hot * (1.0 - smoothing - sm) + sm
    dlogits = (g[..., None] * (p - target_dist)).astype(logits.dtype)
    return dlogits, None


_smoothed_xent_elementwise.defvjp(_smoothed_xent_fwd, _smoothed_xent_bwd)


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         smoothing: float = 0.0,
                         class_axis: int = -1,
                         reduction: str = "mean") -> jnp.ndarray:
    """Label-smoothed cross-entropy (reference ``prediction.py:5-20``).

    logits [..., n_class] (or any axis via ``class_axis``), integer
    targets matching the non-class dims. ``reduction``: 'mean' (scalar)
    or 'none' (elementwise, shaped like ``targets`` — exact-count eval
    needs per-sample values). Accepts bf16 logits directly: reductions
    run in f32 without materializing an f32 [..., n_class] array (see
    ``_smoothed_xent_elementwise``)."""
    if class_axis != -1:
        logits = jnp.moveaxis(logits, class_axis, -1)
    elementwise = _smoothed_xent_elementwise(logits, targets,
                                             float(smoothing))
    if reduction == "none":
        return elementwise
    return jnp.mean(elementwise)


def make_reconstruction_metrics(spectrograms_helper: Optional[
        SpectrogramsHelper] = None):
    """The reference's per-log-step metric trio (``train_vqvae.py:788-795``,
    computed at every log step regardless of the training criterion,
    ``:252-258``): MSE + DDSP + Jukebox evaluated as METRICS on
    (reconstruction, input). Returns ``fn(dec, spec) -> {metric_MSE, ...}``.

    With ``spectrograms_helper=None`` (forced host-FFT fallback: the
    spectral losses cannot run inside the jit) only MSE is computed.
    """
    names = ["MSE"] + (["DDSP", "Jukebox"]
                       if spectrograms_helper is not None else [])
    fns = {name: get_reconstruction_criterion(name, spectrograms_helper)
           for name in names}

    def compute(dec: jnp.ndarray, spec: jnp.ndarray):
        dec = dec.astype(jnp.float32)
        return {f"metric_{n}": fn(dec, spec) for n, fn in fns.items()}

    return compute


def get_reconstruction_criterion(name: str,
                                 spectrograms_helper: Optional[
                                     SpectrogramsHelper] = None,
                                 precision: Optional[str] = None):
    """Factory mirroring ``train_vqvae.py:82-98``: 'mse' |
    'spectral_ddsp' | 'spectral_jukebox'.

    ``precision`` overrides the spectral losses' DFT emulation level
    (``--spectral_precision``): 'high' (default, 3-pass bf16, ~1e-6) |
    'default' (1-pass, 3x fewer loss-kernel FLOPs, ~4e-3 loss error —
    arguably closer to the reference's fp16-autocast arithmetic,
    ``train_vqvae.py:174-179``) | 'highest' (6-pass; disables the fused
    kernel, XLA path only)."""
    if name in ("mse", "MSE", "L2"):
        return mse_loss
    if name in ("spectral_ddsp", "DDSP"):
        make = make_ddsp_loss
    elif name in ("spectral_jukebox", "Jukebox"):
        make = make_jukebox_loss
    else:
        raise ValueError(f"unknown reconstruction criterion {name}")
    assert spectrograms_helper is not None
    loss = make()
    if precision is not None:
        loss = dataclasses.replace(loss, precision=precision)
    return make_spectral_loss_from_spectrogram(loss, spectrograms_helper)
