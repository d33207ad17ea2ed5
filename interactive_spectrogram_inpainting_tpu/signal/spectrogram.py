"""GANSynth-style invertible spectrogram transforms, TPU-native.

Re-implements (from behavioral spec, not code) the ``SpectrogramsHelper`` /
``MelSpectrogramsHelper`` interface of the external ``GANsynth_pytorch``
package used by the reference at
``/root/reference/interactive_spectrogram_inpainting/utils/misc.py:10-29``:

    audio  -> STFT -> (log magnitude, instantaneous frequency)   [2, F, T]
    [2, F, T] -> phase integration -> iSTFT -> audio

with an optional invertible mel-scale warping (configurable break frequency,
edge frequencies and resolution-expansion factor, flag names matching
``/root/reference/train_vqvae.py:473-481``).

Design notes (TPU-first):
- everything is pure ``jnp`` on statically-shaped arrays: framing is a gather,
  the FFT is XLA's native rfft, phase unwrap/cumsum are vectorized VPU ops;
  the whole forward or inverse transform fuses into a handful of XLA kernels
  and is ``vmap``/``pjit``-compatible (used *inside* the training step for the
  DDSP/Jukebox spectral losses, which backprop through ``to_audio``).
- shapes: canonical NSynth config (fs=16k, n_fft=2048, hop=512, 4 s audio)
  yields spectrograms of shape [2, 1024, 128] = (channels, freq, time),
  matching the reference's canonical input (``Inference.ipynb`` cell 1).
  The time axis is padded up to a multiple of ``time_frames_multiple`` (32)
  so the VQ-VAE's total downsampling (bottom 16 x top 2) divides it evenly.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

_MEL_BREAK_FREQUENCY_HERTZ = 700.0
_MEL_HIGH_FREQUENCY_Q = 1127.0


def hertz_to_mel(frequencies_hertz, break_frequency_hertz: float = _MEL_BREAK_FREQUENCY_HERTZ):
    """HTK-style mel scale with configurable break frequency (GANSynth)."""
    return _MEL_HIGH_FREQUENCY_Q * np.log1p(
        np.asarray(frequencies_hertz, dtype=np.float64) / break_frequency_hertz)


def mel_to_hertz(mels, break_frequency_hertz: float = _MEL_BREAK_FREQUENCY_HERTZ):
    return break_frequency_hertz * np.expm1(
        np.asarray(mels, dtype=np.float64) / _MEL_HIGH_FREQUENCY_Q)


def _hann_window(window_length: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window / tf.signal defaults)."""
    n = np.arange(window_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_length)).astype(np.float32)


def instantaneous_frequency(phase_angle: jnp.ndarray, time_axis: int = -1) -> jnp.ndarray:
    """Finite difference of unwrapped phase, in units of pi.

    First frame keeps the raw initial phase (GANSynth convention), so that
    ``cumsum(IF * pi)`` exactly recovers an unwrapped phase whose wrapped
    value matches the original.
    """
    dphase = jnp.diff(phase_angle, axis=time_axis)
    # wrap the finite difference into (-pi, pi]
    dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
    first = jax.lax.slice_in_dim(phase_angle, 0, 1, axis=time_axis)
    return jnp.concatenate([first, dphase], axis=time_axis) / jnp.pi


def polar_to_rect(log_magnitude: jnp.ndarray, phase_angle: jnp.ndarray) -> jnp.ndarray:
    mag = jnp.exp(log_magnitude)
    return mag * jnp.exp(1j * phase_angle.astype(jnp.float32))


_COMPLEX_FFT_SNIFFED = False
_COMPLEX_FFT_MISSING = False


def _backend_lacks_complex_fft() -> bool:
    """True when the default backend cannot execute complex FFT ops.

    The axon remote-TPU backend fails with UNIMPLEMENTED on complex
    lowering / complex device->host transfer; real TPU, GPU and CPU
    backends run FFTs fine. Detection is PASSIVE (platform-version
    sniff): actually executing a probe FFT on the broken backend
    poisons the whole PJRT client — every subsequent op in the process
    fails — so nothing may ever be dispatched to find out.
    """
    global _COMPLEX_FFT_SNIFFED, _COMPLEX_FFT_MISSING
    if not _COMPLEX_FFT_SNIFFED:
        _COMPLEX_FFT_SNIFFED = True
        try:
            # jax.extend is NOT auto-imported by `import jax`: without the
            # explicit import the attribute access raises and the sniff
            # silently reported "no fallback needed" in minimal processes
            import jax.extend.backend
            version = jax.extend.backend.get_backend().platform_version
        except Exception:  # pragma: no cover
            version = ""
        _COMPLEX_FFT_MISSING = "axon" in version.lower()
    return _COMPLEX_FFT_MISSING


def _use_dft_matmul() -> bool:
    """Whether the STFT core should run as real-arithmetic DFT matmuls
    instead of complex ``jnp.fft`` — automatic on backends that cannot
    lower complex FFTs (axon), so the transforms (and the spectral
    training losses that backprop through them, reference
    ``utils/losses/spectral.py:78-126``) execute ON the accelerator
    instead of hopping to the host CPU. ``ISI_FFT_DFT=1``/``0`` forces
    the path on/off for testing."""
    force = os.environ.get("ISI_FFT_DFT")
    if force is not None:
        return force not in ("0", "false", "")
    return _backend_lacks_complex_fft()


_FFT_FALLBACK_PROBED = False
_FFT_FALLBACK_DEVICE = None


def _fft_fallback_device():
    """CPU device to pin the complex STFT/iSTFT core onto when the
    default backend cannot execute it AND the real-arithmetic DFT path
    is disabled, else None. With the DFT path (the default on such
    backends) the transforms run on the accelerator and no fallback is
    needed. Only eager calls use the fallback — inside a jit trace
    placement belongs to the enclosing jit (see
    ``to_spectrogram``/``to_audio``). ``ISI_FFT_ON_CPU=1``/``0``
    forces the fallback on/off.
    """
    global _FFT_FALLBACK_PROBED, _FFT_FALLBACK_DEVICE
    if not _FFT_FALLBACK_PROBED:
        _FFT_FALLBACK_PROBED = True
        force = os.environ.get("ISI_FFT_ON_CPU")
        if force is not None:
            needs_fallback = force not in ("0", "false", "")
        else:
            needs_fallback = (_backend_lacks_complex_fft()
                              and not _use_dft_matmul())
        if needs_fallback:
            try:
                _FFT_FALLBACK_DEVICE = jax.devices("cpu")[0]
            except Exception:  # pragma: no cover - cpu always exists
                _FFT_FALLBACK_DEVICE = None
    return _FFT_FALLBACK_DEVICE


def _dft_bases(n_fft: int):
    """On-device [n_fft, n_fft//2 + 1] cos/sin rDFT bases.

    Generated from iotas inside the trace (never host constants: big
    closed-over arrays are serialized into the remote-compile payload,
    which the axon compiler rejects past ~500MB — CLAUDE.md). The
    angle is computed from the EXACT integer ``(n * k) mod n_fft``
    so its magnitude stays below 2*pi: a naive f32 ``2*pi*n*k/N``
    carries ~1e-7 relative error on values up to ~6e3 rad, i.e. ~6e-4
    absolute phase error — 60x our parity budget.
    """
    f = n_fft // 2 + 1
    n = jax.lax.iota(jnp.int32, n_fft)[:, None]
    k = jax.lax.iota(jnp.int32, f)[None, :]
    m = (n * k) % n_fft
    ang = m.astype(jnp.float32) * np.float32(2.0 * np.pi / n_fft)
    return jnp.cos(ang), jnp.sin(ang)


_DFT_PRECISIONS = {
    # TPU f32 matmul emulation passes: 'highest' = 6-pass bf16 (full f32
    # fidelity, ~1e-7), 'high' = 3-pass (~1e-6 relative — plenty for a
    # training loss), 'default' = 1-pass bf16 (~4e-3)
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def rfft_ri(framed: jnp.ndarray, n_fft: int, precision: str = "highest"):
    """rfft along the last axis as a (real, imag) pair of f32 arrays.

    Uses real-arithmetic DFT matmuls (MXU work: [.., n_fft] x
    [n_fft, n_fft//2+1]) when ``_use_dft_matmul()``, else
    ``jnp.fft.rfft``. ``precision`` selects the TPU f32 matmul emulation
    level (see ``_DFT_PRECISIONS``): the encode/parity transform path
    keeps the default HIGHEST (budget vs the true FFT ~1e-4); training
    losses pass 'high' — half the MXU passes at ~1e-6 relative error.
    """
    if framed.shape[-1] != n_fft:
        pad = [(0, 0)] * (framed.ndim - 1) + [(0, n_fft - framed.shape[-1])]
        framed = jnp.pad(framed, pad)
    if _use_dft_matmul():
        prec = _DFT_PRECISIONS[precision]
        cos_b, sin_b = _dft_bases(n_fft)
        framed = framed.astype(jnp.float32)
        re = jnp.matmul(framed, cos_b, precision=prec)
        im = -jnp.matmul(framed, sin_b, precision=prec)
        return re, im
    x = jnp.fft.rfft(framed, n=n_fft, axis=-1)
    return jnp.real(x), jnp.imag(x)


def irfft_ri(re: jnp.ndarray, im: jnp.ndarray, n_fft: int,
             precision: str = "highest") -> jnp.ndarray:
    """Inverse of ``rfft_ri``: (real, imag) [..., n_fft//2+1] -> real
    [..., n_fft] signal frames, matching ``jnp.fft.irfft``."""
    if _use_dft_matmul():
        prec = _DFT_PRECISIONS[precision]
        f = n_fft // 2 + 1
        # Hermitian fold: interior bins appear twice in the full DFT.
        # DC is unique always; the last bin is the unique Nyquist bin
        # only when n_fft is even (odd n_fft has no Nyquist bin and its
        # last rfft bin IS duplicated).
        w = np.full((f,), 2.0, np.float32)
        w[0] = 1.0
        if n_fft % 2 == 0:
            w[-1] = 1.0
        cos_b, sin_b = _dft_bases(n_fft)  # [n_fft, f]
        re = (re.astype(jnp.float32) * w) / np.float32(n_fft)
        im = (im.astype(jnp.float32) * w) / np.float32(n_fft)
        return (jnp.matmul(re, cos_b.T, precision=prec)
                - jnp.matmul(im, sin_b.T, precision=prec))
    return jnp.fft.irfft(re + 1j * im, n=n_fft, axis=-1)


@dataclasses.dataclass(frozen=True)
class SpectrogramsHelper:
    """Invertible linear-frequency log-magnitude + IF transform.

    Parameters mirror the reference CLI (``train_vqvae.py:457-461``).
    """

    fs_hz: int = 16000
    n_fft: int = 2048
    hop_length: int = 512
    window_length: int = 2048
    safelog_eps: float = 1e-6
    # pad the frame count up to a multiple of this, so the VQ-VAE's
    # downsampling chain divides the time axis evenly (125 -> 128 for 4 s)
    time_frames_multiple: int = 32
    # f32 matmul emulation level for the DFT-matmul STFT core (axon):
    # 'highest' keeps the ~1e-4 parity budget for encode paths; training
    # losses run a dataclasses.replace(..., dft_precision='high') copy
    # (half the MXU passes, ~1e-6 relative — see train/losses.py)
    dft_precision: str = "highest"

    @property
    def num_freq_bins(self) -> int:
        # the DC bin is discarded (GANSynth convention) -> n_fft // 2 bins
        return self.n_fft // 2

    # -- framing geometry ---------------------------------------------------
    @property
    def _pad_left(self) -> int:
        return (self.window_length - self.hop_length) // 2

    def num_frames(self, num_samples: int) -> int:
        frames = int(math.ceil(num_samples / self.hop_length))
        m = self.time_frames_multiple
        return ((frames + m - 1) // m) * m

    def num_samples(self, num_frames: int) -> int:
        """Audio length decoded from a spectrogram with ``num_frames`` frames."""
        return num_frames * self.hop_length

    def _pad_right(self, num_samples: int) -> int:
        total = (self.num_frames(num_samples) - 1) * self.hop_length + self.window_length
        return total - self._pad_left - num_samples

    def safelog(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.log(x + self.safelog_eps)

    # -- core STFT / iSTFT --------------------------------------------------
    def _frame(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[..., num_samples] -> windowed frames [..., T, n_fft]."""
        num_samples = audio.shape[-1]
        pad_l, pad_r = self._pad_left, self._pad_right(num_samples)
        pad_cfg = [(0, 0)] * (audio.ndim - 1) + [(pad_l, pad_r)]
        padded = jnp.pad(audio, pad_cfg)
        frames = self.num_frames(num_samples)
        if self.window_length % self.hop_length == 0:
            # slice framing (window = m*hop, true for the production
            # 2048/512 geometry): frames are a sliding window over
            # contiguous hop-sized chunks — a reshape + m static slices.
            # The [T, window] gather routes through TPU gather HW and
            # differentiates to a scatter-add; slices are contiguous
            # copies with pad+add backward. Same frame values.
            m = self.window_length // self.hop_length
            k = frames + m - 1
            chunks = padded.reshape(
                padded.shape[:-1] + (-1, self.hop_length))[..., :k, :]
            framed = jnp.concatenate(
                [chunks[..., c:c + frames, :] for c in range(m)], axis=-1)
        else:
            # framing as a static gather: [T, window_length] indices
            idx = (np.arange(frames)[:, None] * self.hop_length
                   + np.arange(self.window_length)[None, :])
            framed = padded[..., idx]  # [..., T, window]
        window = jnp.asarray(_hann_window(self.window_length))
        framed = framed * window
        if self.n_fft > self.window_length:
            extra = self.n_fft - self.window_length
            pad_cfg = [(0, 0)] * (framed.ndim - 1) + [(0, extra)]
            framed = jnp.pad(framed, pad_cfg)
        return framed

    def stft(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[..., num_samples] -> complex [..., T, F=n_fft//2+1].

        Complex public API (CPU/GPU convenience); the traced pipeline
        uses ``_stft_ri`` so no complex op ever reaches backends that
        cannot lower them."""
        re, im = self._stft_ri(audio)
        return re + 1j * im

    def _stft_ri(self, audio: jnp.ndarray):
        """[..., num_samples] -> (real, imag) [..., T, F] pair."""
        return rfft_ri(self._frame(audio), self.n_fft,
                       precision=self.dft_precision)

    def istft(self, stfts: jnp.ndarray, num_samples: int) -> jnp.ndarray:
        """complex [..., T, F=n_fft//2+1] -> [..., num_samples].

        Least-squares overlap-add inverse (same normalization as
        ``torch.istft``): multiply each inverse frame by the synthesis
        window and divide by the summed squared window envelope.
        """
        return self._istft_ri(jnp.real(stfts), jnp.imag(stfts),
                              num_samples)

    def _istft_ri(self, re: jnp.ndarray, im: jnp.ndarray,
                  num_samples: int) -> jnp.ndarray:
        frames = re.shape[-2]
        framed = irfft_ri(re, im, self.n_fft,
                          precision=self.dft_precision)
        framed = framed[..., : self.window_length]
        window = jnp.asarray(_hann_window(self.window_length))
        framed = framed * window

        total = (frames - 1) * self.hop_length + self.window_length
        batch_shape = framed.shape[:-2]
        if self.window_length % self.hop_length == 0:
            # overlap-add as m shifted adds (window = m*hop): chunk c of
            # frame f lands on output chunk f+c, so summing m pad-shifted
            # [.., frames, hop] views replaces the scatter-add — the
            # scatter serializes through TPU scatter HW and dominated
            # the to_audio dispatch (measured: the fused decode+iSTFT
            # serving path and the spectral-loss inverse both sit on
            # this op).
            m = self.window_length // self.hop_length
            k = frames + m - 1  # total == k * hop
            z = framed.reshape(batch_shape + (frames, m, self.hop_length))
            out = jnp.zeros(batch_shape + (k, self.hop_length),
                            dtype=framed.dtype)
            for c in range(m):
                out = out.at[..., c:c + frames, :].add(z[..., :, c, :])
            out = out.reshape(batch_shape + (total,))
        else:
            # overlap-add via segment sum over the static
            # frame->sample map
            idx = (np.arange(frames)[:, None] * self.hop_length
                   + np.arange(self.window_length)[None, :]).reshape(-1)
            flat = framed.reshape(batch_shape + (-1,))
            out = jnp.zeros(batch_shape + (total,), dtype=framed.dtype)
            out = out.at[..., idx].add(flat)

        win_sq = np.zeros(total, dtype=np.float64)
        w = _hann_window(self.window_length).astype(np.float64) ** 2
        for f in range(frames):
            win_sq[f * self.hop_length: f * self.hop_length + self.window_length] += w
        win_sq = np.maximum(win_sq, 1e-11).astype(np.float32)
        out = out / jnp.asarray(win_sq)
        pad_l = self._pad_left
        return out[..., pad_l: pad_l + num_samples]

    # -- public transform ---------------------------------------------------
    def _run_with_fft_fallback(self, impl, x, *args):
        """Run ``impl`` eagerly on the CPU backend when the default
        backend cannot execute complex FFTs (axon); no-op for tracers
        (inside jit the enclosing computation owns placement) and for
        backends where the probe succeeds."""
        if not isinstance(x, jax.core.Tracer):
            dev = _fft_fallback_device()
            if dev is not None:
                # hop through numpy: the plain device->host transfer is
                # the one path every backend implements (a direct
                # device_put(accel_array, cpu) is UNIMPLEMENTED on axon)
                x_host = np.asarray(x)
                with jax.default_device(dev):
                    return impl(jnp.asarray(x_host), *args)
        return impl(x, *args)

    def to_spectrogram(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, num_samples] (or [num_samples]) -> [B, 2, F, T] mag+IF."""
        return self._run_with_fft_fallback(self._to_spectrogram_impl,
                                           audio)

    def to_audio(self, spec_and_IF: jnp.ndarray,
                 num_samples: Optional[int] = None) -> jnp.ndarray:
        """[B, 2, F, T] -> [B, num_samples]."""
        return self._run_with_fft_fallback(self._to_audio_impl,
                                           spec_and_IF, num_samples)

    def _to_spectrogram_impl(self, audio: jnp.ndarray) -> jnp.ndarray:
        squeeze = audio.ndim == 1
        if squeeze:
            audio = audio[None]
        re, im = self._stft_ri(audio)
        re, im = re[..., 1:], im[..., 1:]  # discard DC -> [B, T, F]
        logmag = self.safelog(jnp.sqrt(re * re + im * im))
        phase = jnp.arctan2(im, re)
        if_ = instantaneous_frequency(phase, time_axis=-2)
        spec = jnp.stack([logmag, if_], axis=1)  # [B, 2, T, F]
        spec = jnp.swapaxes(spec, -1, -2)  # -> [B, 2, F, T]
        return spec[0] if squeeze else spec

    def _to_audio_impl(self, spec_and_IF: jnp.ndarray,
                       num_samples: Optional[int] = None) -> jnp.ndarray:
        squeeze = spec_and_IF.ndim == 3
        if squeeze:
            spec_and_IF = spec_and_IF[None]
        spec_and_IF = jnp.swapaxes(spec_and_IF, -1, -2)  # [B, 2, T, F]
        logmag = spec_and_IF[:, 0]
        if_ = spec_and_IF[:, 1]
        phase = jnp.cumsum(if_ * jnp.pi, axis=-2)
        mag = jnp.exp(logmag)
        audio = self._resynth_ri(mag, phase, num_samples)
        return audio[0] if squeeze else audio

    def _resynth_ri(self, mag: jnp.ndarray, phase: jnp.ndarray,
                    num_samples: Optional[int]) -> jnp.ndarray:
        """[B, T, F] magnitude + unwrapped phase -> [B, num_samples]."""
        re = mag * jnp.cos(phase)
        im = mag * jnp.sin(phase)
        # restore the discarded DC bin
        dc = jnp.zeros(re.shape[:-1] + (1,), dtype=re.dtype)
        re = jnp.concatenate([dc, re], axis=-1)
        im = jnp.concatenate([dc, im], axis=-1)
        if num_samples is None:
            num_samples = self.num_samples(re.shape[-2])
        return self._istft_ri(re, im, num_samples)

    def from_wavfile(self, path, duration_n: Optional[int] = None) -> jnp.ndarray:
        """Load a wav file (resampled to fs_hz) and return [1, 2, F, T]."""
        from ..data.wav import read_wav, resample

        audio, fs = read_wav(path)
        if audio.ndim > 1:
            audio = audio.mean(axis=0)
        if fs != self.fs_hz:
            audio = resample(audio, fs, self.fs_hz)
        if duration_n is not None:
            if audio.shape[-1] < duration_n:
                audio = np.pad(audio, (0, duration_n - audio.shape[-1]))
            audio = audio[:duration_n]
        return self.to_spectrogram(jnp.asarray(audio, dtype=jnp.float32)[None])


def _expanded_mel_edges(num_mel_bins: int, num_linear_bins: int,
                        fs_hz: float, lower_edge_hertz: float,
                        upper_edge_hertz: float,
                        break_frequency_hertz: float,
                        bin_width_threshold_factor: float) -> np.ndarray:
    """Band edges (num_mel_bins + 2) for an expanded-resolution mel scale.

    A plain mel scale with as many mel bins as linear bins produces, at low
    frequencies, filters far narrower than one linear STFT bin - degenerate
    and non-invertible. Following the reference's
    ``mel_scale_expand_resolution_factor`` knob
    (``train_vqvae.py:479-481``), we enforce a minimum band width of
    ``linear_bin_width / factor``: the lowest ``k`` bands are linearly spaced
    at that minimum width and the remainder are mel-spaced, with ``k`` chosen
    minimally so that mel spacing immediately exceeds the minimum width.
    """
    linear_bin_width = (fs_hz / 2.0) / num_linear_bins
    min_width = linear_bin_width / bin_width_threshold_factor
    num_edges = num_mel_bins + 2

    def edges_with_k(k: int) -> Optional[np.ndarray]:
        linear_top = lower_edge_hertz + k * min_width
        if linear_top >= upper_edge_hertz:
            return None
        lin_part = lower_edge_hertz + min_width * np.arange(k, dtype=np.float64)
        mel_lo = hertz_to_mel(linear_top, break_frequency_hertz)
        mel_hi = hertz_to_mel(upper_edge_hertz, break_frequency_hertz)
        mel_part = mel_to_hertz(
            np.linspace(mel_lo, mel_hi, num_edges - k), break_frequency_hertz)
        first_mel_width = mel_part[1] - mel_part[0] if len(mel_part) > 1 else np.inf
        edges = np.concatenate([lin_part, mel_part])
        return edges if first_mel_width >= min_width else None

    # smallest k whose mel section starts no narrower than min_width
    lo, hi = 0, num_edges - 2
    best = None
    while lo <= hi:
        mid = (lo + hi) // 2
        e = edges_with_k(mid)
        if e is not None:
            best = e
            hi = mid - 1
        else:
            lo = mid + 1
    if best is None:
        best = edges_with_k(0)
        if best is None:
            # fully linear fallback
            best = np.linspace(lower_edge_hertz, upper_edge_hertz, num_edges)
    return best


def linear_to_mel_weight_matrix(num_mel_bins: int, num_linear_bins: int,
                                fs_hz: float, lower_edge_hertz: float,
                                upper_edge_hertz: float,
                                break_frequency_hertz: float = _MEL_BREAK_FREQUENCY_HERTZ,
                                bin_width_threshold_factor: float = 1.5,
                                ) -> np.ndarray:
    """[num_linear_bins, num_mel_bins] triangular filterbank (no DC bin)."""
    edges = _expanded_mel_edges(
        num_mel_bins, num_linear_bins, fs_hz, lower_edge_hertz,
        upper_edge_hertz, break_frequency_hertz, bin_width_threshold_factor)
    # linear bin center frequencies, DC discarded: bins 1..num_linear_bins
    linear_freqs = (np.arange(1, num_linear_bins + 1, dtype=np.float64)
                    * (fs_hz / 2.0) / num_linear_bins)
    lower = edges[:-2][None, :]
    center = edges[1:-1][None, :]
    upper = edges[2:][None, :]
    f = linear_freqs[:, None]
    up_slope = (f - lower) / np.maximum(center - lower, 1e-12)
    down_slope = (upper - f) / np.maximum(upper - center, 1e-12)
    weights = np.maximum(0.0, np.minimum(up_slope, down_slope))
    # ensure every mel bin catches at least its nearest linear bin
    empty = weights.sum(axis=0) < 1e-8
    if np.any(empty):
        nearest = np.abs(linear_freqs[:, None] - center[0][None, :]).argmin(axis=0)
        for m in np.nonzero(empty)[0]:
            weights[nearest[m], m] = 1.0
    return weights.astype(np.float32)


def mel_to_linear_matrix(l2m: np.ndarray) -> np.ndarray:
    """Pseudo-inverse as in GANSynth: m2l = l2m^T diag(1/colsums(l2m l2m^T))."""
    m = l2m.astype(np.float64)  # [linear, mel]
    mt = m.T  # [mel, linear]
    p = m @ mt  # [linear, linear]
    d = p.sum(axis=0)
    d = np.where(np.abs(d) > 1e-8, 1.0 / np.maximum(d, 1e-12), d)
    return (mt * d[None, :]).astype(np.float32)  # [num_mel, num_linear]


@dataclasses.dataclass(frozen=True)
class MelSpectrogramsHelper(SpectrogramsHelper):
    """Mel-warped variant; shape-preserving (num_mel_bins == num linear bins)."""

    lower_edge_hertz: float = 0.0
    upper_edge_hertz: float = 8000.0
    mel_break_frequency_hertz: float = _MEL_BREAK_FREQUENCY_HERTZ
    mel_bin_width_threshold_factor: float = 1.5

    def _matrices(self):
        l2m = linear_to_mel_weight_matrix(
            num_mel_bins=self.num_freq_bins,
            num_linear_bins=self.num_freq_bins,
            fs_hz=self.fs_hz,
            lower_edge_hertz=self.lower_edge_hertz,
            upper_edge_hertz=self.upper_edge_hertz,
            break_frequency_hertz=self.mel_break_frequency_hertz,
            bin_width_threshold_factor=self.mel_bin_width_threshold_factor)
        m2l = mel_to_linear_matrix(l2m)
        return jnp.asarray(l2m), jnp.asarray(m2l)

    # overriding the _impl methods (not the public wrappers) keeps the
    # whole composite — mel conversion included — under the base class's
    # one-shot FFT-fallback placement (one device hop, not one per
    # eager mel op)
    def _to_spectrogram_impl(self, audio: jnp.ndarray) -> jnp.ndarray:
        linear = SpectrogramsHelper._to_spectrogram_impl(self, audio)
        return self.linear_to_mel(linear)

    def _to_audio_impl(self, spec_and_IF: jnp.ndarray,
                       num_samples: Optional[int] = None) -> jnp.ndarray:
        """Fused mel inverse + resynthesis.

        The composite ``mel_to_linear`` -> base ``_to_audio_impl`` would
        round-trip two exact inverse pairs over [B, T, F] arrays:
        ``phase -> instantaneous_frequency -> cumsum`` (identical mod
        2*pi — cos/sin are invariant) and
        ``0.5*safelog(mag_sq) -> exp`` (== ``sqrt(mag_sq + eps)``,
        computed directly here, one rounding FEWER). Skipping them
        drops ~6 full elementwise passes (diff, wrap-round, concat,
        cumsum's log-depth adds, log, exp) from every decode — the
        spectral training criterion runs this inversion twice per step
        and backprops through one of them, and the serving
        decode-to-audio dispatch sits on it too."""
        squeeze = spec_and_IF.ndim == 3
        if squeeze:
            spec_and_IF = spec_and_IF[None]
        _, m2l = self._matrices()
        x = jnp.swapaxes(spec_and_IF, -1, -2)  # [B, 2, T, F]
        logmelmag = x[:, 0]
        mel_if = x[:, 1]
        mag_sq = jnp.exp(2.0 * logmelmag) @ m2l
        mag = jnp.sqrt(jnp.maximum(mag_sq, 0.0) + self.safelog_eps)
        phase = jnp.cumsum(mel_if * jnp.pi, axis=-2) @ m2l
        audio = self._resynth_ri(mag, phase, num_samples)
        return audio[0] if squeeze else audio

    def linear_to_mel(self, spec_and_IF: jnp.ndarray) -> jnp.ndarray:
        """[..., 2, F, T] linear logmag+IF -> mel logmag+IF."""
        l2m, _ = self._matrices()
        logmag = jnp.swapaxes(spec_and_IF[..., 0, :, :], -1, -2)  # [..., T, F]
        if_ = jnp.swapaxes(spec_and_IF[..., 1, :, :], -1, -2)
        mag_sq = jnp.exp(2.0 * logmag)
        logmelmag = 0.5 * self.safelog(mag_sq @ l2m)
        phase = jnp.cumsum(if_ * jnp.pi, axis=-2)
        mel_phase = phase @ l2m
        mel_if = instantaneous_frequency(mel_phase, time_axis=-2)
        out = jnp.stack([logmelmag, mel_if], axis=-3)  # [..., 2, T, F]
        return jnp.swapaxes(out, -1, -2)

    def mel_to_linear(self, mel_spec_and_IF: jnp.ndarray) -> jnp.ndarray:
        _, m2l = self._matrices()
        logmelmag = jnp.swapaxes(mel_spec_and_IF[..., 0, :, :], -1, -2)
        mel_if = jnp.swapaxes(mel_spec_and_IF[..., 1, :, :], -1, -2)
        mag_sq = jnp.exp(2.0 * logmelmag) @ m2l
        logmag = 0.5 * self.safelog(jnp.maximum(mag_sq, 0.0))
        mel_phase = jnp.cumsum(mel_if * jnp.pi, axis=-2)
        phase = mel_phase @ m2l
        if_ = instantaneous_frequency(phase, time_axis=-2)
        out = jnp.stack([logmag, if_], axis=-3)
        return jnp.swapaxes(out, -1, -2)


def get_spectrograms_helper(**kwargs) -> SpectrogramsHelper:
    """Factory mirroring the reference
    (``interactive_spectrogram_inpainting/utils/misc.py:10-29``): builds a
    linear or mel helper from a flat kwargs dict (e.g. a stored training
    parameters JSON). Unknown keys are ignored.
    """
    base = dict(
        fs_hz=kwargs.get("fs_hz", 16000),
        n_fft=kwargs.get("n_fft", 2048),
        hop_length=kwargs.get("hop_length", 512),
        window_length=kwargs.get("window_length", 2048),
    )
    if kwargs.get("use_mel_scale", False):
        return MelSpectrogramsHelper(
            **base,
            lower_edge_hertz=kwargs.get("mel_scale_lower_edge_hertz", 0.0),
            upper_edge_hertz=kwargs.get(
                "mel_scale_upper_edge_hertz", base["fs_hz"] / 2.0),
            mel_break_frequency_hertz=kwargs.get(
                "mel_scale_break_frequency_hertz", _MEL_BREAK_FREQUENCY_HERTZ),
            mel_bin_width_threshold_factor=kwargs.get(
                "mel_scale_expand_resolution_factor", 1.5),
        )
    return SpectrogramsHelper(**base)


def make_masked_phase_transform(min_magnitude: float):
    """Zero the IF channel wherever magnitude is below threshold.

    Mirrors ``GANsynth_pytorch.loader.make_masked_phase_transform`` as used
    at ``vqvae/vqvae.py:239-241`` of the reference: spectrogram values are
    log-magnitudes, so the threshold compares against ``log(min_magnitude)``.
    """
    log_threshold = float(np.log(min_magnitude))

    def transform(spec_and_IF: jnp.ndarray) -> jnp.ndarray:
        logmag = spec_and_IF[..., 0:1, :, :]
        if_ = spec_and_IF[..., 1:2, :, :]
        mask = logmag > log_threshold
        return jnp.concatenate([logmag, jnp.where(mask, if_, 0.0)], axis=-3)

    return transform
