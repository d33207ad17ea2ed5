"""Signal-layer tests: STFT convention parity vs torch, round-trip fidelity.

The reference pipeline's codemap parity hinges on the spectrogram transform
(SURVEY.md section 7.3), so these tests pin down: framing geometry, torch
STFT parity, IF integration exactness, and audio round-trip error.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from interactive_spectrogram_inpainting_tpu.signal import (
    SpectrogramsHelper, MelSpectrogramsHelper, get_spectrograms_helper,
    make_masked_phase_transform, DataNormalizer, DataNormalizerStatistics,
)

FS = 16000
N_SAMPLES = 4 * FS  # 4-second NSynth note


def make_note(rng, n=N_SAMPLES):
    """Synthetic harmonic note with decay envelope (NSynth-like)."""
    t = np.arange(n) / FS
    f0 = 220.0
    audio = sum((0.5 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t)
                for k in range(6))
    audio *= np.exp(-t * 1.5)
    audio += 0.001 * rng.standard_normal(n)
    return (audio / np.abs(audio).max() * 0.8).astype(np.float32)


def test_canonical_shape(rng):
    helper = SpectrogramsHelper()
    spec = helper.to_spectrogram(jnp.asarray(make_note(rng))[None])
    # canonical reference shape: [B, 2, 1024, 128] (Inference.ipynb cell 1)
    assert spec.shape == (1, 2, 1024, 128)


def test_stft_matches_torch(rng):
    import torch

    helper = SpectrogramsHelper()
    audio = make_note(rng)
    ours = np.asarray(helper.stft(jnp.asarray(audio)[None]))[0]  # [T, F]

    pad_l = helper._pad_left
    pad_r = helper._pad_right(len(audio))
    padded = np.pad(audio, (pad_l, pad_r))
    theirs = torch.stft(
        torch.from_numpy(padded), n_fft=2048, hop_length=512,
        win_length=2048, window=torch.hann_window(2048, periodic=True),
        center=False, return_complex=True).numpy().T  # [T, F]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-4)


def test_linear_round_trip(rng):
    helper = SpectrogramsHelper()
    audio = make_note(rng)
    spec = helper.to_spectrogram(jnp.asarray(audio)[None])
    recon = np.asarray(helper.to_audio(spec, num_samples=N_SAMPLES))[0]
    # exact-phase round trip: near-perfect reconstruction
    err = np.mean((recon - audio) ** 2) / np.mean(audio ** 2)
    assert err < 1e-3, f"relative MSE {err}"


def test_if_integration_recovers_phase(rng):
    from interactive_spectrogram_inpainting_tpu.signal.spectrogram import (
        instantaneous_frequency)

    phase = np.unwrap(rng.uniform(-np.pi, np.pi, size=(3, 50, 8)), axis=1)
    if_ = np.asarray(instantaneous_frequency(jnp.asarray(phase), time_axis=1))
    recovered = np.cumsum(if_ * np.pi, axis=1)
    # recovered phase must agree with the original modulo 2*pi
    delta = (phase - recovered) / (2 * np.pi)
    np.testing.assert_allclose(delta, np.round(delta), atol=1e-4)


def test_mel_round_trip(rng):
    helper = MelSpectrogramsHelper()
    audio = make_note(rng)
    spec = helper.to_spectrogram(jnp.asarray(audio)[None])
    assert spec.shape == (1, 2, 1024, 128)
    recon = np.asarray(helper.to_audio(spec, num_samples=N_SAMPLES))[0]
    # mel warping is lossy; require decent SNR on a harmonic note
    err = np.mean((recon - audio) ** 2) / np.mean(audio ** 2)
    assert err < 0.3, f"relative MSE {err}"


def test_mel_matrices_shapes_and_coverage():
    helper = MelSpectrogramsHelper()
    l2m, m2l = helper._matrices()
    assert l2m.shape == (1024, 1024)
    assert m2l.shape == (1024, 1024)
    # every mel bin receives some energy, every linear bin is representable
    assert float(jnp.min(jnp.sum(l2m, axis=0))) > 0.0


def test_factory_matches_reference_flags():
    params = dict(fs_hz=16000, n_fft=2048, hop_length=512, window_length=2048,
                  use_mel_scale=True, mel_scale_lower_edge_hertz=0.0,
                  mel_scale_upper_edge_hertz=8000.0,
                  mel_scale_break_frequency_hertz=700.0,
                  mel_scale_expand_resolution_factor=1.5,
                  unrelated_flag=123)
    helper = get_spectrograms_helper(**params)
    assert isinstance(helper, MelSpectrogramsHelper)
    params["use_mel_scale"] = False
    helper = get_spectrograms_helper(**params)
    assert isinstance(helper, SpectrogramsHelper)
    assert not isinstance(helper, MelSpectrogramsHelper)


def test_masked_phase_transform():
    transform = make_masked_phase_transform(min_magnitude=1e-2)
    logmag = np.full((1, 1, 4, 4), np.log(1e-3), dtype=np.float32)
    logmag[0, 0, 0, 0] = np.log(0.5)
    if_ = np.ones((1, 1, 4, 4), dtype=np.float32)
    out = np.asarray(transform(jnp.concatenate(
        [jnp.asarray(logmag), jnp.asarray(if_)], axis=1)))
    assert out[0, 1, 0, 0] == 1.0  # above threshold: IF kept
    assert out[0, 1, 1, 1] == 0.0  # below threshold: IF zeroed
    np.testing.assert_array_equal(out[0, 0], logmag[0, 0])  # magnitude intact


def test_normalizer_round_trip(rng):
    stats = DataNormalizerStatistics(
        min_logmag=-13.8, max_logmag=2.0, min_IF=-1.0, max_IF=1.0)
    norm = DataNormalizer(stats)
    x = jnp.asarray(rng.standard_normal((2, 2, 8, 8)).astype(np.float32))
    y = norm.normalize(x)
    x2 = np.asarray(norm.denormalize(y))
    np.testing.assert_allclose(x2, np.asarray(x), atol=1e-5)


def test_normalizer_statistics_io(tmp_path, rng):
    batches = [rng.standard_normal((4, 2, 8, 8)).astype(np.float32)
               for _ in range(3)]
    stats = DataNormalizer.compute_statistics(batches)
    norm = DataNormalizer(stats)
    norm.dump_statistics(tmp_path / "stats.json")
    norm2 = DataNormalizer.load_statistics(tmp_path / "stats.json")
    assert norm2.statistics == stats
    all_data = np.concatenate(batches)
    assert stats.max_logmag == pytest.approx(float(all_data[:, 0].max()))


def test_wav_io_round_trip(tmp_path, rng):
    from interactive_spectrogram_inpainting_tpu.data import read_wav, write_wav

    audio = make_note(rng, n=8000)
    write_wav(tmp_path / "x.wav", audio, FS)
    loaded, sr = read_wav(str(tmp_path / "x.wav"))
    assert sr == FS
    assert loaded.shape == (1, 8000)
    np.testing.assert_allclose(loaded[0], audio, atol=2.0 / 32768)

    write_wav(tmp_path / "f.wav", audio, FS, subtype="FLOAT")
    loaded, sr = read_wav(str(tmp_path / "f.wav"))
    np.testing.assert_allclose(loaded[0], audio, atol=1e-6)


def test_resample(rng):
    from interactive_spectrogram_inpainting_tpu.data import resample

    t = np.arange(32000) / 32000
    audio = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    down = resample(audio, 32000, 16000)
    assert down.shape[-1] == 16000
    t16 = np.arange(16000) / 16000
    expected = np.sin(2 * np.pi * 440 * t16)
    # ignore filter edge effects
    np.testing.assert_allclose(down[500:-500], expected[500:-500], atol=5e-2)


def test_fft_fallback_device_path(rng, monkeypatch):
    """When the default backend cannot run complex FFTs (the axon
    remote-TPU tunnel), the eager STFT/iSTFT core is pinned to the CPU
    backend. Forcing the fallback must be numerically transparent, and
    traced (in-jit) calls must bypass it (placement belongs to the
    enclosing jit)."""
    import jax
    from interactive_spectrogram_inpainting_tpu.signal import spectrogram

    helper = MelSpectrogramsHelper(fs_hz=FS, n_fft=256, window_length=256,
                                   hop_length=64)
    audio = make_note(rng, 8000)[None]
    spec = np.asarray(helper.to_spectrogram(jnp.asarray(audio)))

    monkeypatch.setattr(spectrogram, "_FFT_FALLBACK_PROBED", True)
    monkeypatch.setattr(spectrogram, "_FFT_FALLBACK_DEVICE",
                        jax.devices("cpu")[0])
    spec_fb = helper.to_spectrogram(jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(spec_fb), spec,
                               rtol=1e-5, atol=1e-5)
    out = np.asarray(helper.to_audio(spec_fb))
    assert out.shape == (1, helper.num_samples(spec.shape[-1]))

    # tracers bypass the fallback: jitting straight through must work
    # and agree with the eager result
    jit_spec = np.asarray(
        jax.jit(helper.to_spectrogram)(jnp.asarray(audio)))
    np.testing.assert_allclose(jit_spec, spec, rtol=1e-4, atol=1e-4)


# -- real-arithmetic DFT path (verdict r3 item 1) ----------------------------
# On backends without complex-FFT support (axon TPU tunnel) the STFT core
# lowers to real DFT matmuls so the transforms — and the spectral training
# losses that backprop through them (reference utils/losses/spectral.py:
# 78-126) — execute ON the accelerator. These tests force the path via
# ISI_FFT_DFT=1 and pin parity against jnp.fft on CPU.

def _if_wrap_diff(a, b):
    """IF channel difference modulo the +-pi branch-cut wrap (IF is in
    units of pi, so a wrap shows as exactly +-2)."""
    d = a - b
    return (d + 1.0) % 2.0 - 1.0


def test_dft_matmul_parity_full_size(rng, monkeypatch):
    import jax
    from interactive_spectrogram_inpainting_tpu.signal import spectrogram

    x = rng.standard_normal((2, 3, 2048)).astype(np.float32)
    monkeypatch.setenv("ISI_FFT_DFT", "0")
    re0, im0 = spectrogram.rfft_ri(jnp.asarray(x), 2048)
    y0 = spectrogram.irfft_ri(re0, im0, 2048)
    monkeypatch.setenv("ISI_FFT_DFT", "1")
    re1, im1 = spectrogram.rfft_ri(jnp.asarray(x), 2048)
    y1 = spectrogram.irfft_ri(re0, im0, 2048)
    np.testing.assert_allclose(np.asarray(re1), np.asarray(re0),
                               atol=2e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(im1), np.asarray(im0),
                               atol=2e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)
    # irfft(rfft(x)) == x on the DFT path alone
    np.testing.assert_allclose(
        np.asarray(spectrogram.irfft_ri(re1, im1, 2048)), x,
        atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("n_fft", [255, 257])
def test_dft_matmul_parity_odd_n_fft(rng, monkeypatch, n_fft):
    # odd n_fft has no Nyquist bin: every non-DC rfft bin is duplicated
    # in the Hermitian fold (regression: w[-1] was wrongly set to 1.0)
    from interactive_spectrogram_inpainting_tpu.signal import spectrogram

    x = rng.standard_normal((4, n_fft)).astype(np.float32)
    monkeypatch.setenv("ISI_FFT_DFT", "1")
    re, im = spectrogram.rfft_ri(jnp.asarray(x), n_fft)
    y = spectrogram.irfft_ri(re, im, n_fft)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4, rtol=1e-5)
    monkeypatch.setenv("ISI_FFT_DFT", "0")
    y_fft = spectrogram.irfft_ri(re, im, n_fft)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_fft),
                               atol=1e-4, rtol=1e-5)


def test_dft_transform_parity(rng, monkeypatch):
    helper = MelSpectrogramsHelper(fs_hz=FS, n_fft=256, window_length=256,
                                   hop_length=64)
    audio = make_note(rng, 8000)[None]
    monkeypatch.setenv("ISI_FFT_DFT", "0")
    spec0 = np.asarray(helper.to_spectrogram(jnp.asarray(audio)))
    out0 = np.asarray(helper.to_audio(jnp.asarray(spec0)))
    monkeypatch.setenv("ISI_FFT_DFT", "1")
    spec1 = np.asarray(helper.to_spectrogram(jnp.asarray(audio)))
    out1 = np.asarray(helper.to_audio(jnp.asarray(spec0)))
    # magnitude channel: parity within the mel composite's exp/log
    # amplification of the ~1e-4 core DFT error; IF channel: parity
    # modulo the +-pi wrap (atan2 branch cut under tiny differences)
    np.testing.assert_allclose(spec1[:, 0], spec0[:, 0], atol=2e-3)
    # the mel IF passes through a phase cumsum (error accumulates over
    # ~T frames); the tight end-to-end bound is the audio parity below
    assert np.abs(_if_wrap_diff(spec1[:, 1], spec0[:, 1])).max() < 1e-2
    np.testing.assert_allclose(out1, out0, atol=1e-4)


def test_dft_path_jits_without_complex_ops(rng, monkeypatch):
    """The whole traced to_spectrogram -> to_audio pipeline under the
    DFT path contains no fft op and no complex intermediate — the
    property that makes it executable on the axon backend."""
    import jax
    monkeypatch.setenv("ISI_FFT_DFT", "1")
    helper = SpectrogramsHelper(fs_hz=FS, n_fft=256, window_length=256,
                                hop_length=64)
    audio = jnp.asarray(make_note(rng, 8000)[None])

    def round_trip(a):
        return helper.to_audio(helper.to_spectrogram(a))

    hlo = jax.jit(round_trip).lower(audio).as_text()
    assert "fft" not in hlo.lower()
    assert "complex<" not in hlo
    out = np.asarray(jax.jit(round_trip)(audio))
    assert out.shape == (1, helper.num_samples(
        helper.num_frames(audio.shape[-1])))
    assert np.isfinite(out).all()


def test_loss_stft_mag_trimmed_frames_match_torch(rng, monkeypatch):
    """The loss-path STFT gathers frames at win_length (not n_fft) and
    skips the zero-padding — |X| is invariant to where the windowed
    frame sits inside the padded frame, so both the DFT-matmul and the
    FFT variant must match the reference's exact torch.stft call
    (``center=False``, spectral.py:88-92; Jukebox geometry: win 1200
    inside n_fft 2048)."""
    import torch
    from interactive_spectrogram_inpainting_tpu.train.losses import _stft_mag

    n_fft, hop, win = 2048, 240, 1200
    audio = make_note(rng, 8000)
    theirs = torch.stft(
        torch.from_numpy(audio), n_fft=n_fft, hop_length=hop,
        win_length=win, window=torch.hann_window(win, periodic=True),
        center=False, return_complex=True).abs().numpy().T  # [T, F]
    for force, tol in (("0", 2e-4), ("1", 2e-4)):
        monkeypatch.setenv("ISI_FFT_DFT", force)
        ours = np.asarray(_stft_mag(jnp.asarray(audio), n_fft, hop, win))
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=tol, rtol=1e-3)


def test_dft_spectral_loss_parity_and_grads(rng, monkeypatch):
    """DDSP/Jukebox losses agree between the FFT and DFT paths, and the
    spectral-from-spectrogram loss (the VQ-VAE training criterion,
    reference train_vqvae.py:177-179) yields finite gradients under jit
    with the DFT path forced."""
    import jax
    from interactive_spectrogram_inpainting_tpu.train.losses import (
        make_ddsp_loss, make_jukebox_loss,
        make_spectral_loss_from_spectrogram)

    a = make_note(rng, 8000)[None]
    b = a + 0.01 * rng.standard_normal(a.shape).astype(np.float32)
    for make in (make_ddsp_loss, make_jukebox_loss):
        loss = make()
        monkeypatch.setenv("ISI_FFT_DFT", "0")
        v0 = float(loss(jnp.asarray(a), jnp.asarray(b)))
        monkeypatch.setenv("ISI_FFT_DFT", "1")
        v1 = float(loss(jnp.asarray(a), jnp.asarray(b)))
        assert abs(v1 - v0) < 1e-3 * max(1.0, abs(v0))

    helper = SpectrogramsHelper(fs_hz=FS, n_fft=256, window_length=256,
                                hop_length=64)
    monkeypatch.setenv("ISI_FFT_DFT", "1")
    spec_loss = make_spectral_loss_from_spectrogram(
        make_jukebox_loss(), helper)
    target = helper.to_spectrogram(jnp.asarray(a))
    pred = target + 0.01
    g = jax.jit(jax.grad(lambda p: spec_loss(p, target)))(pred)
    assert np.isfinite(np.asarray(g)).all()


def test_mel_to_audio_fused_matches_composite(rng):
    """MelSpectrogramsHelper._to_audio_impl skips the exact inverse
    pairs (IF->cumsum, safelog->exp) the mel_to_linear -> base-impl
    composite would round-trip; the audio must match the composite to
    fp-reassociation level (phases agree mod 2*pi; magnitudes are
    bitwise the same formula)."""
    from interactive_spectrogram_inpainting_tpu.signal.spectrogram import (
        MelSpectrogramsHelper, SpectrogramsHelper)

    helper = MelSpectrogramsHelper(n_fft=512, window_length=512,
                                   hop_length=128)
    audio = make_note(rng, 8000)[None]
    spec = helper.to_spectrogram(jnp.asarray(audio))
    fused = np.asarray(helper.to_audio(spec))

    composite = np.asarray(SpectrogramsHelper._to_audio_impl(
        helper, helper.mel_to_linear(spec)))
    assert fused.shape == composite.shape
    scale = np.abs(composite).max()
    np.testing.assert_allclose(fused, composite, atol=2e-4 * scale)
