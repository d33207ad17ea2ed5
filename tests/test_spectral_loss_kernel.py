"""Fused multiscale-STFT spectral-loss kernel vs the XLA path.

Runs in Pallas interpret mode on the CPU test backend (conftest pins
jax to CPU); the same code path compiles with Mosaic on TPU. The XLA
``MultiscaleSpectralLoss.__call__`` path is itself golden-tested
against the EXECUTED reference (``tests/test_reference_parity.py``), so
value-equality here chains to reference exactness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interactive_spectrogram_inpainting_tpu.train.losses import (
    make_ddsp_loss, make_jukebox_loss, make_spectral_loss_from_spectrogram)
from interactive_spectrogram_inpainting_tpu.ops import spectral_loss_kernel


def _audio_pair(seed, batch=2, length=8000):
    rng = np.random.default_rng(seed)
    a = (rng.standard_normal((batch, length)) * 0.3).astype(np.float32)
    b = (a + 0.05 * rng.standard_normal(a.shape)).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


@pytest.mark.parametrize("make", [make_jukebox_loss, make_ddsp_loss],
                         ids=["jukebox", "ddsp"])
def test_fused_matches_xla_value_and_grad(make, monkeypatch):
    a, b = _audio_pair(0)
    loss = make()
    monkeypatch.setenv("ISI_FUSED_SPECTRAL", "0")
    ref_v, ref_g = jax.value_and_grad(lambda x: loss(x, b))(a)
    monkeypatch.setenv("ISI_FUSED_SPECTRAL", "1")
    fu_v, fu_g = jax.value_and_grad(lambda x: loss(x, b))(a)
    # value: the in-kernel 3-pass bf16 emulation reproduces
    # lax.Precision.HIGH (~1e-6 relative)
    np.testing.assert_allclose(float(fu_v), float(ref_v), rtol=2e-5)
    # gradient: the bf16 U residual carries ~0.4% relative noise —
    # standard bf16-gradient territory (the whole model trains in bf16)
    scale = float(jnp.max(jnp.abs(ref_g)))
    np.testing.assert_allclose(np.asarray(fu_g), np.asarray(ref_g),
                               atol=2e-3 * scale)


def test_fused_target_gets_no_gradient(monkeypatch):
    a, b = _audio_pair(1)
    loss = make_jukebox_loss()
    monkeypatch.setenv("ISI_FUSED_SPECTRAL", "1")
    gb = jax.grad(lambda y: loss(a, y))(b)
    # the reference treats the target as data; the fused path
    # stop_gradients it, so the cotangent is exactly zero
    assert float(jnp.max(jnp.abs(gb))) == 0.0


def test_fused_from_spectrogram_criterion(monkeypatch):
    """The full VQ-VAE training criterion (to_audio + multiscale loss)
    agrees between the fused and XLA paths, including the backprop
    through the inverse transform."""
    from interactive_spectrogram_inpainting_tpu.signal.spectrogram import (
        get_spectrograms_helper)
    helper = get_spectrograms_helper(use_mel_scale=True, n_fft=512,
                                     hop_length=128, window_length=512)
    a, b = _audio_pair(2, batch=2, length=8000)
    spec = helper.to_spectrogram(a)
    target = helper.to_spectrogram(b)
    crit = make_spectral_loss_from_spectrogram(make_jukebox_loss(), helper)
    monkeypatch.setenv("ISI_FUSED_SPECTRAL", "0")
    ref_v, ref_g = jax.value_and_grad(lambda s: crit(s, target))(spec)
    monkeypatch.setenv("ISI_FUSED_SPECTRAL", "1")
    fu_v, fu_g = jax.value_and_grad(lambda s: crit(s, target))(spec)
    np.testing.assert_allclose(float(fu_v), float(ref_v), rtol=2e-5)
    scale = float(jnp.max(jnp.abs(ref_g)))
    np.testing.assert_allclose(np.asarray(fu_g), np.asarray(ref_g),
                               atol=5e-3 * scale)


def test_eligibility_rules():
    # jukebox/ddsp big scales are fused; DDSP's 64/128 windows (hop 16 /
    # 32: 8x / 4x lane padding) stay on the XLA path
    ok = spectral_loss_kernel.scale_eligible
    assert ok(2048, 240, 1200, "high")
    assert ok(512, 48, 240, "high")
    assert not ok(64, 16, 64, "high")
    assert not ok(128, 32, 128, "high")
    assert not ok(2048, 240, 1200, "highest")   # 6-pass stays on XLA
    assert not ok(2048, 241, 1200, "high")      # win % hop != 0


def test_1d_audio(monkeypatch):
    a, b = _audio_pair(3, batch=1)
    loss = make_jukebox_loss()
    monkeypatch.setenv("ISI_FUSED_SPECTRAL", "0")
    ref = float(loss(a[0], b[0]))
    monkeypatch.setenv("ISI_FUSED_SPECTRAL", "1")
    fu = float(loss(a[0], b[0]))
    np.testing.assert_allclose(fu, ref, rtol=2e-5)


def test_fused_loss_is_device_count_invariant(monkeypatch):
    """Loss value and gradient match between a single device and the
    batch sharded over the 8-device 'data' mesh (interpret mode lowers
    the kernel to plain HLO, so the SPMD partitioner sees it)."""
    from interactive_spectrogram_inpainting_tpu.parallel.mesh import (
        data_sharding, make_mesh)
    monkeypatch.setenv("ISI_FUSED_SPECTRAL", "1")
    a, b = _audio_pair(4, batch=8)
    loss = make_jukebox_loss()
    fn = jax.jit(lambda x, y: jax.value_and_grad(
        lambda p: loss(p, y))(x))
    v1, g1 = fn(a, b)
    mesh = make_mesh()
    sh = data_sharding(mesh)
    v8, g8 = fn(jax.device_put(a, sh), jax.device_put(b, sh))
    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1),
                               atol=1e-7)


def test_tpu_mosaic_lowering_smoke(monkeypatch):
    """The kernels must keep LOWERING for TPU (Mosaic), not just run in
    interpret mode on the CPU test backend — catches layout-rule
    breakage (128-lane minors, reshape bans) in CI without hardware."""
    monkeypatch.setattr(spectral_loss_kernel, "_interpret_default",
                        lambda: False)
    monkeypatch.setenv("ISI_FUSED_SPECTRAL", "1")
    a = jnp.zeros((2, 16000), jnp.float32)
    loss = make_jukebox_loss()

    def fn(x, y):
        return jax.value_and_grad(lambda p: loss(p, y))(x)

    lowered = jax.jit(fn).trace(a, a).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert text.count("tpu_custom_call") == 6   # 3 scales x (fwd + bwd)
