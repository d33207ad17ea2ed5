"""label_smoothing_loss: reduction-form custom-vjp vs the dense formula.

The loss is implemented as three class-axis reductions with a custom
backward (see ``train/losses.py:_smoothed_xent_elementwise``) so that no
f32 [B, L, n_class] array is ever materialized. These tests pin its
values AND gradients to the textbook dense formula the reference uses
(``interactive_spectrogram_inpainting/priors/prediction.py:5-20``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interactive_spectrogram_inpainting_tpu.train.losses import (
    label_smoothing_loss,
)


def dense_label_smoothing_loss(logits, targets, smoothing=0.0,
                               reduction="mean"):
    """The direct -sum(target_dist * log_softmax) form (test oracle)."""
    n_class = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    sm = smoothing / (n_class - 1) if n_class > 1 else 0.0
    one_hot = jax.nn.one_hot(targets, n_class)
    target_dist = one_hot * (1.0 - smoothing - sm) + sm
    elementwise = -jnp.sum(target_dist * log_probs, axis=-1)
    if reduction == "none":
        return elementwise
    return jnp.mean(elementwise)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("reduction", ["mean", "none"])
def test_matches_dense_formula(smoothing, reduction):
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(3, 17, 11)) * 3, jnp.float32)
    targets = jnp.asarray(rng.integers(0, 11, size=(3, 17)))
    got = label_smoothing_loss(logits, targets, smoothing=smoothing,
                               reduction=reduction)
    want = dense_label_smoothing_loss(logits, targets, smoothing=smoothing,
                                      reduction=reduction)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_gradients_match_dense_formula(smoothing):
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 9, 13)) * 2, jnp.float32)
    targets = jnp.asarray(rng.integers(0, 13, size=(2, 9)))
    # weighted-mean head mirrors the trainers' exact-count eval use
    weights = jnp.asarray(rng.uniform(0.1, 1.0, size=(2,)), jnp.float32)

    def head(fn, x):
        per_token = fn(x, targets, smoothing=smoothing, reduction="none")
        return jnp.sum(jnp.mean(per_token, axis=1) * weights)

    g_got = jax.grad(lambda x: head(label_smoothing_loss, x))(logits)
    g_want = jax.grad(lambda x: head(dense_label_smoothing_loss, x))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-5, atol=1e-6)


def test_bf16_logits_value_and_grad():
    """bf16 logits go straight in; reductions are f32, grads bf16."""
    rng = np.random.default_rng(2)
    logits32 = jnp.asarray(rng.normal(size=(2, 8, 32)) * 2, jnp.float32)
    logits16 = logits32.astype(jnp.bfloat16)
    targets = jnp.asarray(rng.integers(0, 32, size=(2, 8)))

    got = label_smoothing_loss(logits16, targets, smoothing=0.1)
    # bf16->f32 casts are exact, so the f32 oracle on the SAME bf16
    # values must agree to f32 round-off
    want = dense_label_smoothing_loss(logits16.astype(jnp.float32),
                                      targets, smoothing=0.1)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    g = jax.grad(lambda x: label_smoothing_loss(x, targets, smoothing=0.1)
                 )(logits16)
    assert g.dtype == jnp.bfloat16
    g_want = jax.grad(lambda x: dense_label_smoothing_loss(
        x, targets, smoothing=0.1))(logits32)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g_want), atol=2e-2)


def test_class_axis_moveaxis():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 7, 6)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 7, size=(4, 6)))
    got = label_smoothing_loss(logits, targets, smoothing=0.05,
                               class_axis=1)
    want = label_smoothing_loss(jnp.moveaxis(logits, 1, -1), targets,
                                smoothing=0.05)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_grad_under_jit_and_smoothing_zero_is_nll():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(2, 5, 9)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 9, size=(2, 5)))
    loss = jax.jit(lambda x: label_smoothing_loss(x, targets))(logits)
    nll = -jnp.take_along_axis(
        jax.nn.log_softmax(logits, -1), targets[..., None], -1)[..., 0]
    np.testing.assert_allclose(float(loss), float(jnp.mean(nll)), rtol=1e-6)


def test_spectral_precision_override():
    """--spectral_precision plumbs through get_reconstruction_criterion
    into both the loss STFTs and the inverse transform the loss
    backprops through (a dataclasses.replace copy of the helper)."""
    import jax.numpy as jnp
    from interactive_spectrogram_inpainting_tpu.signal.spectrogram import (
        SpectrogramsHelper)
    from interactive_spectrogram_inpainting_tpu.train.losses import (
        get_reconstruction_criterion)

    helper = SpectrogramsHelper(n_fft=256, window_length=256,
                                hop_length=64)
    for precision in ("highest", "high", "default"):
        crit = get_reconstruction_criterion("spectral_jukebox", helper,
                                            precision=precision)
        assert crit.loss.precision == precision
        assert crit.spectrograms_helper.dft_precision == precision
    # default (None) keeps the loss dataclass default
    crit = get_reconstruction_criterion("spectral_ddsp", helper)
    assert crit.loss.precision == "high"
    # mse ignores it
    assert get_reconstruction_criterion("mse", None, precision="default")
