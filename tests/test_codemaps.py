"""Codemap flatten/unflatten round-trip exactness — the reference's only
test contract (``tests/check_relative_transformer.py``), swept over its
shape grid plus non-square patches the reference test can't distinguish."""

import numpy as np
import jax.numpy as jnp
import pytest

from interactive_spectrogram_inpainting_tpu.models.prior import (
    SimpleCodemapsHelper, ZigZagCodemapsHelper)

SHAPES = [(32, 4), (64, 8), (128, 16)]
BOTTOM_SHAPES = [(64, 8), (128, 16), (256, 32)]


@pytest.mark.parametrize("shape", SHAPES)
def test_simple_round_trip(shape):
    f, t = shape
    helper = SimpleCodemapsHelper(f, t)
    codemap = jnp.arange(f * t).reshape(1, f, t)
    seq = helper.to_sequence(codemap)
    back = helper.to_time_frequency_map(seq)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codemap))


def test_simple_scan_order_is_frequency_first():
    helper = SimpleCodemapsHelper(3, 2)
    codemap = jnp.asarray(np.arange(6).reshape(1, 3, 2))  # [f, t] = f*2+t
    seq = np.asarray(helper.to_sequence(codemap))[0]
    # time-major frames, frequencies fastest: (f0,t0),(f1,t0),(f2,t0),(f0,t1)...
    np.testing.assert_array_equal(seq, [0, 2, 4, 1, 3, 5])


@pytest.mark.parametrize("cond_shape", SHAPES)
@pytest.mark.parametrize("shape", BOTTOM_SHAPES)
def test_zigzag_round_trip_and_first_patch(cond_shape, shape):
    if cond_shape[0] >= shape[0]:
        pytest.skip("condition must be coarser")
    f, t = shape
    pf, pt = f // cond_shape[0], t // cond_shape[1]
    helper = ZigZagCodemapsHelper(f, t, pf, pt)
    codemap = jnp.arange(f * t).reshape(1, f, t)
    seq = helper.to_sequence(codemap)
    back = helper.to_time_frequency_map(seq)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codemap))

    # expected first patch (check_relative_transformer.py:106-110):
    # values arange(pf)[:,None] + arange(pt)[None,:]*t, flattened
    expected = (np.arange(pf)[:, None]
                + np.arange(pt)[None, :] * t).flatten()
    np.testing.assert_array_equal(np.asarray(seq)[0, :pf * pt], expected)


def test_zigzag_non_square_patches():
    # 12x4 target over 3x2 source -> 4x2 patches (pf != pt)
    helper = ZigZagCodemapsHelper(12, 4, 4, 2)
    codemap = jnp.arange(48).reshape(1, 12, 4)
    seq = np.asarray(helper.to_sequence(codemap))[0]
    back = helper.to_time_frequency_map(jnp.asarray(seq)[None])
    np.testing.assert_array_equal(np.asarray(back)[0],
                                  np.arange(48).reshape(12, 4))
    # patch for source cell (f_s=0, t_s=0): cells (f in 0..3, t in 0..1),
    # frequency-first within the patch
    expected_first = [codemap[0, f, t] for t in range(2) for f in range(4)]
    np.testing.assert_array_equal(seq[:8], expected_first)
    # second patch belongs to source cell (f_s=1, t_s=0): cells f in 4..7
    expected_second = [codemap[0, f, t] for t in range(2) for f in range(4, 8)]
    np.testing.assert_array_equal(seq[8:16], expected_second)


def test_embedding_dimension_round_trip():
    helper = ZigZagCodemapsHelper(8, 4, 2, 2)
    rng = np.random.default_rng(0)
    codemap = jnp.asarray(rng.standard_normal((2, 8, 4, 5)).astype(np.float32))
    seq = helper.to_sequence(codemap)
    assert seq.shape == (2, 32, 5)
    back = helper.to_time_frequency_map(seq)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codemap))


def test_logits_permutation():
    helper = SimpleCodemapsHelper(4, 2)
    rng = np.random.default_rng(1)
    logits_seq = jnp.asarray(rng.standard_normal((1, 8, 7)).astype(np.float32))
    out = helper.to_time_frequency_map(logits_seq,
                                       permute_output_as_logits=True)
    assert out.shape == (1, 7, 4, 2)  # torch logits layout [B, C, F, T]
