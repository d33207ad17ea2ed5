"""Checkpointer unit tests: rolling saves, best-tracking with the
persisted marker, restore + restore_best (reference
``utils/training/checkpoint.py:6-31`` conventions on orbax)."""

import json

import numpy as np
import jax.numpy as jnp

from interactive_spectrogram_inpainting_tpu.train.checkpoint import (
    Checkpointer)


def state_with(value: float):
    return {"params": {"w": jnp.full((4, 4), value)},
            "opt_state": {"count": jnp.asarray(int(value))}}


def test_save_restore_and_best_tracking(tmp_path):
    ckpt = Checkpointer(tmp_path, save_frequency=1)
    assert ckpt.latest_epoch() is None

    assert ckpt.save(0, state_with(0.0), validation_loss=1.0) is True
    assert ckpt.save(1, state_with(1.0), validation_loss=2.0) is False
    assert ckpt.save(2, state_with(2.0), validation_loss=0.5) is True
    assert ckpt.latest_epoch() == 2

    marker = json.loads(
        (tmp_path / "best_validation_loss.json").read_text())
    assert marker["validation_loss"] == 0.5 and marker["epoch"] == 2

    restored, epoch = ckpt.restore(state_with(0.0))
    assert epoch == 2
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.full((4, 4), 2.0))

    # specific epoch
    restored, epoch = ckpt.restore(state_with(0.0), epoch=1)
    assert epoch == 1
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.full((4, 4), 1.0))
    ckpt.close()


def test_restore_best_and_marker_reload(tmp_path):
    ckpt = Checkpointer(tmp_path, save_frequency=1)
    ckpt.save(0, state_with(0.0), validation_loss=1.0)
    ckpt.save(1, state_with(1.0), validation_loss=3.0)  # worse: not best
    restored, epoch = ckpt.restore_best(state_with(0.0))
    assert epoch == 0
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.zeros((4, 4)))
    ckpt.close()

    # a NEW Checkpointer over the same directory reloads the best marker,
    # so resumed training does not overwrite best with a worse epoch
    again = Checkpointer(tmp_path, save_frequency=1)
    assert again.best_validation_loss == 1.0
    assert again.save(2, state_with(2.0), validation_loss=2.0) is False
    assert again.save(3, state_with(3.0), validation_loss=0.1) is True
    again.close()


def test_save_frequency_gates_rolling_saves(tmp_path):
    ckpt = Checkpointer(tmp_path, save_frequency=2)
    ckpt.save(0, state_with(0.0))
    ckpt.save(1, state_with(1.0))  # skipped (1 % 2 != 0)
    assert ckpt.latest_epoch() == 0
    ckpt.save(2, state_with(2.0))
    assert ckpt.latest_epoch() == 2
    ckpt.close()
