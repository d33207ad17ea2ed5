"""Multi-host init + step-watchdog wiring (SURVEY.md sections 5.3/5.8).

The reference's multi-process story is ``torch.distributed`` env
rendezvous (``/root/reference/train_vqvae.py:431-437``); ours is
``jax.distributed.initialize`` behind
``parallel.distributed.initialize_multihost`` (a no-op without the env
vars) plus a heartbeat ``StepWatchdog`` (the reference has no failure
detection at all) — both reachable from every trainer CLI.
"""

import os
import threading
import time

import pytest

from interactive_spectrogram_inpainting_tpu.parallel.distributed import (
    StepWatchdog, initialize_multihost, maybe_watchdog)


def test_initialize_multihost_is_noop_single_process(monkeypatch):
    """Without coordinator env vars / args this must do nothing (and in
    particular must NOT call jax.distributed.initialize, which would
    hang waiting for peers)."""
    import jax

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    initialize_multihost()
    assert called == []


def test_initialize_multihost_forwards_rendezvous(monkeypatch):
    import jax

    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: kw)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    # env-var path reaches jax.distributed.initialize
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    initialize_multihost(num_processes=4, process_id=1)
    assert called == [{"coordinator_address": "10.0.0.1:1234",
                       "num_processes": 4, "process_id": 1}]


def test_watchdog_fires_on_stalled_step():
    """A stalled training loop (no pet() within timeout_s) must trigger
    the abort action."""
    fired = threading.Event()
    dog = StepWatchdog(timeout_s=0.2, poll_s=0.05, abort=fired.set)
    try:
        assert fired.wait(timeout=5.0)
    finally:
        dog.stop()


def test_watchdog_survives_while_petted_then_stops_cleanly():
    fired = threading.Event()
    dog = StepWatchdog(timeout_s=0.4, poll_s=0.05, abort=fired.set)
    try:
        deadline = time.monotonic() + 1.0
        while time.monotonic() < deadline:
            dog.pet()  # healthy loop: steps keep completing
            time.sleep(0.05)
        assert not fired.is_set()
    finally:
        dog.stop()
    # after stop() the thread is joined and can no longer fire
    assert not dog._thread.is_alive()
    time.sleep(0.2)
    assert not fired.is_set()


def test_maybe_watchdog_zero_is_off():
    assert maybe_watchdog(0.0) is None
    assert maybe_watchdog(-1.0) is None
    dog = maybe_watchdog(600.0)
    try:
        assert isinstance(dog, StepWatchdog)
        assert dog.poll_s <= 10.0
    finally:
        dog.stop()


@pytest.mark.parametrize("module,required", [
    ("interactive_spectrogram_inpainting_tpu.train.train_vqvae", []),
    ("interactive_spectrogram_inpainting_tpu.train.train_prior",
     ["--hier", "top", "--database_path", "/tmp/db"]),
])
def test_trainer_clis_expose_watchdog_flag(module, required):
    import importlib

    mod = importlib.import_module(module)
    args = mod.make_parser().parse_args(
        required + ["--watchdog_timeout_s", "300"])
    assert args.watchdog_timeout_s == 300.0
    # default off
    assert mod.make_parser().parse_args(required).watchdog_timeout_s == 0.0


def test_production_default_abort_is_hard_exit(monkeypatch):
    """Unparameterized watchdogs abort via os._exit(42) so the cluster
    scheduler restarts the job from the orbax checkpoint."""
    codes = []
    monkeypatch.setattr(os, "_exit", lambda code: codes.append(code))
    dog = StepWatchdog(timeout_s=0.1, poll_s=0.02)
    try:
        deadline = time.monotonic() + 5.0
        while not codes and time.monotonic() < deadline:
            time.sleep(0.02)
    finally:
        dog.stop()
    assert codes and codes[0] == 42
