"""Multi-host initialization + failure-detection helpers.

The reference's multi-process story is ``torch.distributed.launch`` env
rendezvous + NCCL (``train_vqvae.py:431-437``). The TPU equivalent is
``jax.distributed.initialize`` (DCN rendezvous between hosts; ICI within
a slice) and then the *same* SPMD program — no per-rank code paths.

Also provides a light heartbeat watchdog: the reference has no failure
detection at all (SURVEY.md section 5.3); here long device stalls (e.g.
a wedged collective on a lost host) abort the process so the cluster
scheduler can restart it from the orbax checkpoint.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize cross-host JAX. No-ops in single-process runs.

    Defaults come from the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``
    or the TPU metadata server on Cloud TPU pods).
    """
    coordinator = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)


class StepWatchdog:
    """Aborts if no training step completes within ``timeout_s``.

    Usage::

        watchdog = StepWatchdog(timeout_s=600)
        for batch in loader:
            ... run step ...
            watchdog.pet()
    """

    def __init__(self, timeout_s: float = 600.0, poll_s: float = 10.0,
                 abort=None):
        self.timeout_s = timeout_s
        self.poll_s = poll_s
        # injectable abort action (tests); production default hard-exits
        # so the cluster scheduler restarts from the orbax checkpoint
        self._abort = abort if abort is not None else (
            lambda: os._exit(42))
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._watch, daemon=True)
        self._thread.start()

    def pet(self) -> None:
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2 * self.poll_s)

    def __enter__(self) -> "StepWatchdog":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def _watch(self) -> None:
        while not self._stop.wait(self.poll_s):
            stalled = time.monotonic() - self._last
            if stalled > self.timeout_s:
                import sys
                print(f"StepWatchdog: no step for {stalled:.0f}s "
                      f"(> {self.timeout_s:.0f}s); aborting for restart",
                      file=sys.stderr, flush=True)
                self._abort()
                return


def maybe_watchdog(timeout_s: float) -> Optional[StepWatchdog]:
    """CLI adapter for ``--watchdog_timeout_s`` (0 or negative = off)."""
    if timeout_s and timeout_s > 0:
        return StepWatchdog(timeout_s=timeout_s,
                            poll_s=min(10.0, timeout_s / 4))
    return None
