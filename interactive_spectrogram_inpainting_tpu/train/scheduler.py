"""Learning-rate schedules (optax), mirroring the reachable reference set.

The reference ships a zoo (``utils/training/scheduler.py``) of which only
two are reachable from CLIs (SURVEY.md section 2): the fastai 1-cycle
``CycleScheduler`` (``train_vqvae.py:781-785``) and HuggingFace
``get_cosine_schedule_with_warmup``
(``train_autoregressive_model.py:653-663``). Both are provided here as
optax schedules, plus the rest of the zoo's shapes for completeness.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def cycle_schedule(lr_max: float, total_steps: int,
                   warmup_proportion: float = 0.3,
                   div_factor: float = 25.0,
                   final_div_factor: float = 1e4) -> optax.Schedule:
    """fastai-style 1-cycle: linear warmup from ``lr_max/div_factor`` to
    ``lr_max``, then cosine anneal down to ``lr_max/(div_factor *
    final_div_factor)`` — EXACTLY the reference ``CycleScheduler``'s
    phases (linear ``anneal_linear`` then ``anneal_cos`` to
    ``lr_min/1e4``, ``scheduler.py:289-330``); golden-tested against the
    executed reference class (``tests/test_momentum_cycle.py``). Our
    schedule(k) equals the reference's k-th ``step()`` return shifted by
    one (torch Phase.step increments before evaluating). Momentum
    cycling is handled by ``cycle_momentum_schedule``."""
    warmup = max(1, int(total_steps * warmup_proportion))
    return optax.join_schedules([
        optax.linear_schedule(lr_max / div_factor, lr_max, warmup),
        optax.cosine_decay_schedule(
            lr_max, max(1, total_steps - warmup),
            alpha=1.0 / (div_factor * final_div_factor)),
    ], [warmup])


def cycle_momentum_schedule(total_steps: int, m_min: float = 0.85,
                            m_max: float = 0.95,
                            warmup_proportion: float = 0.3
                            ) -> optax.Schedule:
    """Inverse momentum cycling of the 1-cycle policy: linear
    ``m_max -> m_min`` over the warmup, then COSINE recovery back to
    ``m_max`` (the reference ``CycleScheduler`` momentum phases,
    ``scheduler.py:316-326``). NOTE the reference's only call site
    passes ``momentum=None`` (``train_vqvae.py:782-785``) — cycling is
    the class's default semantics, reproduced here per the class
    defaults ``momentum=(0.95, 0.85)``."""
    warmup = max(1, int(total_steps * warmup_proportion))
    recover = max(1, total_steps - warmup)

    def cos_recover(count):
        import jax.numpy as jnp
        t = jnp.clip(count / recover, 0.0, 1.0)
        # anneal_cos(start=m_min, end=m_max, t)
        return m_max + (m_min - m_max) / 2.0 * (jnp.cos(jnp.pi * t) + 1.0)

    return optax.join_schedules([
        optax.linear_schedule(m_max, m_min, warmup),
        cos_recover,
    ], [warmup])


def cosine_schedule_with_warmup(lr: float, num_warmup_steps: int,
                                num_training_steps: int,
                                num_cycles: float = 0.5) -> optax.Schedule:
    """HuggingFace get_cosine_schedule_with_warmup equivalent
    (reference ``scheduler.py:154-171``)."""

    def fn(step):
        import jax.numpy as jnp
        step = jnp.minimum(step, num_training_steps)
        warm = jnp.clip(step / jnp.maximum(1, num_warmup_steps), 0.0, 1.0)
        progress = jnp.clip(
            (step - num_warmup_steps)
            / jnp.maximum(1, num_training_steps - num_warmup_steps),
            0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        return lr * jnp.where(step < num_warmup_steps, warm,
                              jnp.maximum(0.0, cos))

    return fn


def constant_schedule(lr: float) -> optax.Schedule:
    return optax.constant_schedule(lr)


def get_scheduler(name: Optional[str], lr: float, total_steps: int,
                  warmup_steps: int = 0) -> optax.Schedule:
    """CLI-facing factory: None/'' -> constant, 'cycle', 'warmup-cosine'."""
    if not name:
        return constant_schedule(lr)
    if name == "cycle":
        return cycle_schedule(lr, total_steps)
    if name in ("warmup-cosine", "warmup_cosine"):
        return cosine_schedule_with_warmup(
            lr, warmup_steps or int(0.02 * total_steps), total_steps)
    raise ValueError(f"unknown scheduler {name}")


def get_optimizer(opt_name: str, sched_name: Optional[str], lr: float,
                  total_steps: int, warmup_steps: int = 0,
                  eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam/RAdam under the named LR schedule. The 1-cycle policy cycles
    the first-moment decay ``b1`` INVERSELY to the LR (high momentum at
    low LR, low at peak) exactly like the reference's ``CycleScheduler``
    momentum half (``utils/training/scheduler.py:270-359``, reached via
    ``train_vqvae.py:781-785``); ``optax.inject_hyperparams`` re-evaluates
    both schedules against the optimizer step count. The injected state
    exposes ``opt_state.hyperparams['b1']`` for inspection."""
    schedule = get_scheduler(sched_name, lr, total_steps, warmup_steps)
    opt = optax.radam if opt_name == "radam" else optax.adam
    # inject_hyperparams records ALL numeric args (incl. defaults) in
    # opt_state.hyperparams, so passing eps never changes the cycle
    # opt_state structure — resume stays compatible either way
    if sched_name == "cycle":
        return optax.inject_hyperparams(opt)(
            learning_rate=schedule,
            b1=cycle_momentum_schedule(total_steps), eps=eps)
    return opt(schedule, eps=eps)
