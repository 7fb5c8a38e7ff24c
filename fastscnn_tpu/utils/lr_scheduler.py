"""Learning-rate schedules (constant/step/linear/poly/cosine by iteration).

Functional port of reference:utils/lr_scheduler.py:6-91 with identical
math — ``lr_schedule`` returns a pure ``step -> lr`` callable usable both
as an optax schedule (traced) and from Python. The stateful
``LRScheduler`` class mirrors the reference call signature for drop-in
use in the trainer loop.

The reference's poly config everywhere is power=0.9 over total iters
(reference:train.py:206-207).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp

__all__ = ["lr_schedule", "LRScheduler"]


def lr_schedule(
    mode: str,
    base_lr: float = 0.01,
    target_lr: float = 0.0,
    niters: int = 0,
    nepochs: int = 0,
    iters_per_epoch: int = 0,
    offset: int = 0,
    power: float = 0.9,
    step_iter: Sequence[int] | None = None,
    step_epoch: Sequence[int] | None = None,
    step_factor: float = 0.1,
) -> Callable:
    """Build a ``step -> lr`` schedule; semantics match the reference class."""
    if mode not in ("constant", "step", "linear", "poly", "cosine"):
        raise ValueError(f"unknown lr mode {mode!r}")
    if mode == "constant":
        target_lr = base_lr
    if nepochs * iters_per_epoch > 0:
        niters = nepochs * iters_per_epoch
        if step_epoch is not None:
            step_iter = [s * iters_per_epoch for s in step_epoch]
    if mode == "step" and step_iter is None and step_epoch is None:
        raise ValueError("step mode requires step_iter or step_epoch")

    steps = tuple(step_iter) if step_iter is not None else None
    if mode == "step" and steps and niters <= max(steps):
        # without niters (or with thresholds beyond it) the clip below
        # would freeze the counter before any decay step ever fires
        niters = max(steps) + 1
    n = max(niters - 1, 1)

    def schedule(num_update):
        t = jnp.clip(num_update - offset, 0, n).astype(jnp.float32)
        if mode == "constant":
            factor = 0.0
        elif mode == "linear":
            factor = 1.0 - t / n
        elif mode == "poly":
            # NOT `(1 - t/n) ** power`: under jit XLA lowers the traced
            # f32 `**` as exp(power·log(base)) and returns NaN at
            # base == 0 (eager numpy returns 0.0) — which lands on the
            # LAST optimizer step of every full poly run, 0·NaN-ing the
            # final checkpoint. Guard the endpoint explicitly.
            base = 1.0 - t / n
            factor = jnp.where(base > 0.0, jnp.power(jnp.maximum(base, 1e-30), power), 0.0)
        elif mode == "cosine":
            factor = (1.0 + jnp.cos(math.pi * t / n)) / 2.0
        else:  # step
            if steps is not None:
                count = sum((jnp.asarray(s, jnp.float32) <= t).astype(jnp.int32) for s in steps)
                return base_lr * step_factor ** count.astype(jnp.float32)
            return jnp.asarray(base_lr, jnp.float32)
        return target_lr + (base_lr - target_lr) * factor

    return schedule


class LRScheduler:
    """Stateful wrapper with the reference's ``scheduler(iter) -> lr``
    calling convention (reference:train.py:257-259)."""

    def __init__(self, mode, base_lr=0.01, **kwargs):
        self._schedule = lr_schedule(mode, base_lr=base_lr, **kwargs)
        self.learning_rate = base_lr

    def __call__(self, num_update: int) -> float:
        self.learning_rate = float(self._schedule(num_update))
        return self.learning_rate
