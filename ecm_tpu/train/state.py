"""TrainState + optimizer (reference T1: ``optim.Adam(lr=1e-3)``;
T2 ``adjust_learning_rate``: 1e-3 -> 1e-4 late in KITTI fine-tune —
SURVEY.md 2.3).

TPU-native: a flax TrainState extended with BN ``batch_stats``; the optax
chain is Adam with an optional piecewise-constant schedule mirroring the
reference's epoch-based LR drop, plus optional global-norm clipping (not in
the reference; off by default).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(
    lr: float = 1e-3,
    boundaries_and_lrs: list[tuple[int, float]] | None = None,
    clip_norm: float | None = None,
) -> optax.GradientTransformation:
    """Adam (torch defaults: b1=0.9, b2=0.999, eps=1e-8) with optional
    step-boundary LR schedule (the reference drops 1e-3 -> 1e-4 at ~epoch 200
    of the KITTI fine-tune)."""
    if boundaries_and_lrs:
        sched = optax.piecewise_constant_schedule(
            init_value=lr,
            boundaries_and_scales={b: v / lr for b, v in boundaries_and_lrs},
        )
    else:
        sched = lr
    tx = optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def create_train_state(
    model: nn.Module,
    rng: jax.Array,
    input_shape: tuple[int, int, int],  # (H, W, 3)
    tx: optax.GradientTransformation | None = None,
    batch_size: int = 1,
) -> TrainState:
    """Initialize params (always with ``train=True`` so ALL heads exist —
    eval-mode apply then simply ignores the unused classif1/2 params).

    init runs under jit: eager linen init dispatches hundreds of individual
    ops, which costs minutes on a high-dispatch-latency (relay-attached)
    device; one compiled call is ~100x faster there.
    """
    h, w, c = input_shape
    dummy = jnp.zeros((batch_size, h, w, c), jnp.float32)
    init_fn = jax.jit(lambda r: model.init({"params": r}, dummy, dummy, train=True))
    variables = init_fn(rng)
    if tx is None:
        tx = make_optimizer()
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
