"""Jitted train/eval steps (reference ``main.py::train``/``test`` —
SURVEY.md 3.1; TPU-native replacement for the autograd hot loop).

Parallelism is expressed by sharding, not by step-code changes: the SAME
``train_step`` runs single-device (trivial mesh) or data+disp-parallel —
callers place the batch with ``batch_sharding(mesh)`` and keep params
replicated; GSPMD inserts the gradient all-reduce (SURVEY.md 2.4). BN runs in
sync-BN semantics automatically because batch-stat reductions see the global
(sharded) batch under jit.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ecm_tpu.train.loss import stereo_loss
from ecm_tpu.train.metrics import disparity_metrics
from ecm_tpu.train.state import TrainState


def make_train_step(model, max_disp: int):
    """Returns jitted ``(state, batch) -> (state, metrics)``; batch keys:
    left/right [B,H,W,3], disparity [B,H,W]."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict[str, jax.Array]):
        def loss_fn(params):
            preds, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["left"],
                batch["right"],
                train=True,
                mutable=["batch_stats"],
            )
            loss = stereo_loss(preds, batch["disparity"], max_disp)
            return loss, (preds, mutated["batch_stats"])

        (loss, (preds, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        metrics = {"loss": loss}
        metrics.update(disparity_metrics(preds[-1], batch["disparity"], max_disp))
        return state, metrics

    return train_step


def make_eval_step(model, max_disp: int):
    """Returns jitted ``(state, batch) -> (disp [B,H,W], metrics)``."""

    @jax.jit
    def eval_step(state: TrainState, batch: dict[str, jax.Array]):
        preds = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["left"],
            batch["right"],
            train=False,
        )
        disp = preds[-1]
        metrics = disparity_metrics(disp, batch["disparity"], max_disp)
        return disp, metrics

    return eval_step


def make_infer_fn(model, variables: dict[str, Any]):
    """Inference-only jitted fn (T3/T4 path): (left, right) -> disp [B,H,W]."""

    @jax.jit
    def infer(left: jax.Array, right: jax.Array) -> jax.Array:
        preds = model.apply(variables, left, right, train=False)
        return preds[-1]

    return infer
