"""Training loop (reference ``main.py::main`` epoch loop — SURVEY.md 3.1),
TPU-native: jitted steps over a sharded mesh, device-resident state, metrics
via JSONL + stdout, orbax checkpoint every N steps with auto-resume.
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator
from typing import Any, Callable

import jax
import numpy as np

from ecm_tpu.parallel.sharding import batch_sharding, use_mesh
from ecm_tpu.train import checkpoint as ckpt_lib
from ecm_tpu.train.state import TrainState


def _to_host(metrics: dict[str, Any]) -> dict[str, float]:
    return {k: float(v) for k, v in metrics.items()}


def train_loop(
    state: TrainState,
    train_step: Callable,
    data_iter: Iterator[dict[str, np.ndarray]],
    num_steps: int,
    mesh=None,
    log_every: int = 20,
    ckpt_manager=None,
    ckpt_every: int = 1000,
    metrics_path: str | None = None,
    eval_fn: Callable[[TrainState, int], dict] | None = None,
    eval_every: int = 0,
    tensorboard_dir: str | None = None,
) -> TrainState:
    """Run ``num_steps`` steps; resumes from ``state.step`` if nonzero."""
    sharding = batch_sharding(mesh) if mesh is not None else None
    start = int(state.step)
    log_f = open(metrics_path, "a") if metrics_path else None
    tb = None
    if tensorboard_dir:
        from ecm_tpu.train.writers import MetricWriter

        tb = MetricWriter(logdir=tensorboard_dir)
    t0 = time.perf_counter()
    window_images = 0
    try:
        with use_mesh(mesh):
            for step in range(start, num_steps):
                batch = next(data_iter)
                batch = {
                    k: v for k, v in batch.items() if k in ("left", "right", "disparity")
                }
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                state, metrics = train_step(state, batch)
                window_images += batch["left"].shape[0] * jax.process_count()
                if (step + 1) % log_every == 0 or step + 1 == num_steps:
                    m = _to_host(jax.device_get(metrics))
                    dt = time.perf_counter() - t0
                    m.update(
                        step=step + 1,
                        pairs_per_s=window_images / max(dt, 1e-9),
                        step_time_ms=1e3 * dt / log_every,
                    )
                    print(
                        f"step {step + 1}/{num_steps} loss={m['loss']:.4f} "
                        f"epe={m['epe']:.3f} d1={m['d1_all']:.4f} "
                        f"{m['pairs_per_s']:.2f} pairs/s",
                        flush=True,
                    )
                    if log_f:
                        log_f.write(json.dumps(m) + "\n")
                        log_f.flush()
                    if tb is not None:
                        tb.write(step + 1, m)
                    t0 = time.perf_counter()
                    window_images = 0
                if ckpt_manager is not None and (step + 1) % ckpt_every == 0:
                    ckpt_lib.save(ckpt_manager, step + 1, state)
                if eval_fn is not None and eval_every and (step + 1) % eval_every == 0:
                    eval_metrics = eval_fn(state, step + 1)
                    print(f"eval @ {step + 1}: {eval_metrics}", flush=True)
                    if log_f:
                        log_f.write(
                            json.dumps({"step": step + 1, "eval": eval_metrics}) + "\n"
                        )
                        log_f.flush()
        if ckpt_manager is not None:
            ckpt_lib.save(ckpt_manager, num_steps, state)
            ckpt_lib.wait(ckpt_manager)
    finally:
        if log_f:
            log_f.close()
        if tb is not None:
            tb.close()
    return state
