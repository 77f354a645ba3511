"""Mesh construction + sharding annotations (SURVEY.md 2.4).

Mesh axes:

- ``"data"``: batch-parallel axis. Replaces the reference's
  ``nn.DataParallel`` (BASELINE.json configs 3 & 5). Gradients are reduced by
  the ``psum`` GSPMD inserts from the sharded-batch ``jit``; multi-host just
  grows this axis over `jax.distributed`-initialized processes.
- ``"disp"``: disparity-axis cost-volume sharding for high-resolution pairs
  (BASELINE.json config 4, Middlebury). The [B, D, H, W, C] volume is sharded
  along D; XLA's spatial-partitioning of the 3D convolutions inserts the +-1
  halo exchanges (ppermute over ICI), and the soft-argmin's softmax over the
  sharded D axis becomes the two-pass psum automatically. An explicit
  shard_map halo-exchange implementation (for the hand-scheduled path) lives
  in :mod:`ecm_tpu.parallel.halo`.

Sharding propagation enters the model through ``constrain_volume`` — a
``with_sharding_constraint`` applied inside the forward pass when a mesh is
active (set by the ``use_mesh`` context manager); without a mesh it is the
identity, so single-device paths pay nothing.
"""

from __future__ import annotations

import contextlib
import os as _os
import threading
from collections.abc import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

_state = threading.local()

# constrain_features A/B gate (see its docstring); read once at import so
# jit bakes the choice into the trace
_SHARD_FEATURES = _os.environ.get("ECM_TPU_SHARD_FEATURES", "1") != "0"


def make_mesh(
    data: int | None = None,
    disp: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ``("data", "disp")`` mesh over ``devices`` (default: all).

    ``data=None`` uses all remaining devices after ``disp``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % disp == 0, (n, disp)
        data = n // disp
    assert data * disp <= n, f"need {data * disp} devices, have {n}"
    grid = np.asarray(devices[: data * disp]).reshape(data, disp)
    return Mesh(grid, ("data", "disp"))


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None):
    """Activate ``mesh`` for in-model sharding constraints (thread-local)."""
    prev = getattr(_state, "mesh", None)
    _state.mesh = mesh
    try:
        yield mesh
    finally:
        _state.mesh = prev


def active_mesh() -> Mesh | None:
    return getattr(_state, "mesh", None)


def _constrain(x: jax.Array, spec: PS) -> jax.Array:
    mesh = active_mesh()
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_volume(vol: jax.Array) -> jax.Array:
    """Shard a ``[B, D, H, W, C]`` (or ``[B, D, H, W]``) cost volume:
    batch over ``data``, disparity over ``disp``."""
    mesh = active_mesh()
    if mesh is None:
        return vol
    spec = PS("data", "disp") if vol.ndim >= 2 else PS("data")
    return _constrain(vol, spec)


def constrain_features(x: jax.Array) -> jax.Array:
    """Shard 2D feature maps ``[B, H, W, C]``: batch over ``data``, width
    over ``disp``. Without this the whole siamese feature extractor is
    REPLICATED over the disp axis (GSPMD has no disparity dim to propagate
    into it) — measured as the residual partition-efficiency loss at mesh
    (4,2) after the volume-side constraints landed (SHARD_DIAG.json). The
    cost-volume builder's disparity shifts then cost one small feature
    all-gather (~MBs) instead of replicating tens of 2D convs.
    A/B-gated by ECM_TPU_SHARD_FEATURES (read at import)."""
    mesh = active_mesh()
    if mesh is None or x.ndim != 4 or not _SHARD_FEATURES:
        return x
    return _constrain(x, PS("data", None, "disp", None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for host->device batches: leading (batch) dim over ``data``."""
    return NamedSharding(mesh, PS("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state — model is ~5M
    params so FSDP is unnecessary, SURVEY.md 2.4)."""
    return NamedSharding(mesh, PS())
