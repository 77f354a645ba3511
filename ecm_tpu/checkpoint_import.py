"""torch -> JAX weight import (SURVEY.md section 5 checkpoint row: "a
torch->JAX weight-import tool for parity checks against reference
checkpoints").

The reference saves ``torch.save({'state_dict': model.state_dict(), ...},
'checkpoint_N.tar')`` with ``nn.DataParallel``'s ``module.`` prefixes
(SURVEY.md 2.3 T1). This module provides:

- tensor-layout converters for every torch layer type used by the model
  family (Conv2d/3d [O,I,*k] -> [*k,I,O]; ConvTranspose [I,O,*k] ->
  [*k,O,I] for flax ``transpose_kernel=True``; BN weight/bias/running stats);
- ``load_torch_checkpoint``: reads a ``.tar``/``.pth`` with torch (CPU) and
  strips ``module.`` prefixes;
- ``import_by_structure``: maps a torch state_dict onto a flax variables
  pytree by *structural alignment* — both the canonical torch model and this
  build enumerate their conv/BN layers in the same forward order, so pairing
  the i-th torch conv with the i-th flax conv (with shape checks at every
  assignment) transfers weights without depending on the reference's exact
  attribute names (which could not be verified; SURVEY.md section 0).

NOTE the flax ConvTranspose here uses ``transpose_kernel=False``; imported
torch ConvTranspose weights are converted with an explicit flip+transpose to
the equivalent parameterization (verified in tests/test_torch_parity.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def convert_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d/3d weight [O, I, *k] -> flax [*k, I, O]."""
    nd = w.ndim - 2
    perm = tuple(range(2, 2 + nd)) + (1, 0)
    return np.ascontiguousarray(np.transpose(w, perm))


def convert_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose weight [I, O, *k] -> flax ConvTranspose
    (transpose_kernel=False) kernel [*k, I, O].

    torch's transposed conv correlates the zero-dilated input with the
    *spatially flipped* kernel relative to lax.conv_transpose's
    non-transposed form, so flip all spatial dims then lay out [*k, I, O].
    """
    nd = w.ndim - 2
    w = np.flip(w, axis=tuple(range(2, 2 + nd)))
    perm = tuple(range(2, 2 + nd)) + (0, 1)  # [*k, I, O]
    return np.ascontiguousarray(np.transpose(w, perm))


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read a reference checkpoint -> flat {name: ndarray} with ``module.``
    prefixes stripped (torch used only here, as a file reader)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        out[k] = v.detach().cpu().numpy()
    return out


def _natkey(s: str):
    """Natural sort ('layer2_2' < 'layer2_10') so flax module definition
    order is recovered from the (alphabetically stored) param dict."""
    import re

    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def _flatten_with_path(tree: Any, prefix: tuple = ()) -> list[tuple[tuple, Any]]:
    if isinstance(tree, dict):
        out = []
        for k in sorted(tree.keys(), key=_natkey):
            out.extend(_flatten_with_path(tree[k], prefix + (k,)))
        return out
    return [(prefix, tree)]


def _layer_groups_torch(sd: dict[str, np.ndarray]) -> list[dict[str, np.ndarray]]:
    """Group a torch state_dict into per-layer dicts in insertion (forward
    definition) order: conv weights, BN (weight, bias, mean, var), biases."""
    groups: list[dict[str, np.ndarray]] = []
    by_stem: dict[str, dict[str, np.ndarray]] = {}
    for name, arr in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        stem, leaf = name.rsplit(".", 1)
        if stem not in by_stem:
            by_stem[stem] = {}
            groups.append(by_stem[stem])
        by_stem[stem][leaf] = arr
    return groups


def import_by_structure(
    sd: dict[str, np.ndarray], variables: dict[str, Any]
) -> dict[str, Any]:
    """Map torch layers onto the flax variables pytree by forward order.

    Both models must define layers in the same order (the build follows the
    canonical forward exactly — SURVEY.md 3.4). Every assignment is
    shape-checked; a mismatch raises with both paths named.
    """
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    def set_in(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        old = node[path[-1]]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: {old.shape} vs {value.shape}"
            )
        node[path[-1]] = value.astype(old.dtype)

    flax_convs = [p for p, a in _flatten_with_path(params) if p[-1] == "kernel"]
    flax_bns = sorted(
        {p[:-1] for p, _ in _flatten_with_path(params) if p[-2:] == ("bn", "scale")},
        key=lambda p: [_natkey(x) for x in p],
    )
    torch_groups = _layer_groups_torch(sd)
    torch_convs = [g for g in torch_groups if "weight" in g and g["weight"].ndim >= 4]
    torch_bns = [g for g in torch_groups if "running_mean" in g]
    if len(flax_convs) != len(torch_convs) or len(flax_bns) != len(torch_bns):
        raise ValueError(
            f"layer-count mismatch: flax {len(flax_convs)} convs / "
            f"{len(flax_bns)} BNs vs torch {len(torch_convs)} / "
            f"{len(torch_bns)} — structural import requires identical "
            "architectures"
        )

    for path, group in zip(flax_convs, torch_convs):
        w = group["weight"]
        is_transpose = "deconv" in "/".join(path)
        conv = convert_conv_transpose(w) if is_transpose else convert_conv(w)
        set_in(params, path, conv)
        if "bias" in group:
            set_in(params, path[:-1] + ("bias",), group["bias"])
    for bn_path, group in zip(flax_bns, torch_bns):
        set_in(params, bn_path + ("scale",), group["weight"])
        set_in(params, bn_path + ("bias",), group["bias"])
        set_in(stats, bn_path + ("mean",), group["running_mean"])
        set_in(stats, bn_path + ("var",), group["running_var"])
    return {"params": params, "batch_stats": stats}
