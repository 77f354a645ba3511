"""Run the tiny-overfit training gate on the current backend and commit the
evidence (round-3 verdict ask #3a: "no artifact from the overfit_gate config
on the real chip exists").

Drives the REAL trainer CLI path (ecm_tpu.cli.train main()) for the
overfit_gate preset (4 fixed synthetic warped batches cycled for 600 steps,
f32, max_disp 48) AND — on TPU — overfit_gate_grouped (same data, d64/bf16/
grouped: the production TPU training layout, round-4 verdict ask #6b) into a
fresh checkpoint dir, then summarizes their metrics.jsonl into
benchmarks/OVERFIT.json (git-stamped): first/last loss and EPE plus the gate
verdict (EPE must drop below 2 px — an untrained model on this data sits at
~10-15 px, so the gate proves the full train loop optimizes for real).

    timeout 1500 python benchmarks/overfit_gate.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

EPE_GATE_PX = 2.0


def run_preset(preset: str) -> dict:
    from ecm_tpu.cli.train import main as train_main

    workdir = tempfile.mkdtemp(prefix="ecm_overfit_")
    try:
        train_main(["--config", preset, "--savemodel", workdir])
        rows = [
            json.loads(line)
            for line in open(os.path.join(workdir, "metrics.jsonl"))
            if line.strip()
        ]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    assert rows, "trainer wrote no metrics"
    first, last = rows[0], rows[-1]
    return {
        "first": {k: first[k] for k in ("step", "loss", "epe") if k in first},
        "last": {k: last[k] for k in ("step", "loss", "epe") if k in last},
        "pass": float(last["epe"]) < EPE_GATE_PX,
    }


def main() -> None:
    import jax as _jax

    # the grouped/bf16 preset is the production TPU layout; on CPU only the
    # f32/standard gate runs (grouped dispatch is TPU-gated anyway)
    presets = ["overfit_gate"]
    if _jax.default_backend() == "tpu":
        presets.append("overfit_gate_grouped")
    out = {
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
        ).stdout.strip(),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "config": (
            "4 fixed synthetic batches, 600 steps, b2, 128x256; "
            "overfit_gate = d48/f32/standard, overfit_gate_grouped = "
            "d64/bf16/grouped (production TPU training layout)"
        ),
        "gate_epe_px": EPE_GATE_PX,
    }
    for preset in presets:
        out[preset] = run_preset(preset)
    out["pass"] = all(out[p]["pass"] for p in presets)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "OVERFIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    assert out["pass"], f"overfit gate FAILED: {out}"
    print("overfit gate PASS ->", path)


if __name__ == "__main__":
    main()
