"""Metric writers (SURVEY.md section 5 metrics/observability row: the
reference prints loss per batch; the build provides TensorBoard + JSONL via
clu.metric_writers as first-class observability).
"""

from __future__ import annotations

from typing import Any, Mapping


class MetricWriter:
    """TensorBoard (clu summary writer) + JSONL + stdout fan-out.

    clu/tensorflow are optional at runtime: if unavailable, TensorBoard
    output is skipped silently and JSONL remains authoritative.
    """

    def __init__(self, logdir: str | None = None, jsonl_path: str | None = None):
        self._tb = None
        self._jsonl = None
        if logdir:
            try:
                from clu import metric_writers

                self._tb = metric_writers.SummaryWriter(logdir)
            except Exception:
                self._tb = None
        if jsonl_path:
            self._jsonl = open(jsonl_path, "a")

    def write(self, step: int, metrics: Mapping[str, Any]) -> None:
        scalars = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            self._tb.write_scalars(step, scalars)
        if self._jsonl is not None:
            import json

            self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
