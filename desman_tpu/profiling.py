"""Profiling/observability hooks (SURVEY.md §5 'Tracing / profiling').

The reference logs wall-clock prints; here runs can capture a real
``jax.profiler`` device trace (viewable in XProf/TensorBoard) and structured
sweep-throughput metrics. Used by run.run(...) via profile_dir and by
bench.py.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """Capture a jax.profiler trace into trace_dir (no-op when None)."""
    if not trace_dir:
        yield
        return
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class SweepTimer:
    """Wall-clock segments -> sweeps/sec summary (JSONL-appendable)."""

    segments: List[dict] = field(default_factory=list)
    _t0: float = 0.0

    def start(self):
        self._t0 = time.time()

    def stop(self, n_sweeps: int, label: str = "segment"):
        dt = time.time() - self._t0
        self.segments.append({
            "label": label, "sweeps": n_sweeps, "seconds": dt,
            "sweeps_per_s": n_sweeps / dt if dt > 0 else None,
        })

    def summary(self) -> dict:
        total_sweeps = sum(s["sweeps"] for s in self.segments)
        total_time = sum(s["seconds"] for s in self.segments)
        return {
            "total_sweeps": total_sweeps,
            "total_seconds": total_time,
            "sweeps_per_s": total_sweeps / total_time if total_time else None,
            "segments": self.segments,
        }

    def write(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
