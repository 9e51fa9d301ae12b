"""Profiling hooks (SURVEY.md §5 tracing row)."""
import json
import os

import jax.numpy as jnp

from desman_tpu.profiling import SweepTimer, device_trace


def test_device_trace_noop():
    with device_trace(None):
        pass  # must be a no-op without a dir


def test_device_trace_writes(tmp_path):
    d = str(tmp_path / "trace")
    with device_trace(d):
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    # a profile subdir with at least one trace artifact appears
    found = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert found, "no trace files written"


def test_sweep_timer(tmp_path):
    t = SweepTimer()
    t.start()
    t.stop(10, label="a")
    t.start()
    t.stop(30, label="b")
    s = t.summary()
    assert s["total_sweeps"] == 40
    assert s["sweeps_per_s"] is not None and s["sweeps_per_s"] > 0
    p = str(tmp_path / "timer.json")
    t.write(p)
    assert json.load(open(p))["segments"][1]["label"] == "b"
