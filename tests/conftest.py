"""Test harness: force an 8-virtual-device CPU backend before JAX import.

CI/tests need no TPU; sharding tests run on a virtual 8-device CPU mesh
(SURVEY.md §4's 'CPU-backend JAX tests' implication).
"""
import os

# overwrite, not setdefault: the ambient environment exports JAX_PLATFORMS=axon
os.environ["JAX_PLATFORMS"] = "cpu"
# hermetic tests: never read/write the persistent XLA executable cache (a
# stale cross-session entry once SEGFAULTED deserialization mid-suite; CLI
# tests would otherwise switch it on via _enable_compilation_cache)
os.environ["DESMAN_TPU_NO_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers its PJRT backend at interpreter start, so
# the env vars alone are too late — force the platform through jax.config.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from desman_tpu import synth


@pytest.fixture(scope="session")
def small_synth():
    """Tiny but informative dataset: 3 strains, decent coverage."""
    return synth.generate(V=120, S=12, G=3, coverage=60.0, seed=1)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
