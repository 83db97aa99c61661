"""Test harness config.

Tests run on CPU with 8 virtual XLA host devices so mesh/pjit sharding logic
is exercised without a TPU pod (SURVEY.md §4 "Multi-chip without a cluster").

Tiers (VERDICT r4 #7): the heavy end-to-end suites — mesh trainer/serving,
forward+reverse migration rehearsals, SIGKILL/resume, training-dynamics
parity, multichip sweeps — are marked ``slow``. The default run (the gate)
executes everything; the inner loop is ``pytest -m "not slow" tests/``,
which finishes in a few minutes.

Note: this image boots an ``axon`` TPU PJRT plugin from sitecustomize.py and
imports jax at interpreter startup, so JAX_PLATFORMS env tweaks are too late —
the platform must be forced through jax.config here instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
