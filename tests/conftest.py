"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on
XLA's host-platform virtual devices (the TPU-native substitute for the
reference's nonexistent distributed tests — SURVEY.md §4).

The environment may pre-register a TPU PJRT plugin and pin
``jax_platforms`` before user code runs (sitecustomize), so plain env
vars are not enough — force the config explicitly before any backend
use.  Set ``TQ_TEST_TPU=1`` to run the suite on the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("TQ_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
