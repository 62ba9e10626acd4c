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

# Persistent compile cache: the slow tier is dominated by XLA:CPU
# compiles of the CNN graphs (VERDICT r3 weak #3); re-runs hit disk
# instead (measured: slow tier 9:30 cold -> ~4 min warm).  Safe to
# share: the cache key covers program + flags + platform, so the
# virtual-mesh and single-device entries coexist.
_CACHE = os.environ.get("TQ_TEST_CACHE_DIR", "/tmp/tq_test_jax_cache")
if _CACHE != "0":
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


_CNN_PARAMS: dict = {}


@pytest.fixture(scope="session")
def cnn_params():
    """Session-scoped random-init cache: ``cnn_params(module, seed)``.

    The big zoo inits (vgg is 138M uniform draws) are pure and reused
    read-only across tests; initializing them once per session trims
    the slow tier (VERDICT r3 next #5)."""

    def get(m, seed: int = 0):
        key = (m.__name__, seed)
        if key not in _CNN_PARAMS:
            _CNN_PARAMS[key] = m.init(jax.random.PRNGKey(seed))
        return _CNN_PARAMS[key]

    return get
