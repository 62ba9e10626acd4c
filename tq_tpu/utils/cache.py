"""Persistent XLA compilation cache helper.

On this class of rig, compilation happens remotely and dominates
wall-clock for sweep CLIs (every (wb, gs, wt, db, dt) setting traces a
distinct program).  The persistent cache makes re-runs and resumed
sweeps start in seconds.  Call before the first jit execution.
"""

from __future__ import annotations

import os

import jax

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None):
    path = path or os.environ.get("TQ_JAX_CACHE", "/tmp/tq_jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
