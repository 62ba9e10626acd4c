"""shard_map compatibility shim across the jax 0.8 API migration.

jax >= 0.8 promotes ``shard_map`` to the top level and renames
``check_rep`` (replication checking) to ``check_vma``; older jax only
has ``jax.experimental.shard_map`` with ``check_rep``.  This wrapper
presents one stable call signature to the rest of the package.
"""

from __future__ import annotations

import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# Feature-detect the kwarg: jax versions in the 0.6-0.7 window exposed
# top-level jax.shard_map while still spelling the kwarg check_rep, so
# keying off the import location alone is wrong.
_KW = (
    "check_vma"
    if "check_vma" in inspect.signature(_shard_map).parameters
    else "check_rep"
)

__all__ = ["shard_map"]


def shard_map(f, *, mesh, in_specs, out_specs, check_rep: bool = True):
    return _shard_map(
        f,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        **{_KW: check_rep},
    )
