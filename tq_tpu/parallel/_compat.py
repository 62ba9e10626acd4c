"""shard_map compatibility shim across the jax 0.8 API migration.

jax >= 0.8 promotes ``shard_map`` to the top level and renames
``check_rep`` (replication checking) to ``check_vma``; older jax only
has ``jax.experimental.shard_map`` with ``check_rep``.  This wrapper
presents one stable call signature to the rest of the package.
"""

from __future__ import annotations

try:
    from jax import shard_map as _shard_map

    _KW = "check_vma"
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    _KW = "check_rep"

__all__ = ["shard_map"]


def shard_map(f, *, mesh, in_specs, out_specs, check_rep: bool = True):
    return _shard_map(
        f,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        **{_KW: check_rep},
    )
