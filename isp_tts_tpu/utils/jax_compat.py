"""Version-compatibility shims for jax APIs in flux."""

from __future__ import annotations

import jax


def pvary(x, axis_name: str):
    """Mark ``x`` as varying over a manual (shard_map) axis.

    Newer jax tracks varying-manual-axes on shard_map values; constants
    built inside the mapped function start axis-invariant and must be cast
    before mixing with varying values in a scan carry. The API moved
    ``pvary`` -> ``pcast(..., to='varying')``; older jax needs neither.
    """
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis_name,), to="varying")
    if hasattr(jax.lax, "pvary"):
        return jax.lax.pvary(x, (axis_name,))
    return x
