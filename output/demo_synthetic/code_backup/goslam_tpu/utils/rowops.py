"""Traced-index row operations.

``arr.at[i].set(v)`` with a Python-int index bakes ``i`` into the compiled
program — every distinct keyframe index would trigger a fresh compile (and
on this box compiles are expensive).  These helpers take the index as a
traced scalar so each (shape, dtype) compiles exactly once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def set_row(arr, ix, val):
    """arr[ix] = val with traced ix."""
    return arr.at[jnp.asarray(ix)].set(val)


@jax.jit
def get_row(arr, ix):
    return arr[jnp.asarray(ix)]


@jax.jit
def shift_down(arr, ix):
    """Remove row ix by shifting everything above it down one slot
    (the last row duplicates its predecessor)."""
    n = arr.shape[0]
    idx = jnp.arange(n)
    idx = jnp.where(idx >= jnp.asarray(ix), jnp.minimum(idx + 1, n - 1), idx)
    return arr[idx]
