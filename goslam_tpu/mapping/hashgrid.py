"""Multi-resolution hash-grid encoding (tiny-cuda-nn replacement).

Instant-NGP-style encoding with the reference's configuration
(InstantNeuS.py:44-52): 16 levels x 2 features, 2^19-entry table,
base resolution 16, per-level growth 1.4472692.

TPU design: all 16 levels are evaluated with one batched gather into a
single [L, T, F] table — 8 corner gathers x L levels fused by XLA; the
backward pass is the corresponding scatter-add (JAX autodiff of gather).
Levels whose dense grid fits in the table use injective dense indexing,
larger ones use the Instant-NGP spatial hash (pi1=1, pi2=2654435761,
pi3=805459861).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PRIMES = (1, 2654435761, 805459861)


def level_resolutions(n_levels: int = 16, base: int = 16,
                      growth: float = 1.4472692374403782) -> np.ndarray:
    return np.floor(base * growth ** np.arange(n_levels)).astype(np.int64)


class HashGrid(nn.Module):
    """x in [0, 1]^3 -> [..., n_levels * n_features]."""
    n_levels: int = 16
    n_features: int = 2
    log2_table: int = 19
    base_res: int = 16
    growth: float = 1.4472692374403782

    @nn.compact
    def __call__(self, x):
        L, F = self.n_levels, self.n_features
        T = 1 << self.log2_table
        res = level_resolutions(self.n_levels, self.base_res, self.growth)

        table = self.param(
            "table",
            lambda key, shape: 1e-4 * (2 * jax.random.uniform(key, shape) - 1),
            (L, T, F))

        lead = x.shape[:-1]
        pts = x.reshape(-1, 3)
        N = pts.shape[0]

        # per-level cell coords: [L, N, 3]
        scaled = pts[None, :, :] * (res[:, None, None] - 1).astype(jnp.float32)
        c0 = jnp.floor(scaled).astype(jnp.int32)
        frac = scaled - c0

        # 8 corners: [8, 3] offsets
        corners = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.int32)
        cidx = c0[:, :, None, :] + corners[None, None, :, :]   # [L,N,8,3]

        res_j = jnp.asarray(res, jnp.int32)[:, None, None]
        cidx = jnp.clip(cidx, 0, (res_j - 1)[..., None])

        # dense index when the grid fits, hash otherwise (per level, static)
        dense_fits = (res + 1) ** 3 <= T
        strides = jnp.stack([jnp.ones_like(res_j), res_j, res_j * res_j],
                            axis=-1)                            # [L,1,1,3]
        dense_idx = (cidx * strides).sum(-1) % T               # [L,N,8]
        cu = cidx.astype(jnp.uint32)
        h = ((cu[..., 0] * jnp.uint32(PRIMES[0]))
             ^ (cu[..., 1] * jnp.uint32(PRIMES[1]))
             ^ (cu[..., 2] * jnp.uint32(PRIMES[2]))) % jnp.uint32(T)
        fits = jnp.asarray(dense_fits)[:, None, None]
        idx = jnp.where(fits, dense_idx, h.astype(jnp.int32))  # [L,N,8]

        # gather: [L, N, 8, F] via one flat indexed lookup
        flat_idx = idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
        feats = table.reshape(L * T, F)[flat_idx]

        # trilinear weights
        w = jnp.where(corners[None, None, :, :] == 1,
                      frac[:, :, None, :], 1.0 - frac[:, :, None, :])
        w = w.prod(axis=-1)                                    # [L,N,8]

        out = (feats * w[..., None]).sum(axis=2)               # [L,N,F]
        out = jnp.moveaxis(out, 0, 1).reshape(N, L * F)
        return out.reshape(lead + (L * F,))
