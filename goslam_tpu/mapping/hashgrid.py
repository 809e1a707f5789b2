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

Every intermediate keeps the sample dim N on the minor (128-lane) axis
— [L, 8, N], never [L, N, 8]: fp32 tiles as T(8, 128), so a minor dim
of 8 (corners) or 2 (features) pads 16-64x, and at the reference's
mapping load (4,400 rays x 72 samples) the train-step backward then
needs 34.5 GB of HBM.  N-minor keeps the whole grad under ~1 GB.
Numerics parity with the [L, N, 8, F] formulation:
tests/test_mapping.py::test_hashgrid_matches_oracle.
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

        # N-MINOR LAYOUT THROUGHOUT.  TPU tiles fp32 as T(8,128): the two
        # minor dims pad to (8, 128).  The naive [L, N, 8(, F)] layout puts
        # the corner dim (8) or feature dim (2) on the 128-lane axis, so
        # every intermediate — and every remat copy in the backward —
        # inflates 16-64x; at the reference's mapping load (316,800
        # samples) the train-step grad wanted 34.5 GB of HBM (bench r05).
        # Keeping the huge sample dim N on the lane axis makes every
        # intermediate pad-free.

        ptsT = pts.T                                           # [3, N]
        scaled = ptsT[None] * (res[:, None, None] - 1).astype(jnp.float32)
        c0 = jnp.floor(scaled).astype(jnp.int32)               # [L, 3, N]
        frac = scaled - c0                                     # [L, 3, N]

        # 8 corners: [8, 3] offsets
        corners = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.int32)
        cidx = c0[:, None, :, :] + corners[None, :, :, None]   # [L,8,3,N]

        res_j = jnp.asarray(res, jnp.int32)[:, None, None, None]  # [L,1,1,1]
        cidx = jnp.clip(cidx, 0, res_j - 1)

        # dense index when the grid fits, hash otherwise (per level, static)
        dense_fits = (res + 1) ** 3 <= T
        r1 = jnp.asarray(res, jnp.int32)[:, None, None]
        strides = jnp.stack([jnp.ones_like(r1), r1, r1 * r1],
                            axis=2)                            # [L,1,3,1]
        dense_idx = (cidx * strides).sum(axis=2) % T           # [L,8,N]
        cu = cidx.astype(jnp.uint32)
        h = ((cu[:, :, 0] * jnp.uint32(PRIMES[0]))
             ^ (cu[:, :, 1] * jnp.uint32(PRIMES[1]))
             ^ (cu[:, :, 2] * jnp.uint32(PRIMES[2]))) % jnp.uint32(T)
        fits = jnp.asarray(dense_fits)[:, None, None]
        idx = jnp.where(fits, dense_idx, h.astype(jnp.int32))  # [L,8,N]
        flat_idx = idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]

        # trilinear weights as an explicit 3-factor product: the grad of
        # each factor is a cheap [L,8,N] product, where prod(axis)'s
        # backward would materialize [L,8,3,N] cumulants
        bits = corners.T[None, :, :, None]                     # [1,3,8,1]
        wxyz = jnp.where(bits == 1, frac[:, :, None, :],
                         1.0 - frac[:, :, None, :])            # [L,3,8,N]
        w = wxyz[:, 0] * wxyz[:, 1] * wxyz[:, 2]               # [L,8,N]

        # per-feature flat gather: output [L,8,N] stays pad-free; F is a
        # static 2, so the python loop costs two fused gathers
        tflat = table.reshape(L * T, F)
        outs = [(tflat[:, f][flat_idx] * w).sum(axis=1)        # [L,N]
                for f in range(F)]

        out = jnp.concatenate(outs, axis=0)                    # [F*L, N]
        out = out.T                                            # [N, F*L]
        # reorder columns f*L+l -> l*F+f (the tcnn/forward-compatible
        # channel layout this module has always produced); static lane
        # permutation, fused by XLA
        perm = np.arange(L * F).reshape(L, F)
        perm = (perm % F) * L + perm // F
        out = out[:, perm.reshape(-1)]
        return out.reshape(lead + (L * F,))
