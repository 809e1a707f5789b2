"""Fused on-the-fly correlation lookup — Pallas TPU kernel.

The runtime's long-video correlation path (AltCorrBlock,
/root/reference/src/modules/corr.py:90-127 + altcorr_kernel.cu) needs,
per edge (i, j) and per 1/8-res pixel p of frame i, the 4-level x
(2r+1)^2-tap bilinearly-sampled local correlation between feature f1[i, p]
and the feature map of frame j around the reprojected coordinate
coords[e, p].

The XLA formulation (ops/corr.alt_corr_mxu) computes the per-level
volume as a batched MXU matmul but pays for the per-pixel window
extraction: its one-hot contractions lower to ~2 x E x P1 tiny batched
matmuls ([8,H]@[H,W] per pixel), each one an MXU pass — measured ~3.3 s
per 12k-edge backend step on a v5e, 2/3 of the whole step.

This kernel fuses volume build + window extraction + bilinear combine
per (edge, pixel-block) entirely in VMEM:

  * grid (E, P1/Pb); scalar-prefetched edge indices (ii, jj) drive the
    BlockSpec index maps, so the per-frame feature pyramid is DMA'd
    straight from HBM — the [E, P1, C] / [E, Q, C] edge-gathered copies
    of the XLA path never exist anywhere,
  * the [Pb, Q_l] correlation volume block is ONE MXU contraction
    (bf16 in, fp32 accumulate — same precision as the XLA path),
  * the per-pixel (2r+2)^2 integer window is extracted with
    iota-compare mask-reductions on the VPU (8 row passes + 8 column
    passes over VMEM-resident data): no gathers, no tiny matmuls, and
    out-of-bounds taps contribute exactly zero (the CUDA kernel's OOB
    semantics, correlation_kernels.cu:52),
  * bilinear weights combine the (2r+2)^2 taps into (2r+1)^2 output
    channels in x-major order (channel = x_off * (2r+1) + y_off,
    correlation_kernels.cu:47-69), levels concatenated level-major.

Numerically identical to ops/corr.alt_corr (same fp32 accumulation
order up to matmul reassociation); parity-tested against it in
tests/test_corr.py::test_alt_corr_fused_matches_alt_corr (interpreter)
and tests/test_pallas_kernels.py::test_alt_corr_fused_mosaic_matches_alt_corr
(compiled Mosaic, TPU-only slow tier).

Runtime wiring: factor_graph routes through corr.alt_corr_dispatch,
which selects this kernel when GOSLAM_CORR=fused on a TPU backend and
otherwise falls back to alt_corr_mxu (the gather-as-matmul XLA path,
11x faster than the original one-hot form after round-4 tuning).
The default stays mxu until fused wins an A/B on real backend shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LEVELS = 4


def _pixel_block(P1: int) -> int:
    """Largest divisor of P1 that is <= 128.

    The VPU window extraction holds ~8 [Pb, H0, Wmax] fp32 temporaries
    on the Mosaic vector stack; Pb = 240 blew the 16 MB scoped-VMEM
    limit at the runtime's 30x40 geometry (19.4 MB), Pb = 120 fits."""
    for d in range(min(P1, 128), 0, -1):
        if P1 % d == 0:
            return d
    return P1


def _corr_kernel(ii_ref, jj_ref, coords_ref, f1_ref, *rest, radius,
                 shapes):
    """Grid step (e, pb): all levels for one pixel block of one edge."""
    del ii_ref, jj_ref  # consumed by the BlockSpec index maps
    n_lvl = len(shapes)
    f2_refs = rest[:n_lvl]
    out_ref = rest[n_lvl]
    vol3 = rest[n_lvl + 1]

    rd = 2 * radius + 1
    S = rd + 1
    f1 = f1_ref[0]                                   # [Pb, C] bf16
    Pb = f1.shape[0]
    x_l0 = coords_ref[0, :, 0]                       # [Pb] fp32
    y_l0 = coords_ref[0, :, 1]

    off = 0
    for lvl, (H2, W2) in enumerate(shapes):
        f2 = f2_refs[lvl][0]                         # [Q_l, C] bf16
        # one MXU pass: [Pb, C] x [Q_l, C] -> [Pb, Q_l] fp32
        vol = jax.lax.dot_general(
            f1, f2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # assemble [Pb, H2, W2] rows in scratch (static slice stores —
        # no lane-splitting reshape needed)
        for h in range(H2):
            vol3[:, h, :W2] = vol[:, h * W2:(h + 1) * W2]

        c_x = x_l0 * (1.0 / (1 << lvl))
        c_y = y_l0 * (1.0 / (1 << lvl))
        x0 = jnp.floor(c_x)
        y0 = jnp.floor(c_y)
        dx = (c_x - x0)[:, None, None]               # [Pb, 1, 1]
        dy = (c_y - y0)[:, None, None]
        x0i = x0.astype(jnp.int32)[:, None]          # [Pb, 1]
        y0i = y0.astype(jnp.int32)[:, None]

        hh = jax.lax.broadcasted_iota(jnp.int32, (Pb, H2), 1)
        ww = jax.lax.broadcasted_iota(jnp.int32, (Pb, W2), 1)

        # rows[p, s, w] = vol3[p, y0[p] + s - radius, w] (0 if OOB)
        v3 = vol3[:, :H2, :W2]                       # [Pb, H2, W2]
        rows = []
        for s in range(S):
            m = (hh == y0i + (s - radius)).astype(jnp.float32)
            rows.append((v3 * m[:, :, None]).sum(axis=1))     # [Pb, W2]
        rows = jnp.stack(rows, axis=1)               # [Pb, S, W2]

        # taps[p, t, s] = rows[p, s, x0[p] + t - radius] (0 if OOB)
        taps = []
        for t in range(S):
            m = (ww == x0i + (t - radius)).astype(jnp.float32)
            taps.append((rows * m[:, None, :]).sum(axis=2))   # [Pb, S]
        taps = jnp.stack(taps, axis=1)               # [Pb, S(t), S(s)]

        out = ((1 - dx) * (1 - dy) * taps[:, :rd, :rd]
               + dx * (1 - dy) * taps[:, 1:, :rd]
               + (1 - dx) * dy * taps[:, :rd, 1:]
               + dx * dy * taps[:, 1:, 1:])          # [Pb, rd(t), rd(s)]
        # channel = x_off * rd + y_off — the row-major flatten of the
        # (t, s) trailing dims, stored one x-offset row at a time:
        # Mosaic cannot shape-cast [Pb, rd, rd] -> [Pb, rd*rd] (the
        # collapsed minor dims are not tile-aligned), but [Pb, rd]
        # slice stores lower fine
        for t in range(rd):
            out_ref[0, :, off + t * rd:off + (t + 1) * rd] = out[:, t, :]
        off += rd * rd


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def alt_corr_fused(levels: tuple, coords: jnp.ndarray, ii: jnp.ndarray,
                   jj: jnp.ndarray, radius: int = 3,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused alt-corr lookup.

    Args:
      levels: per-level feature maps [T, h_l, w_l, C] (already /4-scaled,
        bf16) — FeaturePyramid.levels.
      coords: [E, h1, w1, 2] (x, y) lookup coords in level-0 pixels.
      ii, jj: [E] int32 source/target rig-frame indices.
    Returns:
      [E, h1, w1, L*(2r+1)^2] fp32, level-major, x-offset-major channels.
    """
    E, h1, w1, _ = coords.shape
    P1 = h1 * w1
    rd = 2 * radius + 1
    n_lvl = len(levels)
    Pb = _pixel_block(P1)
    shapes = tuple((lv.shape[1], lv.shape[2]) for lv in levels)
    C = levels[0].shape[-1]
    H0 = shapes[0][0]
    Wmax = max(w for _, w in shapes)

    f1_all = levels[0].reshape(levels[0].shape[0], P1, C)
    f2_all = [lv.reshape(lv.shape[0], lv.shape[1] * lv.shape[2], C)
              for lv in levels]
    coords_flat = coords.reshape(E, P1, 2)

    grid = (E, P1 // Pb)
    # index maps receive the scalar-prefetch refs as TRAILING args
    in_specs = [
        pl.BlockSpec((1, Pb, 2),
                     lambda e, pb, ii_r, jj_r: (e, pb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Pb, C),
                     lambda e, pb, ii_r, jj_r: (ii_r[e], pb, 0),
                     memory_space=pltpu.VMEM),
    ]
    for lvl in range(n_lvl):
        Q_l = f2_all[lvl].shape[1]
        in_specs.append(pl.BlockSpec(
            (1, Q_l, C),
            lambda e, pb, ii_r, jj_r: (jj_r[e], 0, 0),
            memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Pb, n_lvl * rd * rd),
            lambda e, pb, ii_r, jj_r: (e, pb, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Pb, H0, Wmax), jnp.float32)],
    )

    flops = 2 * E * P1 * sum(h * w for h, w in shapes) * C
    out = pl.pallas_call(
        functools.partial(_corr_kernel, radius=radius, shapes=shapes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, P1, n_lvl * rd * rd),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=E * (P1 + sum(h * w for h, w in shapes)) * C
            * 2 + E * P1 * n_lvl * rd * rd * 4,
            transcendentals=0),
        interpret=interpret,
    )(ii.astype(jnp.int32), jj.astype(jnp.int32), coords_flat,
      f1_all, *f2_all)
    return out.reshape(E, h1, w1, n_lvl * rd * rd)
