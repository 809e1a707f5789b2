"""Correlation volumes and windowed bilinear lookup — TPU-native.

Replaces the reference's CUDA correlation stack
(/root/reference/src/modules/corr.py, correlation_kernels.cu,
altcorr_kernel.cu) with XLA-friendly primitives:

  * the all-pairs 4D volume is a single batched matmul (MXU) —
    corr[e, p1, p2] = <fmap1[e, p1], fmap2[e, p2]> / 16,
  * the 4-level pyramid is average pooling over the *target* dims,
  * the (2r+1)^2-tap lookup gathers one (2r+2)^2 window per pixel and
    forms the 49 bilinear samples with shifted slices (64 gathers instead
    of 196),
  * alt_corr recomputes patch correlations on the fly from feature
    pyramids (the long-video memory-scaling path, altcorr_kernel.cu) —
    per-tap gather + channel dot, no volume ever materialized.

Semantics matched: /4 scaling of each feature map (corr.py:71-72,103),
zero contribution from out-of-bounds taps (correlation_kernels.cu:52),
channel layout level-major then x-offset-major then y-offset
(correlation_kernels.cu:47-69, CorrBlock.__call__ cat over levels).

Volumes are stored bf16 (the reference stores fp16); lookups accumulate in
fp32.
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence

import os

import jax
import jax.numpy as jnp

NUM_LEVELS = 4
RADIUS = 3
# window-gather lowering override; resolved once at import (see
# _window_gather) — changing it after a jitted caller has traced would
# otherwise silently keep the stale lowering
_GATHER_MODE = os.environ.get("GOSLAM_GATHER", "")


class CorrPyramid(NamedTuple):
    """Per-level all-pairs correlation volumes [E, h1*w1, h2_l, w2_l]."""
    levels: List[jnp.ndarray]

    @property
    def num_edges(self):
        return self.levels[0].shape[0]


def _avg_pool2(x):
    """2x2/2 average pool over the last two spatial dims (torch floor mode)."""
    h, w = x.shape[-2] // 2 * 2, x.shape[-1] // 2 * 2
    x = x[..., :h, :w]
    x = x.reshape(x.shape[:-2] + (h // 2, 2, w // 2, 2))
    return x.mean(axis=(-3, -1))


def build_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                  num_levels: int = NUM_LEVELS) -> CorrPyramid:
    """All-pairs correlation pyramid.

    Args:
      fmap1, fmap2: [E, h, w, C] per-edge feature maps (bf16 ok).
    Returns:
      CorrPyramid with levels [E, h*w, h/2^l, w/2^l] (bf16).
    """
    E, h, w, C = fmap1.shape
    f1 = (fmap1.astype(jnp.float32) / 4.0).reshape(E, h * w, C)
    f2 = (fmap2.astype(jnp.float32) / 4.0).reshape(E, h * w, C)
    vol = jnp.einsum("epc,eqc->epq", f1, f2,
                     preferred_element_type=jnp.float32)
    vol = vol.reshape(E, h * w, h, w).astype(jnp.bfloat16)

    levels = [vol]
    for _ in range(num_levels - 1):
        levels.append(_avg_pool2(levels[-1]))
    return CorrPyramid(levels)


def _window_gather_mxu(vol: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
                       radius: int) -> jnp.ndarray:
    """Window extraction as two one-hot contractions (gather-as-matmul).

    TPU minor-axis gathers serialize to scalar loads — the
    take_along_axis form cost ~10.7 s per composed 1538-edge lowmem
    step on a v5e; this form 0.97 s (floor 0.33 s with correlation
    stubbed). The 0/1 selector entries are exact in bf16, every output
    tap has exactly one nonzero product, and accumulation is fp32, so
    this is numerically identical to the gather. Out-of-window rows and
    columns fall outside the iota range and naturally contribute zero —
    the CUDA kernel's zero-OOB semantics (correlation_kernels.cu:52).
    """
    E, P1, H2, W2 = vol.shape
    S = 2 * radius + 2
    ay = y0[..., None] - radius + jnp.arange(S)                 # [E,P1,S]
    ax = x0[..., None] - radius + jnp.arange(S)
    oh_y = (ay[..., None] == jnp.arange(H2)).astype(jnp.bfloat16)
    oh_x = (ax[..., None] == jnp.arange(W2)).astype(jnp.bfloat16)
    rows = jnp.einsum("epsh,ephw->epsw", oh_y, vol.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    taps = jnp.einsum("epsw,eptw->epst", rows.astype(jnp.bfloat16), oh_x,
                      preferred_element_type=jnp.float32)
    return taps


def _window_gather_vpu(vol: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
                       radius: int) -> jnp.ndarray:
    """Window extraction as unrolled mask-reductions on the VPU.

    The one-hot einsum form (_window_gather_mxu) lowers to E*P1 batched
    [S, H2] @ [H2, W2] matmuls — ~300k MXU passes per 256-edge chunk at
    the runtime's 30x40 geometry, each using a sliver of the systolic
    array: measured 80 ms/chunk, 23.1 s of the 40.3 s full-BA trigger
    (round-5 bisection).  Expressing the same selection as S broadcast
    compare-multiply-reduce passes keeps it on the VPU where XLA fuses
    mask and reduction: each tap is still exactly one volume element or
    zero (out-of-range rows/columns match no iota), so the result is
    bit-identical to the gather.
    """
    E, P1, H2, W2 = vol.shape
    S = 2 * radius + 2
    v = vol.astype(jnp.float32)
    hh = jnp.arange(H2)
    rows = jnp.stack(
        [(v * ((y0 - radius + s)[..., None, None] == hh[:, None])
          .astype(v.dtype)).sum(axis=2) for s in range(S)],
        axis=2)                                        # [E, P1, S, W2]
    ww = jnp.arange(W2)
    taps = jnp.stack(
        [(rows * ((x0 - radius + t)[..., None, None] == ww)
          .astype(v.dtype)).sum(axis=3) for t in range(S)],
        axis=3)                                        # [E, P1, S, S]
    return taps


def _window_gather_taa(vol: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
                       radius: int) -> jnp.ndarray:
    """Window extraction as a flat take_along_axis — XLA:CPU lowers this
    to tight scalar loops, faster there than 307k tiny matmuls."""
    E, P1, H2, W2 = vol.shape
    S = 2 * radius + 2
    vf = vol.reshape(E * P1, H2 * W2)

    ay = y0[..., None, None] - radius + jnp.arange(S)[None, None, :, None]
    ax = x0[..., None, None] - radius + jnp.arange(S)[None, None, None, :]
    inb = (ay >= 0) & (ay < H2) & (ax >= 0) & (ax < W2)
    idx = jnp.where(inb, ay * W2 + ax, 0).reshape(E * P1, S * S)

    taps = jnp.take_along_axis(vf, idx, axis=1).reshape(E, P1, S, S)
    return jnp.where(inb, taps.astype(jnp.float32), 0.0)


def _window_gather(vol: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
                   radius: int) -> jnp.ndarray:
    """Gather the (2r+2)x(2r+2) integer window at (y0-r.., x0-r..) per pixel.

    vol: [E, P1, H2, W2]; x0/y0: [E, P1] int32 floor coords.
    Returns [E, P1, 2r+2, 2r+2] fp32 with zeros out of bounds.

    Three equivalent lowerings, picked per backend (override with
    GOSLAM_GATHER=vpu|mxu|taa — read ONCE at import, because jitted
    callers bake the choice into their traces and the jit cache is not
    keyed on the env var; set it before importing goslam_tpu.
    Parity-tested in tests/test_corr.py).  TPU default is the VPU
    mask-reduce form: the one-hot-matmul form cost 80 ms/chunk in
    ~300k sliver MXU passes (21.7 s of the 40.3 s 2048-kf trigger,
    round-5 bisection), the VPU form fuses to compare-multiply-reduce.
    """
    mode = _GATHER_MODE
    if not mode:
        mode = "vpu" if jax.default_backend() == "tpu" else "taa"
    fn = {"vpu": _window_gather_vpu, "mxu": _window_gather_mxu,
          "taa": _window_gather_taa}[mode]
    return fn(vol, x0, y0, radius)


def _bilinear_window(taps: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray,
                     radius: int) -> jnp.ndarray:
    """[E,P1,2r+2,2r+2] integer taps -> [E,P1,(2r+1)^2] bilinear samples,
    channel = x_offset * (2r+1) + y_offset (correlation_kernels.cu layout)."""
    rd = 2 * radius + 1
    dx = dx[..., None, None]
    dy = dy[..., None, None]
    out_yx = ((1 - dy) * (1 - dx) * taps[..., :rd, :rd]
              + (1 - dy) * dx * taps[..., :rd, 1:]
              + dy * (1 - dx) * taps[..., 1:, :rd]
              + dy * dx * taps[..., 1:, 1:])
    # [E,P1,y_off,x_off] -> channel x-major
    return jnp.swapaxes(out_yx, -1, -2).reshape(
        taps.shape[0], taps.shape[1], rd * rd)


def lookup(pyramid: CorrPyramid, coords: jnp.ndarray,
           radius: int = RADIUS) -> jnp.ndarray:
    """Sample the pyramid at per-pixel coords with a (2r+1)^2 window.

    coords: [E, h1, w1, 2] (x, y) in level-0 pixels.
    Returns [E, h1, w1, L*(2r+1)^2] fp32, level-major channels.
    """
    E, h1, w1, _ = coords.shape
    P1 = h1 * w1
    out = []
    for lvl, vol in enumerate(pyramid.levels):
        c = coords.reshape(E, P1, 2) / (2 ** lvl)
        x0 = jnp.floor(c[..., 0])
        y0 = jnp.floor(c[..., 1])
        dx = c[..., 0] - x0
        dy = c[..., 1] - y0
        taps = _window_gather(vol, x0.astype(jnp.int32), y0.astype(jnp.int32),
                              radius)
        out.append(_bilinear_window(taps, dx, dy, radius))
    return jnp.concatenate(out, axis=-1).reshape(E, h1, w1, -1)


def alt_corr_mxu(pyramid: "FeaturePyramid", coords: jnp.ndarray,
                 ii: jnp.ndarray, jj: jnp.ndarray,
                 radius: int = RADIUS) -> jnp.ndarray:
    """alt_corr with the dot product hoisted BEFORE the gather.

    Mathematically identical to alt_corr (average-pooling the target
    features commutes with the dot product, so the per-level volume
    f1 . f2_l equals the pooled volume), but maps onto the TPU the
    right way round: the [E, P1, Q_l] correlation volume is ONE batched
    matmul on the MXU, and the window sampling pulls 64 scalars per
    pixel from it (via _window_gather's one-hot contractions) instead
    of 64 C-vector taps.  Measured on a v5e, one composed lowmem step
    (256 keyframes, 1538 edges, 7 GRU chunks): alt_corr's per-tap
    channel gathers 5.9 s; this volume with take_along_axis window
    sampling 10.7 s (minor-axis gathers serialize); this volume with
    the one-hot-matmul window sampling 0.97 s — against a 0.33 s floor
    with correlation stubbed out entirely.  The volume is a per-chunk
    transient (~0.7 GB bf16 at chunk 256), so the AltCorrBlock memory
    story is preserved: nothing of O(E_total * P1 * Q) ever exists.
    """
    E, h1, w1, _ = coords.shape
    P1 = h1 * w1
    f1 = pyramid.levels[0][ii].reshape(E, P1, -1)

    out = []
    for lvl, flvl in enumerate(pyramid.levels):
        T, H2, W2, C = flvl.shape
        f2 = flvl[jj].reshape(E, H2 * W2, C)
        vol = jnp.einsum("epc,eqc->epq", f1, f2,
                         preferred_element_type=jnp.float32)
        vol = vol.reshape(E, P1, H2, W2).astype(jnp.bfloat16)
        # force materialization: without the barrier XLA fuses the
        # volume matmul (and the f2 frame-gather behind it) into the
        # 64-tap window gather and RECOMPUTES it per tap — measured
        # 10.6 s/step instead of ~0.4 s on a v5e lowmem step
        vol = jax.lax.optimization_barrier(vol)

        c = coords.reshape(E, P1, 2) / (2 ** lvl)
        x0 = jnp.floor(c[..., 0])
        y0 = jnp.floor(c[..., 1])
        dx = c[..., 0] - x0
        dy = c[..., 1] - y0
        taps = _window_gather(vol, x0.astype(jnp.int32),
                              y0.astype(jnp.int32), radius)
        out.append(_bilinear_window(taps, dx, dy, radius))
    return jnp.concatenate(out, axis=-1).reshape(E, h1, w1, -1)


_ALT_CORR_MODE = os.environ.get("GOSLAM_CORR", "")


def alt_corr_dispatch(pyramid: "FeaturePyramid", coords: jnp.ndarray,
                      ii: jnp.ndarray, jj: jnp.ndarray,
                      radius: int = RADIUS) -> jnp.ndarray:
    """Runtime alt-corr entry point: picks the lowering per backend.

    GOSLAM_CORR=fused selects the Pallas fused kernel
    (ops/pallas_corr.alt_corr_fused: volume + window extraction +
    bilinear combine per (edge, pixel-block) entirely in VMEM);
    GOSLAM_CORR=mxu the XLA volume + VPU mask-reduce window path.
    Resolved once at import for the same trace-staleness reason as
    _GATHER_MODE.  Default: mxu everywhere (the fused kernel is
    TPU-only; flip after benchmarking on real backend shapes).
    """
    mode = _ALT_CORR_MODE
    if not mode:
        mode = "mxu"
    if mode == "fused" and jax.default_backend() == "tpu":
        from .pallas_corr import alt_corr_fused
        return alt_corr_fused(tuple(pyramid.levels), coords, ii, jj,
                              radius=radius)
    return alt_corr_mxu(pyramid, coords, ii, jj, radius=radius)


# ---------------------------------------------------------------------------
# memory-lean on-the-fly correlation (AltCorrBlock / altcorr_kernel.cu)
# ---------------------------------------------------------------------------

class FeaturePyramid(NamedTuple):
    """Per-level feature maps [T, h_l, w_l, C] (already /4-scaled)."""
    levels: List[jnp.ndarray]


def build_feature_pyramid(fmaps: jnp.ndarray,
                          num_levels: int = NUM_LEVELS) -> FeaturePyramid:
    """fmaps: [T, h, w, C] -> averaged-pooled pyramid, each level /4-scaled
    (AltCorrBlock, corr.py:98-110)."""
    f = fmaps.astype(jnp.float32) / 4.0
    levels = [f.astype(jnp.bfloat16)]
    cur = f
    for _ in range(num_levels - 1):
        cur = _avg_pool2(jnp.moveaxis(cur, -1, 1))
        cur = jnp.moveaxis(cur, 1, -1)
        levels.append(cur.astype(jnp.bfloat16))
    return FeaturePyramid(levels)


def alt_corr(pyramid: FeaturePyramid, coords: jnp.ndarray, ii: jnp.ndarray,
             jj: jnp.ndarray, radius: int = RADIUS) -> jnp.ndarray:
    """On-the-fly windowed correlation for edges (ii -> jj).

    pyramid: feature pyramid over rig-frames (stereo: index 2*t + rig).
    coords: [E, h1, w1, 2] lookup coords in level-0 target pixels.
    Returns [E, h1, w1, L*(2r+1)^2] fp32, same channel layout as lookup().
    """
    E, h1, w1, _ = coords.shape
    P1 = h1 * w1
    rd = 2 * radius + 1
    S = rd + 1

    f1 = pyramid.levels[0][ii].reshape(E, P1, -1).astype(jnp.float32)

    out = []
    for lvl, flvl in enumerate(pyramid.levels):
        T, H2, W2, C = flvl.shape
        f2 = flvl[jj]                                    # [E, H2, W2, C]
        f2 = f2.reshape(E, H2 * W2, C)

        c = coords.reshape(E, P1, 2) / (2 ** lvl)
        x0f = jnp.floor(c[..., 0])
        y0f = jnp.floor(c[..., 1])
        dx = (c[..., 0] - x0f)[..., None, None]
        dy = (c[..., 1] - y0f)[..., None, None]
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        # dot products at the (2r+2)^2 integer taps, computed tap-by-tap to
        # keep the transient at [E, P1, C]
        taps = []
        for a in range(S):
            row = []
            for b in range(S):
                ay = y0 - radius + a
                ax = x0 - radius + b
                inb = (ay >= 0) & (ay < H2) & (ax >= 0) & (ax < W2)
                idx = jnp.where(inb, ay * W2 + ax, 0)
                g = jnp.take_along_axis(
                    f2, idx[..., None], axis=1).astype(jnp.float32)
                dot = jnp.einsum("epc,epc->ep", f1, g)
                row.append(jnp.where(inb, dot, 0.0))
            taps.append(jnp.stack(row, axis=-1))
        taps = jnp.stack(taps, axis=-2)                  # [E, P1, S(y), S(x)]

        out_yx = ((1 - dy) * (1 - dx) * taps[..., :rd, :rd]
                  + (1 - dy) * dx * taps[..., :rd, 1:]
                  + dy * (1 - dx) * taps[..., 1:, :rd]
                  + dy * dx * taps[..., 1:, 1:])
        out.append(jnp.swapaxes(out_yx, -1, -2).reshape(E, P1, rd * rd))

    return jnp.concatenate(out, axis=-1).reshape(E, h1, w1, -1)
