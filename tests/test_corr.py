"""Correlation volume + lookup vs. naive oracles.

Oracle: direct bilinear sampling of an explicitly-computed volume with the
CUDA kernel's zero-out-of-bounds and channel-layout semantics
(correlation_kernels.cu:40-69).
"""
import numpy as np
import jax.numpy as jnp

from goslam_tpu.ops import corr

E, H, W, C = 2, 10, 12, 16


def make_fmaps(rng):
    f1 = rng.normal(size=(E, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(E, H, W, C)).astype(np.float32)
    return jnp.asarray(f1), jnp.asarray(f2)


def naive_volume(f1, f2):
    f1 = np.asarray(f1) / 4.0
    f2 = np.asarray(f2) / 4.0
    return np.einsum("ehwc,eyxc->ehwyx", f1, f2)


def naive_pool(vol):
    h2, w2 = vol.shape[-2] // 2, vol.shape[-1] // 2
    v = vol[..., : h2 * 2, : w2 * 2]
    return v.reshape(v.shape[:-2] + (h2, 2, w2, 2)).mean(axis=(-3, -1))


def naive_lookup(vols, coords, radius=3):
    """vols: list of [E,H,W,H2,W2]; coords [E,H,W,2] (x,y) level-0."""
    outs = []
    for lvl, vol in enumerate(vols):
        H2, W2 = vol.shape[-2:]
        c = np.asarray(coords) / 2 ** lvl
        rd = 2 * radius + 1
        out = np.zeros((E, H, W, rd, rd), np.float32)
        for e in range(E):
            for y in range(H):
                for x in range(W):
                    x0, y0 = c[e, y, x]
                    fx0, fy0 = np.floor(x0), np.floor(y0)
                    dx, dy = x0 - fx0, y0 - fy0
                    for i in range(rd):
                        for j in range(rd):
                            # bilinear at (x0 - r + i, y0 - r + j), OOB = 0
                            acc = 0.0
                            for (sx, wx) in ((0, 1 - dx), (1, dx)):
                                for (sy, wy) in ((0, 1 - dy), (1, dy)):
                                    xx = int(fx0) - radius + i + sx
                                    yy = int(fy0) - radius + j + sy
                                    if 0 <= xx < W2 and 0 <= yy < H2:
                                        acc += wx * wy * vol[e, y, x, yy, xx]
                            out[e, y, x, i, j] = acc
        outs.append(out.reshape(E, H, W, rd * rd))
    return np.concatenate(outs, axis=-1)


def test_lookup_matches_naive(rng):
    f1, f2 = make_fmaps(rng)
    pyr = corr.build_pyramid(f1, f2, num_levels=2)

    vol0 = naive_volume(f1, f2)
    vol1 = naive_pool(vol0.reshape(E * H * W, 1, H, W)).reshape(
        E, H, W, H // 2, W // 2)
    # random in-bounds-ish coords (some out of range to hit OOB path)
    coords = rng.uniform(-2, max(H, W) + 1, size=(E, H, W, 2)).astype(
        np.float32)
    out = corr.lookup(pyr, jnp.asarray(coords))
    expect = naive_lookup([vol0, vol1], coords)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-2, atol=2e-2)


def test_alt_corr_matches_volume_lookup(rng):
    """alt_corr over a feature pyramid == lookup over the explicit volume."""
    T = 3
    fmaps = jnp.asarray(rng.normal(size=(T, H, W, C)).astype(np.float32))
    ii = jnp.asarray([0, 2])
    jj = jnp.asarray([1, 0])
    coords = jnp.asarray(
        rng.uniform(0, min(H, W) - 1, size=(E, H, W, 2)).astype(np.float32))

    fp = corr.build_feature_pyramid(fmaps, num_levels=2)
    out_alt = corr.alt_corr(fp, coords, ii, jj)

    # volume path on the same (bf16-rounded) features
    f1 = fp.levels[0][ii].astype(jnp.float32) * 4.0
    f2 = fp.levels[0][jj].astype(jnp.float32) * 4.0
    pyr = corr.build_pyramid(f1, f2, num_levels=2)
    out_vol = corr.lookup(pyr, coords)

    np.testing.assert_allclose(np.asarray(out_alt), np.asarray(out_vol),
                               rtol=5e-2, atol=5e-2)


def test_window_gather_lowerings_agree(rng):
    """The one-hot-matmul window extraction (TPU lowering) must equal the
    take_along_axis form (CPU lowering) bit-for-bit up to fp32 rounding:
    every tap selects exactly one bf16 volume element or zero."""
    Ep, P1, H2, W2 = 3, 40, 10, 12
    vol = jnp.asarray(
        rng.normal(size=(Ep, P1, H2, W2)).astype(np.float32)
    ).astype(jnp.bfloat16)
    # integer coords straddling the bounds to hit the zero-OOB path
    y0 = jnp.asarray(rng.integers(-5, H2 + 5, (Ep, P1)), jnp.int32)
    x0 = jnp.asarray(rng.integers(-5, W2 + 5, (Ep, P1)), jnp.int32)
    a = corr._window_gather_mxu(vol, x0, y0, radius=3)
    b = corr._window_gather_taa(vol, x0, y0, radius=3)
    c = corr._window_gather_vpu(vol, x0, y0, radius=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(c))


def test_alt_corr_mxu_matches_alt_corr(rng):
    """alt_corr_mxu (volume-first, MXU einsum + scalar window gather) must
    equal alt_corr (per-tap feature gather + dot): pooling the target
    features commutes with the dot product, so both compute the same
    pyramid lookup.  Tolerance covers the bf16 volume rounding."""
    T = 3
    fmaps = jnp.asarray(rng.normal(size=(T, H, W, C)).astype(np.float32))
    ii = jnp.asarray([0, 2])
    jj = jnp.asarray([1, 0])
    # mix of interior and out-of-bounds coords to hit the zero-OOB path
    coords = jnp.asarray(
        rng.uniform(-2, max(H, W) + 1, size=(E, H, W, 2)).astype(np.float32))

    fp = corr.build_feature_pyramid(fmaps, num_levels=2)
    out_ref = corr.alt_corr(fp, coords, ii, jj)
    out_mxu = corr.alt_corr_mxu(fp, coords, ii, jj)

    np.testing.assert_allclose(np.asarray(out_mxu), np.asarray(out_ref),
                               rtol=5e-2, atol=5e-2)


def test_zero_displacement_peak(rng):
    """Looking up a self-correlation at the identity grid: the center tap
    (offset (r, r) -> channel r*7+r) must be the feature-norm peak."""
    f = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    pyr = corr.build_pyramid(f, f, num_levels=1)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = jnp.asarray(
        np.stack([gx, gy], -1)[None].astype(np.float32))
    out = np.asarray(corr.lookup(pyr, coords))    # [1,H,W,49]
    center = out[0, :, :, 3 * 7 + 3]
    expect = (np.asarray(f[0]) ** 2).sum(-1) / 16.0
    np.testing.assert_allclose(center, expect, rtol=2e-2, atol=1e-2)


def test_alt_corr_fused_matches_alt_corr(rng):
    """The Pallas fused alt-corr kernel (pallas_corr.alt_corr_fused,
    interpreter mode) must equal alt_corr: same bf16 features, same
    fp32-accumulated MXU contraction, same zero-OOB window + bilinear
    combine, same x-major channel layout."""
    from goslam_tpu.ops.pallas_corr import alt_corr_fused

    T = 3
    fmaps = jnp.asarray(rng.normal(size=(T, H, W, C)).astype(np.float32))
    ii = jnp.asarray([0, 2], jnp.int32)
    jj = jnp.asarray([1, 0], jnp.int32)
    # mix of interior and out-of-bounds coords to hit the zero-OOB path
    coords = jnp.asarray(
        rng.uniform(-2, max(H, W) + 1, size=(E, H, W, 2)).astype(np.float32))

    fp = corr.build_feature_pyramid(fmaps, num_levels=2)
    out_ref = corr.alt_corr(fp, coords, ii, jj)
    out_fused = alt_corr_fused(tuple(fp.levels), coords, ii, jj,
                               interpret=True)

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=5e-2, atol=5e-2)
