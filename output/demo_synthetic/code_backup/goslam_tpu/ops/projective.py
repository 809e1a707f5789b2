"""Differentiable pinhole + SE(3) reprojection with analytic Jacobians.

Re-derivation of the reference geometry layer for TPU:
  * /root/reference/src/geom/projective_ops.py (Python oracle)
  * /root/reference/src/lib/droid_kernels.cu:176-424 (runtime CUDA kernel)

Points are homogeneous ``[X, Y, 1, d]`` with inverse depth ``d`` (disparity);
poses are world-to-camera 7-vectors (see ops.lie).  All functions are pure,
statically shaped, and vmap over the edge dimension — on TPU the per-pixel
Jacobian products become fused VPU elementwise work and the weighted
accumulations in ops.dba become MXU matmuls.

The stereo convention is kept: an edge with ii == jj is a rectified stereo
pair whose relative transform is the fixed baseline ``t = [-0.1, 0, 0]``
(projective_ops.py:124, droid_kernels.cu:219-229).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie

# python-side valid-mask threshold (projective_ops.py:4); the BA system build
# uses the kernel's stricter 0.25 (droid_kernels.cu:26) — see ops/dba.py.
MIN_DEPTH = 0.2

STEREO_BASELINE = jnp.asarray([-0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def coords_grid(ht: int, wd: int) -> jnp.ndarray:
    """Pixel-center coordinate grid, [ht, wd, 2] as (x, y)."""
    y, x = jnp.meshgrid(
        jnp.arange(ht, dtype=jnp.float32),
        jnp.arange(wd, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([x, y], axis=-1)


def iproj(disps: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Inverse pinhole projection to homogeneous points.

    Args:
      disps: [..., ht, wd] inverse depths.
      intrinsics: [..., 4] (fx, fy, cx, cy), broadcast against disps' batch.
    Returns:
      [..., ht, wd, 4] homogeneous points [X, Y, 1, d].
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    grid = coords_grid(ht, wd)
    X = jnp.broadcast_to((grid[..., 0] - cx) / fx, disps.shape)
    Y = jnp.broadcast_to((grid[..., 1] - cy) / fy, disps.shape)
    return jnp.stack([X, Y, jnp.ones_like(disps), disps], axis=-1)


def proj(Xs: jnp.ndarray, intrinsics: jnp.ndarray,
         return_depth: bool = False) -> jnp.ndarray:
    """Pinhole projection of homogeneous points [..., 4] -> pixel coords.

    Z below 0.5*MIN_DEPTH is replaced by 1 to keep the math finite
    (projective_ops.py:93); validity is handled by the caller's mask.
    """
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    X, Y, Z, D = jnp.moveaxis(Xs, -1, 0)
    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    x = fx * (X / Z) + cx
    y = fy * (Y / Z) + cy
    if return_depth:
        return jnp.stack([x, y, D / Z], axis=-1)
    return jnp.stack([x, y], axis=-1)


def rel_poses(poses: jnp.ndarray, ii: jnp.ndarray, jj: jnp.ndarray) -> jnp.ndarray:
    """Per-edge relative transforms G_ij = G_jj . G_ii^-1 with the stereo
    (ii == jj) baseline substitution."""
    Gij = lie.rel(poses[ii], poses[jj])
    stereo = (ii == jj)[..., None]
    return jnp.where(stereo, STEREO_BASELINE.astype(Gij.dtype), Gij)


def transform(poses: jnp.ndarray, disps: jnp.ndarray, intrinsics: jnp.ndarray,
              ii: jnp.ndarray, jj: jnp.ndarray,
              return_depth: bool = False):
    """Reproject pixels of frames ii into frames jj.

    Args:
      poses: [T, 7] w2c poses.
      disps: [T, ht, wd] inverse depths (1/8-resolution).
      intrinsics: [4] shared (fx, fy, cx, cy) at the same resolution.
      ii, jj: [E] edge endpoints.
    Returns:
      coords: [E, ht, wd, 2] target-frame pixel coords (plus depth ratio if
        return_depth), valid: [E, ht, wd] float mask.
    """
    X0 = iproj(disps[ii], intrinsics)                    # [E, ht, wd, 4]
    Gij = rel_poses(poses, ii, jj)                       # [E, 7]
    X1 = lie.act(Gij[:, None, None, :], X0)              # [E, ht, wd, 4]
    coords = proj(X1, intrinsics, return_depth=return_depth)
    valid = ((X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH)).astype(coords.dtype)
    return coords, valid


def induced_flow(poses, disps, intrinsics, ii, jj):
    """Flow field induced by camera motion (target coords minus the identity
    grid) plus the valid mask — used by frame_distance."""
    coords, valid = transform(poses, disps, intrinsics, ii, jj)
    ht, wd = disps.shape[-2:]
    return coords - coords_grid(ht, wd), valid


# ---------------------------------------------------------------------------
# frame distance (droid_kernels.cu:518-657) — mean flow magnitude between
# frames, used for keyframing and edge proposal. beta mixes full-SE3 flow with
# translation-only flow; pairs with <75% valid pixels get distance 1000.
# ---------------------------------------------------------------------------

def frame_distance(poses: jnp.ndarray, disps: jnp.ndarray,
                   intrinsics: jnp.ndarray, ii: jnp.ndarray, jj: jnp.ndarray,
                   beta: float = 0.3) -> jnp.ndarray:
    """Per-edge mean reprojection-flow distance, [E]."""
    ht, wd = disps.shape[-2:]
    grid = coords_grid(ht, wd)

    X0 = iproj(disps[ii], intrinsics)
    Gij = rel_poses(poses, ii, jj)

    # full SE3 flow
    X1 = lie.act(Gij[:, None, None, :], X0)
    coords_full = proj(X1, intrinsics)

    # translation-only flow (rotation removed; droid_kernels.cu:592-616)
    Gij_t = jnp.concatenate(
        [Gij[..., 0:3], jnp.zeros_like(Gij[..., 3:6]), jnp.ones_like(Gij[..., 6:7])],
        axis=-1,
    )
    X1_t = lie.act(Gij_t[:, None, None, :], X0)
    coords_t = proj(X1_t, intrinsics)

    valid = (X1[..., 2] > MIN_DEPTH) & (X1_t[..., 2] > MIN_DEPTH)
    dflow_full = jnp.linalg.norm(coords_full - grid, axis=-1)
    dflow_t = jnp.linalg.norm(coords_t - grid, axis=-1)
    d = beta * dflow_full + (1.0 - beta) * dflow_t

    vf = valid.astype(d.dtype)
    num_valid = jnp.sum(vf, axis=(-2, -1))
    mean_d = jnp.sum(d * vf, axis=(-2, -1)) / jnp.maximum(num_valid, 1.0)
    enough = num_valid / float(ht * wd) > 0.75
    return jnp.where(enough, mean_d, jnp.full_like(mean_d, 1000.0))


def frame_distance_matrix(poses, disps, intrinsics, n: int, beta: float = 0.3,
                          bidirectional: bool = True) -> jnp.ndarray:
    """[n, n] symmetric distance matrix (DepthVideo.distance matrix mode)."""
    ii, jj = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)
    d1 = frame_distance(poses, disps, intrinsics, ii, jj, beta)
    if bidirectional:
        d2 = frame_distance(poses, disps, intrinsics, jj, ii, beta)
        d1 = 0.5 * (d1 + d2)
    return d1.reshape(n, n)


# ---------------------------------------------------------------------------
# iproj to world + multiview depth consistency (droid_kernels.cu:661-850)
# ---------------------------------------------------------------------------

def iproj_world(poses: jnp.ndarray, disps: jnp.ndarray,
                intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Unproject each frame's disparity map into world coordinates.

    Returns [T, ht, wd, 3] world points (c2w applied to the backprojection).
    """
    fx, fy, cx, cy = intrinsics
    ht, wd = disps.shape[-2:]
    grid = coords_grid(ht, wd)
    z = 1.0 / jnp.maximum(disps, 1e-8)
    X = z * (grid[..., 0] - cx) / fx
    Y = z * (grid[..., 1] - cy) / fy
    pts_cam = jnp.stack([X, Y, z], axis=-1)                  # [T, ht, wd, 3]
    c2w = lie.inv(poses)
    return lie.act3(c2w[:, None, None, :], pts_cam)


def depth_consistency_count(poses: jnp.ndarray, disps: jnp.ndarray,
                            intrinsics: jnp.ndarray, thresh) -> jnp.ndarray:
    """For every frame, count how many of 6 neighbours agree on each pixel's
    depth (depth_filter_kernel, droid_kernels.cu:661-775).

    The reference checks neighbour offsets {-1,-2,-3,+3,+4,+5}
    (droid_kernels.cu:695).  A neighbour j agrees at pixel p of frame i if the
    warp of p into j lands with floor-coords strictly inside the image and the
    absolute *depth* error |1/d_warped - 1/d_j| at any of the 4 integer taps
    is below thresh; each neighbour contributes at most 1.

    Args:
      thresh: scalar or [T] per-frame depth-error threshold (metres).
    Returns [T, ht, wd] float counts.
    """
    T, ht, wd = disps.shape
    offsets = jnp.asarray([-1, -2, -3, 3, 4, 5], dtype=jnp.int32)
    K = offsets.shape[0]

    ii = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)
    jj = (ii.reshape(T, K) + offsets[None, :]).reshape(-1)
    in_range = (jj >= 0) & (jj < T)
    jj_c = jnp.clip(jj, 0, T - 1)

    coords = transform(poses, disps, intrinsics, ii, jj_c, return_depth=True)[0]
    x, y, dz = coords[..., 0], coords[..., 1], coords[..., 2]   # dz: inv depth in j
    z = 1.0 / jnp.maximum(dz, 1e-8)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)

    agree = jnp.zeros(x.shape, dtype=jnp.bool_)
    flat_dj = disps[jj_c].reshape(-1, ht * wd)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = jnp.clip(x0 + dx, 0, wd - 1)
        yi = jnp.clip(y0 + dy, 0, ht - 1)
        dj = jnp.take_along_axis(flat_dj, (yi * wd + xi).reshape(-1, ht * wd),
                                 axis=1).reshape(x.shape)
        zj = 1.0 / jnp.maximum(dj, 1e-8)
        t = jnp.broadcast_to(jnp.asarray(thresh, jnp.float32), (T,))[ii]
        agree = agree | (jnp.abs(z - zj) < t[:, None, None])

    inb = (x0 >= 0) & (x0 < wd - 1) & (y0 >= 0) & (y0 < ht - 1)
    ok = agree & inb & in_range[:, None, None]
    return ok.astype(jnp.float32).reshape(T, K, ht, wd).sum(axis=1)
