"""Ray sampling + batched rendering (re-design of /root/reference/src/render.py).

Sampling protocol matched to the reference:
  * near = 0.01 * gt_depth (0.01 for depthless rays), far = bbox ray-exit
    clamped to 1.2 * max gt depth (render.py:104-124)
  * N_surface samples in a +-10% band around gt depth; rays without depth
    sample uniformly 0.001 -> max depth (render.py:127-142)
  * N_samples uniform near->far with stratified perturbation, merged and
    sorted with the surface samples (render.py:144-171)

Everything is a single jitted function over a static ray-batch size.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


def sample_z_vals(key, rays_o, rays_d, gt_depth, bound, n_samples: int,
                  n_surface: int, perturb: float, depth_max=None):
    """Returns (z_vals [R, n_samples+n_surface], sample_dist [R, 1]).

    depth_max: optional override of the batch-global max(gt_depth) used
    by the far clamp and invalid-ray surface range (render.py:104-142) —
    a ray-sharded caller passes the pmax so every shard samples as the
    unsharded batch would (parallel/sharded_mapping.py).
    """
    R = rays_o.shape[0]
    gt = gt_depth[:, None]
    near = gt * 0.01 + jnp.where(gt > 0, 0.0, 0.01)
    if depth_max is None:
        depth_max = gt_depth.max()

    t = (bound.T[None] - rays_o[:, None, :]) / jnp.where(
        jnp.abs(rays_d[:, None, :]) < 1e-9, 1e-9, rays_d[:, None, :])
    far_bb = jnp.max(t, axis=1).min(axis=1, keepdims=True) + 0.01
    far = jnp.clip(far_bb, 0.0, jnp.maximum(depth_max * 1.2, 1e-3))

    tv = jnp.linspace(0.0, 1.0, n_samples)[None]
    z_vals = near + (far - near) * tv
    sample_dist = (far - near) / n_samples

    if perturb > 0:
        mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mid, z_vals[:, -1:]], axis=1)
        lower = jnp.concatenate([z_vals[:, :1], mid], axis=1)
        r = jax.random.uniform(key, (n_samples,))
        z_vals = lower + (upper - lower) * r[None]

    if n_surface > 0:
        ts = jnp.linspace(0.0, 1.0, n_surface)[None]
        valid = (gt > 0).astype(jnp.float32)
        znear, zfar = 0.9 * gt, 1.1 * gt
        z_surf_valid = znear + (zfar - znear) * ts
        z_surf_invalid = 0.001 + (depth_max - 0.001) * ts
        z_surf = z_surf_valid * valid + z_surf_invalid * (1 - valid)
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_surf], axis=1), axis=1)

    return z_vals, sample_dist


def render_rays(model, params, key, rays_o, rays_d, gt_depth, bound,
                realtime_bound, n_samples: int, n_surface: int,
                perturb: float, depth_max=None) -> Dict[str, jnp.ndarray]:
    """Sample + volume render one ray batch (render.py:73-175)."""
    z_vals, sample_dist = sample_z_vals(key, rays_o, rays_d, gt_depth,
                                        bound, n_samples, n_surface, perturb,
                                        depth_max=depth_max)
    dists = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], sample_dist], axis=1)
    return model.apply({"params": params}, rays_o, rays_d, z_vals, dists,
                       bound, realtime_bound)


def build_ray_dirs(H, W, fx, fy, cx, cy):
    """Per-pixel un-normalized camera-frame ray directions [H, W, 3]
    (nerf_func.build_rays with nerf_coordinate=False, dir_normalize=False)."""
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)],
                     axis=-1)


def rays_from_pixels(c2w, dirs_cam, pix_y, pix_x):
    """Gather world rays for chosen pixels.

    c2w: [4,4]; dirs_cam: [H,W,3]; pix_y/pix_x: [R].
    Returns rays_o [R,3], rays_d [R,3].
    """
    d = dirs_cam[pix_y, pix_x]
    rays_d = d @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def sample_pdf(key, bins, weights, n_samples: int):
    """Importance sampling from a piecewise-constant pdf over bins
    (nerf_func.py:224-253; latent API in the reference)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
    u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu))(cdf, u)
    idx = jnp.clip(idx, 1, cdf.shape[-1] - 1)
    c0 = jnp.take_along_axis(cdf, idx - 1, -1)
    c1 = jnp.take_along_axis(cdf, idx, -1)
    b0 = jnp.take_along_axis(bins, jnp.clip(idx - 1, 0, bins.shape[-1] - 1),
                             -1)
    b1 = jnp.take_along_axis(bins, jnp.clip(idx, 0, bins.shape[-1] - 1), -1)
    t = jnp.where(c1 - c0 < 1e-8, 0.5, (u - c0) / jnp.maximum(c1 - c0, 1e-8))
    return b0 + t * (b1 - b0)


def render_img(model, params, c2w, H, W, fx, fy, cx, cy, bound,
               realtime_bound, gt_depth=None, n_samples=24, n_surface=48,
               ray_chunk: int = 4096):
    """Full-image rendering in ray chunks (render.py:177-235).

    Returns dict of [H, W, ...] images (color, depth, depth_variance,
    normal, weight_sum).
    """
    import numpy as np

    dirs = build_ray_dirs(H, W, fx, fy, cx, cy).reshape(-1, 3)
    R3 = jnp.asarray(c2w[:3, :3])
    rays_d_all = dirs @ R3.T
    rays_o_all = jnp.broadcast_to(jnp.asarray(c2w[:3, 3]), rays_d_all.shape)
    gt = jnp.zeros((H * W,)) if gt_depth is None \
        else jnp.asarray(gt_depth).reshape(-1)

    outs = {}
    key = jax.random.PRNGKey(0)
    n = H * W
    for i in range(0, n, ray_chunk):
        sl = slice(i, min(i + ray_chunk, n))
        ro, rd, g = rays_o_all[sl], rays_d_all[sl], gt[sl]
        if ro.shape[0] < ray_chunk:   # pad tail to reuse the jit
            pad = ray_chunk - ro.shape[0]
            ro = jnp.concatenate([ro, ro[:pad]])
            rd = jnp.concatenate([rd, rd[:pad]])
            g = jnp.concatenate([g, jnp.zeros(pad)])
        ret = render_rays(model, params, key, ro, rd, g, bound,
                          realtime_bound, n_samples, n_surface, 0.0)
        k = sl.stop - sl.start
        for name in ("color", "depth", "depth_variance", "normal",
                     "weight_sum"):
            outs.setdefault(name, []).append(np.asarray(ret[name])[:k])
    import numpy as np
    return {k: np.concatenate(v).reshape((H, W) + v[0].shape[1:])
            for k, v in outs.items()}
