"""InstantNeuS — hash-grid SDF scene model with NeuS volume rendering.

JAX/flax re-design of /root/reference/src/InstantNeuS.py:
  * SDFNetwork: hash-grid encoding (+ raw xyz concat) -> single linear ->
    (sdf, 31-dim feature); geometric init (InstantNeuS.py:109-111)
  * ColorNetwork: sin-Fourier position embedding (B ~ N(0, 25^2)) + normals
    + features -> 2x64 MLP -> sigmoid RGB (InstantNeuS.py:162-205)
  * SingleVarianceNetwork: learnable NeuS inv-s = exp(10 * v)
  * NeuS sigmoid-CDF alpha compositing with in-bound masking
    (InstantNeuS.py:276-358); boolean indexing becomes where-masking so
    shapes stay static under jit
  * truncation-band SDF + free-space losses (InstantNeuS.py:372-400,
    following arXiv 2204.02296 Eq. 6) and eikonal via jax.grad
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .hashgrid import HashGrid


def normalize_3d(p, bound):
    """Normalize points to [-1, 1] within bound [3,2] (InstantNeuS.py:12-32)."""
    p = (p - bound[:, 0]) / (bound[:, 1] - bound[:, 0]) * 2.0 - 1.0
    return jnp.clip(p, -1.0, 1.0)


def in_bound(pts, bound):
    return ((pts > bound[:, 0]) & (pts < bound[:, 1])).all(-1)


class SDFNetwork(nn.Module):
    d_out: int = 32

    @nn.compact
    def __call__(self, pts_n):
        """pts_n: [..., 3] normalized to [-1, 1].
        Returns (sdf [..., 1], feat [..., d_out-1])."""
        enc = HashGrid(name="encoding")((pts_n + 1.0) / 2.0)
        h = jnp.concatenate([pts_n, enc.astype(pts_n.dtype)], axis=-1)

        d_in = 3 + enc.shape[-1]
        d_out = self.d_out

        def kernel_init(key, shape, dtype=jnp.float32):
            # geometric-ish init: zeros on grid features, gaussian on xyz
            w = jnp.zeros(shape, dtype)
            wxyz = jax.random.normal(key, (3, d_out), dtype) * (
                math.sqrt(2.0) / math.sqrt(d_out))
            return w.at[:3, :].set(wxyz)

        out = nn.Dense(d_out, kernel_init=kernel_init,
                       bias_init=nn.initializers.zeros, name="sdf_layer")(h)
        return out[..., 0:1], out[..., 1:]


class ColorNetwork(nn.Module):
    d_feat: int = 31
    d_hidden: int = 64
    n_layers: int = 2

    @nn.compact
    def __call__(self, pts_n, normals, feat):
        B = self.param("B", lambda k, s: 25.0 * jax.random.normal(k, s),
                       (3, 33))
        emb = jnp.sin(pts_n @ B)
        h = jnp.concatenate([emb, normals, feat], axis=-1)
        for i in range(self.n_layers):
            h = nn.relu(nn.Dense(self.d_hidden, name=f"hidden{i}")(h))
        rgb = nn.Dense(3, name="out")(h)
        return jax.nn.sigmoid(rgb)


class InstantNeuS(nn.Module):
    """Scene model; bound/realtime_bound are call inputs (they change at
    runtime as the multiview filter refines the scene extent)."""
    d_out: int = 32
    d_hidden: int = 64
    n_layers: int = 2
    init_val: float = 0.2
    scale_factor: float = 10.0
    sdf_truncation: float = 0.16
    sdf_sparse_factor: float = 5.0
    cos_anneal_ratio: float = 1.0

    def setup(self):
        self.sdf_network = SDFNetwork(self.d_out)
        self.color_network = ColorNetwork(self.d_out - 1, self.d_hidden,
                                          self.n_layers)
        self.variance = self.param(
            "variance", lambda k, s: jnp.full(s, self.init_val), ())

    def inv_s(self):
        return jnp.clip(jnp.exp(self.variance * self.scale_factor),
                        1e-6, 1e6)

    def sdf_with_grad(self, pts, bound):
        """sdf, feature, d(sdf)/d(pts) at world points [N, 3]."""
        def f(p):
            sdf, feat = self.sdf_network(normalize_3d(p, bound))
            return sdf.sum(), (sdf, feat)

        grad, (sdf, feat) = jax.grad(f, has_aux=True)(pts)
        return sdf, feat, grad

    def get_alpha(self, sdf, gradients, dirs, dists):
        """NeuS alpha from the sigmoid CDF (InstantNeuS.py:276-293)."""
        inv_s = self.inv_s()
        true_cos = (dirs * gradients).sum(-1, keepdims=True)
        iter_cos = -(nn.relu(-true_cos * 0.5 + 0.5)
                     * (1.0 - self.cos_anneal_ratio)
                     + nn.relu(-true_cos) * self.cos_anneal_ratio)
        est_next = sdf + iter_cos * dists[..., None] / 2.0
        est_prev = sdf - iter_cos * dists[..., None] / 2.0
        prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
        next_cdf = jax.nn.sigmoid(est_next * inv_s)
        return jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5),
                        0.0, 1.0)

    def __call__(self, rays_o, rays_d, z_vals, dists, bound, realtime_bound):
        """Volume-render a batch of rays (InstantNeuS.py:295-370).

        rays_o/rays_d: [R, 3]; z_vals/dists: [R, S].
        Returns dict of per-ray outputs.
        """
        R, S = z_vals.shape
        z_vals = z_vals + dists / 2.0
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None, :], (R, S, 3))

        pts_f = pts.reshape(-1, 3)
        dirs_f = dirs.reshape(-1, 3)
        dists_f = dists.reshape(-1)
        mask = in_bound(pts_f, realtime_bound)

        sdf_raw, feat, grad = self.sdf_with_grad(pts_f, bound)
        sdf = jnp.where(mask[:, None], sdf_raw, 100.0)
        feat = jnp.where(mask[:, None], feat, 0.0)
        grad = jnp.where(mask[:, None], grad, 0.0)

        alpha = self.get_alpha(sdf, grad, dirs_f, dists_f)
        rgb = self.color_network(pts_f, grad, feat)
        rgb = jnp.where(mask[:, None], rgb, 0.0)

        alpha = (alpha[..., 0] * mask).reshape(R, S)
        rgb = rgb.reshape(R, S, 3)
        sdf = sdf.reshape(R, S)
        grad = grad.reshape(R, S, 3)
        maskRS = mask.reshape(R, S)

        trans = jnp.cumprod(
            jnp.concatenate([jnp.ones((R, 1)), 1.0 - alpha + 1e-7], axis=1),
            axis=1)[:, :-1]
        weights = alpha * trans
        weight_sum = weights.sum(1, keepdims=True)
        color = (rgb * weights[..., None]).sum(1)
        depth = (z_vals * weights).sum(1, keepdims=True)
        depth_var = (((z_vals - depth) ** 2) * weights).sum(1, keepdims=True)
        normal = (grad * (weights * maskRS)[..., None]).sum(1)

        # grad-safe norm: ||0|| has an undefined gradient that would leak
        # NaN through the mask product in the backward pass
        grad_norm = jnp.sqrt((grad ** 2).sum(-1) + 1e-12)
        grad_err = ((grad_norm - 1.0) ** 2) * maskRS

        return {
            "color": color,                  # [R, 3]
            "depth": depth,                  # [R, 1]
            "depth_variance": depth_var,     # [R, 1]
            "normal": normal,                # [R, 3]
            "weight_sum": weight_sum,        # [R, 1]
            "sdf": sdf,                      # [R, S]
            "z_vals": z_vals,                # [R, S]
            "gradient_error": grad_err.mean()[None],
        }

    def sdf_grid(self, pts, bound, realtime_bound):
        """SDF values for mesh extraction; out-of-realtime-bound -> 100."""
        mask = in_bound(pts, realtime_bound)
        sdf, _ = self.sdf_network(normalize_3d(pts, bound))
        return jnp.where(mask[:, None], sdf, 100.0)[..., 0]

    def color_at(self, pts, bound):
        """Vertex colors for mesh export (InstantNeuS.py:402-420)."""
        sdf, feat, grad = self.sdf_with_grad(pts, bound)
        return self.color_network(pts, grad, feat)


def compute_sdf_losses(sdf, z_vals, gt_depth, truncation: float,
                       sparse_factor: float, psum=None):
    """Truncation-band SDF loss + free-space loss (InstantNeuS.py:372-400).

    sdf/z_vals: [R, S]; gt_depth: [R] (0 = invalid).
    Returns (sdf_loss, front_loss) scalars.

    psum: optional cross-shard sum (e.g. partial(jax.lax.psum,
    axis_name=...)) so a ray-sharded caller normalizes by the GLOBAL
    valid-ray count — making the sharded loss bit-comparable to the
    single-device one (parallel/sharded_mapping.py).
    """
    gt = gt_depth[:, None]
    ray_ok = (gt_depth > 0).astype(jnp.float32)

    bound_dist = gt - z_vals
    front_mask = (z_vals < (gt - truncation)).astype(jnp.float32) \
        * ray_ok[:, None]
    sdf_mask = (jnp.abs(bound_dist) <= truncation).astype(jnp.float32) \
        * ray_ok[:, None]

    n_valid = front_mask.sum(1) + sdf_mask.sum(1) + 1e-8
    n_rays_local = ray_ok.sum()
    n_rays = jnp.maximum(psum(n_rays_local) if psum is not None
                         else n_rays_local, 1.0)

    front_loss = jnp.maximum(
        jnp.exp(jnp.clip(-sparse_factor * sdf, a_max=10.0)) - 1.0,
        sdf - bound_dist)
    front_loss = jnp.clip(front_loss, a_min=0.0) * front_mask
    front_sum = (front_loss.sum(1) / n_valid).sum()
    sdf_sum = ((jnp.abs(sdf - bound_dist) * sdf_mask).sum(1)
               / n_valid).sum()
    if psum is not None:
        front_sum = psum(front_sum)
        sdf_sum = psum(sdf_sum)
    return sdf_sum / n_rays, front_sum / n_rays
