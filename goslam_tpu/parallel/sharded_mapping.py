"""Multi-chip neural mapping via shard_map over the ray dimension.

New capability vs the reference (single-GPU mapping, mapping.py:60-137):
one mapping optimization step is data-parallel over rays — every chip
renders its ray shard through the (replicated) InstantNeuS, loss
normalizers and gradients are combined with psum over ICI, and the
optimizer update is applied identically on every chip, keeping params
and optimizer state replicated.

The sharded loss is bit-comparable to the single-device one: all
normalizers (valid-ray counts, eikonal element counts) are global psums,
not per-shard means — validated in tests/test_parallel.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..mapping.instant_neus import compute_sdf_losses
from ..mapping.renderer import render_rays


def shard_rays(n_shards: int, rays_o, rays_d, gt_color, gt_depth):
    """Pad the ray batch to a multiple of n_shards.

    Padded rays copy ray 0's geometry (well-conditioned — a zero
    direction would NaN the renderer) but carry gt_depth 0, so they are
    invalid for every valid-normalized loss term.  Only the unmasked
    eikonal regularizer sees them (averaged over a few extra sane
    samples — a negligible, documented perturbation).
    """
    n = rays_o.shape[0]
    m = ((n + n_shards - 1) // n_shards) * n_shards
    if m == n:
        return rays_o, rays_d, gt_color, gt_depth
    k = m - n
    rep = lambda a: jnp.concatenate([a, jnp.repeat(a[:1], k, 0)])  # noqa: E731
    return (rep(rays_o), rep(rays_d), rep(gt_color),
            jnp.concatenate([gt_depth, jnp.zeros((k,), gt_depth.dtype)]))


def make_sharded_map_step(mesh: Mesh, model, tx, *, n_samples: int,
                          n_surface: int, perturb: float, w_color: float,
                          w_sdf: float, w_eik: float, uncertainty: bool,
                          truncation: float, sparse_factor: float):
    """Build the jitted multi-chip mapping train step.

    Mirrors Mapper._build_train_step's loss exactly (same terms, weights
    and masking); rays_o/rays_d/gt_color/gt_depth are sharded over the
    mesh axis, params/opt_state replicated.
    """
    axis = mesh.axis_names[0]

    @jax.jit
    def step(params, opt_state, key, rays_o, rays_d, gt_color, gt_depth,
             bound, realtime_bound):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis),
                      P(), P()),
            out_specs=(P(), P(), P()),
        )
        def run(params, opt_state, key, ro, rd, gc, gd, bound, rb):
            psum = functools.partial(jax.lax.psum, axis_name=axis)
            # per-shard sample jitter (unused when perturb == 0)
            key_local = jax.random.fold_in(key, jax.lax.axis_index(axis))

            # batch-global max(gt_depth) (far clamp + invalid-ray surface
            # range) must see the WHOLE batch, not the shard
            dmax = jax.lax.pmax(gd.max(), axis)

            def loss_fn(p):
                ret = render_rays(model, p, key_local, ro, rd, gd,
                                  bound, rb, n_samples, n_surface, perturb,
                                  depth_max=dmax)
                valid = (gd > 0).astype(jnp.float32)
                nv = jnp.maximum(psum(valid.sum()), 1.0)

                color_l = psum((jnp.abs(ret["color"] - gc).mean(-1)
                                * valid).sum()) / nv
                uw = 1.0 / jnp.sqrt(
                    jax.lax.stop_gradient(ret["depth_variance"][:, 0])
                    + 1e-10)
                if not uncertainty:
                    uw = jnp.ones_like(uw)
                depth_l = psum((jnp.abs(ret["depth"][:, 0] - gd) * uw
                                * valid).sum()) / nv

                sdf_l, front_l = compute_sdf_losses(
                    ret["sdf"], ret["z_vals"], gd, truncation,
                    sparse_factor, psum=psum)
                g = ret["gradient_error"]
                eik_l = psum(g.sum()) / psum(
                    jnp.asarray(g.size, jnp.float32))

                total = (color_l * w_color + depth_l
                         + (sdf_l + front_l) * w_sdf + eik_l * w_eik)
                return total, {"color": color_l, "depth": depth_l,
                               "sdf": sdf_l, "eikonal": eik_l,
                               "total": total}

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            # each shard's grad covers only its local rays' terms — the
            # global gradient is their ICI all-reduce
            grads = jax.lax.psum(grads, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return run(params, opt_state, key, rays_o, rays_d, gt_color,
                   gt_depth, bound, realtime_bound)

    return step


def make_sharded_map_step_from_cfg(mesh: Mesh, mapper):
    """Sharded step wired from a Mapper's own model/optimizer/knobs."""
    return make_sharded_map_step(
        mesh, mapper.model, mapper.tx,
        n_samples=mapper.n_samples, n_surface=mapper.n_surface,
        perturb=mapper.perturb, w_color=mapper.w_color,
        w_sdf=mapper.w_sdf, w_eik=mapper.w_eik,
        uncertainty=mapper.uncertainty, truncation=mapper.truncation,
        sparse_factor=mapper.sparse_factor)
