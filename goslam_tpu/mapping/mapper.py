"""Mapper — online training loop for the InstantNeuS scene model.

Re-design of /root/reference/src/mapping.py: keyframe scheduling (unvisited
keyframes get a x10 burst; revisits pick the 2 newest + top-10 by update
priority + stratified random to the window size), masked ray sampling,
AdamW with separate net/grid learning rates and global-norm clip 35, and
the loss stack: L1 color x2, uncertainty-weighted L1 depth, truncation
SDF + free-space x2, eikonal x0.1.

The whole optimization step (sample z, render, losses, grads, AdamW) is
one jitted function over a static ray-batch size.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import lie
from ..utils.shapes import bucket
from .instant_neus import InstantNeuS, compute_sdf_losses
from .renderer import build_ray_dirs, render_rays


@functools.partial(jax.jit, static_argnames=("n_per", "scale"))
def _sample_rays_kernel(key, frames, images, disps_f, masks, poses_f,
                        pose_comp, intr8, n_per: int, scale: int):
    """Device-side masked ray sampling over a window of keyframes — ONE
    dispatch for the whole window, no host mask downloads or host RNG
    (replaces the reference's per-frame torch sampling, mapping.py:226-235,
    and the round-2 host loop that paid a tunnel round trip per frame).

    frames: [F] int32 keyframe ids, -1 = padding. Per frame, n_per pixels
    are drawn uniformly WITHOUT replacement from the multiview mask via
    top-k over per-pixel uniform keys; when a frame has fewer masked
    pixels than n_per (or is padding) the excess rays carry gt_depth 0 —
    invalid for every valid-normalized loss term, the same convention as
    shard_rays padding.

    Returns flat (rays_o [F*n_per,3], rays_d, gt_color, gt_depth).
    """
    F = frames.shape[0]
    ok_f = frames >= 0
    fi = jnp.where(ok_f, frames, 0)
    H, W = masks.shape[-2:]

    m = masks[fi] > 0                                        # [F, H, W]
    keys = jax.random.uniform(key, (F, H, W))
    score = jnp.where(m, keys, -1.0).reshape(F, H * W)
    top, idx = jax.lax.top_k(score, n_per)                   # [F, n_per]
    picked = top >= 0.0
    ys = idx // W
    xs = idx % W

    fx, fy, cx, cy = (intr8[0] * scale, intr8[1] * scale,
                      intr8[2] * scale, intr8[3] * scale)
    xf = xs.astype(jnp.float32)
    yf = ys.astype(jnp.float32)
    dirs = jnp.stack([(xf - cx) / fx, (yf - cy) / fy,
                      jnp.ones_like(xf)], axis=-1)           # [F, n_per, 3]

    c2w = lie.matrix(lie.compose(pose_comp[None], lie.inv(poses_f[fi])))
    rays_d = jnp.einsum("fab,fpb->fpa", c2w[:, :3, :3], dirs)
    rays_o = jnp.broadcast_to(c2w[:, None, :3, 3], rays_d.shape)

    ar = jnp.arange(F)[:, None]
    gt_color = images[fi][ar, ys, xs]                        # [F, n_per, 3]
    depth = 1.0 / (disps_f[fi] + 1e-7)
    gt_depth = depth[ar, ys, xs]
    valid = picked & ok_f[:, None]
    gt_depth = jnp.where(valid, gt_depth, 0.0)

    return (rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
            gt_color.reshape(-1, 3), gt_depth.reshape(-1))


def make_optimizer(net_lr=1e-3, grid_lr=1e-2, clip=35.0):
    """AdamW, two lr groups: hash table at grid_lr, rest at net_lr
    (mapping.py:55-58), with global-norm clipping (mapping.py:135)."""
    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "grid"
            if any(getattr(k, "key", None) == "table" for k in path)
            else "net",
            params)

    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.multi_transform(
            {"net": optax.adamw(net_lr, b1=0.9, b2=0.999, eps=1e-8,
                                weight_decay=0.01),
             "grid": optax.adamw(grid_lr, b1=0.9, b2=0.999, eps=1e-8,
                                 weight_decay=0.01)},
            label_fn),
    )
    return tx


class Mapper:
    def __init__(self, video, cfg: dict, params=None, seed: int = 0,
                 mesh=None):
        m = cfg["mapping"]
        # multi-device mesh: training steps shard the ray batch over it
        # (parallel/sharded_mapping.py), params/optimizer replicated
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None
        self.video = video
        self.cfg = cfg
        self.w_color = m["w_color_loss"]
        self.w_sdf = m["w_sdf_loss"]
        self.w_eik = m["w_eikonal_loss"]
        self.uncertainty = m["uncertainty_weight_loss"]
        self.window = m["mapping_window_size"]
        self.pixels = m["pixels"]
        self.iters = m["iters"]
        self.decay = m["decay"]

        mm = m["model"]
        self.model = InstantNeuS(
            d_out=mm["sdf_network"]["d_out"],
            d_hidden=mm["color_network"]["d_hidden"],
            n_layers=mm["color_network"]["n_layers"],
            init_val=mm["variance_network"]["init_val"],
            scale_factor=mm["variance_network"]["scale_factor"],
            sdf_truncation=mm["sdf_truncation"],
            sdf_sparse_factor=mm["sdf_sparse_factor"],
        )
        self.truncation = mm["sdf_truncation"]
        self.sparse_factor = mm["sdf_sparse_factor"]

        r = cfg["rendering"]
        self.n_samples = r["N_samples"]
        self.n_surface = r["N_surface"]
        self.perturb = r["perturb"]

        self.enable_ba = m.get("BA", False)
        self.ba_cam_lr = m.get("BA_cam_lr", 1e-3)

        self.key = jax.random.PRNGKey(seed)
        if params is None:
            k, self.key = jax.random.split(self.key)
            dummy = jnp.zeros((4, 3))
            zv = jnp.linspace(0.1, 1.0, 8)[None].repeat(4, 0)
            bound = jnp.asarray([[-1, 1], [-1, 1], [-1, 1]], jnp.float32)
            params = self.model.init(k, dummy, dummy, zv, zv, bound,
                                     bound)["params"]
        self.params = params
        self.tx = make_optimizer(m["net_lr"], m["grid_lr"])
        self.opt_state = self.tx.init(self.params)

        self.last_visit = 0
        self.init = True
        self.global_step = 0
        self.np_rng = np.random.default_rng(seed)

        self._train_step = self._build_train_step()
        self._train_step_ba = self._build_train_step_ba()
        if self.mesh is not None:
            from ..parallel.sharded_mapping import (
                make_sharded_map_step_from_cfg)
            # ray-sharded step, bit-comparable loss (global psum
            # normalizers); the camera-refinement (BA) step stays
            # single-device — its per-frame pose variables are tiny
            self._train_step_sharded = make_sharded_map_step_from_cfg(
                self.mesh, self)

    # ------------------------------------------------------------------
    def _build_train_step(self):
        model = self.model
        tx = self.tx
        w_color, w_sdf, w_eik = self.w_color, self.w_sdf, self.w_eik
        uncertainty = self.uncertainty
        trunc, sparse = self.truncation, self.sparse_factor
        n_samples, n_surface, perturb = (self.n_samples, self.n_surface,
                                         self.perturb)

        @jax.jit
        def step(params, opt_state, key, rays_o, rays_d, gt_color, gt_depth,
                 bound, realtime_bound):
            def loss_fn(p):
                ret = render_rays(model, p, key, rays_o, rays_d, gt_depth,
                                  bound, realtime_bound, n_samples,
                                  n_surface, perturb)
                valid = (gt_depth > 0).astype(jnp.float32)
                nv = jnp.maximum(valid.sum(), 1.0)

                color_l = (jnp.abs(ret["color"] - gt_color).mean(-1)
                           * valid).sum() / nv
                uw = 1.0 / jnp.sqrt(
                    jax.lax.stop_gradient(ret["depth_variance"][:, 0])
                    + 1e-10)
                if not uncertainty:
                    uw = jnp.ones_like(uw)
                depth_l = (jnp.abs(ret["depth"][:, 0] - gt_depth) * uw
                           * valid).sum() / nv

                sdf_l, front_l = compute_sdf_losses(
                    ret["sdf"], ret["z_vals"], gt_depth, trunc, sparse)
                eik_l = ret["gradient_error"].mean()

                total = (color_l * w_color + depth_l
                         + (sdf_l + front_l) * w_sdf + eik_l * w_eik)
                return total, {"color": color_l, "depth": depth_l,
                               "sdf": sdf_l, "eikonal": eik_l,
                               "total": total}

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return step

    # ------------------------------------------------------------------
    def _build_train_step_ba(self):
        """Joint map + camera refinement (mapping.py:173-194, 266-270):
        per-keyframe se(3) deltas are optimized alongside the scene model
        with a separate learning rate; rays are rebuilt inside the step so
        gradients reach the poses.  As in the reference, the refined poses
        only shape the map — they are not written back to the tracker."""
        from ..ops import lie as lie_ops

        model = self.model
        tx = self.tx
        cam_tx = optax.adam(self.ba_cam_lr)
        w_color, w_sdf, w_eik = self.w_color, self.w_sdf, self.w_eik
        uncertainty = self.uncertainty
        trunc, sparse = self.truncation, self.sparse_factor
        n_samples, n_surface, perturb = (self.n_samples, self.n_surface,
                                         self.perturb)

        @jax.jit
        def step(params, deltas, opt_state, cam_state, key, c2w_base,
                 frame_of_ray, dirs_cam, gt_color, gt_depth,
                 bound, realtime_bound):
            """c2w_base: [F, 7] base camera-to-world poses (lie 7-vec);
            deltas: [F, 6] se3 increments; frame_of_ray: [R] int;
            dirs_cam: [R, 3] camera-frame ray dirs."""
            def loss_fn(p, d):
                c2w = lie_ops.retr(c2w_base, d)
                Gr = c2w[frame_of_ray]
                rays_d = lie_ops.quat_rotate(Gr[:, 3:7], dirs_cam)
                rays_o = Gr[:, 0:3]
                ret = render_rays(model, p, key, rays_o, rays_d, gt_depth,
                                  bound, realtime_bound, n_samples,
                                  n_surface, perturb)
                valid = (gt_depth > 0).astype(jnp.float32)
                nv = jnp.maximum(valid.sum(), 1.0)
                color_l = (jnp.abs(ret["color"] - gt_color).mean(-1)
                           * valid).sum() / nv
                uw = 1.0 / jnp.sqrt(
                    jax.lax.stop_gradient(ret["depth_variance"][:, 0])
                    + 1e-10)
                if not uncertainty:
                    uw = jnp.ones_like(uw)
                depth_l = (jnp.abs(ret["depth"][:, 0] - gt_depth) * uw
                           * valid).sum() / nv
                sdf_l, front_l = compute_sdf_losses(
                    ret["sdf"], ret["z_vals"], gt_depth, trunc, sparse)
                eik_l = ret["gradient_error"].mean()
                total = (color_l * w_color + depth_l
                         + (sdf_l + front_l) * w_sdf + eik_l * w_eik)
                return total, {"total": total, "color": color_l,
                               "depth": depth_l, "sdf": sdf_l,
                               "eikonal": eik_l}

            (_, metrics), (gp, gd) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, deltas)
            up, opt_state = tx.update(gp, opt_state, params)
            params = optax.apply_updates(params, up)
            upd, cam_state = cam_tx.update(gd, cam_state, deltas)
            deltas = optax.apply_updates(deltas, upd)
            return params, deltas, opt_state, cam_state, metrics

        self._cam_tx = cam_tx
        return step

    # ------------------------------------------------------------------
    def _sample_pixels(self, frames: list, n_per_frame: int):
        """Masked pixel sampling returning per-ray (frame slot, camera-frame
        dir, gt color/depth) plus per-slot base c2w — for the BA step."""
        from ..ops import lie as lie_ops

        video = self.video
        H, W = video.ht, video.wd
        fx, fy, cx, cy = np.asarray(video.intrinsics) * video.device_scale
        dirs_cam = build_ray_dirs(H, W, fx, fy, cx, cy)

        c2w_base, fo, dc, gc, gd = [], [], [], [], []
        for slot, f in enumerate(frames):
            image, depth, c2w, _, mask = video.get_mapping_item(
                f, decay=self.decay)
            m = np.array(mask) > 0
            ys, xs = np.nonzero(m)
            if len(ys) == 0:
                continue
            sel = self.np_rng.integers(0, len(ys), n_per_frame)
            py = jnp.asarray(ys[sel])
            px = jnp.asarray(xs[sel])
            c2w_base.append(lie.from_matrix(jnp.asarray(c2w)))
            fo.append(jnp.full((n_per_frame,), len(c2w_base) - 1,
                               jnp.int32))
            dc.append(dirs_cam[py, px])
            gc.append(image[py, px])
            gd.append(depth[py, px])
        if not fo:
            return None
        return (jnp.stack(c2w_base), jnp.concatenate(fo),
                jnp.concatenate(dc), jnp.concatenate(gc),
                jnp.concatenate(gd))

    def _optimize_ba(self, frames, n_per_frame, bound, realtime_bound,
                     iters: int):
        """Visit-phase optimization with camera refinement."""
        from ..utils.shapes import bucket as _bucket

        F = _bucket(len(frames), (8, 16, 24, 32, 48, 64))
        deltas = jnp.zeros((F, 6), jnp.float32)
        cam_state = self._cam_tx.init(deltas)
        metrics = None
        for _ in range(iters):
            out = self._sample_pixels(frames, n_per_frame)
            if out is None:
                return None
            c2w_base, fo, dc, gc, gd = out
            if c2w_base.shape[0] < F:   # pad frame slots
                pad = F - c2w_base.shape[0]
                c2w_base = jnp.concatenate(
                    [c2w_base, jnp.tile(lie.identity(), (pad, 1))])
            R = fo.shape[0]
            Rb = bucket(R)
            if Rb != R:
                pad = Rb - R
                fo = jnp.concatenate([fo, fo[:pad]])
                dc = jnp.concatenate([dc, dc[:pad]])
                gc = jnp.concatenate([gc, gc[:pad]])
                gd = jnp.concatenate([gd, jnp.zeros(pad, gd.dtype)])
            self.global_step += 1
            self.key, k = jax.random.split(self.key)
            (self.params, deltas, self.opt_state, cam_state,
             metrics) = self._train_step_ba(
                self.params, deltas, self.opt_state, cam_state, k,
                c2w_base, fo, dc, gc, gd, bound, realtime_bound)
        return metrics

    # ------------------------------------------------------------------
    def _sample_rays(self, frames: list, n_per_frame: int):
        """Masked ray sampling over the given keyframes — one jitted
        dispatch with device RNG (see _sample_rays_kernel); the whole
        window's ray batch never touches the host."""
        if not frames:
            return None
        video = self.video
        F = bucket(len(frames), (2, 4, 8, 16, 24, 32, 48, 64))
        fr = np.full(F, -1, np.int32)
        fr[:len(frames)] = frames
        # keyframe access decays its update priority, once per access,
        # duplicates included (DepthVideo.get_mapping_item semantics)
        for f in frames:
            video.update_priority[f] *= self.decay

        self.key, k = jax.random.split(self.key)
        return _sample_rays_kernel(
            k, jnp.asarray(fr), video.images, video.disps_filtered,
            video.mask_filtered, video.poses_filtered,
            video.pose_compensate, video.intrinsics,
            n_per=n_per_frame, scale=video.device_scale)

    def _optimize(self, batch, bound, realtime_bound, iters: int):
        rays_o, rays_d, gt_color, gt_depth = batch
        # pad ray count to a bucket so the train step compiles once
        R = rays_o.shape[0]
        Rb = bucket(R)
        if Rb != R:
            pad = Rb - R
            rays_o = jnp.concatenate([rays_o, rays_o[:pad]])
            rays_d = jnp.concatenate([rays_d, rays_d[:pad]])
            gt_color = jnp.concatenate([gt_color, gt_color[:pad]])
            gt_depth = jnp.concatenate(
                [gt_depth, jnp.zeros(pad, gt_depth.dtype)])

        if self.mesh is not None:
            from ..parallel.sharded_mapping import shard_rays
            rays_o, rays_d, gt_color, gt_depth = shard_rays(
                int(self.mesh.devices.size), rays_o, rays_d, gt_color,
                gt_depth)
            step = self._train_step_sharded
        else:
            step = self._train_step

        metrics = None
        for _ in range(iters):
            self.global_step += 1
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, metrics = step(
                self.params, self.opt_state, k, rays_o, rays_d, gt_color,
                gt_depth, bound, realtime_bound)
        return metrics

    # ------------------------------------------------------------------
    def __call__(self, the_end: bool = False):
        """One mapping round (mapping.py:151-301)."""
        video = self.video
        cur = video.filtered_id
        if cur <= 1:
            return None

        iters = self.iters * (10 if the_end else 1)
        bound = jnp.asarray(video.bound, jnp.float32)
        realtime_bound = bound

        unvisit = list(range(self.last_visit, cur))
        visit = [cur - 1, cur - 2]
        if self.last_visit > 0:
            prio = video.update_priority[:self.last_visit]
            order = np.argsort(-prio)
            visit += order[:10].tolist()
            n_rand = max(self.window - 12, 0)
            if n_rand and self.last_visit > 1:
                visit += self.np_rng.integers(
                    0, self.last_visit, n_rand).tolist()
        visit = [int(v) for v in visit if 0 <= v < cur]

        metrics = None
        # unvisited burst (x10 at init / per new frames)
        if len(unvisit) > 2:
            self.last_visit = cur
            factor = iters * 10 if self.init else iters
            n_per = max(self.pixels // min(len(unvisit), self.window), 1)
            for _ in range(factor):
                sub = self.np_rng.choice(
                    unvisit, min(self.window, len(unvisit)), replace=True)
                batch = self._sample_rays([int(s) for s in sub], n_per)
                if batch is None or batch[0].shape[0] < 100:
                    continue
                metrics = self._optimize(batch, bound, realtime_bound, 1)

        # revisit window — with optional joint camera refinement
        n_per = max(self.pixels // max(len(visit), 1), 1)
        if self.enable_ba and self.last_visit >= 10 and visit:
            metrics = self._optimize_ba(visit, n_per, bound,
                                        realtime_bound, iters) or metrics
        else:
            for _ in range(iters):
                batch = self._sample_rays(visit, n_per)
                if batch is None or batch[0].shape[0] < 100:
                    continue
                metrics = self._optimize(batch, bound, realtime_bound, 1)

        self.init = False
        return metrics
