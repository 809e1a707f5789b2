"""Multiview consistency filter — feeds the mapper clean depths + bounds.

Re-design of /root/reference/src/multiview_filter.py: full-resolution
upsampled depths are cross-checked against 6 neighbouring keyframes
(depth agreement < thresh), masked, and used to derive the scene bound;
per-keyframe update priorities grow with pose change (BundleFusion-style
translation+euler metric).  All heavy work is jitted; the bound and
bookkeeping stay on host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie, projective
from ..utils.shapes import bucket
from .video import VideoBuffer


def pose_priority_dist(q0, q1):
    """BundleFusion Sec. 5.3 pose-change metric: L1 translation + 2x L1
    euler-angle difference (multiview_filter.py:28-61)."""
    def to_euler(p):
        tx, ty, tz = p[..., 0], p[..., 1], p[..., 2]
        x, y, z, w = p[..., 3], p[..., 4], p[..., 5], p[..., 6]
        roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
        pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1, 1))
        yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
        return jnp.stack([tx, ty, tz, roll, pitch, yaw], -1)

    d = jnp.abs(to_euler(q0) - to_euler(q1))
    return d[..., :3].sum(-1) + 2.0 * d[..., 3:].sum(-1)


@functools.partial(jax.jit, static_argnames=("T", "visible_num"))
def _filter_kernel(T, visible_num, poses, disps_up, intrinsics_full,
                   pose_compensate, thresh):
    """counts + masks + world points for keyframes [0, T)."""
    counts = projective.depth_consistency_count(
        poses, disps_up, intrinsics_full, thresh)
    mean_disp = disps_up.mean(axis=(1, 2), keepdims=True)
    masks = (counts >= visible_num) & (disps_up > 0.01 * mean_disp)

    c2w = lie.compose(pose_compensate[None], lie.inv(poses))
    pts = projective.iproj_world(
        lie.inv(c2w), disps_up, intrinsics_full)     # [T, ht, wd, 3]
    return masks, pts


class MultiviewFilter:
    def __init__(self, video: VideoBuffer, cfg: dict, warmup: int = 8):
        mv = cfg["tracking"]["multiview_filter"]
        self.video = video
        self.thresh = mv["thresh"]
        self.visible_num = mv["visible_num"]
        self.kernel_size = mv["kernel_size"]
        self.bound_enlarge = mv["bound_enlarge_scale"]
        self.warmup = warmup
        # the reference always feeds *upsampled* disps to this filter
        # (multiview_filter.py:105, upsample defaults True whenever
        # mapping runs); when tracking.upsample is off, fall back to a
        # bilinear resize of the 1/8-res disps so the filter still
        # publishes masks/bounds for the mapper
        self.use_upsampled = bool(cfg["tracking"].get("upsample", True))

    def __call__(self) -> bool:
        """Run one filter pass; returns True if new filtered state was
        published (multiview_filter.py:98-170)."""
        video = self.video
        cur_t = video.counter
        if video.filtered_id >= cur_t or cur_t <= self.warmup:
            return False

        T = bucket(cur_t)
        intr_full = video.intrinsics * video.device_scale

        if self.use_upsampled:
            disps_full = video.disps_up[:T]
        else:
            disps_full = jax.image.resize(
                video.disps[:T], (T, video.ht, video.wd), "bilinear")
        masks, pts = _filter_kernel(
            T, self.visible_num,
            video.poses[:T], disps_full, intr_full,
            video.pose_compensate, self.thresh)
        masks = np.array(masks[:cur_t])
        pts = np.asarray(pts[:cur_t])

        if masks.sum() < 100:
            return False

        sel = pts.reshape(-1, 3)[masks.reshape(-1)]
        bound = self._bound_from_points(sel)

        masks_ext = self._extend_masks(masks)
        if masks_ext.sum() < 100:
            return False
        sel = pts.reshape(-1, 3)[masks_ext.reshape(-1)]
        inb = ((sel > bound[:, 0]) & (sel < bound[:, 1])).all(axis=-1)
        masks_ext.reshape(-1)[np.where(masks_ext.reshape(-1))[0][~inb]] = False

        sel = pts.reshape(-1, 3)[masks_ext.reshape(-1)]
        bound = self._bound_from_points(sel, self.bound_enlarge)

        prio = np.asarray(pose_priority_dist(
            video.poses_filtered[:cur_t], video.poses[:cur_t]))

        # publish (multiview_filter.py:153-159)
        video.update_priority[:cur_t] += prio
        video.mask_filtered = video.mask_filtered.at[:cur_t].set(
            jnp.asarray(masks_ext, jnp.float32))
        video.disps_filtered = video.disps_filtered.at[:cur_t].set(
            jnp.asarray(disps_full[:cur_t]))
        video.poses_filtered = video.poses_filtered.at[:cur_t].set(
            video.poses[:cur_t])
        video.filtered_id = cur_t
        video.bound = bound
        return True

    def _bound_from_points(self, pts: np.ndarray,
                           enlarge: float = 1.0) -> np.ndarray:
        bound = np.stack([pts.min(0), pts.max(0)], axis=-1)
        edge = (bound[:, 1] - bound[:, 0]) * (enlarge - 1.0) / 2.0
        bound[:, 0] -= edge
        bound[:, 1] += edge
        return bound.astype(np.float32)

    def _extend_masks(self, masks: np.ndarray) -> np.ndarray:
        k = self.kernel_size
        if isinstance(k, str) and k == "inf":
            return np.ones_like(masks)
        k = int(k)
        if k < 2:
            return masks
        k = (k // 2) * 2 + 1
        from scipy.ndimage import maximum_filter

        return np.stack([
            maximum_filter(m.astype(np.float32), size=k) > 0 for m in masks
        ])
