"""Pose trajectory filler — interpolate + refine non-keyframe poses.

Re-design of /root/reference/src/trajectory_filler.py: at termination,
every input frame that was not kept as a keyframe gets a pose by geodesic
interpolation between its bracketing keyframes, refined with 6 motion-only
update iterations against those keyframes (edges keyframe -> frame so the
keyframes' known disparities drive the reprojection).
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..ops import lie
from .factor_graph import FactorGraph
from .motion_filter import IMAGENET_MEAN, IMAGENET_STD
from .video import VideoBuffer


class TrajectoryFiller:
    def __init__(self, params, video: VideoBuffer, motion_filter,
                 batch: int = 16):
        self.params = params
        self.video = video
        self.batch = batch
        # reuse the motion filter's jitted feature encoder
        self._encode = motion_filter._encode

    def _fill_batch(self, timestamps, images, intrinsics):
        video = self.video
        N = video.counter
        M = len(timestamps)
        assert N + M <= video.buffer, (
            "keyframe buffer too small for trajectory filling; raise "
            "tracking.buffer")

        ts = np.asarray(video.timestamp[:N])
        tt = np.asarray(timestamps, np.float32)

        # bracketing keyframes (trajectory_filler.py:46-47)
        t0 = np.asarray([max(0, int((ts <= t).sum()) - 1) for t in tt])
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        dt = ts[t1] - ts[t0] + 1e-3
        w = (tt - ts[t0]) / dt
        G0 = video.poses[jnp.asarray(t0)]
        G1 = video.poses[jnp.asarray(t1)]
        Gs = lie.interp(G0, G1, jnp.asarray(w, jnp.float32))

        # temporarily append the frames (trajectory_filler.py:61-63)
        fmaps = self._encode(self.params, jnp.stack(images))  # [M,rig?..]
        zeros_ctx = jnp.zeros((video.h8, video.w8, 128), jnp.bfloat16)
        for k in range(M):
            video.append(float(tt[k]), images[k], Gs[k], 1.0, None,
                         jnp.asarray(intrinsics[k]) / video.device_scale,
                         fmaps[k][None], zeros_ctx, zeros_ctx)

        graph = FactorGraph(video, self.params, max_factors=2 * self.batch + 8,
                            corr_impl="volume", inac_capacity=-1)
        graph.add_factors(t0, np.arange(N, N + M))
        graph.add_factors(t1, np.arange(N, N + M))

        for _ in range(6):
            graph.update(t0=N, t1=N + M, motion_only=True)

        out = np.array(video.poses[N:N + M])
        video.counter = N
        return out

    def __call__(self, stream) -> np.ndarray:
        """stream yields (timestamp, image [rig,ht,wd,3], depth, intrinsics,
        gt_pose).  Returns [n_frames, 7] w2c poses for every input frame."""
        poses: List[np.ndarray] = []
        ts_b, im_b, intr_b = [], [], []

        for (timestamp, image, depth, intrinsics, gt_pose) in stream:
            ts_b.append(timestamp)
            im_b.append(image[0])
            intr_b.append(intrinsics)
            if len(ts_b) == self.batch:
                poses.append(self._fill_batch(ts_b, im_b, intr_b))
                ts_b, im_b, intr_b = [], [], []

        if ts_b:
            poses.append(self._fill_batch(ts_b, im_b, intr_b))
        return np.concatenate(poses, axis=0)
