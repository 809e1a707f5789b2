"""Frontend — local windowed BA with keyframe management.

Host-side orchestration mirroring /root/reference/src/frontend.py: the
system initializes after `warmup` keyframes with neighborhood+proximity
edges and 8+8 update iterations; afterwards every new keyframe triggers
age-pruning, proximity edge proposal, iters1 update steps, a
keyframe-distance test (removing redundant keyframes), and either loop
closing (delegated to Backend.loop_ba) or iters2 more update steps.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

import functools

import jax

from ..utils import rowops
from .factor_graph import FactorGraph, _resolve_dtype
from .video import VideoBuffer


@jax.jit
def _seed_disp_window_mean(disps, t1):
    """disps[t1] = mean(disps[t1-4:t1]) with traced t1
    (frontend.py:121)."""
    t1 = jnp.asarray(t1)
    win = jax.lax.dynamic_slice_in_dim(disps, t1 - 4, 4)
    return disps.at[t1].set(win.mean(axis=0))


@jax.jit
def _seed_disp_prev_mean(disps, t1):
    """disps[t1] = mean(disps[t1-1]) (frontend.py:95)."""
    t1 = jnp.asarray(t1)
    return disps.at[t1].set(disps[t1 - 1].mean())


@jax.jit
def _seed_disp_from_sensor(disps, disps_sens, t):
    """Prefer sensor disparity for the newest keyframe
    (frontend.py:62-64)."""
    t = jnp.asarray(t)
    d = jnp.where(disps_sens[t] > 0, disps_sens[t], disps[t])
    return disps.at[t].set(d)


class Frontend:
    def __init__(self, params, video: VideoBuffer, cfg: dict,
                 loop_closing=None):
        t = cfg["tracking"]
        self.video = video
        self.warmup = t["warmup"]
        self.beta = t["beta"]
        self.max_age = 25
        self.iters1 = 4
        self.iters2 = 2

        f = t["frontend"]
        self.keyframe_thresh = f["keyframe_thresh"]
        self.frontend_window = f["window"]
        self.frontend_thresh = f["thresh"]
        self.frontend_radius = f["radius"]
        self.frontend_nms = f["nms"]
        self.enable_loop = f.get("enable_loop", False)
        self.loop_closing = loop_closing
        self.last_loop_t = -1

        self.graph = FactorGraph(
            video, params, max_factors=f["max_factors"],
            corr_impl="volume", upsample=t.get("upsample", False),
            inac_capacity=2 * f["max_factors"],
            compute_dtype=_resolve_dtype(t.get("compute_dtype")))

        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0

    # ------------------------------------------------------------------
    def __call__(self):
        if not self.is_initialized and self.video.counter == self.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._update()

    # ------------------------------------------------------------------
    def _initialize(self):
        """frontend.py:100-134."""
        self.t0 = 0
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        for _ in range(8):
            self.graph.update(t0=1, use_inactive=True)

        self.graph.add_proximity_factors(t0=0, t1=0, rad=2, nms=2,
                                         thresh=self.frontend_thresh,
                                         remove=False)
        for _ in range(8):
            self.graph.update(t0=1, use_inactive=True)

        self.video.set_pose(self.t1, rowops.get_row(self.video.poses,
                                                    self.t1 - 1))
        self.video.disps = _seed_disp_window_mean(
            self.video.disps, self.t1)

        self.is_initialized = True
        self.video.ready = True
        self.video.dirty[:self.t1] = True
        self.graph.rm_factors(
            self.graph.valid & (self.graph.ii < self.warmup - 4), store=True)

    # ------------------------------------------------------------------
    def _update(self):
        """frontend.py:48-98."""
        self.count += 1
        self.t1 += 1

        self.graph.rm_factors(
            self.graph.valid & (self.graph.age > self.max_age), store=True)

        self.graph.add_proximity_factors(
            max(self.t1 - 5, 0), max(self.t1 - self.frontend_window, 0),
            rad=self.frontend_radius, nms=self.frontend_nms,
            thresh=self.frontend_thresh, beta=self.beta, remove=True)

        # seed the new keyframe's disparity from sensor depth where present
        self.video.disps = _seed_disp_from_sensor(
            self.video.disps, self.video.disps_sens, self.t1 - 1)

        for _ in range(self.iters1):
            self.graph.update(use_inactive=True)

        d = float(self.video.distance([self.t1 - 3], [self.t1 - 2],
                                      beta=self.beta)[0])

        if d < self.keyframe_thresh:
            self.graph.rm_keyframe(self.t1 - 2)
            self.t1 -= 1
        else:
            cur_t = self.video.counter
            if self.enable_loop and self.loop_closing is not None \
                    and cur_t > self.frontend_window:
                self.loop_closing.loop_ba(
                    t_start=0, t_end=cur_t, steps=self.iters2,
                    motion_only=False, local_graph=self.graph)
                self.last_loop_t = cur_t
            else:
                for _ in range(self.iters2):
                    self.graph.update(use_inactive=True)

        # extrapolate the next pose (frontend.py:94-95)
        self.video.set_pose(self.t1, rowops.get_row(self.video.poses,
                                                    self.t1 - 1))
        self.video.disps = _seed_disp_prev_mean(self.video.disps, self.t1)
