"""SLAMSystem — single-program orchestrator.

Re-design of the reference's 6-process architecture (/root/reference/src/
slam.py:373-390: tracking / optimizing / multiview-filter / mapping /
meshing / visualizing processes with shared CUDA memory and spin-locks):
on TPU a single process interleaves jitted steps over one device-resident
state, preserving the observable schedule:

  per frame:    motion filter -> frontend (+ in-frontend loop closing)
  periodically: global dense BA (the reference's `optimizing` process)
  periodically: multiview filter -> mapper iterations
  at the end:   final global BA x2, trajectory fill, ATE eval, mesh

The reference already serializes BA phases with ba_locks (depth_video.py:
21-24) — a deterministic interleave is behavior-preserving and makes runs
reproducible.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import default_config
from .models.droidnet import DroidNet
from .ops import lie
from .tracking.backend import Backend
from .tracking.frontend import Frontend
from .tracking.motion_filter import MotionFilter
from .tracking.video import VideoBuffer


def init_params(seed: int = 0, ht: int = 64, wd: int = 96):
    """Random-initialized DroidNet params (droid.pth absent from the
    reference snapshot — see models/convert.py for the checkpoint path)."""
    model = DroidNet(num_frames=8)
    rng = jax.random.PRNGKey(seed)
    img = jnp.zeros((1, ht, wd, 3), jnp.float32)
    variables = model.init(rng, img)
    return variables["params"]


@dataclasses.dataclass
class TrackingResult:
    poses_w2c: np.ndarray          # [N, 7] keyframe poses
    timestamps: np.ndarray         # [N]
    n_keyframes: int


class SLAMSystem:
    def __init__(self, cfg: Optional[dict] = None, params=None,
                 mapper=None):
        self.cfg = cfg or default_config()
        cam = self.cfg["cam"]
        tr = self.cfg["tracking"]

        self.mode = self.cfg.get("mode", "mono")
        stereo = self.mode == "stereo"

        self.video = VideoBuffer(
            buffer=tr["buffer"], ht=cam["H_out"], wd=cam["W_out"],
            stereo=stereo)

        if params is None:
            params = init_params(ht=cam["H_out"], wd=cam["W_out"])
        self.params = params

        self.motion_filter = MotionFilter(
            params, self.video, thresh=tr["motion_filter"]["thresh"])
        self.backend = Backend(params, self.video, self.cfg)
        self.frontend = Frontend(params, self.video, self.cfg,
                                 loop_closing=self.backend)
        self.mapper = mapper

        # global-BA cadence: the reference's `optimizing` process loops
        # continuously; we trigger every N accepted keyframes
        self.global_ba_every = tr.get("global_ba_every", 10)
        self._kf_since_ba = 0
        self.frame_count = 0

    # ------------------------------------------------------------------
    def track(self, timestamp, image, depth=None, intrinsics=None,
              gt_pose=None):
        """Feed one frame (image [rig, ht, wd, 3] in [0,1])."""
        self.frame_count += 1
        is_kf = self.motion_filter.track(timestamp, image, depth,
                                         intrinsics, gt_pose)
        self.frontend()

        if is_kf and self.frontend.is_initialized:
            self._kf_since_ba += 1
            if (self.global_ba_every > 0
                    and self._kf_since_ba >= self.global_ba_every):
                self._kf_since_ba = 0
                self.backend.dense_ba(0, self.video.counter, steps=2)
        return is_kf

    # ------------------------------------------------------------------
    def finalize_tracking(self, final_steps: int = 6):
        """Final global BA passes (slam.py:236-241 runs dense_ba twice when
        tracking ends)."""
        n = self.video.counter
        if n > 2 and self.frontend.is_initialized:
            self.backend.dense_ba(0, n, steps=final_steps)
            self.backend.dense_ba(0, n, steps=final_steps)
        return TrackingResult(
            poses_w2c=np.asarray(self.video.poses[:n]),
            timestamps=np.asarray(self.video.timestamp[:n]),
            n_keyframes=n,
        )

    # ------------------------------------------------------------------
    def keyframe_c2w(self):
        """Keyframe camera-to-world matrices [N, 4, 4]."""
        n = self.video.counter
        return np.asarray(lie.matrix(lie.inv(self.video.poses[:n])))
