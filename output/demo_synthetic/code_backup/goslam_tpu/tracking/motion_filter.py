"""Keyframe admission by optical-flow magnitude.

Re-design of /root/reference/src/motion_filter.py: per incoming frame,
encode matching features, estimate flow against the last keyframe with a
single update-operator iteration at zero flow, and admit the frame as a
keyframe when the mean predicted flow exceeds a threshold (default 4 px,
configs/go_slam.yaml:52).

All device work is two jitted closures (encode, flow-magnitude); the
admit/reject branch is host logic, as in the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.droidnet import BasicEncoder, UpdateModule
from ..ops import corr, lie, projective
from .video import VideoBuffer

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


class MotionFilter:
    def __init__(self, params, video: VideoBuffer, thresh: float = 4.0):
        self.params = params
        self.video = video
        self.thresh = thresh
        self.count = 0

        self.fnet = BasicEncoder(128, "instance")
        self.cnet = BasicEncoder(256, "none")
        self.update = UpdateModule(num_frames=0)

        # rolling context of the last keyframe
        self.net = None
        self.inp = None
        self.fmap = None

        @jax.jit
        def _encode(params, images):
            """images [rig, ht, wd, 3] in [0,1] -> fmap [rig, h8, w8, 128]."""
            x = (images - IMAGENET_MEAN) / IMAGENET_STD
            return self.fnet.apply({"params": params["fnet"]}, x)

        @jax.jit
        def _context(params, image):
            """image [1, ht, wd, 3] -> (net, inp) [1, h8, w8, 128]."""
            x = (image - IMAGENET_MEAN) / IMAGENET_STD
            ctx = self.cnet.apply({"params": params["cnet"]}, x)
            net, inp = jnp.split(ctx, 2, axis=-1)
            return jnp.tanh(net), jax.nn.relu(inp)

        @jax.jit
        def _flow_mag(params, fmap_prev, fmap_new, net, inp):
            """Mean |delta| of one update iteration at zero flow
            (motion_filter.py:66-75)."""
            pyr = corr.build_pyramid(fmap_prev[None], fmap_new[None])
            h8, w8 = fmap_prev.shape[0], fmap_prev.shape[1]
            coords0 = projective.coords_grid(h8, w8)[None]
            c = corr.lookup(pyr, coords0)
            _, delta, _ = self.update.apply(
                {"params": params["update"]}, net, inp, c)
            return jnp.mean(jnp.linalg.norm(delta, axis=-1))

        self._encode = _encode
        self._context = _context
        self._flow_mag = _flow_mag

    def track(self, timestamp, image, depth=None, intrinsics=None,
              gt_pose=None):
        """Process one frame. image: [rig, ht, wd, 3] in [0,1]
        (rig=2 for stereo); depth: [ht, wd] or None.

        Returns True if the frame was admitted as a keyframe.
        """
        s = float(self.video.device_scale)
        gmap = self._encode(self.params, image)

        if self.video.counter == 0:
            net, inp = self._context(self.params, image[:1])
            self.net, self.inp, self.fmap = net, inp, gmap
            self.video.append(timestamp, image[0], lie.identity(), 1.0,
                              depth, jnp.asarray(intrinsics) / s, gmap,
                              net[0], inp[0], gt_pose)
            return True

        mag = float(self._flow_mag(self.params, self.fmap[0], gmap[0],
                                   self.net, self.inp))
        if mag > self.thresh:
            self.count = 0
            net, inp = self._context(self.params, image[:1])
            self.net, self.inp, self.fmap = net, inp, gmap
            self.video.append(timestamp, image[0], None, None, depth,
                              jnp.asarray(intrinsics) / s, gmap,
                              net[0], inp[0], gt_pose)
            return True

        self.count += 1
        return False
