"""VideoBuffer — the device-resident per-keyframe state store.

TPU re-design of the reference's DepthVideo (/root/reference/src/depth_video.py):
the shared-memory CUDA tensors + mp.Value locks become plain preallocated
device arrays owned by a single process; every mutation is a functional
``.at[].set`` so all consumers see consistent snapshots and the whole store
is trivially checkpointable as one pytree.

Compile discipline: all mutations take the keyframe index as a *traced*
scalar (one compile per array shape, not per index), appends are a single
fused kernel, and distance queries run through capacity-bucketed jitted
kernels.

Layout notes (all NHWC / channels-last, bf16 for network features):
  * poses are w2c 7-vectors [tx ty tz qx qy qz qw], identity-initialized
    (depth_video.py:43,57)
  * disps live at 1/8 resolution, mean-initialized to 1 (depth_video.py:45)
  * sensor depth is subsampled at pixel centers [3::8, 3::8]
    (depth_video.py:101-103)
  * fmaps carry a rig dim (1 mono / 2 stereo) (depth_video.py:52)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie, projective
from ..utils import rowops
from ..utils.shapes import bucket

_SHIFT_FIELDS = ("timestamp", "images", "poses", "poses_gt", "disps",
                 "disps_sens", "depths_gt", "disps_up", "fmaps", "nets",
                 "inps", "damping", "poses_filtered", "disps_filtered",
                 "mask_filtered")


@functools.partial(jax.jit, static_argnames=("scale", "has_pose", "has_disp",
                                             "has_depth", "has_gt"))
def _append_kernel(scale, has_pose, has_disp, has_depth, has_gt,
                   state, ix, timestamp, image, pose, disp, depth, fmap,
                   net, inp, gt_pose):
    """Fused single-keyframe write; ix is traced."""
    (timestamps, images, poses, disps, disps_sens, depths_gt, fmaps, nets,
     inps, poses_gt) = state
    ix = jnp.asarray(ix)
    timestamps = timestamps.at[ix].set(timestamp)
    images = images.at[ix].set(image)
    if has_pose:
        poses = poses.at[ix].set(pose)
    if has_disp:
        disps = disps.at[ix].set(disp)
    if has_depth:
        depths_gt = depths_gt.at[ix].set(depth)
        sub = depth[scale // 2 - 1::scale, scale // 2 - 1::scale]
        dsens = jnp.where(sub > 0, 1.0 / jnp.where(sub > 0, sub, 1.0), 0.0)
        disps_sens = disps_sens.at[ix].set(dsens)
        disps = disps.at[ix].set(jnp.where(dsens > 0, dsens, disps[ix]))
    if has_gt:
        poses_gt = poses_gt.at[ix].set(gt_pose)
    fmaps = fmaps.at[ix].set(fmap.astype(jnp.bfloat16))
    nets = nets.at[ix].set(net.astype(jnp.bfloat16))
    inps = inps.at[ix].set(inp.astype(jnp.bfloat16))
    return (timestamps, images, poses, disps, disps_sens, depths_gt, fmaps,
            nets, inps, poses_gt)


@jax.jit
def _distance_pairs_kernel(poses, disps, intrinsics, ii, jj, beta):
    d1 = projective.frame_distance(poses, disps, intrinsics, ii, jj, beta)
    d2 = projective.frame_distance(poses, disps, intrinsics, jj, ii, beta)
    return 0.5 * (d1 + d2)


@jax.jit
def _distance_pairs_oneway(poses, disps, intrinsics, ii, jj, beta):
    return projective.frame_distance(poses, disps, intrinsics, ii, jj, beta)


@functools.partial(jax.jit, static_argnames=("bidirectional",))
def _distance_pairs_big(poses, disps, intrinsics, ii, jj, beta,
                        bidirectional=True):
    """Huge pair sets (full n x n proposal at thousands of keyframes):
    ii/jj arrive as [C, chunk] and a device-side lax.map walks the chunks
    inside ONE jitted program — no per-chunk dispatch (tunnel) cost and
    bounded transient memory."""
    def one(e):
        i, j = e
        d = projective.frame_distance(poses, disps, intrinsics, i, j, beta)
        if bidirectional:
            d = 0.5 * (d + projective.frame_distance(
                poses, disps, intrinsics, j, i, beta))
        return d
    return jax.lax.map(one, (ii, jj))


@jax.jit
def _normalize_kernel(poses, disps, count_mask):
    """Mean-disparity normalization over the first `n` frames
    (count_mask: [B] 1.0 for frames < n)."""
    m = count_mask
    s = (disps * m[:, None, None]).sum() / jnp.maximum(
        m.sum() * disps.shape[1] * disps.shape[2], 1.0)
    disps = jnp.where(m[:, None, None] > 0, disps / s, disps)
    poses = poses.at[:, :3].multiply(jnp.where(m > 0, s, 1.0)[:, None])
    return poses, disps


@dataclasses.dataclass
class VideoBuffer:
    """Preallocated keyframe store of capacity ``buffer``.

    Host-side bookkeeping (counter) is a plain int — keyframe admission is
    inherently sequential host logic; all array state lives on device.
    """
    buffer: int
    ht: int
    wd: int
    stereo: bool = False
    device_scale: int = 8

    def __post_init__(self):
        B = self.buffer
        ht, wd = self.ht, self.wd
        s = self.device_scale
        h8, w8 = ht // s, wd // s
        rig = 2 if self.stereo else 1

        self.counter = 0
        self.ready = False
        self.has_gt = False     # set on first appended gt pose

        f32 = jnp.float32
        self.timestamp = jnp.zeros((B,), f32)
        self.images = jnp.zeros((B, ht, wd, 3), f32)
        self.dirty = np.zeros((B,), bool)
        self.poses = jnp.tile(lie.identity(), (B, 1))
        self.poses_gt = jnp.tile(jnp.eye(4, dtype=f32), (B, 1, 1))
        self.disps = jnp.ones((B, h8, w8), f32)
        self.disps_sens = jnp.zeros((B, h8, w8), f32)
        self.depths_gt = jnp.zeros((B, ht, wd), f32)
        self.disps_up = jnp.zeros((B, ht, wd), f32)
        self.intrinsics = jnp.zeros((4,), f32)          # shared, 1/8 scale

        self.fmaps = jnp.zeros((B, rig, h8, w8, 128), jnp.bfloat16)
        self.nets = jnp.zeros((B, h8, w8, 128), jnp.bfloat16)
        self.inps = jnp.zeros((B, h8, w8, 128), jnp.bfloat16)

        # per-frame GRU damping state (factor_graph.py:30)
        self.damping = jnp.full((B, h8, w8), 1e-6, f32)

        # multiview-filtered outputs for mapping (depth_video.py:61-67)
        self.poses_filtered = jnp.tile(lie.identity(), (B, 1))
        self.disps_filtered = jnp.zeros((B, ht, wd), f32)
        self.mask_filtered = jnp.zeros((B, ht, wd), f32)
        self.filtered_id = -1
        self.update_priority = np.zeros((B,), np.float32)
        self.bound = np.zeros((3, 2), np.float32)
        self.pose_compensate = lie.identity()

        self.h8, self.w8, self.rig = h8, w8, rig

    # ------------------------------------------------------------------
    # keyframe admission
    # ------------------------------------------------------------------
    def append(self, timestamp, image, pose, disp, depth, intrinsics, fmap,
               net, inp, gt_pose=None):
        """Write a new keyframe at the current counter (DepthVideo.append).

        image: [ht, wd, 3]; depth: [ht, wd] or None; fmap: [rig, h8, w8, 128];
        pose/disp may be None to keep defaults; disp may be a scalar.
        """
        ix = self.counter
        if gt_pose is not None:
            self.has_gt = True
        if intrinsics is not None:
            self.intrinsics = jnp.asarray(intrinsics, jnp.float32)

        zero = jnp.zeros(())
        disp_arr = None
        if disp is not None:
            disp_arr = jnp.broadcast_to(
                jnp.asarray(disp, jnp.float32), (self.h8, self.w8))

        state = (self.timestamp, self.images, self.poses, self.disps,
                 self.disps_sens, self.depths_gt, self.fmaps, self.nets,
                 self.inps, self.poses_gt)
        state = _append_kernel(
            self.device_scale, pose is not None, disp is not None,
            depth is not None, gt_pose is not None,
            state, ix, jnp.asarray(timestamp, jnp.float32), image,
            pose if pose is not None else zero,
            disp_arr if disp_arr is not None else zero,
            depth if depth is not None else zero,
            fmap, net, inp,
            gt_pose if gt_pose is not None else zero)
        (self.timestamp, self.images, self.poses, self.disps,
         self.disps_sens, self.depths_gt, self.fmaps, self.nets,
         self.inps, self.poses_gt) = state
        self.counter = ix + 1

    def remove_keyframe(self, ix: int):
        """Shift all state down by one from ix (FactorGraph.rm_keyframe's
        video half, factor_graph.py:161-181) — traced-index gather."""
        for name in _SHIFT_FIELDS:
            setattr(self, name, rowops.shift_down(getattr(self, name), ix))
        self.update_priority[ix:-1] = self.update_priority[ix + 1:]
        self.counter -= 1

    def set_pose(self, ix, pose):
        self.poses = rowops.set_row(self.poses, ix, pose)

    def set_disp(self, ix, disp):
        disp = jnp.broadcast_to(jnp.asarray(disp, jnp.float32),
                                (self.h8, self.w8))
        self.disps = rowops.set_row(self.disps, ix, disp)

    # ------------------------------------------------------------------
    # geometric ops (thin wrappers over ops.projective)
    # ------------------------------------------------------------------
    def reproject(self, ii, jj):
        """[E, h8, w8, 2] coords of frames ii reprojected into jj."""
        return projective.transform(self.poses, self.disps, self.intrinsics,
                                    jnp.asarray(ii), jnp.asarray(jj))

    def distance(self, ii, jj, beta=0.3, bidirectional=True):
        """Frame-distance metric over index pairs (DepthVideo.distance);
        pair count is bucketed so each bucket compiles once."""
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        n = len(ii)
        if n > 4096:
            # full-sequence proposals (backend at thousands of keyframes):
            # chunk the pair set inside one jitted program
            CH = 4096
            C = (n + CH - 1) // CH
            ii_p = np.zeros(C * CH, np.int64)
            jj_p = np.zeros(C * CH, np.int64)
            ii_p[:n] = ii
            jj_p[:n] = jj
            d = _distance_pairs_big(
                self.poses, self.disps, self.intrinsics,
                jnp.asarray(ii_p.reshape(C, CH)),
                jnp.asarray(jj_p.reshape(C, CH)),
                jnp.asarray(beta, jnp.float32),
                bidirectional=bidirectional)
            return np.array(d).reshape(-1)[:n]
        K = bucket(n)
        ii_p = np.zeros(K, np.int64)
        jj_p = np.zeros(K, np.int64)
        ii_p[:n] = ii
        jj_p[:n] = jj
        fn = _distance_pairs_kernel if bidirectional else \
            _distance_pairs_oneway
        d = fn(self.poses, self.disps, self.intrinsics,
               jnp.asarray(ii_p), jnp.asarray(jj_p),
               jnp.asarray(beta, jnp.float32))
        return np.array(d)[:n]

    def distance_matrix(self, n: int, beta=0.3):
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        return self.distance(ii, jj, beta).reshape(n, n)

    def normalize(self):
        """Rescale disparities to mean 1 and translations to match
        (DepthVideo.normalize) — fixes the mono gauge."""
        m = (jnp.arange(self.buffer) < self.counter).astype(jnp.float32)
        self.poses, self.disps = _normalize_kernel(self.poses, self.disps, m)
        self.dirty[:self.counter] = True

    def get_mapping_item(self, index: int, decay: float = 0.1):
        """Snapshot one keyframe for the mapper (DepthVideo.get_mapping_item):
        (image [ht,wd,3], depth [ht,wd], c2w 4x4, gt_c2w, mask)."""
        ix = jnp.asarray(index)
        est_disp = self.disps_filtered[ix]
        depth = 1.0 / (est_disp + 1e-7)
        w2c = self.poses_filtered[ix]
        c2w = lie.matrix(lie.compose(self.pose_compensate, lie.inv(w2c)))
        self.update_priority[index] *= decay
        return (self.images[ix], depth, c2w, self.poses_gt[ix],
                self.mask_filtered[ix])
