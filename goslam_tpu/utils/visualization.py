"""Live + offline visualization and image metrics.

Replaces the reference's Open3D live viewer and matplotlib debug panels
(visualization.py, image_visualization.py) with headless-safe outputs:
  * LiveViewer — incremental dirty-keyframe consumer maintaining point /
    camera actors and writing PLY snapshots (droid_visualization's
    animation_callback without a window)
  * keyframe point-cloud export to PLY (colored, multiview-filtered)
  * rendered-vs-GT comparison panels (PNG) with PSNR / depth MAE / RMSE
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


class LiveViewer:
    """Headless equivalent of the reference's live point-cloud viewer
    (droid_visualization, /root/reference/src/visualization.py:56-205).

    The reference runs an Open3D window whose animation callback polls
    `video.dirty`, re-unprojects the dirty keyframes through the depth
    consistency filter, and swaps their point/camera actors; key bindings
    double/halve the filter threshold and dump the accumulated cloud.
    This box is headless, so the actors live as numpy arrays and the
    "render" is a PLY snapshot — the dirty-index protocol, filtering
    semantics (count >= 2, disp > 1% of mean, droid_visualization's
    masks), and the S/F/... key actions (save / filter up / filter down)
    are preserved as methods.
    """

    def __init__(self, video, save_root: str, filter_thresh: float = 0.005,
                 filter_count: int = 2, stride: int = 1,
                 save_every: int = 0):
        self.video = video
        self.filter_thresh = filter_thresh
        self.filter_count = filter_count
        self.stride = stride
        self.save_every = save_every
        self.points = {}      # kf index -> (pts [M,3], colors [M,3] u8)
        self.cameras = {}     # kf index -> c2w 4x4
        self.updates = 0
        self.last_id = -1
        self.out_dir = os.path.join(save_root, "pointcloud")
        os.makedirs(self.out_dir, exist_ok=True)

    # -- key bindings (visualization.py:73-81) --------------------------
    def increase_filter(self):
        self.filter_thresh *= 2.0
        self.video.dirty[:self.video.counter] = True

    def decrease_filter(self):
        self.filter_thresh *= 0.5
        self.video.dirty[:self.video.counter] = True

    def _compute(self):
        """Jitted full-buffer actor computation (ONE device dispatch per
        update — an unjitted version costs hundreds of tunnel round
        trips).  Shapes are fixed by the video buffer capacity, so this
        compiles once."""
        import jax
        import jax.numpy as jnp

        from ..ops import lie, projective

        if getattr(self, "_compute_fn", None) is not None:
            return self._compute_fn

        @jax.jit
        def fn(poses, disps, intr, thresh, n):
            # unfilled buffer slots (identity pose, unit disparity) must
            # not fake depth agreements for real frames near index n:
            # give them ~zero disparity so their depth never matches
            live = jnp.arange(disps.shape[0]) < n
            disps_m = jnp.where(live[:, None, None], disps, 1e-8)
            count = projective.depth_consistency_count(
                poses, disps_m, intr, thresh)
            pts = projective.iproj_world(
                poses, jnp.maximum(disps, 1e-8), intr)
            masks = (count >= self.filter_count) & \
                (disps > 0.01 * disps.mean(axis=(1, 2), keepdims=True))
            c2ws = lie.matrix(lie.inv(poses))
            return pts, masks, c2ws

        self._compute_fn = fn
        return fn

    # -- animation callback (visualization.py:104-180) ------------------
    def update(self):
        """Consume dirty keyframes; returns how many actors changed."""
        import jax.numpy as jnp

        video = self.video
        n = video.counter
        dirty = np.flatnonzero(video.dirty[:n])
        if len(dirty) == 0:
            return 0
        # (dirty bits are cleared only after the compute succeeds — this
        # runs under SLAMSystem._safe, and a transient failure must not
        # permanently lose these keyframes from the cloud)

        # full-res actors when upsampled disps exist, 1/8-res otherwise
        disps_all = video.disps_up if float(
            jnp.abs(video.disps_up[:1]).sum()) > 0 else video.disps
        scale = 1 if disps_all is video.disps_up else video.device_scale
        intr = jnp.asarray(video.intrinsics) * (video.device_scale / scale)

        pts_a, masks_a, c2w_a = self._compute()(
            video.poses, disps_all, intr,
            jnp.float32(self.filter_thresh), n)
        pts = np.asarray(pts_a[dirty])
        masks = np.asarray(masks_a[dirty])
        c2ws = np.asarray(c2w_a[dirty])
        imgs = np.asarray(video.images[dirty])
        if imgs.shape[1] != masks.shape[1]:  # images at full res, disps /8
            s = video.device_scale
            imgs = imgs[:, 3::s, 3::s][:, :masks.shape[1], :masks.shape[2]]

        video.dirty[dirty] = False
        st = self.stride
        for k, ix in enumerate(dirty):
            m = masks[k][::st, ::st]
            self.points[int(ix)] = (
                pts[k][::st, ::st][m].astype(np.float32),
                (np.clip(imgs[k][::st, ::st][m], 0, 1) * 255)
                .astype(np.uint8))
            self.cameras[int(ix)] = c2ws[k]

        self.updates += 1
        if self.save_every and self.updates % self.save_every == 0:
            self.save_pointcloud()
        return len(dirty)

    # -- S key (visualization.py:83-101) --------------------------------
    def save_pointcloud(self) -> str:
        from ..mapping.mesher import save_ply

        if not self.points:
            return ""
        self.last_id = max(self.points)
        P = np.concatenate([p for p, _ in self.points.values()])
        C = np.concatenate([c for _, c in self.points.values()])
        path = os.path.join(self.out_dir, f"{self.last_id:05d}_pc.ply")
        save_ply(path, P, np.zeros((0, 3), np.int32), C)
        return path

    def save_cameras(self) -> str:
        """Camera frusta as a PLY line set (the viewer's camera actors)."""
        if not self.cameras:
            return ""
        # canonical frustum wireframe (create_camera_actor analog)
        f = 0.08
        box = np.asarray([[0, 0, 0], [-f, -f, 2 * f], [f, -f, 2 * f],
                          [f, f, 2 * f], [-f, f, 2 * f]], np.float32)
        seg = [(0, 1), (0, 2), (0, 3), (0, 4),
               (1, 2), (2, 3), (3, 4), (4, 1)]
        verts, edges = [], []
        for i, (ix, c2w) in enumerate(sorted(self.cameras.items())):
            v = box @ c2w[:3, :3].T + c2w[:3, 3]
            base = 5 * i
            verts.append(v)
            edges += [(base + a, base + b) for a, b in seg]
        path = os.path.join(self.out_dir, "cameras.ply")
        _save_ply_lines(path, np.concatenate(verts),
                        np.asarray(edges, np.int32))
        return path


def _save_ply_lines(path: str, verts: np.ndarray, edges: np.ndarray):
    with open(path, "wb") as fh:
        fh.write((
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element edge {len(edges)}\n"
            "property int vertex1\nproperty int vertex2\n"
            "end_header\n").encode())
        for v in verts:
            fh.write(f"{v[0]} {v[1]} {v[2]}\n".encode())
        for a, b in edges:
            fh.write(f"{a} {b}\n".encode())


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(((a - b) ** 2).mean())
    return float(10.0 * np.log10(max_val ** 2 / max(mse, 1e-12)))


def depth_metrics(est: np.ndarray, gt: np.ndarray):
    m = gt > 0
    err = np.abs(est[m] - gt[m])
    return {"mae": float(err.mean()),
            "rmse": float(np.sqrt((err ** 2).mean()))}


def export_pointcloud(path: str, video, stride: int = 4,
                      max_frames: Optional[int] = None):
    """Dump the multiview-filtered keyframe point cloud as colored PLY
    (reference: droid_visualization's point actors)."""
    from ..mapping.mesher import save_ply
    from ..ops import lie, projective
    import jax.numpy as jnp

    n = video.filtered_id if video.filtered_id > 0 else video.counter
    if max_frames:
        n = min(n, max_frames)
    if n <= 0:
        return 0

    pts_all, col_all = [], []
    disps = np.asarray(video.disps_filtered[:n])
    masks = np.asarray(video.mask_filtered[:n]) > 0
    imgs = np.asarray(video.images[:n])
    intr = jnp.asarray(video.intrinsics) * video.device_scale

    pts = np.asarray(projective.iproj_world(
        video.poses_filtered[:n],
        jnp.asarray(np.maximum(disps, 1e-6)), intr))
    for k in range(n):
        m = masks[k][::stride, ::stride]
        p = pts[k][::stride, ::stride][m]
        c = imgs[k][::stride, ::stride][m]
        pts_all.append(p)
        col_all.append((np.clip(c, 0, 1) * 255).astype(np.uint8))
    if not pts_all:
        return 0
    P = np.concatenate(pts_all)
    C = np.concatenate(col_all)
    save_ply(path, P.astype(np.float32), np.zeros((0, 3), np.int32), C)
    return len(P)


def save_render_panel(path: str, gt_color, gt_depth, est_color, est_depth,
                      est_depth_var=None, est_normal=None):
    """2x3 comparison panel (reference: image_visualization.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    gt_color = np.asarray(gt_color)
    est_color = np.clip(np.asarray(est_color), 0, 1)
    gt_depth = np.asarray(gt_depth)
    est_depth = np.asarray(est_depth)

    fig, ax = plt.subplots(2, 3, figsize=(13, 7))
    ax[0, 0].imshow(gt_color)
    ax[0, 0].set_title("GT color")
    ax[0, 1].imshow(est_color)
    ax[0, 1].set_title(f"rendered (PSNR {psnr(est_color, gt_color):.2f} dB)")
    ax[0, 2].imshow(np.abs(est_color - gt_color).mean(-1), cmap="hot")
    ax[0, 2].set_title("|color err|")
    vmax = np.percentile(gt_depth[gt_depth > 0], 99) if (gt_depth > 0).any() \
        else 1.0
    ax[1, 0].imshow(gt_depth, cmap="turbo", vmin=0, vmax=vmax)
    ax[1, 0].set_title("GT depth")
    dm = depth_metrics(est_depth, gt_depth)
    ax[1, 1].imshow(est_depth, cmap="turbo", vmin=0, vmax=vmax)
    ax[1, 1].set_title(f"rendered depth (MAE {dm['mae']:.3f})")
    if est_depth_var is not None:
        ax[1, 2].imshow(np.sqrt(np.asarray(est_depth_var)), cmap="viridis")
        ax[1, 2].set_title("depth sigma")
    else:
        ax[1, 2].imshow(np.abs(est_depth - gt_depth), cmap="hot")
        ax[1, 2].set_title("|depth err|")
    for a in ax.ravel():
        a.axis("off")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return {"psnr": psnr(est_color, gt_color), **dm}
