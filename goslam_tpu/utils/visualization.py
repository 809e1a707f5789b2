"""Offline visualization + image metrics.

Replaces the reference's Open3D live viewer and matplotlib debug panels
(visualization.py, image_visualization.py) with headless-safe outputs:
  * keyframe point-cloud export to PLY (colored, multiview-filtered)
  * rendered-vs-GT comparison panels (PNG) with PSNR / depth MAE / RMSE
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


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
