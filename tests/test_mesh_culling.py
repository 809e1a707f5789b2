"""Mesh culling stack: native depth rasterizer, point masks, full cull
flow, ICP alignment (reference mesher.py:56-240,339-357,444-480)."""
import os

import numpy as np
import pytest

from goslam_tpu.native import render_depth
from goslam_tpu.mapping import mesher as M
from goslam_tpu.utils.obb import OrientedBoundingBox

pytestmark = pytest.mark.quick

H, W = 60, 80
FX = FY = 40.0
INTR = (FX, FY, W / 2, H / 2)


def _plane(z, half=1.0, n=8, dx=0.0, dy=0.0):
    """Subdivided square plane at depth z, [2*half]^2, n x n quads."""
    xs = np.linspace(-half, half, n + 1)
    gx, gy = np.meshgrid(xs + dx, xs + dy, indexing="ij")
    v = np.stack([gx, gy, np.full_like(gx, z)], -1).reshape(-1, 3)
    tris = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = a + 1
            c = a + n + 1
            tris += [[a, b, c], [b, c + 1, c]]
    return v.astype(np.float32), np.asarray(tris, np.int32)


def _merge(*meshes):
    vs, ts, off = [], [], 0
    for v, t in meshes:
        vs.append(v)
        ts.append(t + off)
        off += len(v)
    return np.concatenate(vs), np.concatenate(ts)


def test_render_depth_zbuffer_and_frustum():
    # near plane subtends +-10 px, far plane +-20 px
    v, t = _merge(_plane(2.0, half=0.5), _plane(4.0, half=2.0))
    d = render_depth(v, t, np.eye(4, dtype=np.float32)[None], INTR, H, W)
    assert abs(d[0, H // 2, W // 2] - 2.0) < 1e-3        # near wins
    assert abs(d[0, H // 2, W // 2 + 15] - 4.0) < 1e-3   # only far there
    assert d[0, 0, 0] == 0.0                             # nothing hit


def test_point_masks_occlusion_and_forecast():
    v, t = _plane(2.0, half=1.5)  # wall: +-30 px, covers test pixels
    w2c = np.eye(4, dtype=np.float32)[None]
    depth = render_depth(v, t, w2c, INTR, H, W)
    c2w = [np.eye(4)]
    pts = np.array([
        [0, 0, 1.0],    # in front of wall -> seen
        [0, 0, 3.0],    # behind wall -> occluded
        [0, 1.2, 1.0],  # v = 40*1.2+30 = 78 -> 19 px below border
    ], np.float32)
    seen, forecast = M.point_masks(pts, depth, c2w, INTR, H, W,
                                   forecast_radius=30)
    assert seen[0] and not seen[1]
    assert not seen[2] and forecast[2]
    # zero radius: forecast == seen
    seen0, fore0 = M.point_masks(pts, depth, c2w, INTR, H, W,
                                 forecast_radius=0)
    assert (seen0 == fore0).all()


def test_cull_mesh_removes_hidden_geometry():
    # visible wall at z=2 + blob at z=5 directly behind it
    v, t = _merge(_plane(2.0, half=1.0), _plane(5.0, half=0.3))
    c2w = [np.eye(4)]
    (cv, ct), (fv, ft) = M.cull_mesh(v, t, c2w, INTR, H, W,
                                     forecast_radius=0.0)
    assert len(ct) > 0
    assert cv[:, 2].max() < 3.0, "hidden blob should be culled"
    # bound cull drops out-of-bound geometry before projection
    bound = np.array([[-3, 3], [-3, 3], [0, 3]], np.float32)
    (cv2, ct2), _ = M.cull_mesh(v, t, c2w, INTR, H, W, bound=bound)
    assert len(ct2) and cv2[:, 2].max() < 3.0


def test_cull_mesh_obb_bound():
    v, t = _plane(2.0, half=1.0, n=16)
    obb = OrientedBoundingBox(center=[0.0, 0.0, 2.0], R=np.eye(3),
                              extent=[1.0, 1.0, 1.0])
    (cv, ct), _ = M.cull_mesh(v, t, [np.eye(4)], INTR, H, W, obb=obb)
    assert len(cv) and np.abs(cv[:, :2]).max() <= 0.55


def _ground_plane(y=1.0, x_half=4.0, z0=1.5, z1=5.5, n=32):
    xs = np.linspace(-x_half, x_half, n + 1)
    zs = np.linspace(z0, z1, n + 1)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    v = np.stack([gx, np.full_like(gx, y), gz], -1).reshape(-1, 3)
    tris = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            tris += [[a, a + 1, a + n + 1], [a + 1, a + n + 2, a + n + 1]]
    return v.astype(np.float32), np.asarray(tris, np.int32)


def test_forecast_mesh_extends_past_frustum():
    # receding ground plane: the frustum limits |x| <= z, so at z~2 the
    # seen region is narrow but the culled OBB (fed by far geometry) is
    # wide — forecast wings at z~2 survive the OBB trim
    # (mesher.py:210-231 semantics)
    v, t = _ground_plane()
    (cv, ct), (fv, ft) = M.cull_mesh(v, t, [np.eye(4)], INTR, H, W,
                                     forecast_radius=25.0)
    assert len(ct) and len(ft) >= len(ct)
    near_c = cv[np.abs(cv[:, 2] - 2.0) < 0.26]
    near_f = fv[np.abs(fv[:, 2] - 2.0) < 0.26]
    assert np.abs(near_f[:, 0]).max() > np.abs(near_c[:, 0]).max(), \
        "forecast mesh should extend past the frustum"


def test_component_culling_by_area():
    v, t = _merge(_plane(2.0, half=2.0), _plane(2.0, half=0.1, dx=10.0))
    cv, ct = M.cull_small_components(v, t, min_area_ratio=0.2)
    assert np.abs(cv[:, 0]).max() <= 2.0, "small distant blob not removed"
    lv, lt = M.cull_small_components(v, t, get_largest=True)
    assert np.abs(lv[:, 0]).max() <= 2.0 and len(lt) == 128


def test_icp_alignment_recovers_offset():
    rng = np.random.default_rng(0)
    pts = rng.random((500, 3)).astype(np.float32) * 4
    offset = np.array([0.3, -0.2, 0.1])
    est = pts + offset
    T = M.align_mesh_icp(est, pts, init=None, iters=30, n_sample=500)
    aligned = est @ T[:3, :3].T + T[:3, 3]
    assert np.abs(aligned - pts).max() < 0.05
    # seeding with the exact inverse converges instantly
    init = np.eye(4)
    init[:3, 3] = -offset
    T2 = M.align_mesh_icp(est, pts, init=init, iters=2, n_sample=500)
    aligned2 = est @ T2[:3, :3].T + T2[:3, 3]
    assert np.abs(aligned2 - pts).max() < 0.02


@pytest.mark.quick
def test_meshvideo_from_run_dir(tmp_path):
    """make_video renders every mesh/*.ply + trajectory into an mp4
    (run.py --make_video path, reference tools/meshvideo.py behavior)."""
    from goslam_tpu.mapping.mesher import save_ply
    from goslam_tpu.tools.meshvideo import make_video

    run = tmp_path / "run"
    (run / "mesh").mkdir(parents=True)
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    t = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    for k in range(2):
        save_ply(str(run / "mesh" / f"{k:05d}_mesh.ply"), v + 0.1 * k, t)
    traj = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
    traj[:, 0, 3] = np.linspace(0, 1, 6)
    np.save(str(run / "est_poses.npy"), traj)

    out = make_video(str(run), fps=2)
    assert out is not None and os.path.exists(out)
    assert os.path.getsize(out) > 1000
    assert len(list((run / "video_frames").glob("*.png"))) == 2


def test_synthetic_gt_mesh_geometry():
    """The analytic room GT mesh (Synthetic.gt_mesh) is a closed box at
    +-half with interior-facing normals and exact surface area — the
    ground truth for the demo's mesh-eval protocol (run.py wires it when
    meshing.eval_rec is set and no gt_mesh_path is given)."""
    from goslam_tpu.config import default_config, update_recursive
    from goslam_tpu.data.synthetic import Synthetic

    cfg = default_config()
    update_recursive(cfg, {
        "data": {"input_folder": "", "output": "", "n_frames": 2,
                 "room_half_size": 2.5},
        "cam": {"H": 32, "W": 48, "H_out": 32, "W_out": 48,
                "H_edge": 0, "W_edge": 0}})
    v, t = Synthetic(cfg).gt_mesh()

    assert t.min() >= 0 and t.max() < len(v)
    assert np.allclose(np.abs(v).max(axis=1), 2.5)
    e1 = v[t[:, 1]] - v[t[:, 0]]
    e2 = v[t[:, 2]] - v[t[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    assert abs(area - 6 * 5.0 ** 2) < 1e-3
    n = np.cross(e1, e2)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    c = v[t].mean(axis=1)
    assert (np.abs(c + 0.1 * n).max(axis=1) < 2.5).all(), \
        "triangles must face the room interior"
    # a perfect est mesh scores at the protocol's sampling floor: two
    # independent 50k samplings of this 150 m^2 surface have ~2-3 cm
    # typical nearest-neighbor spacing (0.5/sqrt(density))
    res = M.eval_mesh(v, t, v, t, n_points=50000)
    assert res["accuracy_cm"] < 5.0 and res["f_score"] > 90.0
