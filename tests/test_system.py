"""System-level smoke tests: full pipeline over the synthetic dataset,
stereo machinery, mapper pose-BA path, checkpoint roundtrip."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from goslam_tpu.config import default_config, load_config, update_recursive
from goslam_tpu.data.synthetic import Synthetic
from goslam_tpu.system import SLAMSystem, init_params

HT, WD = 64, 96


def demo_cfg(**over):
    cfg = default_config()
    update_recursive(cfg, {
        "dataset": "synthetic",
        "mode": "rgbd",
        "cam": {"H": HT, "W": WD, "H_out": HT, "W_out": WD,
                "H_edge": 0, "W_edge": 0},
        "data": {"input_folder": "", "n_frames": 14, "output": ""},
        "tracking": {
            "buffer": 32, "warmup": 4, "upsample": False,
            "motion_filter": {"thresh": -1.0},
            # 64x96 tracked depth is coarse: the reference's 1 cm
            # depth-agreement threshold would reject everything, and the
            # multiview filter would never publish a bound for mapping
            "multiview_filter": {"thresh": 0.25},
            "frontend": {"window": 6, "max_factors": 24,
                         "enable_loop": False, "keyframe_thresh": 0.0},
            "global_ba_every": 0,
        },
        "mapping": {"mapping_every": 4, "pixels": 512,
                    "mapping_window_size": 6, "post_processing_iters": 1},
        "rendering": {"N_samples": 8, "N_surface": 16},
        "meshing": {"resolution": 64},
    })
    update_recursive(cfg, over)
    return cfg


@pytest.fixture(scope="module")
def params():
    return init_params(ht=HT, wd=WD)


def test_full_pipeline_smoke(params, tmp_path):
    """Tracking + multiview filter + mapping + mesh eval + terminate on
    synthetic RGB-D; artifacts written, everything finite."""
    cfg = demo_cfg()
    cfg["data"]["output"] = str(tmp_path)
    cfg["meshing"]["eval_rec"] = True
    ds = Synthetic(cfg)
    slam = SLAMSystem(cfg, params=params, output=str(tmp_path))

    for i in range(len(ds)):
        idx, img, depth, intr, gt = ds[i]
        slam.track(float(i), img, depth, intr, gt)
    slam.flush()

    assert slam.video.counter >= 4
    assert np.isfinite(
        np.asarray(slam.video.poses[:slam.video.counter])).all()

    def stream():
        for i in range(len(ds)):
            idx, img, depth, intr, gt = ds[i]
            yield float(i), img, depth, intr, gt

    # the analytic GT room mesh closes the mesh-eval loop
    # (accuracy/completion/F-score protocol, reference mesher.py:390-421)
    from goslam_tpu.mapping import mesher as M
    gv, gt_tris = ds.gt_mesh()
    gt_path = str(tmp_path / "gt_mesh.ply")
    M.save_ply(gt_path, gv, gt_tris)

    metrics = slam.terminate(stream=stream(), eval_mesh_path=gt_path)
    assert "ate" in metrics
    assert os.path.exists(tmp_path / "est_poses.npy")
    assert os.path.exists(tmp_path / "metrics_traj.txt")
    assert os.path.exists(tmp_path / "go.ckpt")
    mesh_metrics = json.load(open(tmp_path / "metrics_mesh.txt"))
    assert np.isfinite(mesh_metrics["accuracy_cm"])
    assert np.isfinite(mesh_metrics["completion_cm"])
    assert 0 <= mesh_metrics["f_score"] <= 100
    # trajectory covers every input frame
    poses = np.load(tmp_path / "est_poses.npy")
    assert poses.shape == (len(ds), 4, 4)


def test_checkpoint_roundtrip(params, tmp_path):
    cfg = demo_cfg()
    slam = SLAMSystem(cfg, params=params, output=str(tmp_path))
    ds = Synthetic(cfg)
    for i in range(6):
        idx, img, depth, intr, gt = ds[i]
        slam.track(float(i), img, depth, intr, gt)
    slam.flush()
    p = str(tmp_path / "ck.pkl")
    slam.save_checkpoint(p)

    slam2 = SLAMSystem(cfg, params=params, output=str(tmp_path))
    slam2.load_checkpoint(p)
    n0 = slam2.video.counter
    assert n0 == slam.video.counter
    np.testing.assert_allclose(
        np.asarray(slam2.video.poses[:n0]),
        np.asarray(slam.video.poses[:n0]), atol=1e-6)
    # full checkpoint restores the factor graph's inputs (features,
    # context, intrinsics) — tracking must be able to CONTINUE
    np.testing.assert_allclose(np.asarray(slam2.video.intrinsics),
                               np.asarray(slam.video.intrinsics), atol=0)
    assert float(jnp.abs(slam2.video.fmaps[:n0].astype(jnp.float32)).sum()) > 0
    # frontend resume state is restored by load_checkpoint itself
    assert slam2.frontend.is_initialized == (n0 >= cfg["tracking"]["warmup"])
    assert slam2.frontend.t1 == n0
    for i in range(6, 10):
        idx, img, depth, intr, gt = ds[i]
        slam2.track(float(i), img, depth, intr, gt)
    slam2.flush()
    assert slam2.video.counter > n0
    assert np.isfinite(
        np.asarray(slam2.video.poses[:slam2.video.counter])).all()


def test_stereo_machinery(params):
    """Stereo mode: rig-2 images, stereo self-edges, finite BA."""
    cfg = demo_cfg()
    cfg["mode"] = "stereo"
    slam = SLAMSystem(cfg, params=params, only_tracking=True)
    rng = np.random.default_rng(3)
    base = rng.random((HT, WD, 3)).astype(np.float32)
    intr = np.asarray([80.0, 80.0, WD / 2, HT / 2], np.float32)
    for k in range(6):
        left = np.roll(base, 2 * k, axis=1)
        right = np.roll(base, 2 * k + 1, axis=1)   # fake baseline shift
        img = jnp.asarray(np.stack([left, right]))
        slam.track(float(k), img, None, intr)
    slam.flush()
    assert slam.video.counter >= 4
    assert slam.video.rig == 2
    # stereo self-edges present in the frontend graph
    g = slam.frontend.graph
    assert ((g.ii[g.valid] == g.jj[g.valid]).any())
    assert np.isfinite(
        np.asarray(slam.video.poses[:slam.video.counter])).all()


def test_mapper_pose_ba_path(params):
    """mapping.BA=True exercises the joint camera-refinement step."""
    from goslam_tpu.mapping.mapper import Mapper
    from goslam_tpu.tracking.video import VideoBuffer

    cfg = demo_cfg()
    cfg["mapping"]["BA"] = True
    v = VideoBuffer(buffer=16, ht=HT, wd=WD)
    v.intrinsics = jnp.asarray([10.0, 10.0, 6.0, 4.0])

    rng = np.random.default_rng(0)
    # fabricate filtered state for 14 keyframes
    n = 14
    v.counter = n
    v.filtered_id = n
    v.disps_filtered = v.disps_filtered.at[:n].set(0.5)
    v.mask_filtered = v.mask_filtered.at[:n].set(1.0)
    v.images = v.images.at[:n].set(
        jnp.asarray(rng.random((n, HT, WD, 3)).astype(np.float32)))
    v.bound = np.asarray([[-3, 3], [-3, 3], [-3, 3]], np.float32)

    m = Mapper(v, cfg)
    m.last_visit = 12          # enables the BA branch (needs >= 10)
    out = m()
    assert out is not None
    assert np.isfinite(float(out["total"]))


@pytest.mark.quick
def test_pipelined_ingest_matches_sync(params):
    """The batched uint8 ingest pipeline (SLAMSystem.track) must admit the
    same keyframes as the synchronous MotionFilter path on the same
    stream (quantization on the wire notwithstanding — the sync reference
    here consumes the same uint8-roundtripped frames)."""
    from goslam_tpu.system import SLAMSystem
    from goslam_tpu.tracking.motion_filter import MotionFilter
    from goslam_tpu.tracking.video import VideoBuffer

    cfg = demo_cfg()
    cfg["tracking"]["motion_filter"]["thresh"] = 2.0   # mixed admit/reject
    cfg["tracking"]["ingest_batch"] = 4
    cfg["tracking"]["pipeline_lag"] = 5
    ds = Synthetic(cfg)
    intr = None

    # pipelined system path
    slam = SLAMSystem(cfg, params=params, only_tracking=True)
    for i in range(len(ds)):
        idx, img, depth, intr, gt = ds[i]
        slam.track(float(i), img, depth, intr, gt)
    slam.flush()

    # synchronous reference path on identically quantized frames
    video = VideoBuffer(buffer=32, ht=HT, wd=WD)
    mf = MotionFilter(params, video,
                      thresh=cfg["tracking"]["motion_filter"]["thresh"])
    admits = []
    for i in range(len(ds)):
        idx, img, depth, intr, gt = ds[i]
        q = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(
            np.uint8).astype(np.float32) / 255.0
        admits.append(mf.track(float(i), jnp.asarray(q), jnp.asarray(depth),
                               intr, gt))

    assert video.counter == slam.video.counter
    np.testing.assert_allclose(
        np.asarray(video.timestamp[:video.counter]),
        np.asarray(slam.video.timestamp[:slam.video.counter]), atol=0)


def test_live_viewer(params, tmp_path):
    """LiveViewer consumes dirty keyframes incrementally and writes PLY
    snapshots + camera actors (droid_visualization protocol,
    /root/reference/src/visualization.py:56-205)."""
    from goslam_tpu.utils.visualization import LiveViewer

    cfg = demo_cfg()
    cfg["viz"] = True
    # generous consistency threshold: this fixture tracks with random
    # weights, so depths are sensor-seeded but poses drift — the test
    # exercises the viewer protocol, not tracking quality
    cfg["viz_options"] = {"save_every": 0, "filter_thresh": 2.0,
                          "stride": 2}
    ds = Synthetic(cfg)
    slam = SLAMSystem(cfg, params=params, output=str(tmp_path),
                      only_tracking=True)
    assert slam.viewer is not None
    for i in range(len(ds)):
        idx, img, depth, intr, gt = ds[i]
        slam.track(float(i), img, depth, intr, gt)
    slam.flush()
    slam.viewer.update()
    assert not slam.video.dirty[:slam.video.counter].any()
    assert len(slam.viewer.points) == slam.video.counter

    pc = slam.viewer.save_pointcloud()
    cams = slam.viewer.save_cameras()
    assert os.path.exists(pc) and os.path.getsize(pc) > 0
    assert os.path.exists(cams) and os.path.getsize(cams) > 0
    n_pts = sum(len(p) for p, _ in slam.viewer.points.values())
    assert n_pts > 100, n_pts

    # key-binding semantics: halving the threshold re-dirties everything
    slam.viewer.decrease_filter()
    assert slam.video.dirty[:slam.video.counter].all()
    changed = slam.viewer.update()
    assert changed == slam.video.counter
    # stricter consistency threshold keeps no more points than before
    assert sum(len(p) for p, _ in slam.viewer.points.values()) <= n_pts


def test_mixed_depth_batch_keeps_other_frames_depth(params):
    """A frame with missing depth in an ingest batch must not drop the
    other frames' sensor depths (their RGB-D prior depends on them)."""
    cfg = demo_cfg()
    cfg["tracking"]["ingest_batch"] = 4
    cfg["tracking"]["pipeline_lag"] = 0
    ds = Synthetic(cfg)
    slam = SLAMSystem(cfg, params=params, only_tracking=True)
    for i in range(4):
        idx, img, depth, intr, gt = ds[i]
        slam.track(float(i), img, None if i == 2 else depth, intr, gt)
    slam.flush()
    n = slam.video.counter
    assert n == 4
    sens = np.asarray(slam.video.disps_sens[:n])
    # frames 0,1,3 keep sensor disparity; frame 2 has none
    assert (sens[[0, 1, 3]] > 0).all()
    assert (sens[2] == 0).all()
