"""End-to-end loop closure: a full-orbit trajectory must trigger the
neighborhood-consistency vote (Backend._propose_edges loop mode,
reference backend.py:79-89) and reduce drift vs the same run without
loop closing — the system's namesake capability ("GO" = Global
Optimization, frontend.py:83-87).
"""
import os

import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "checkpoints", "droid_synthetic.ckpt")

pytestmark = pytest.mark.slow


def _loop_cfg(enable_loop: bool):
    from goslam_tpu.config import default_config, update_recursive

    cfg = default_config()
    update_recursive(cfg, {
        "dataset": "synthetic", "mode": "rgbd",
        # operating regime of the shipped checkpoint (see
        # test_accuracy.py for the resolution rationale)
        "cam": {"H": 128, "W": 192, "H_out": 128, "W_out": 192,
                "H_edge": 0, "W_edge": 0},
        # full orbit: the camera returns to its start pose, so the final
        # keyframes SEE the first ones — the loop-closure scenario
        "data": {"input_folder": "", "n_frames": 60, "output": "",
                 "room_half_size": 3.0, "orbit_fraction": 1.0},
        "tracking": {
            # full orbit at thresh 2.0 admits ~50 keyframes; the
            # trajectory filler additionally needs batch=16 free slots
            "buffer": 96, "warmup": 4,
            "motion_filter": {"thresh": 2.0},
            "frontend": {"window": 8, "max_factors": 32,
                         "enable_loop": enable_loop,
                         "keyframe_thresh": 1.0},
            "backend": {"loop_window": 25, "loop_thresh": 30.0,
                        "loop_radius": 1, "loop_nms": 2},
            # no periodic global BA: isolate the loop-closing effect
            "global_ba_every": 0,
        },
    })
    return cfg


def _run(cfg, tmp, params):
    from goslam_tpu.data.synthetic import Synthetic
    from goslam_tpu.system import SLAMSystem

    ds = Synthetic(cfg)
    slam = SLAMSystem(cfg, params=params, output=tmp, only_tracking=True)
    for i in range(len(ds)):
        idx, img, depth, intr, gt = ds[i]
        slam.track(float(i), img, depth, intr, gt)

    def stream():
        for i in range(len(ds)):
            idx, img, depth, intr, gt = ds[i]
            yield float(i), img, depth, intr, gt

    metrics = slam.terminate(stream=stream())
    return slam, metrics


@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason="train checkpoints/droid_synthetic.ckpt first")
def test_loop_closure_accepts_edges_and_reduces_drift(tmp_path):
    from goslam_tpu.system import load_pretrained

    params = load_pretrained(CKPT)

    slam_off, m_off = _run(_loop_cfg(False), str(tmp_path / "off"), params)
    slam_on, m_on = _run(_loop_cfg(True), str(tmp_path / "on"), params)

    # (a) the vote accepted loop-mode candidates: long-range edges between
    # the orbit's end and its revisited start
    assert slam_on.backend.total_loop_accepts > 0, \
        "no loop candidates passed the neighborhood-consistency vote"
    assert slam_off.backend.total_loop_accepts == 0

    ate_off = m_off["ate"]["rmse"]
    ate_on = m_on["ate"]["rmse"]
    print(f"ATE without loop closing: {ate_off:.4f} m; "
          f"with: {ate_on:.4f} m "
          f"({slam_on.backend.total_loop_accepts} loop votes accepted)")
    # (b) loop closing must measurably reduce the orbit's accumulated
    # drift (and at minimum never make it worse than a small margin)
    assert np.isfinite(ate_on)
    assert ate_on < ate_off * 0.9, \
        f"loop closing did not reduce drift: {ate_off:.4f} -> {ate_on:.4f}"
