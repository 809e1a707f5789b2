"""End-to-end tracking accuracy with the trained synthetic checkpoint.

The reference's quality story rests on DROID's pretrained droid.pth
(slam.py:196-208); this environment has no egress, so accuracy is gated
on the in-tree synthetic-domain checkpoint (scripts/train_synthetic.py).
Held-out scene: the Synthetic dataset class generates a different
trajectory/texture than the trainer's randomized clips.
"""
import os

import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "checkpoints", "droid_synthetic.ckpt")

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason="train checkpoints/droid_synthetic.ckpt first "
                           "(scripts/train_synthetic.py)")
# gate BOTH the design-regime resolution and the ScanNet tracking
# geometry the FPS bench uses (240x320, configs/ScanNet/scannet.yaml)
@pytest.mark.parametrize("ht,wd,gate", [(128, 192, 0.18),
                                        (240, 320, 0.16)])
def test_e2e_ate_with_trained_weights(tmp_path, ht, wd, gate):
    from goslam_tpu.config import default_config, update_recursive
    from goslam_tpu.data.synthetic import Synthetic
    from goslam_tpu.system import SLAMSystem, load_pretrained

    cfg = default_config()
    # resolution matters: the reference's absolute BA constants
    # (WEIGHT_SCALE 0.001, ep 0.1, alpha 0.05 — droid_kernels.cu) assume
    # its operating regime of ~1200-pixel 1/8-res frames with fx/8 >~ 20;
    # at a toy 64x96 the damping drowns the photometric Hessian and any
    # sub-pixel flow bias integrates into unbounded drift (round-2
    # root-cause). The gate therefore runs at 128x192, inside the regime,
    # with a checkpoint trained at the same scale.
    update_recursive(cfg, {
        "dataset": "synthetic", "mode": "rgbd",
        # the gated number is a single-device measurement (on a virtual
        # CPU mesh the sharded global BA also risks XLA:CPU's 40 s
        # collective watchdog; parity is covered by test_parallel.py)
        "multichip": False,
        "cam": {"H": ht, "W": wd, "H_out": ht, "W_out": wd,
                "H_edge": 0, "W_edge": 0},
        "data": {"input_folder": "", "n_frames": 40, "output": "",
                 "room_half_size": 3.0},
        "tracking": {
            "buffer": 64, "warmup": 4,
            # real keyframe spacing (reference thresh 4.0 at its flows):
            # admitting EVERY frame (thresh -1) makes the per-keyframe
            # refinement bias large relative to the ~1px inter-frame
            # motion and integrates into drift regardless of net quality
            "motion_filter": {"thresh": 2.0},
            "frontend": {"window": 8, "max_factors": 32,
                         "enable_loop": False, "keyframe_thresh": 1.0},
            "global_ba_every": 10,
        },
    })
    ds = Synthetic(cfg)
    params = load_pretrained(CKPT)
    slam = SLAMSystem(cfg, params=params, output=str(tmp_path),
                      only_tracking=True)
    for i in range(len(ds)):
        idx, img, depth, intr, gt = ds[i]
        slam.track(float(i), img, depth, intr, gt)

    def stream():
        for i in range(len(ds)):
            idx, img, depth, intr, gt = ds[i]
            yield float(i), img, depth, intr, gt

    metrics = slam.terminate(stream=stream())
    ate = metrics["ate"]["rmse"]
    print(f"trained-checkpoint ATE rmse: {ate:.4f} m "
          f"(scale {metrics['ate']['scale']:.3f})")
    # Regression bound at the round-3 achieved level (0.128 m on this
    # scene with the 20k-step curriculum checkpoint; round 2: 0.148 m;
    # random weights ~0.6 m). The remaining gap to the reference's
    # centimeter ATE is *net quality*, not machinery: with ground-truth
    # flow targets injected, this exact pipeline tracks the scene at
    # 0.023 m mean error / scale 0.99 (round-2 oracle run). Probed
    # structure of the residual (round 3, /tmp-probe at GT state): the
    # from-scratch net's weighted flow bias grows with edge baseline
    # (0.15 px at 1-frame separation -> 0.47 px at 8) and its confidence
    # weights are globally small (~0.01-0.02), so the photometric term
    # converges slowly against damping and per-keyframe residuals
    # integrate into drift. Closing that needs DROID-scale training data
    # (TartanAir) — unavailable here (zero egress); models/convert.py
    # stands ready for droid.pth.
    assert ate < gate, f"ATE {ate} regressed for trained weights"
