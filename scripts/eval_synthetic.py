"""Evaluate a tracking checkpoint on the held-out synthetic scene.

Runs the same scenario as tests/test_accuracy.py (40-frame orbit,
RGB-D, real keyframe spacing) at one or more resolutions and prints the
ATE.  Used to compare candidate checkpoints before shipping one to
checkpoints/droid_synthetic.ckpt.

    python scripts/eval_synthetic.py --ckpt /tmp/droid_synth_r3.ckpt \
        --res 128x192 240x320
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def evaluate(ckpt: str, ht: int, wd: int, n_frames: int = 40,
             window: int = 8, max_factors: int = 32,
             weight_calib: float = 1.0):
    import jax
    from goslam_tpu.config import default_config, update_recursive
    from goslam_tpu.data.synthetic import Synthetic
    from goslam_tpu.system import SLAMSystem, load_pretrained

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    cfg = default_config()
    update_recursive(cfg, {
        "dataset": "synthetic", "mode": "rgbd",
        "cam": {"H": ht, "W": wd, "H_out": ht, "W_out": wd,
                "H_edge": 0, "W_edge": 0},
        "data": {"input_folder": "", "n_frames": n_frames, "output": "",
                 "room_half_size": 3.0},
        "tracking": {
            "buffer": 64, "warmup": 4,
            "motion_filter": {"thresh": 2.0},
            "weight_calib": weight_calib,
            "frontend": {"window": window, "max_factors": max_factors,
                         "enable_loop": False, "keyframe_thresh": 1.0},
            "global_ba_every": 10,
        },
    })
    ds = Synthetic(cfg)
    params = load_pretrained(ckpt)
    out = f"/tmp/eval_synth_{ht}x{wd}"
    slam = SLAMSystem(cfg, params=params, output=out, only_tracking=True)
    for i in range(len(ds)):
        idx, img, depth, intr, gt = ds[i]
        slam.track(float(i), img, depth, intr, gt)

    def stream():
        for i in range(len(ds)):
            idx, img, depth, intr, gt = ds[i]
            yield float(i), img, depth, intr, gt

    metrics = slam.terminate(stream=stream())
    ate = metrics["ate"]
    print(f"[{ht}x{wd} w={window} mf={max_factors} wc={weight_calib}] "
          f"ATE rmse {ate['rmse']:.4f} m  mean {ate['mean']:.4f}  "
          f"scale {ate['scale']:.3f}  kf={slam.video.counter}", flush=True)
    return ate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/droid_synthetic.ckpt")
    ap.add_argument("--res", nargs="+", default=["128x192"])
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--max_factors", type=int, default=32)
    ap.add_argument("--weight_calib", type=float, nargs="+", default=[1.0])
    args = ap.parse_args()
    for res in args.res:
        ht, wd = (int(x) for x in res.split("x"))
        for wc in args.weight_calib:
            evaluate(args.ckpt, ht, wd, n_frames=args.frames,
                     window=args.window, max_factors=args.max_factors,
                     weight_calib=wc)


if __name__ == "__main__":
    main()
