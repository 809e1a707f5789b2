#!/usr/bin/env python3
"""goslam_tpu CLI — mirrors the reference's run.py interface.

    python run.py configs/Replica/room0.yaml [--mode rgbd] [--only_tracking]
        [--input_folder ...] [--output ...] [--max_frames N] [--stride N]
        [--image_size H W] [--calibration_txt path]

Loads the YAML config chain, builds the dataset, runs the SLAM system over
the stream, and evaluates (ATE + mesh metrics) at termination
(/root/reference/run.py:36-92 behaviorally).
"""
import argparse
import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def setup_seed(seed: int = 43):
    random.seed(seed)
    np.random.seed(seed)


def backup_source(output: str):
    """Snapshot the package source next to the results (run.py:21-33)."""
    dst = os.path.join(output, "code_backup")
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "goslam_tpu")
    if os.path.abspath(src) == os.path.abspath(dst):
        return
    shutil.copytree(src, os.path.join(dst, "goslam_tpu"),
                    dirs_exist_ok=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="path to the scene config yaml")
    parser.add_argument("--mode", choices=["mono", "stereo", "rgbd"],
                        default=None)
    parser.add_argument("--only_tracking", action="store_true")
    parser.add_argument("--input_folder", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--max_frames", type=int, default=-1)
    parser.add_argument("--stride", type=int, default=None)
    parser.add_argument("--image_size", type=int, nargs=2, default=None)
    parser.add_argument("--calibration_txt", default=None)
    parser.add_argument("--make_video", action="store_true")
    parser.add_argument("--viz", action="store_true",
                        help="live point-cloud viewer (headless: writes "
                             "incremental PLY snapshots to output/pointcloud)")
    parser.add_argument("--resume", default=None,
                        help="resume from a go.ckpt written by a previous "
                             "run (new capability: the reference only "
                             "saves, slam.py:296-301); frames up to the "
                             "checkpoint's last keyframe are skipped")
    args = parser.parse_args()

    setup_seed(43)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from goslam_tpu.config import load_config, save_config
    from goslam_tpu.data import get_dataset
    from goslam_tpu.system import SLAMSystem

    cfg = load_config(args.config)
    if args.mode:
        cfg["mode"] = args.mode
    assert cfg["mode"] in ("mono", "stereo", "rgbd"), cfg["mode"]
    if args.only_tracking:
        cfg["only_tracking"] = True
    if args.input_folder:
        cfg["data"]["input_folder"] = args.input_folder
    if args.output:
        cfg["data"]["output"] = args.output
    if args.stride is not None:
        cfg["stride"] = args.stride
    if args.image_size is not None:
        cfg["cam"]["H_out"], cfg["cam"]["W_out"] = args.image_size
    if args.max_frames > 0:
        cfg["data"]["max_frames"] = args.max_frames
    if args.calibration_txt:
        fx, fy, cx, cy = np.loadtxt(args.calibration_txt).tolist()
        cfg["cam"].update({"fx": fx, "fy": fy, "cx": cx, "cy": cy})
    if args.make_video:
        cfg["make_video"] = True
    if args.viz:
        cfg["viz"] = True

    output = cfg["data"]["output"] or "/tmp/goslam_runs/run"
    os.makedirs(output, exist_ok=True)
    backup_source(output)
    save_config(cfg, os.path.join(output, "config.yaml"))

    dataset = get_dataset(cfg)
    n_frames = len(dataset)
    if args.max_frames > 0:
        n_frames = min(n_frames, args.max_frames)
    print(f"dataset: {cfg['dataset']} frames: {n_frames} "
          f"mode: {cfg['mode']}")

    slam = SLAMSystem(cfg, output=output,
                      only_tracking=cfg.get("only_tracking", False))

    start_frame = 0
    if args.resume and os.path.exists(args.resume):
        state = slam.load_checkpoint(args.resume)
        last_ts = float(state["timestamps"][-1]) if state["counter"] else -1.0
        ts_all = (np.asarray(dataset.timestamps, np.float64)
                  if dataset.timestamps is not None
                  else np.arange(n_frames, dtype=np.float64))
        start_frame = int((ts_all <= last_ts).sum())
        # frontend + motion-filter resume state restored by load_checkpoint
        print(f"resumed {state['counter']} keyframes from {args.resume}; "
              f"continuing at frame {start_frame}")

    use_depth = cfg["mode"] == "rgbd"
    t0 = time.time()
    for i in range(start_frame, n_frames):
        idx, image, depth, intrinsics, gt_pose = dataset[i]
        ts = float(dataset.timestamps[i]) if dataset.timestamps is not None \
            else float(idx)
        slam.track(ts, image, depth if use_depth else None, intrinsics,
                   gt_pose)
        if i % 25 == 0:
            fps = (i + 1) / (time.time() - t0)
            print(f"frame {i}/{n_frames} kf={slam.video.counter} "
                  f"fps={fps:.2f}", flush=True)

    elapsed = time.time() - t0
    print(f"tracking done: {n_frames} frames in {elapsed:.1f}s "
          f"({n_frames / elapsed:.2f} fps)")

    def stream():
        for i in range(n_frames):
            idx, image, depth, intrinsics, gt_pose = dataset[i]
            ts = float(dataset.timestamps[i]) \
                if dataset.timestamps is not None else float(idx)
            yield ts, image, depth, intrinsics, gt_pose

    gt_mesh_path = cfg["meshing"].get("gt_mesh_path", "")
    if (not gt_mesh_path and cfg["meshing"].get("eval_rec")
            and hasattr(dataset, "gt_mesh")):
        # analytic datasets know their exact geometry — write the GT
        # mesh next to the outputs so mesh eval runs without assets
        from goslam_tpu.mapping import mesher as M
        gv, gt_tris = dataset.gt_mesh()
        gt_mesh_path = os.path.join(output, "gt_mesh.ply")
        M.save_ply(gt_mesh_path, gv, gt_tris)

    metrics = slam.terminate(
        stream=stream(), eval_mesh_path=gt_mesh_path)
    print(json.dumps(metrics, indent=2, default=str))

    if args.make_video:
        from goslam_tpu.tools.meshvideo import make_video
        make_video(output)


if __name__ == "__main__":
    main()
