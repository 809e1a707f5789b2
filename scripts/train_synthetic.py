#!/usr/bin/env python3
"""Train the DroidNet tracking checkpoint on the synthetic domain.

    python scripts/train_synthetic.py [--steps N] [--out PATH]

Produces checkpoints/droid_synthetic.ckpt used by tests/test_accuracy.py
and loadable via tracking.pretrained in any config (see
goslam_tpu/train/trainer.py for why this exists in place of droid.pth).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--ht", type=int, default=128)
    ap.add_argument("--wd", type=int, default=192)
    ap.add_argument("--scenes", type=int, default=2048)
    ap.add_argument("--multires", default="240x320",
                    help="comma-separated extra HxW resolutions mixed "
                         "into the scene pool ('' to disable)")
    ap.add_argument("--lr", type=float, default=2.5e-4)
    ap.add_argument("--out", default="checkpoints/droid_synthetic.ckpt")
    ap.add_argument("--log", default="")
    ap.add_argument("--resume", default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from goslam_tpu.train.trainer import TrainConfig, fit, load_checkpoint

    multires = tuple(
        tuple(int(v) for v in r.split("x"))
        for r in args.multires.split(",") if r)
    cfg = TrainConfig(steps=args.steps, n_scenes=args.scenes, lr=args.lr,
                      ht=args.ht, wd=args.wd, multires=multires)
    params = None
    if args.resume and os.path.exists(args.resume):
        params, _ = load_checkpoint(args.resume)
        print(f"resumed from {args.resume}")
    fit(cfg, args.out, params=params, log_file=args.log or None)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
