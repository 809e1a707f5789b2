"""Headline benchmarks against BASELINE.md's north stars.

1. Online full bundle adjustment: the reference's headline scaling claim
   is online full BA with loop closure over thousands of keyframes
   (README.md:240, scene0054_00 with 6,629 frames); BASELINE.md sets the
   target "2,000 keyframes in < 1 s on v5e".  This runs the complete DBA
   pipeline over 2,048 keyframes at the reference's 1/8-res ScanNet
   geometry (30x40) with backend edge density ((radius+2)*2 edges/frame,
   backend.py:131), 6 GN steps x 2 inner iterations per trigger
   (slam.py:85) — with EXACTLY the solver configuration the runtime's
   update_lowmem selects at this scale (factor_graph.py: CG for P >= 192,
   Pallas fused edge build on TPU).

2. Tracked FPS: motion filter + frontend update over synthetic frames at
   ScanNet geometry (BASELINE.md: >= 30 FPS target).

Prints ONE JSON line (full-BA trigger as the headline metric; tracked FPS
attached as extra keys).
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_full_ba():
    import jax
    import jax.numpy as jnp
    from goslam_tpu.ops import dba, lie, projective

    P, ht, wd = 2048, 30, 40
    radius = 1
    rng = np.random.default_rng(0)

    xi = np.cumsum(0.01 * rng.standard_normal((P, 6)).astype(np.float32),
                   axis=0)
    poses = jax.vmap(lie.exp)(jnp.asarray(xi))
    disps = jnp.asarray(0.4 + 0.2 * rng.random((P, ht, wd)).astype(np.float32))
    intr = jnp.asarray([72.0, 72.0, wd / 2, ht / 2], jnp.float32)

    # backend-density edge set: (radius+2)*2 per frame (backend.py:131)
    ii, jj = [], []
    for a in range(P):
        for b in range(max(0, a - (radius + 2)), a):
            ii += [a, b]
            jj += [b, a]
    ii = jnp.asarray(np.asarray(ii, np.int32))
    jj = jnp.asarray(np.asarray(jj, np.int32))
    E = ii.shape[0]

    target, _ = projective.transform(poses, disps, intr, ii, jj)
    target = target + 0.5
    weight = jnp.ones((E, ht, wd, 2), jnp.float32)
    eta = jnp.full((P, ht, wd), 1e-4, jnp.float32)
    valid = jnp.ones((E,), bool)

    # mirror the runtime's solver + degree-bucket selection
    # (factor_graph._lowmem_step)
    from goslam_tpu.utils.shapes import bucket
    solver = "cg" if P >= 192 else "chol"
    deg = int(np.bincount(np.asarray(ii), minlength=1).max())
    max_deg = bucket(deg, (4, 8, 12, 16, 24, 32, 48, 64, 96, 128))

    def trigger(poses, disps):
        """One full-BA trigger: 6 GN steps x iters=2 = 12 GN iterations
        (slam.py:85), dense-BA damping regime (factor_graph.py:313-318).
        Issued as ONE jitted call so the number measures device compute,
        not the axon tunnel's ~75 ms per-dispatch round trip (on a
        directly-attached TPU the per-call overhead is microseconds)."""
        return dba.ba(poses, disps, intr, jnp.zeros_like(disps), target,
                      weight, eta, ii, jj, valid, 1, P, iters=12,
                      lm=1e-5, ep=1e-2, solver=solver, cg_iters=32,
                      max_deg=max_deg)

    # device-side checksum: materializing poses+disps via scalar fetches
    # (a full disps download through the tunnel costs ~150 ms and is not
    # part of the work being measured — the runtime chains BA steps
    # without reading state back, factor_graph.update_lowmem)
    checksum = jax.jit(lambda p, d: p.sum() + d.sum())

    # compile + warmup
    out = trigger(poses, disps)
    chk = float(checksum(*out))
    assert np.isfinite(chk), "BA produced non-finite poses"

    def run(k=3):
        """k chained triggers, one sync: throughput per trigger."""
        t0 = time.time()
        p, d = poses, disps
        for _ in range(k):
            p, d = trigger(p, d)
        float(checksum(p, d))
        return (time.time() - t0) / k

    run(1)  # second warmup (checksum compile)
    times = [run() for _ in range(3)]
    return P, E, float(np.median(times))


def bench_tracked_fps(n_frames: int = 120, warmup: int = 24):
    """Per-frame tracking throughput: motion filter + frontend over
    synthetic frames at ScanNet geometry (240x320), mapping off."""
    from goslam_tpu.config import default_config
    from goslam_tpu.data.synthetic import Synthetic
    from goslam_tpu.system import SLAMSystem
    from goslam_tpu.config import update_recursive

    cfg = default_config()
    update_recursive(cfg, {
        "dataset": "synthetic", "mode": "rgbd",
        "cam": {"H": 240, "W": 320, "H_out": 240, "W_out": 320,
                "H_edge": 0, "W_edge": 0,
                "fx": 290.0, "fy": 290.0, "cx": 160.0, "cy": 120.0},
        "data": {"input_folder": "", "n_frames": n_frames,
                 "output": "/tmp/bench_tracking", "room_half_size": 3.0},
        "tracking": {"global_ba_every": 0},
    })
    ds = Synthetic(cfg)
    frames = [ds[i] for i in range(n_frames)]          # pre-render

    slam = SLAMSystem(cfg, output="/tmp/bench_tracking",
                      only_tracking=True)
    for i in range(warmup):
        idx, img, depth, intr, gt = frames[i]
        slam.track(float(i), img, depth, intr, gt)

    slam.flush()
    t0 = time.time()
    for i in range(warmup, n_frames):
        idx, img, depth, intr, gt = frames[i]
        slam.track(float(i), img, depth, intr, gt)
    slam.flush()
    # materialize device state (tunnel-safe sync)
    float(slam.video.poses[:max(slam.video.counter, 1)].sum())
    dt = time.time() - t0
    return (n_frames - warmup) / dt


def main():
    import jax
    cache = os.path.expanduser("~/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    P, E, secs = bench_full_ba()

    try:
        # two passes: the first absorbs jit compiles + tunnel warmup, the
        # second measures the steady state a long-running SLAM session sees
        bench_tracked_fps(n_frames=60, warmup=24)
        fps = bench_tracked_fps()
    except Exception as e:  # noqa: BLE001 — FPS is auxiliary
        print(f"WARN tracked-FPS bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        fps = None

    baseline = 1.0  # BASELINE.md: 2k keyframes < 1 s per trigger
    out = {
        "metric": f"full_BA_trigger_seconds_{P}kf_{E}edges",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(baseline / secs, 3),
    }
    if fps is not None:
        out["tracked_fps"] = round(fps, 2)
        out["tracked_fps_vs_target30"] = round(fps / 30.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
