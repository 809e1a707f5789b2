"""Headline benchmarks against BASELINE.md's north stars.

1. END-TO-END full-BA trigger (headline): `Backend.dense_ba(0, 2048)` —
   the thing slam.py:229-241 actually runs per optimizing-process
   iteration: host edge proposal (n^2 flow-distance matrix + greedy NMS,
   backend.py:25-99) + 6 steps of (alt-corr lookup + chunked ConvGRU +
   full DBA) over ~12k edges at the reference's 1/8-res ScanNet geometry
   (30x40), on a populated 2,048-keyframe VideoBuffer.  BASELINE.md sets
   "2,000 keyframes in < 1 s on v5e" as the target.

2. Solver-only trigger (secondary): 12 GN iterations of dba.ba at the
   same scale — the round-2 headline, kept for continuity.

3. Tracked FPS: motion filter + frontend update over synthetic frames at
   ScanNet geometry (BASELINE.md: >= 30 FPS target).

4. Render throughput: rays/sec of one jitted mapping train step at the
   reference's load (4,400 rays x (24+48) samples, go_slam.yaml:19-22,
   93-94) — the BASELINE.json metric that round 2 never measured.

Prints ONE JSON line (end-to-end trigger as the headline metric; the
rest attached as extra keys).
"""
import json
import sys
import threading
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

_T0 = time.time()


def _host_poses(P: int, rng, step: float = 0.01) -> np.ndarray:
    """Smooth random-walk w2c trajectory [P, 7] (t, q-xyzw) in pure numpy
    — the bench must not compile extra XLA programs (lie.exp / transform)
    just to build its input state: at driver time the compile cache is
    cold and those compiles cost ~170 s of the budget."""
    from scipy.spatial.transform import Rotation
    rotvec = np.cumsum(step * rng.standard_normal((P, 3)), axis=0)
    trans = np.cumsum(step * rng.standard_normal((P, 3)), axis=0)
    q = Rotation.from_rotvec(rotvec).as_quat()
    return np.concatenate([trans, q], axis=1).astype(np.float32)


def _host_targets(poses: np.ndarray, disps: np.ndarray, intr,
                  ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """Numpy mirror of projective.transform (reproject pixels of frames
    ii into frames jj) for bench input construction — semantics of
    ops/projective.py:83-102, host-side."""
    from scipy.spatial.transform import Rotation
    fx, fy, cx, cy = intr
    ht, wd = disps.shape[-2:]
    y, x = np.meshgrid(np.arange(ht, dtype=np.float32),
                       np.arange(wd, dtype=np.float32), indexing="ij")
    X0 = np.stack([(x - cx) / fx, (y - cy) / fy, np.ones_like(x)], -1)
    R = Rotation.from_quat(poses[:, 3:])
    t = poses[:, :3]
    Rij = (R[jj] * R[ii].inv()).as_matrix().astype(np.float32)
    tij = (t[jj] - np.einsum("eab,eb->ea", Rij, t[ii])).astype(np.float32)
    d = disps[ii]
    xyz = (np.einsum("eab,hwb->ehwa", Rij, X0)
           + tij[:, None, None, :] * d[..., None])
    Z = np.where(xyz[..., 2] < 0.1, 1.0, xyz[..., 2])
    return np.stack([fx * xyz[..., 0] / Z + cx,
                     fy * xyz[..., 1] / Z + cy], -1).astype(np.float32)


def _mark(s):
    print(f"[bench {time.time() - _T0:.0f}s] {s}", file=sys.stderr,
          flush=True)


def bench_full_ba(bank=None):
    import jax
    import jax.numpy as jnp
    from goslam_tpu.ops import dba

    P, ht, wd = 2048, 30, 40
    radius = 1
    rng = np.random.default_rng(0)

    poses_np = _host_poses(P, rng)
    disps_np = 0.4 + 0.2 * rng.random((P, ht, wd)).astype(np.float32)
    intr_np = np.asarray([72.0, 72.0, wd / 2, ht / 2], np.float32)

    # backend-density edge set: (radius+2)*2 per frame (backend.py:131)
    ii, jj = [], []
    for a in range(P):
        for b in range(max(0, a - (radius + 2)), a):
            ii += [a, b]
            jj += [b, a]
    ii_np = np.asarray(ii, np.int32)
    jj_np = np.asarray(jj, np.int32)
    E = len(ii_np)

    _mark("host state start")
    target_np = _host_targets(poses_np, disps_np, intr_np, ii_np,
                              jj_np) + 0.5
    _mark("host targets done")

    poses = jnp.asarray(poses_np)
    disps = jnp.asarray(disps_np)
    intr = jnp.asarray(intr_np)
    ii = jnp.asarray(ii_np)
    jj = jnp.asarray(jj_np)
    target = jnp.asarray(target_np)
    weight = jnp.ones((E, ht, wd, 2), jnp.float32)
    eta = jnp.full((P, ht, wd), 1e-4, jnp.float32)
    valid = jnp.ones((E,), bool)
    jax.block_until_ready(target)
    _mark("device state up")

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
    _mark("solver compiled + warm")

    def run(k=3):
        """k chained triggers, one sync: throughput per trigger."""
        t0 = time.time()
        p, d = poses, disps
        for _ in range(k):
            p, d = trigger(p, d)
        float(checksum(p, d))
        return (time.time() - t0) / k

    # bank the first honest measurement IMMEDIATELY (the watchdog may
    # fire during the refinement passes at driver time), then refine
    t_first = run(1)  # second warmup (checksum compile) + first timing
    if bank is not None:
        bank(t_first)
    times = [run() for _ in range(3)]
    return P, E, float(np.median(times))


def bench_full_trigger(P: int = 2048, ht: int = 30, wd: int = 40,
                       steps: int = 6, bank=None):
    """End-to-end Backend.dense_ba over a populated VideoBuffer."""
    import jax
    import jax.numpy as jnp
    from goslam_tpu.config import default_config
    from goslam_tpu.system import init_params
    from goslam_tpu.tracking.backend import Backend
    from goslam_tpu.tracking.video import VideoBuffer

    rng = np.random.default_rng(0)
    video = VideoBuffer(buffer=P, ht=ht * 8, wd=wd * 8)
    # the trigger never touches the full-res fields (images, depths_gt,
    # disps_up, filtered outputs) — drop them so the 2048-keyframe state
    # plus the ~12k-edge graph fits HBM alongside the GRU transients
    for name in ("images", "depths_gt", "disps_up", "disps_filtered",
                 "mask_filtered"):
        setattr(video, name, jnp.zeros((1,), jnp.float32))

    video.poses = jnp.asarray(_host_poses(P, rng, step=0.004))
    video.disps = jnp.asarray(
        0.4 + 0.2 * rng.random((P, ht, wd)).astype(np.float32))
    video.intrinsics = jnp.asarray([36.0, 36.0, wd / 2, ht / 2],
                                   jnp.float32)
    video.fmaps = jnp.asarray(
        rng.standard_normal((P, 1, ht, wd, 128)).astype(np.float32) * 0.5
    ).astype(jnp.bfloat16)
    video.nets = jnp.asarray(
        rng.standard_normal((P, ht, wd, 128)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    video.inps = jnp.asarray(
        rng.standard_normal((P, ht, wd, 128)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    video.counter = P

    params = init_params(ht=ht * 8, wd=wd * 8)
    cfg = default_config()
    backend = Backend(params, video, cfg)

    checksum = jax.jit(lambda p, d: p.sum() + d.astype(jnp.float32).sum())

    def trigger():
        n, edges = backend.dense_ba(0, P, steps=steps)
        chk = float(checksum(video.poses, video.disps))
        assert np.isfinite(chk), "dense_ba produced non-finite state"
        return edges

    edges = trigger()          # compile + warmup
    t0 = time.time()
    trigger()
    dt1 = time.time() - t0     # steady state
    if bank is not None:
        bank(edges, dt1)
    t0 = time.time()
    trigger()
    dt2 = time.time() - t0
    return edges, min(dt1, dt2)


def bench_render_rays(n_iters: int = 20):
    """rays/sec of one jitted mapping train step at the reference's load
    (pixels 4400, N_samples 24 + N_surface 48)."""
    import jax
    import jax.numpy as jnp
    from goslam_tpu.config import default_config
    from goslam_tpu.mapping.mapper import Mapper
    from goslam_tpu.tracking.video import VideoBuffer

    rng = np.random.default_rng(0)
    cfg = default_config()   # pixels 4400, N_samples 24, N_surface 48
    R = cfg["mapping"]["pixels"]
    mapper = Mapper(VideoBuffer(buffer=4, ht=48, wd=64), cfg)

    ro = jnp.asarray(0.1 * rng.standard_normal((R, 3)), jnp.float32)
    rd = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    gc = jnp.asarray(rng.random((R, 3)), jnp.float32)
    gd = jnp.asarray(0.5 + rng.random((R,)), jnp.float32)
    bound = jnp.asarray([[-3, 3], [-3, 3], [-3, 3]], jnp.float32)

    params, opt_state = mapper.params, mapper.opt_state
    key = jax.random.PRNGKey(0)

    def run(k):
        nonlocal params, opt_state
        for i in range(k):
            params, opt_state, metrics = mapper._train_step(
                params, opt_state, jax.random.fold_in(key, i),
                ro, rd, gc, gd, bound, bound)
        jax.block_until_ready(params)
        return metrics

    m = run(2)                 # compile + warmup
    assert np.isfinite(float(m["total"]))
    t0 = time.time()
    run(n_iters)
    dt = time.time() - t0
    return R * n_iters / dt


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


# ---------------------------------------------------------------------
# Driver contract: ONE JSON line on stdout, within the driver's time
# budget, no matter which sub-benches fit.  BENCH_r03 produced NOTHING
# (rc=124): the round-3 e2e trigger compiled+executed for longer than
# the budget and the JSON print lived after it.  Results are now
# accumulated as each stage lands and a watchdog THREAD (survives a
# main thread blocked inside a C call, unlike SIGALRM) emits whatever
# is banked before the driver's timeout can hit.

RESULTS: dict = {}
# single-acquire gate: the watchdog Timer thread and the main thread can
# both reach emit_and_exit at budget expiry; a bare check-then-set flag
# could let both print and break the one-JSON-line driver contract
_EMIT_GATE = threading.Lock()


def emit_and_exit(code=0):
    if not _EMIT_GATE.acquire(blocking=False):
        return
    baseline = 1.0  # BASELINE.md: 2k keyframes < 1 s per trigger
    out = {}
    if "e2e_seconds" in RESULTS:
        out["metric"] = ("full_BA_trigger_e2e_seconds_2048kf_"
                         f"{RESULTS.get('e2e_edges', 0)}edges")
        out["value"] = round(RESULTS["e2e_seconds"], 4)
        out["unit"] = "s"
        out["vs_baseline"] = round(baseline / RESULTS["e2e_seconds"], 3)
        if "solver_seconds" in RESULTS:
            out["solver_only_seconds"] = round(RESULTS["solver_seconds"], 4)
    elif "solver_seconds" in RESULTS:
        out["metric"] = "full_BA_solver_seconds_2048kf_12276edges"
        out["value"] = round(RESULTS["solver_seconds"], 4)
        out["unit"] = "s"
        out["vs_baseline"] = round(baseline / RESULTS["solver_seconds"], 3)
        out["e2e_trigger"] = RESULTS.get("e2e_status", "not_measured")
    else:
        out["metric"] = "bench_incomplete"
        out["value"] = 0
        out["unit"] = "s"
        out["vs_baseline"] = 0.0
    for k in ("degraded", "kernel_path"):
        if k in RESULTS:
            out[k] = RESULTS[k]
    if "rays" in RESULTS:
        out["render_rays_per_sec"] = round(RESULTS["rays"], 1)
    if "fps" in RESULTS:
        out["tracked_fps"] = round(RESULTS["fps"], 2)
        out["tracked_fps_vs_target30"] = round(RESULTS["fps"] / 30.0, 3)
    out["stages_completed"] = RESULTS.get("stages", [])
    print(json.dumps(out), flush=True)
    if code is not None:
        os._exit(code)


def main():
    import threading
    import jax

    budget = float(os.environ.get("GOSLAM_BENCH_BUDGET", "420"))
    t_start = time.time()
    watchdog = threading.Timer(budget, emit_and_exit)
    watchdog.daemon = True
    watchdog.start()

    def left():
        return budget - (time.time() - t_start)

    # TPU executables cache fine across runs on the same libtpu; the
    # cache lives IN the repo because the host filesystem is reset
    # between rounds (~/.jax_cache was empty at round-5 start despite
    # round 4 writing it) — a pre-warmed in-repo cache is what lets the
    # driver-time run skip the ~335 s cold solver compile and reach the
    # e2e-trigger stage.  On a libtpu/jax version skew the keys simply
    # miss and this degrades to the round-4 cold-compile behavior.
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    # Stage 1 — solver-only full BA at 2048 kf (guaranteed headline
    # fallback; the round-2 measurement, known to fit the budget).
    try:
        def bank_first(t):
            RESULTS["solver_seconds"] = t
            RESULTS.setdefault("stages", []).append("solver_first")
            print(f"[{time.time()-t_start:.0f}s] solver(first) {t:.3f}s",
                  file=sys.stderr)
        P, E, secs_solver = bench_full_ba(bank=bank_first)
        RESULTS["solver_seconds"] = secs_solver
        RESULTS.setdefault("stages", []).append("solver")
        print(f"[{time.time()-t_start:.0f}s] solver {secs_solver:.3f}s",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"WARN solver-only bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Stage 2 — the honest e2e trigger (edge proposal + alt-corr + GRU +
    # BA): the headline metric, run right after its guaranteed fallback
    # so a cold driver-time cache spends the budget here, not on the
    # auxiliary stages.  First steady-state timing is banked before the
    # refinement pass.
    try:
        if left() > 150:
            def bank_e2e(edges, t):
                RESULTS["e2e_seconds"] = t
                RESULTS["e2e_edges"] = edges
                RESULTS.setdefault("stages", []).append("e2e_first")
                print(f"[{time.time()-t_start:.0f}s] e2e(first) {t:.3f}s",
                      file=sys.stderr)
            edges_e2e, secs_e2e = bench_full_trigger(bank=bank_e2e)
            RESULTS["e2e_seconds"] = secs_e2e
            RESULTS["e2e_edges"] = edges_e2e
            RESULTS.setdefault("stages", []).append("e2e_trigger")
            print(f"[{time.time()-t_start:.0f}s] e2e {secs_e2e:.3f}s",
                  file=sys.stderr)
        else:
            RESULTS["e2e_status"] = "skipped_budget"
    except Exception as e:  # noqa: BLE001
        RESULTS["e2e_status"] = f"failed: {type(e).__name__}"
        print(f"WARN e2e trigger failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Stage 3 — render rays/sec (small programs, quick).
    try:
        if left() > 90:
            rays = bench_render_rays()
            RESULTS["rays"] = rays
            RESULTS.setdefault("stages", []).append("rays")
            print(f"[{time.time()-t_start:.0f}s] rays {rays:.0f}/s",
                  file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"WARN render-rays bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # Stage 4 — tracked FPS (compiles a dozen small programs; only
    # attempted when plenty of budget remains).
    try:
        if left() > 150:
            bench_tracked_fps(n_frames=60, warmup=24)  # compile pass
            fps = bench_tracked_fps()
            RESULTS["fps"] = fps
            RESULTS.setdefault("stages", []).append("fps")
            print(f"[{time.time()-t_start:.0f}s] fps {fps:.1f}",
                  file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"WARN tracked-FPS bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    emit_and_exit(0)


if __name__ == "__main__":
    main()
