"""Headline benchmark: online full bundle adjustment throughput.

The reference's headline scaling claim is online full BA with loop closure
over thousands of keyframes (README.md:240, scene0054_00 with 6,629
frames); BASELINE.md sets the target "2,000 keyframes in < 1 s on v5e".
This benchmark runs the complete DBA pipeline (system build + Schur +
on-device Cholesky + retractions, 6 GN steps x 2 inner iterations — the
reference's per-trigger work, slam.py:85 / backend.py:106-114) over 2,048
keyframes at the reference's 1/8-res ScanNet geometry (30x40) with its
backend edge density ((radius+2)*2 edges/frame, backend.py:131).

Prints ONE JSON line: seconds per full-BA trigger, vs_baseline = 1s / ours.
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from goslam_tpu.ops import dba, lie, projective

    P, ht, wd = 2048, 30, 40
    radius = 1
    rng = np.random.default_rng(0)

    # smooth synthetic trajectory + depths
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

    def trigger(poses, disps):
        """One full-BA trigger: 6 GN steps x iters=2 (slam.py:85)."""
        for _ in range(6):
            poses, disps = dba.ba(poses, disps, intr,
                                  jnp.zeros_like(disps), target, weight,
                                  eta, ii, jj, valid, 1, P, iters=2,
                                  lm=1e-5, ep=1e-2, solver="cg",
                                  cg_iters=32)
        return poses, disps

    # compile + warmup (materialize: block_until_ready alone does not
    # synchronize through the axon tunnel)
    out = trigger(poses, disps)
    chk = float(out[0].sum())
    assert np.isfinite(chk), "BA produced non-finite poses"

    times = []
    for _ in range(3):
        t0 = time.time()
        out = trigger(poses, disps)
        float(out[0].sum())
        float(out[1].sum())
        times.append(time.time() - t0)

    secs = float(np.median(times))
    baseline = 1.0  # BASELINE.md: 2k keyframes < 1 s per trigger
    print(json.dumps({
        "metric": f"full_BA_trigger_seconds_{P}kf_{E}edges",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(baseline / secs, 3),
    }))


if __name__ == "__main__":
    main()
