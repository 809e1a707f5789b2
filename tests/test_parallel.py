"""Sharded BA == single-device BA, across virtual CPU mesh sizes.

Run with:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m pytest tests/test_parallel.py

Validates the SURVEY §2.8 multi-chip scale-out design: ba_sharded's
psum-combined normal equations must reproduce dba.ba bit-for-tolerance on
identical inputs for 1/2/4/8-device meshes (the driver separately runs
__graft_entry__.dryrun_multichip).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from goslam_tpu.ops import dba, lie, projective
from goslam_tpu.parallel.sharded_ba import (ba_sharded,
                                            partition_edges_by_source)

pytestmark = pytest.mark.quick


def _problem(rng, Pn=10, ht=6, wd=8):
    poses = jax.vmap(lie.exp)(
        jnp.asarray(0.05 * rng.standard_normal((Pn, 6)), jnp.float32))
    disps = jnp.asarray(0.4 + 0.2 * rng.random((Pn, ht, wd)), jnp.float32)
    intr = jnp.asarray([8.0, 8.0, wd / 2, ht / 2], jnp.float32)

    ii, jj = np.meshgrid(np.arange(Pn), np.arange(Pn), indexing="ij")
    keep = (ii != jj) & (np.abs(ii - jj) <= 3)
    ii, jj = ii[keep].astype(np.int32), jj[keep].astype(np.int32)
    valid = np.ones(len(ii), bool)
    valid[-3:] = False  # exercise padding/masking

    coords, _ = projective.transform(poses, disps, intr,
                                     jnp.asarray(ii), jnp.asarray(jj))
    target = np.asarray(coords) + 0.3 * rng.standard_normal(
        coords.shape).astype(np.float32)
    weight = (0.5 + 0.5 * rng.random(coords.shape)).astype(np.float32)
    eta = jnp.full((Pn, ht, wd), 1e-4, jnp.float32)
    return poses, disps, intr, target, weight, eta, ii, jj, valid


def test_partition_keeps_same_source_shard_local(rng):
    ii = rng.integers(0, 16, 200).astype(np.int32)
    jj = rng.integers(0, 16, 200).astype(np.int32)
    valid = rng.random(200) > 0.2
    ii_s, jj_s, ok_s = partition_edges_by_source(ii, jj, valid, 16, 4)
    # every valid edge appears exactly once, on the shard that owns its ii
    seen = []
    for s in range(4):
        srcs = set(ii_s[s][ok_s[s]].tolist())
        for s2 in range(s + 1, 4):
            assert not srcs & set(ii_s[s2][ok_s[s2]].tolist())
        seen.extend(zip(ii_s[s][ok_s[s]].tolist(), jj_s[s][ok_s[s]].tolist()))
    want = sorted(zip(ii[valid].tolist(), jj[valid].tolist()))
    assert sorted(seen) == want


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_sharded_ba_matches_reference_solver(rng, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs {n_dev} devices "
                    f"(run with JAX_PLATFORMS=cpu XLA_FLAGS="
                    f"--xla_force_host_platform_device_count=8)")
    poses, disps, intr, target, weight, eta, ii, jj, valid = _problem(rng)
    Pn = poses.shape[0]
    ht, wd = disps.shape[-2:]

    ref_poses, ref_disps = dba.ba(
        poses, disps, intr, jnp.zeros_like(disps),
        jnp.asarray(target), jnp.asarray(weight), eta,
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(valid),
        1, Pn, iters=2)

    ii_s, jj_s, ok_s = partition_edges_by_source(ii, jj, valid, Pn, n_dev)
    S, Es = ii_s.shape
    tg = np.zeros((S, Es, ht, wd, 2), np.float32)
    ww = np.zeros((S, Es, ht, wd, 2), np.float32)
    lut = {(int(a), int(b)): k for k, (a, b) in enumerate(zip(ii, jj))}
    for s in range(S):
        for e in range(Es):
            if ok_s[s, e]:
                k = lut[(int(ii_s[s, e]), int(jj_s[s, e]))]
                tg[s, e] = target[k]
                ww[s, e] = weight[k]

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("edges",))
    out_poses, out_disps = ba_sharded(
        mesh, poses, disps, intr, jnp.zeros_like(disps),
        jnp.asarray(tg), jnp.asarray(ww), eta,
        jnp.asarray(ii_s), jnp.asarray(jj_s), jnp.asarray(ok_s),
        1, Pn, iters=2)

    np.testing.assert_allclose(np.asarray(out_poses),
                               np.asarray(ref_poses), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_disps),
                               np.asarray(ref_disps), atol=2e-4)
