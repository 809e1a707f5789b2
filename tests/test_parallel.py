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


def _tiny_mapper(seed=0):
    from goslam_tpu.config import default_config, update_recursive
    from goslam_tpu.mapping.mapper import Mapper
    from goslam_tpu.tracking.video import VideoBuffer

    cfg = default_config()
    update_recursive(cfg, {
        "mapping": {"pixels": 64, "mapping_window_size": 2},
        "rendering": {"N_samples": 6, "N_surface": 8, "perturb": 0.0},
    })
    video = VideoBuffer(buffer=4, ht=16, wd=24)
    return Mapper(video, cfg, seed=seed)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_mapping_matches_single_device(rng, n_dev):
    """One ray-sharded mapping step == the Mapper's own jitted step:
    same loss metrics and same updated params (psum'd normalizers +
    gradients, SURVEY §2.8 'shard ... the ray dimension of mapping')."""
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs {n_dev} devices "
                    f"(run with JAX_PLATFORMS=cpu XLA_FLAGS="
                    f"--xla_force_host_platform_device_count=8)")
    from goslam_tpu.parallel.sharded_mapping import (
        make_sharded_map_step_from_cfg, shard_rays)

    mapper = _tiny_mapper()
    R = 48                           # shard-divisible: exact parity
    ro = jnp.asarray(0.1 * rng.standard_normal((R, 3)), jnp.float32)
    rd = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    gc = jnp.asarray(rng.random((R, 3)), jnp.float32)
    gd = jnp.asarray(0.5 + rng.random((R,)), jnp.float32)
    gd = gd.at[5].set(0.0)           # invalid-depth ray
    bound = jnp.asarray([[-2, 2], [-2, 2], [-2, 2]], jnp.float32)
    key = jax.random.PRNGKey(7)

    p1, _, m1 = mapper._train_step(mapper.params, mapper.opt_state, key,
                                   ro, rd, gc, gd, bound, bound)

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("rays",))
    step = make_sharded_map_step_from_cfg(mesh, mapper)
    ro_p, rd_p, gc_p, gd_p = shard_rays(n_dev, ro, rd, gc, gd)
    p2, _, m2 = step(mapper.params, mapper.opt_state, key,
                     ro_p, rd_p, gc_p, gd_p, bound, bound)

    for k in ("color", "depth", "sdf", "eikonal", "total"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]), rtol=2e-4,
                                   err_msg=k)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        # reduction-order noise through Adam's rsqrt reaches ~2e-4 on a
        # handful of near-zero-grad hash entries; the update scale is
        # grid_lr = 1e-2, so 5e-4 is still a 20x-margin equality check
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)


def test_shard_rays_padding_is_loss_neutral(rng):
    """Non-divisible ray batches: padded rays must stay finite and leave
    the valid-normalized loss terms untouched."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from goslam_tpu.parallel.sharded_mapping import (
        make_sharded_map_step_from_cfg, shard_rays)

    mapper = _tiny_mapper()
    R = 21
    ro = jnp.asarray(0.1 * rng.standard_normal((R, 3)), jnp.float32)
    rd = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    gc = jnp.asarray(rng.random((R, 3)), jnp.float32)
    gd = jnp.asarray(0.5 + rng.random((R,)), jnp.float32)
    bound = jnp.asarray([[-2, 2], [-2, 2], [-2, 2]], jnp.float32)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("rays",))
    step = make_sharded_map_step_from_cfg(mesh, mapper)
    ro_p, rd_p, gc_p, gd_p = shard_rays(2, ro, rd, gc, gd)
    assert ro_p.shape[0] == 22 and float(gd_p[-1]) == 0.0
    p2, _, m2 = step(mapper.params, mapper.opt_state,
                     jax.random.PRNGKey(3), ro_p, rd_p, gc_p, gd_p,
                     bound, bound)
    for k, v in m2.items():
        assert np.isfinite(float(v)), k
    for leaf in jax.tree_util.tree_leaves(p2):
        assert np.isfinite(np.asarray(leaf)).all()


# ---------------------------------------------------------------------------
# Runtime integration: SLAMSystem itself must use the sharded paths on a
# multi-device mesh and reproduce the single-device results (VERDICT r2 #2)
# ---------------------------------------------------------------------------

def _tracking_cfg(n_frames=14):
    from goslam_tpu.config import default_config, update_recursive
    cfg = default_config()
    update_recursive(cfg, {
        "dataset": "synthetic", "mode": "rgbd",
        "cam": {"H": 64, "W": 96, "H_out": 64, "W_out": 96,
                "H_edge": 0, "W_edge": 0},
        "data": {"input_folder": "", "n_frames": n_frames, "output": ""},
        "tracking": {
            "buffer": 32, "warmup": 4, "upsample": False,
            "motion_filter": {"thresh": -1.0},
            "frontend": {"window": 6, "max_factors": 24,
                         "enable_loop": False, "keyframe_thresh": 0.0},
            "global_ba_every": 0,
        },
    })
    return cfg


def _run_tracking(cfg, params, tmp, mesh_on: bool):
    from goslam_tpu.data.synthetic import Synthetic
    from goslam_tpu.system import SLAMSystem

    ds = Synthetic(cfg)
    slam = SLAMSystem(cfg, params=params, output=tmp, only_tracking=True)
    if not mesh_on:
        slam.backend.mesh = None
    for i in range(len(ds)):
        idx, img, depth, intr, gt = ds[i]
        slam.track(float(i), img, depth, intr, gt)
    slam.flush()
    return slam


def test_slam_system_sharded_global_ba_matches_single(rng, tmp_path):
    """Backend.dense_ba through SLAMSystem routes over the device mesh
    (sharded alt-corr GRU + psum'd DBA) and matches the single-device
    run to float tolerance."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh (run with JAX_PLATFORMS=cpu"
                    " XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    from goslam_tpu.system import init_params

    cfg = _tracking_cfg()
    # fp32 conv compute: bf16 conv outputs round differently under the
    # different XLA block tilings of the sharded vs single-device paths;
    # those ULP flips are amplified chaotically by the host greedy edge
    # proposal between BA steps (verified: identical logic passes at
    # atol=1e-4 in fp32, diverges to ~0.4 in bf16).  The production bf16
    # path's end-to-end quality is gated by tests/test_accuracy.py; this
    # test pins fp32 to check the SHARDING logic exactly.
    cfg["tracking"]["compute_dtype"] = "float32"
    params = init_params(ht=64, wd=96)

    slam_a = _run_tracking(cfg, params, str(tmp_path / "a"), mesh_on=False)
    slam_b = _run_tracking(cfg, params, str(tmp_path / "b"), mesh_on=True)
    assert slam_b.backend.mesh is not None  # sharded path active
    n = slam_a.video.counter
    assert n == slam_b.video.counter
    np.testing.assert_allclose(np.asarray(slam_a.video.poses[:n]),
                               np.asarray(slam_b.video.poses[:n]),
                               atol=1e-6)

    na, ea = slam_a.backend.dense_ba(0, n, steps=2)
    nb, eb = slam_b.backend.dense_ba(0, n, steps=2)
    assert (na, ea) == (nb, eb) and ea > 0

    pa = np.asarray(slam_a.video.poses[:n])
    pb = np.asarray(slam_b.video.poses[:n])
    da = np.asarray(slam_a.video.disps[:n])
    db = np.asarray(slam_b.video.disps[:n])
    assert np.isfinite(pb).all() and np.isfinite(db).all()
    np.testing.assert_allclose(pa, pb, atol=1e-4)
    np.testing.assert_allclose(da, db, atol=1e-3)
