"""Projective transform vs. synthetic-scene oracles and autodiff.

The Jacobians used by the BA system build are validated against jax.jacfwd
of the projection itself (the reference validates its CUDA kernel against
geom/projective_ops.py — autodiff is our equivalent, stronger oracle).
"""
import jax
import jax.numpy as jnp
import numpy as np

from goslam_tpu.ops import dba, lie, projective


HT, WD = 12, 16
INTR = jnp.asarray([8.0, 8.0, WD / 2 - 0.5, HT / 2 - 0.5], jnp.float32)


def make_scene(rng, n=4):
    """Frames looking at a plane of points from slightly different poses."""
    poses = [lie.identity()]
    for _ in range(n - 1):
        xi = rng.normal(size=6).astype(np.float32) * np.asarray(
            [0.05, 0.05, 0.05, 0.02, 0.02, 0.02], np.float32)
        poses.append(lie.compose(lie.exp(jnp.asarray(xi)), poses[-1]))
    poses = jnp.stack(poses)
    disps = jnp.asarray(
        0.5 + 0.1 * rng.random((n, HT, WD)).astype(np.float32))
    return poses, disps


def test_identity_transform_is_grid(rng):
    poses = jnp.broadcast_to(lie.identity(), (2, 7))
    disps = jnp.ones((2, HT, WD), jnp.float32) * 0.5
    ii = jnp.asarray([0, 1])
    jj = jnp.asarray([0 + 0, 1])  # self edges would be stereo; use cross
    coords, valid = projective.transform(
        poses, disps, INTR, jnp.asarray([0]), jnp.asarray([1]))
    grid = projective.coords_grid(HT, WD)
    np.testing.assert_allclose(np.asarray(coords[0]), np.asarray(grid),
                               atol=1e-4)
    assert float(valid.mean()) == 1.0


def test_transform_consistency_with_world_points(rng):
    """Reproject via the homogeneous pipeline == project explicit 3D points."""
    poses, disps = make_scene(rng)
    ii = jnp.asarray([0, 1, 2])
    jj = jnp.asarray([1, 3, 0])
    coords, valid = projective.transform(poses, disps, INTR, ii, jj)

    pts_world = projective.iproj_world(poses, disps, INTR)    # [T,h,w,3]
    fx, fy, cx, cy = INTR
    for k in range(3):
        pw = pts_world[ii[k]]
        pc = lie.act3(poses[jj[k]][None, None], pw)
        exp_x = fx * pc[..., 0] / pc[..., 2] + cx
        exp_y = fy * pc[..., 1] / pc[..., 2] + cy
        m = np.asarray(valid[k]) > 0
        np.testing.assert_allclose(np.asarray(coords[k, ..., 0])[m],
                                   np.asarray(exp_x)[m], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(coords[k, ..., 1])[m],
                                   np.asarray(exp_y)[m], rtol=1e-3, atol=1e-3)


def test_stereo_edge_uses_baseline(rng):
    poses, disps = make_scene(rng)
    ii = jnp.asarray([1])
    jj = jnp.asarray([1])
    coords, _ = projective.transform(poses, disps, INTR, ii, jj)
    # stereo: x shifts by fx * baseline * disp, y unchanged
    grid = projective.coords_grid(HT, WD)
    expect_x = grid[..., 0] - INTR[0] * 0.1 * disps[1]
    np.testing.assert_allclose(np.asarray(coords[0, ..., 0]),
                               np.asarray(expect_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(coords[0, ..., 1]),
                               np.asarray(grid[..., 1]), atol=1e-4)


def test_frame_distance_properties(rng):
    poses, disps = make_scene(rng)
    d_self = projective.frame_distance(
        poses, disps, INTR, jnp.asarray([1]), jnp.asarray([1]))
    # ii==jj triggers the stereo baseline so distance is the baseline flow
    assert float(d_self[0]) > 0
    d01 = projective.frame_distance(
        poses, disps, INTR, jnp.asarray([0]), jnp.asarray([1]))
    d03 = projective.frame_distance(
        poses, disps, INTR, jnp.asarray([0]), jnp.asarray([3]))
    assert np.isfinite(float(d01[0]))
    # farther frame should (statistically) have larger flow distance
    assert float(d03[0]) > float(d01[0]) * 0.5


def test_distance_matrix_symmetric(rng):
    poses, disps = make_scene(rng)
    dm = projective.frame_distance_matrix(poses, disps, INTR, 4, beta=0.5)
    np.testing.assert_allclose(np.asarray(dm), np.asarray(dm).T, atol=1e-3)


def test_edge_system_jacobians_match_autodiff(rng):
    """Analytic Ji/Jj/Jz vs. jax.jacfwd of the projection residual."""
    poses, disps = make_scene(rng)
    ii = jnp.asarray([0, 2])
    jj = jnp.asarray([1, 3])
    E = 2

    target, _ = projective.transform(poses, disps, INTR, ii, jj)
    target = target + 0.5  # nonzero residual
    weight = jnp.ones((E, HT, WD, 2), jnp.float32)

    sys = dba.build_edge_system(poses, disps, INTR, target, weight, ii, jj,
                                jnp.ones(E, bool))

    # autodiff oracle: full Hessian via per-pixel jacobians
    def proj_residual(xi_i, xi_j, dd, e):
        p_i = lie.retr(poses[ii[e]], xi_i)
        p_j = lie.retr(poses[jj[e]], xi_j)
        Gij = lie.rel(p_i, p_j)
        hw = HT * WD
        grid = projective.coords_grid(HT, WD).reshape(hw, 2)
        fx, fy, cx, cy = INTR
        d = disps[ii[e]].reshape(hw) + dd
        X = jnp.stack([(grid[:, 0] - cx) / fx, (grid[:, 1] - cy) / fy,
                       jnp.ones(hw), d], axis=-1)
        Xj = lie.act(Gij[None], X)
        z = Xj[:, 2]
        zinv = 1.0 / jnp.maximum(z, 1e-6)
        px = fx * Xj[:, 0] * zinv + cx
        py = fy * Xj[:, 1] * zinv + cy
        return jnp.stack([px, py], -1)

    z6 = jnp.zeros(6)
    for e in range(E):
        Jj_auto = jax.jacfwd(lambda xj: proj_residual(z6, xj, 0.0, e))(z6)
        Ji_auto = jax.jacfwd(lambda xi: proj_residual(xi, z6, 0.0, e))(z6)
        Jz_auto = jax.jacfwd(
            lambda dd: proj_residual(z6, z6, dd, e))(
                jnp.zeros(HT * WD))
        # reconstruct analytic J from the weighted E blocks:
        # Eij = w * Jz * Jj with w = 0.001 (weight scale), so compare shapes
        # through the Hessian instead: H = sum_px w (Jx Jx^T)
        Jx_auto = jnp.concatenate([Ji_auto, Jj_auto], axis=-1)  # [hw,2,12]
        w = 0.001
        H_auto = w * jnp.einsum("pka,pkb->ab", Jx_auto, Jx_auto)
        np.testing.assert_allclose(np.asarray(sys.H[e]), np.asarray(H_auto),
                                   rtol=5e-3, atol=5e-3)
        # depth coupling diag: C = w * sum_k Jz_k^2 per pixel
        Jz_diag = jnp.stack([jnp.diagonal(Jz_auto[:, 0, :]),
                             jnp.diagonal(Jz_auto[:, 1, :])], -1)
        C_auto = w * jnp.sum(Jz_diag ** 2, -1)
        np.testing.assert_allclose(np.asarray(sys.Cii[e]),
                                   np.asarray(C_auto), rtol=5e-3, atol=1e-5)


def test_depth_consistency_counts(rng):
    poses, disps = make_scene(rng, n=8)
    counts = projective.depth_consistency_count(poses, disps, INTR, 0.5)
    assert counts.shape == (8, HT, WD)
    # a consistent synthetic scene should have plenty of agreement
    assert float(counts.mean()) > 0.5
