"""Dense bundle adjustment: convergence on synthetic problems.

Oracle: a consistent synthetic scene (poses+depths) reprojected to give
perfect flow targets; GN from a perturbed initialization must recover the
ground truth (the reference validates only end-to-end; this is stronger).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from goslam_tpu.ops import dba, lie, projective

HT, WD = 8, 12
INTR = jnp.asarray([6.0, 6.0, WD / 2 - 0.5, HT / 2 - 0.5], jnp.float32)
P = 4


def make_gt(rng):
    poses = [lie.identity()]
    for _ in range(P - 1):
        xi = rng.normal(size=6).astype(np.float32) * np.asarray(
            [0.04, 0.04, 0.04, 0.02, 0.02, 0.02], np.float32)
        poses.append(lie.compose(lie.exp(jnp.asarray(xi)), poses[-1]))
    poses = jnp.stack(poses)
    disps = jnp.asarray(
        0.6 + 0.15 * rng.random((P, HT, WD)).astype(np.float32))
    return poses, disps


def all_edges():
    ii, jj = np.meshgrid(np.arange(P), np.arange(P), indexing="ij")
    keep = ii != jj
    return jnp.asarray(ii[keep]), jnp.asarray(jj[keep])


def pose_err(a, b):
    """Max translation error after aligning to frame 0."""
    rel_a = lie.rel(jnp.broadcast_to(a[0], a.shape), a)
    rel_b = lie.rel(jnp.broadcast_to(b[0], b.shape), b)
    return float(jnp.abs(rel_a[:, :3] - rel_b[:, :3]).max())


def perturb(rng, poses, scale):
    xi = rng.normal(size=(P, 6)).astype(np.float32) * scale
    xi[0] = 0
    return lie.compose(lie.exp(jnp.asarray(xi)), poses)


def test_motion_only_recovers_poses(rng):
    gt_poses, gt_disps = make_gt(rng)
    ii, jj = all_edges()
    E = ii.shape[0]
    target, _ = projective.transform(gt_poses, gt_disps, INTR, ii, jj)
    weight = jnp.ones((E, HT, WD, 2), jnp.float32)
    eta = jnp.full((P, HT, WD), 1e-5, jnp.float32)

    poses0 = perturb(rng, gt_poses, 0.02)
    err0 = pose_err(poses0, gt_poses)

    poses, _ = dba.ba(poses0, gt_disps, INTR, jnp.zeros_like(gt_disps),
                      target, weight, eta, ii, jj, jnp.ones(E, bool),
                      t0=1, t1=P, iters=8, lm=1e-5, ep=1e-4,
                      motion_only=True)
    err1 = pose_err(poses, gt_poses)
    assert err1 < 0.05 * err0, (err0, err1)


def test_full_ba_recovers_poses_and_depth(rng):
    gt_poses, gt_disps = make_gt(rng)
    ii, jj = all_edges()
    E = ii.shape[0]
    target, _ = projective.transform(gt_poses, gt_disps, INTR, ii, jj)
    weight = jnp.ones((E, HT, WD, 2), jnp.float32)
    eta = jnp.full((P, HT, WD), 1e-4, jnp.float32)

    poses0 = perturb(rng, gt_poses, 0.015)
    disps0 = gt_disps * jnp.asarray(
        1.0 + 0.1 * rng.standard_normal((P, HT, WD)).astype(np.float32))
    # RGB-D prior pins the gauge
    disps_sens = gt_disps

    err_p0 = pose_err(poses0, gt_poses)
    err_d0 = float(jnp.abs(disps0 - gt_disps).mean())

    poses, disps = dba.ba(poses0, disps0, INTR, disps_sens, target, weight,
                          eta, ii, jj, jnp.ones(E, bool), t0=1, t1=P,
                          iters=10, lm=1e-5, ep=1e-4)
    err_p1 = pose_err(poses, gt_poses)
    err_d1 = float(jnp.abs(disps - gt_disps).mean())
    assert err_p1 < 0.1 * err_p0, (err_p0, err_p1)
    assert err_d1 < 0.15 * err_d0, (err_d0, err_d1)


def test_fixed_pose_stays_fixed(rng):
    gt_poses, gt_disps = make_gt(rng)
    ii, jj = all_edges()
    E = ii.shape[0]
    target, _ = projective.transform(gt_poses, gt_disps, INTR, ii, jj)
    target = target + 1.0  # force updates
    weight = jnp.ones((E, HT, WD, 2), jnp.float32)
    eta = jnp.full((P, HT, WD), 1e-4, jnp.float32)

    poses, _ = dba.ba(gt_poses, gt_disps, INTR, jnp.zeros_like(gt_disps),
                      target, weight, eta, ii, jj, jnp.ones(E, bool),
                      t0=2, t1=P, iters=2)
    np.testing.assert_allclose(np.asarray(poses[:2]),
                               np.asarray(gt_poses[:2]), atol=1e-6)
    assert float(jnp.abs(poses[2:] - gt_poses[2:]).max()) > 1e-5


def test_invalid_edges_ignored(rng):
    gt_poses, gt_disps = make_gt(rng)
    ii, jj = all_edges()
    E = ii.shape[0]
    target, _ = projective.transform(gt_poses, gt_disps, INTR, ii, jj)
    weight = jnp.ones((E, HT, WD, 2), jnp.float32)
    eta = jnp.full((P, HT, WD), 1e-4, jnp.float32)
    poses0 = perturb(rng, gt_poses, 0.02)

    # pad with garbage edges marked invalid
    pad = 5
    ii_p = jnp.concatenate([ii, jnp.zeros(pad, ii.dtype)])
    jj_p = jnp.concatenate([jj, jnp.zeros(pad, jj.dtype)])
    tg_p = jnp.concatenate(
        [target, 1e6 * jnp.ones((pad, HT, WD, 2), jnp.float32)])
    wt_p = jnp.concatenate([weight, jnp.ones((pad, HT, WD, 2), jnp.float32)])
    valid = jnp.concatenate([jnp.ones(E, bool), jnp.zeros(pad, bool)])

    out_a = dba.ba(poses0, gt_disps, INTR, jnp.zeros_like(gt_disps), target,
                   weight, eta, ii, jj, jnp.ones(E, bool), t0=1, t1=P,
                   iters=2)
    out_b = dba.ba(poses0, gt_disps, INTR, jnp.zeros_like(gt_disps), tg_p,
                   wt_p, eta, ii_p, jj_p, valid, t0=1, t1=P, iters=2)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a[1]), np.asarray(out_b[1]),
                               atol=1e-4)


def test_zero_weight_is_noop(rng):
    gt_poses, gt_disps = make_gt(rng)
    ii, jj = all_edges()
    E = ii.shape[0]
    target, _ = projective.transform(gt_poses, gt_disps, INTR, ii, jj)
    weight = jnp.zeros((E, HT, WD, 2), jnp.float32)
    eta = jnp.full((P, HT, WD), 1e-4, jnp.float32)
    poses, disps = dba.ba(gt_poses, gt_disps, INTR,
                          jnp.zeros_like(gt_disps), target, weight, eta,
                          ii, jj, jnp.ones(E, bool), t0=1, t1=P, iters=2)
    np.testing.assert_allclose(np.asarray(poses), np.asarray(gt_poses),
                               atol=1e-5)


def test_cg_solver_matches_cholesky(rng):
    """The matrix-free PCG path must agree with the dense Cholesky path on
    the same GN problem (both as one-shot solves and after convergence) —
    prerequisite for the runtime using solver='cg' at backend scale."""
    poses_gt, disps_gt = make_gt(rng)
    ii, jj = all_edges()
    target, _ = projective.transform(poses_gt, disps_gt, INTR, ii, jj)
    weight = jnp.asarray(
        0.5 + 0.5 * rng.random(target.shape).astype(np.float32))
    eta = jnp.full((P, HT, WD), 1e-4, jnp.float32)
    valid = jnp.ones(ii.shape, bool)

    poses0 = perturb(rng, poses_gt, 0.02)
    disps0 = disps_gt + 0.05

    args = (poses0, disps0, INTR, jnp.zeros_like(disps0), target, weight,
            eta, ii, jj, valid, 1, P)
    for iters in (1, 4):
        p_ch, d_ch = dba.ba(*args, iters=iters, solver="chol")
        p_cg, d_cg = dba.ba(*args, iters=iters, solver="cg", cg_iters=64)
        np.testing.assert_allclose(np.asarray(p_cg), np.asarray(p_ch),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(d_cg), np.asarray(d_ch),
                                   atol=2e-4)
    # and with the dense-BA damping regime CG converges toward the ground
    # truth exactly as well as chol does
    p_ch, _ = dba.ba(*args, iters=6, solver="chol", lm=1e-5, ep=1e-2)
    p_cg, _ = dba.ba(*args, iters=6, solver="cg", lm=1e-5, ep=1e-2)
    e_ch, e_cg = pose_err(p_ch, poses_gt), pose_err(p_cg, poses_gt)
    assert e_cg < 1.05 * e_ch + 1e-6, (e_cg, e_ch)


def test_cg_plan_path_matches_xla_cg(rng):
    """The fused Pallas system matvec (plan path: sorted slabs, in-kernel
    pose-Hessian + Schur) must produce the same BA solution as the pure
    XLA CG path. Forces the plan preconditions (P%8==0, enough edges)
    and interpret-mode kernels so it runs on CPU."""
    import goslam_tpu.ops.pallas_kernels as pk

    Pn, ht, wd = 16, 8, 12
    intr = jnp.asarray([6.0, 6.0, wd / 2 - 0.5, ht / 2 - 0.5], jnp.float32)
    rng2 = np.random.default_rng(7)
    poses = [lie.identity()]
    for _ in range(Pn - 1):
        xi = rng2.normal(size=6).astype(np.float32) * 0.03
        poses.append(lie.compose(lie.exp(jnp.asarray(xi)), poses[-1]))
    poses = jnp.stack(poses)
    disps = jnp.asarray(0.6 + 0.15 * rng2.random((Pn, ht, wd)),
                        jnp.float32)
    ii0, jj0 = np.meshgrid(np.arange(Pn), np.arange(Pn), indexing="ij")
    keep = (ii0 != jj0) & (np.abs(ii0 - jj0) <= 3)        # deg 6 -> E=84
    ii = jnp.asarray(ii0[keep].astype(np.int32))
    jj = jnp.asarray(jj0[keep].astype(np.int32))
    E = int(ii.shape[0])
    assert ((E + 7) // 8) * 8 >= 8 * 8 + 8                # plan precondition
    valid = np.ones(E, bool)
    valid[5] = False
    coords, _ = projective.transform(poses, disps, intr, ii, jj)
    tgt = coords + 0.3
    wgt = jnp.asarray(rng2.random((E, ht, wd, 2)).astype(np.float32))
    eta = jnp.full(disps.shape, 1e-4, jnp.float32)
    args = (poses, disps, intr, jnp.zeros_like(disps), tgt, wgt, eta,
            ii, jj, jnp.asarray(valid), 1, Pn)

    p_x, d_x = dba.ba(*args, iters=2, solver="cg", cg_iters=64,
                      max_deg=8, fused=False)

    orig_b, orig_m = pk.build_edge_system_fused, pk.schur_matvec

    def build_i(*a, **kw):
        kw["interpret"] = True
        return orig_b(*a, **kw)

    def mv_i(*a, **kw):
        kw["interpret"] = True
        return orig_m(*a, **kw)

    pk.build_edge_system_fused = build_i
    pk.schur_matvec = mv_i
    try:
        p_f, d_f = dba.ba(*args, iters=2, solver="cg", cg_iters=64,
                          max_deg=8, fused=True)
    finally:
        pk.build_edge_system_fused = orig_b
        pk.schur_matvec = orig_m
    # the plan path's Eij slab travels as bf16 (~0.4% operator
    # perturbation) — both paths must land on the same GN solution to
    # within that scale
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_x), atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_x), atol=1e-2)
    # and the perturbed solve must still reduce the objective like the
    # exact one: compare reprojection error at both solutions
    c_x, _ = projective.transform(p_x, d_x, intr, ii, jj)
    c_f, _ = projective.transform(p_f, d_f, intr, ii, jj)
    r_x = float(jnp.abs(c_x - tgt).mean())
    r_f = float(jnp.abs(c_f - tgt).mean())
    assert r_f < 1.05 * r_x + 1e-6, (r_f, r_x)


def test_cg_budget_quality_at_backend_scale(rng):
    """The runtime's CG budget (cg_iters=32, factor_graph._lowmem_step)
    must track the exact Cholesky solve's GN trajectory at a
    backend-representative scale (P=192, band graph)."""
    import jax

    Pn, ht, wd = 192, 8, 12
    intr = jnp.asarray([6.0, 6.0, wd / 2 - 0.5, ht / 2 - 0.5], jnp.float32)
    rng2 = np.random.default_rng(11)
    xi = np.cumsum(0.02 * rng2.standard_normal((Pn, 6)).astype(np.float32),
                   axis=0)
    poses_gt = jax.vmap(lie.exp)(jnp.asarray(xi))
    disps_gt = jnp.asarray(0.5 + 0.2 * rng2.random((Pn, ht, wd)),
                           jnp.float32)
    ii0, jj0 = np.meshgrid(np.arange(Pn), np.arange(Pn), indexing="ij")
    keep = (ii0 != jj0) & (np.abs(ii0 - jj0) <= 3)
    ii = jnp.asarray(ii0[keep].astype(np.int32))
    jj = jnp.asarray(jj0[keep].astype(np.int32))
    E = int(ii.shape[0])
    valid = jnp.ones((E,), bool)
    coords, _ = projective.transform(poses_gt, disps_gt, intr, ii, jj)
    wgt = jnp.ones((E, ht, wd, 2), jnp.float32)
    eta = jnp.full(disps_gt.shape, 1e-4, jnp.float32)

    # perturbed start; targets = GT reprojection (consistent optimum)
    xi_p = 0.02 * rng2.standard_normal((Pn, 6)).astype(np.float32)
    xi_p[0] = 0
    poses0 = lie.compose(jax.vmap(lie.exp)(jnp.asarray(xi_p)), poses_gt)
    args = (poses0, disps_gt, intr, jnp.zeros_like(disps_gt), coords, wgt,
            eta, ii, jj, valid, 1, Pn)

    p_ch, _ = dba.ba(*args, iters=2, lm=1e-5, ep=1e-2, solver="chol",
                     fused=False)
    p_cg, _ = dba.ba(*args, iters=2, lm=1e-5, ep=1e-2, solver="cg",
                     cg_iters=32, max_deg=8, fused=False)

    e_ch = pose_err(p_ch, poses_gt)
    e_cg = pose_err(p_cg, poses_gt)
    # both must reduce the initial error a lot, and CG must not lag chol
    e0 = pose_err(poses0, poses_gt)
    assert e_ch < 0.25 * e0
    assert e_cg < 1.1 * e_ch + 1e-6, (e_cg, e_ch)


def test_degree_overflow_fails_loudly(rng):
    """A per-source degree above max_deg would silently drop edges from
    the degree-capped source table (depth-coupling cross terms in every
    solver path) — concrete inputs must raise instead (VERDICT r2 #6)."""
    gt_poses, gt_disps = make_gt(rng)
    # all edges share source frame 0 -> degree 5 > max_deg=4
    ii = jnp.asarray(np.zeros(5, np.int32))
    jj = jnp.asarray(np.array([1, 2, 3, 1, 2], np.int32))
    E = ii.shape[0]
    target, _ = projective.transform(gt_poses, gt_disps, INTR, ii, jj)
    weight = jnp.ones((E, HT, WD, 2), jnp.float32)
    eta = jnp.full((P, HT, WD), 1e-5, jnp.float32)
    with pytest.raises(ValueError, match="degree"):
        dba.ba(gt_poses, gt_disps, INTR, jnp.zeros_like(gt_disps),
               target, weight, eta, ii, jj, jnp.ones(E, bool),
               t0=1, t1=P, iters=1, max_deg=4)


def test_degree_overflow_traced_poisons_output(rng):
    """With traced ii the host check cannot run; the overflow must poison
    the outputs (NaN) so finiteness gates trip instead of silently
    optimizing an inconsistent system."""
    import jax
    gt_poses, gt_disps = make_gt(rng)
    ii = jnp.asarray(np.zeros(5, np.int32))
    jj = jnp.asarray(np.array([1, 2, 3, 1, 2], np.int32))
    E = ii.shape[0]
    target, _ = projective.transform(gt_poses, gt_disps, INTR, ii, jj)
    weight = jnp.ones((E, HT, WD, 2), jnp.float32)
    eta = jnp.full((P, HT, WD), 1e-5, jnp.float32)

    @jax.jit
    def run(ii, jj):
        return dba.ba(gt_poses, gt_disps, INTR, jnp.zeros_like(gt_disps),
                      target, weight, eta, ii, jj, jnp.ones(E, bool),
                      t0=1, t1=P, iters=1, max_deg=4)

    poses, disps = run(ii, jj)
    assert not np.isfinite(np.asarray(poses)).all()
    assert not np.isfinite(np.asarray(disps)).all()
    # same shapes under capacity: clean output
    ok_jj = jnp.asarray(np.array([1, 2, 3, 4, 5], np.int32))
    p2, d2 = run(jnp.asarray(np.array([0, 0, 0, 0, 1], np.int32)), ok_jj)
    assert np.isfinite(np.asarray(p2)).all()
