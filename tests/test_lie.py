"""SE(3) ops vs. finite differences / closure properties.

Oracle formulas: droid_kernels.cu:58-175 and lietorch semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goslam_tpu.ops import lie


def random_pose(rng, n=()):
    xi = rng.normal(size=n + (6,)).astype(np.float32) * 0.5
    return lie.exp(jnp.asarray(xi))


def test_identity_roundtrip():
    p = lie.identity((3,))
    np.testing.assert_allclose(np.asarray(lie.compose(p, p)), np.asarray(p),
                               atol=1e-6)


def test_exp_log_roundtrip(rng):
    # log is the principal branch: keep rotation angles below pi
    xi = rng.normal(size=(64, 6)).astype(np.float32)
    xi[:, 3:] *= 0.9 * np.pi / np.maximum(
        np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True), 1.0) / 3.0
    xi = jnp.asarray(xi)
    xi2 = lie.log(lie.exp(xi))
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_exp_log_small_angle():
    xi = jnp.asarray([[1e-9, -2e-9, 3e-9, 1e-10, -1e-10, 2e-10],
                      [0.1, 0.2, -0.3, 0, 0, 0]], dtype=jnp.float32)
    out = lie.log(lie.exp(xi))
    np.testing.assert_allclose(np.asarray(out), np.asarray(xi), atol=1e-6)


def test_compose_inv(rng):
    a = random_pose(rng, (16,))
    b = random_pose(rng, (16,))
    ab = lie.compose(a, b)
    ident = lie.compose(ab, lie.inv(ab))
    np.testing.assert_allclose(np.asarray(ident[..., :3]), 0, atol=1e-5)
    qw = np.abs(np.asarray(ident[..., 6]))
    np.testing.assert_allclose(qw, 1, atol=1e-5)


def test_rel_definition(rng):
    gi = random_pose(rng, (8,))
    gj = random_pose(rng, (8,))
    gij = lie.rel(gi, gj)
    np.testing.assert_allclose(
        np.asarray(lie.compose(gij, gi))[:, :3],
        np.asarray(gj)[:, :3], atol=1e-5)


def test_act_matches_matrix(rng):
    g = random_pose(rng, (8,))
    x = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    M = lie.matrix(g)
    expect = jnp.einsum("bij,bj->bi", M[:, :3, :3], x) + M[:, :3, 3]
    np.testing.assert_allclose(np.asarray(lie.act3(g, x)), np.asarray(expect),
                               atol=1e-5)


def test_act_homogeneous(rng):
    """act on [x,y,z,h]: xyz' = R xyz + h t (droid_kernels.cu:70-77)."""
    g = random_pose(rng, (8,))
    X = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    Y = lie.act(g, X)
    R = lie.matrix(g)[:, :3, :3]
    expect = jnp.einsum("bij,bj->bi", R, X[:, :3]) + X[:, 3:4] * g[:, :3]
    np.testing.assert_allclose(np.asarray(Y[:, :3]), np.asarray(expect),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(Y[:, 3]), np.asarray(X[:, 3]))


def test_matrix_roundtrip(rng):
    g = random_pose(rng, (32,))
    g2 = lie.from_matrix(lie.matrix(g))
    # quaternions are sign-ambiguous
    q1, q2 = np.asarray(g[:, 3:]), np.asarray(g2[:, 3:])
    sign = np.sign(np.sum(q1 * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2[:, :3]), np.asarray(g[:, :3]),
                               atol=1e-5)


def test_retr_left_increment(rng):
    g = random_pose(rng, (4,))
    xi = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32) * 0.1)
    expect = lie.compose(lie.exp(xi), g)
    np.testing.assert_allclose(np.asarray(lie.retr(g, xi)),
                               np.asarray(expect), atol=1e-6)


def test_adjT_is_dual_adjoint(rng):
    """<adjT(G, a), xi> == <a, Adj(G) xi> where Adj acts on tangents via
    exp(Adj(G) xi) = G exp(xi) G^-1."""
    g = random_pose(rng, (1,))[0]
    a = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))

    eps = 1e-3
    # numeric Adj(G) xi = d/dt log(G exp(t xi) G^-1)
    adj_xi = lie.log(lie.compose(lie.compose(g, lie.exp(eps * xi)),
                                 lie.inv(g))) / eps
    lhs = jnp.dot(lie.adjT(g, a), xi)
    rhs = jnp.dot(a, adj_xi)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=2e-2, atol=2e-3)


def test_interp_endpoints(rng):
    a = random_pose(rng, (4,))
    b = random_pose(rng, (4,))
    p0 = lie.interp(a, b, jnp.zeros(4))
    p1 = lie.interp(a, b, jnp.ones(4))
    np.testing.assert_allclose(np.asarray(p0[:, :3]), np.asarray(a[:, :3]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1[:, :3]), np.asarray(b[:, :3]),
                               atol=1e-4)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lie.exp))
    xi = jnp.ones((8, 6)) * 0.1
    out = f(xi)
    assert out.shape == (8, 7)
    assert bool(jnp.all(jnp.isfinite(out)))
