"""Mapping stack: hash grid, NeuS rendering/losses, mesher pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goslam_tpu.mapping import mesher
from goslam_tpu.mapping.hashgrid import HashGrid
from goslam_tpu.mapping.instant_neus import (InstantNeuS, compute_sdf_losses,
                                             in_bound, normalize_3d)
from goslam_tpu.mapping.renderer import render_rays, sample_z_vals

BOUND = jnp.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]])


def test_hashgrid_shapes_and_grads(rng):
    hg = HashGrid(n_levels=4, log2_table=10, base_res=4)
    x = jnp.asarray(rng.random((32, 3)).astype(np.float32))
    params = hg.init(jax.random.PRNGKey(0), x)
    out = hg.apply(params, x)
    assert out.shape == (32, 8)

    # gradient flows into the table
    def loss(p):
        return (hg.apply(p, x) ** 2).sum()

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["params"]["table"]).sum()) > 0


def test_hashgrid_interpolation_continuity(rng):
    hg = HashGrid(n_levels=2, log2_table=12, base_res=4)
    x = jnp.asarray(rng.random((8, 3)).astype(np.float32)) * 0.8 + 0.1
    params = hg.init(jax.random.PRNGKey(1), x)
    eps = 1e-4
    a = hg.apply(params, x)
    b = hg.apply(params, x + eps)
    assert float(jnp.abs(a - b).max()) < 0.05  # trilinear => Lipschitz


@pytest.fixture(scope="module")
def neus():
    model = InstantNeuS()
    dummy = jnp.zeros((4, 3))
    zv = jnp.linspace(0.1, 1.0, 8)[None].repeat(4, 0)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy, zv, zv,
                        BOUND, BOUND)["params"]
    return model, params


def test_render_outputs(neus, rng):
    model, params = neus
    R = 16
    rays_o = jnp.zeros((R, 3))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    gt_depth = jnp.full((R,), 1.5)

    out = render_rays(model, params, jax.random.PRNGKey(2), rays_o, rays_d,
                      gt_depth, BOUND, BOUND, n_samples=8, n_surface=8,
                      perturb=1.0)
    assert out["color"].shape == (R, 3)
    assert out["depth"].shape == (R, 1)
    assert out["sdf"].shape == (R, 16)
    assert bool(jnp.isfinite(out["color"]).all())
    assert float(out["color"].min()) >= 0 and float(out["color"].max()) <= 1


def test_z_sampling_brackets_depth(rng):
    R = 8
    rays_o = jnp.zeros((R, 3))
    rays_d = jnp.asarray(np.tile([0, 0, 1.0], (R, 1)).astype(np.float32))
    gt = jnp.full((R,), 1.0)
    z, _ = sample_z_vals(jax.random.PRNGKey(0), rays_o, rays_d, gt, BOUND,
                         8, 16, perturb=0.0)
    z = np.asarray(z)
    # surface samples cover [0.9, 1.1]
    assert (np.abs(z - 1.0) < 0.101).sum(axis=1).min() >= 16
    assert (np.diff(z, axis=1) >= 0).all()


def test_sdf_losses_zero_on_perfect(rng):
    """A perfect linear SDF along the ray gives ~zero truncation loss."""
    R, S = 4, 16
    z = jnp.linspace(0.5, 1.5, S)[None].repeat(R, 0)
    gt = jnp.ones((R,))
    sdf = gt[:, None] - z    # exact signed distance along the ray
    sdf_l, front_l = compute_sdf_losses(sdf, z, gt, truncation=0.16,
                                        sparse_factor=5.0)
    assert float(sdf_l) < 1e-5
    assert float(front_l) < 1e-3


def test_mapper_training_reduces_loss(rng):
    """Train on a synthetic flat wall; depth+sdf losses must drop."""
    from goslam_tpu.mapping.mapper import make_optimizer
    import optax

    model = InstantNeuS()
    R = 64
    rays_o = jnp.zeros((R, 3))
    d = rng.normal(size=(R, 3)).astype(np.float32) * 0.2
    d[:, 2] = 1.0
    rays_d = jnp.asarray(d)
    gt_depth = jnp.full((R,), 1.2)
    gt_color = jnp.broadcast_to(jnp.asarray([0.2, 0.5, 0.8]), (R, 3))

    zv = jnp.linspace(0.1, 1.0, 8)[None].repeat(4, 0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.zeros((4, 3)), zv, zv, BOUND, BOUND)["params"]
    tx = make_optimizer()
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss_fn(p):
            ret = render_rays(model, p, key, rays_o, rays_d, gt_depth,
                              BOUND, BOUND, 8, 16, 1.0)
            dl = jnp.abs(ret["depth"][:, 0] - gt_depth).mean()
            cl = jnp.abs(ret["color"] - gt_color).mean()
            sl, fl = compute_sdf_losses(ret["sdf"], ret["z_vals"], gt_depth,
                                        0.16, 5.0)
            return cl * 2 + dl + (sl + fl) * 2 + 0.1 * ret[
                "gradient_error"].mean(), (dl, cl)

        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, l, aux

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        key, k = jax.random.split(key)
        params, opt, l, aux = step(params, opt, k)
        losses.append(float(l))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert np.isfinite(losses).all()


def test_mesh_eval_identity(rng):
    """eval_mesh of a mesh against itself: ~0 error, F-score 100."""
    n = 24
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    field = np.sqrt(((g - c) ** 2).sum(0)) - 8.0
    from goslam_tpu.native import marching_cubes
    v, t = marching_cubes(field, 0.0)
    # coordinates are voxel units here: with 5k samples on a radius-8
    # sphere the mean point-to-point NN distance is ~0.2 voxels, so use a
    # 0.5-voxel threshold
    m = mesher.eval_mesh(v, t, v, t, n_points=5000, threshold=0.5)
    assert m["accuracy_cm"] < 40.0      # < 0.4 voxel
    assert m["f_score"] > 95.0


def test_ply_roundtrip(tmp_path, rng):
    v = rng.random((10, 3)).astype(np.float32)
    t = rng.integers(0, 10, (6, 3)).astype(np.int32)
    p = str(tmp_path / "m.ply")
    mesher.save_ply(p, v, t)
    v2, t2 = mesher.load_ply(p)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    np.testing.assert_array_equal(t2, t)


def test_cull_small_components(rng):
    # two separate triangles groups: one big quad-ish patch, one tiny
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                    [5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32)
    t = np.asarray([[0, 1, 2], [1, 3, 2], [0, 1, 3], [0, 2, 3],
                    [4, 5, 6]], np.int32)
    v2, t2 = mesher.cull_small_components(v, t, min_area_ratio=0.3)
    assert len(t2) == 4
    assert len(v2) == 4


def test_hashgrid_matches_oracle(rng):
    """The N-minor-layout encoding must equal a direct numpy oracle of the
    original [L, N, 8, F] formulation (dense vs hash indexing, corner
    clipping, trilinear weights, l*F+f channel order)."""
    from goslam_tpu.mapping.hashgrid import PRIMES, level_resolutions

    L, F, log2T, base = 5, 2, 9, 4
    T = 1 << log2T
    hg = HashGrid(n_levels=L, n_features=F, log2_table=log2T, base_res=base)
    x = jnp.asarray(rng.uniform(-0.05, 1.05, (64, 3)).astype(np.float32))
    params = hg.init(jax.random.PRNGKey(2), x)
    out = np.asarray(hg.apply(params, x))

    table = np.asarray(params["params"]["table"])   # [L, T, F]
    res = level_resolutions(L, base, hg.growth)
    pts = np.asarray(x)
    expect = np.zeros((pts.shape[0], L * F), np.float32)
    corners = np.asarray([[i, j, k] for i in (0, 1) for j in (0, 1)
                          for k in (0, 1)])
    for lvl in range(L):
        scaled = pts * np.float32(res[lvl] - 1)
        c0 = np.floor(scaled).astype(np.int64)
        frac = scaled - c0
        dense = (res[lvl] + 1) ** 3 <= T
        for n in range(pts.shape[0]):
            acc = np.zeros(F, np.float32)
            for c in corners:
                ci = np.clip(c0[n] + c, 0, res[lvl] - 1)
                if dense:
                    idx = int(ci[0] + ci[1] * res[lvl]
                              + ci[2] * res[lvl] ** 2) % T
                else:
                    cu = ci.astype(np.uint32)
                    idx = int((cu[0] * np.uint32(PRIMES[0]))
                              ^ (cu[1] * np.uint32(PRIMES[1]))
                              ^ (cu[2] * np.uint32(PRIMES[2]))) % T
                w = np.prod(np.where(c == 1, frac[n], 1 - frac[n]))
                acc += np.float32(w) * table[lvl, idx]
            expect[n, lvl * F:(lvl + 1) * F] = acc
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)
