"""End-to-end tracking machinery on a synthetic sequence.

With randomly-initialized network weights the *accuracy* of tracking is
meaningless; these tests verify the machinery — keyframe admission, factor
graph bookkeeping, fused update steps, keyframe removal, global BA — runs,
stays finite, and keeps its invariants.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from goslam_tpu.config import default_config
from goslam_tpu.system import SLAMSystem, init_params
from goslam_tpu.tracking.factor_graph import FactorGraph
from goslam_tpu.tracking.video import VideoBuffer

HT, WD = 64, 96


def tiny_cfg():
    cfg = default_config()
    cfg["mode"] = "mono"
    cfg["cam"].update({"H_out": HT, "W_out": WD})
    t = cfg["tracking"]
    t.update({"buffer": 24, "warmup": 4, "upsample": False})
    t["motion_filter"]["thresh"] = -1.0      # admit every frame (random net)
    t["frontend"].update({"window": 5, "max_factors": 20,
                          "enable_loop": False, "keyframe_thresh": 0.0})
    t["backend"].update({"loop_window": 6})
    cfg["tracking"]["global_ba_every"] = 0   # exercised separately
    return cfg


@pytest.fixture(scope="module")
def params():
    return init_params(ht=HT, wd=WD)


def synth_frames(rng, n):
    """Smooth random textures — content is irrelevant for machinery tests."""
    base = rng.random((HT, WD, 3)).astype(np.float32)
    frames = []
    for k in range(n):
        img = np.roll(base, shift=2 * k, axis=1)
        frames.append(jnp.asarray(img[None]))           # [rig=1, ht, wd, 3]
    return frames


def test_videobuffer_append_and_remove(params, rng):
    v = VideoBuffer(buffer=8, ht=HT, wd=WD)
    img = jnp.zeros((HT, WD, 3))
    fmap = jnp.zeros((1, HT // 8, WD // 8, 128))
    net = jnp.zeros((HT // 8, WD // 8, 128))
    depth = jnp.asarray(1.0 + np.random.default_rng(0).random((HT, WD)),
                        jnp.float32)
    for k in range(3):
        v.append(float(k), img, None, None, depth,
                 jnp.asarray([10.0, 10, 6, 4.5]), fmap, net, net)
    assert v.counter == 3
    # sensor disparity populated at pixel centers
    assert float(v.disps_sens[0].mean()) > 0
    ts_before = float(v.timestamp[2])
    v.remove_keyframe(1)
    assert v.counter == 2
    assert float(v.timestamp[1]) == ts_before


def test_end_to_end_tracking(params):
    cfg = tiny_cfg()
    slam = SLAMSystem(cfg, params=params)
    frames = synth_frames(np.random.default_rng(0), 8)
    intr = np.asarray([80.0, 80.0, WD / 2, HT / 2], np.float32)

    for k, img in enumerate(frames):
        slam.track(float(k), img, depth=None, intrinsics=intr)
    slam.flush()

    assert slam.frontend.is_initialized
    assert slam.video.counter >= cfg["tracking"]["warmup"]
    poses = np.asarray(slam.video.poses[:slam.video.counter])
    assert np.isfinite(poses).all()
    assert slam.frontend.graph.n_edges() > 0

    # keyframe c2w conversion
    c2w = slam.keyframe_c2w()
    np.testing.assert_allclose(c2w[0], np.eye(4), atol=1e-5)


def test_backend_dense_ba(params):
    cfg = tiny_cfg()
    slam = SLAMSystem(cfg, params=params)
    frames = synth_frames(np.random.default_rng(1), 8)
    intr = np.asarray([80.0, 80.0, WD / 2, HT / 2], np.float32)
    for k, img in enumerate(frames):
        slam.track(float(k), img, depth=None, intrinsics=intr)
    slam.flush()

    n, n_edges = slam.backend.dense_ba(0, slam.video.counter, steps=1)
    assert n_edges >= 3 or n_edges == 0
    poses = np.asarray(slam.video.poses[:slam.video.counter])
    assert np.isfinite(poses).all()


def test_factor_graph_bookkeeping(params):
    v = VideoBuffer(buffer=16, ht=HT, wd=WD)
    rng = np.random.default_rng(2)
    img = jnp.zeros((HT, WD, 3))
    h8, w8 = HT // 8, WD // 8
    for k in range(6):
        fmap = jnp.asarray(rng.normal(size=(1, h8, w8, 128)), jnp.float32)
        net = jnp.asarray(rng.normal(size=(h8, w8, 128)), jnp.float32)
        v.append(float(k), img, None, None, None,
                 jnp.asarray([10.0, 10, 6, 4.5]), fmap, net, net)

    g = FactorGraph(v, None, max_factors=12, corr_impl="volume",
                    inac_capacity=12)
    g.add_factors([0, 1, 2], [1, 2, 3])
    assert g.n_edges() == 3
    # dedup
    g.add_factors([0, 1], [1, 4])
    assert g.n_edges() == 4
    # removal with store
    g.rm_factors(g.valid & (g.ii == 0), store=True)
    assert g.n_edges() == 3
    assert g.valid_inac.sum() == 1
    # re-adding a stored edge is refused (dedup vs inactive)
    g.add_factors([0], [1])
    assert g.n_edges() == 3
    # keyframe removal reindexes
    g.rm_keyframe(2)
    assert v.counter == 5
    assert (g.jj[g.valid] <= 3).all()


def test_weight_calib_scales_ba_weights(params):
    """cfg tracking.weight_calib rides the params pytree into the jitted
    update kernels and rescales the net's BA confidence weights
    (factor_graph._weight_calib)."""
    import copy

    means = {}
    for calib in (1.0, 8.0):
        cfg = tiny_cfg()
        cfg["tracking"]["weight_calib"] = calib
        slam = SLAMSystem(cfg, params=params)
        frames = synth_frames(np.random.default_rng(0), 8)
        intr = np.asarray([80.0, 80.0, WD / 2, HT / 2], np.float32)
        for k, img in enumerate(frames):
            slam.track(float(k), img, depth=None, intrinsics=intr)
        slam.flush()
        g = slam.frontend.graph
        w = np.asarray(g.weight)[np.asarray(g.valid)]
        assert np.isfinite(w).all()
        poses = np.asarray(slam.video.poses[:slam.video.counter])
        assert np.isfinite(poses).all()
        means[calib] = float(w.mean())

    # not exactly 8x (BA feeds back into later GRU steps) but the scale
    # must carry through
    assert means[8.0] > 3.0 * means[1.0], means
