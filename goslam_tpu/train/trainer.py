"""Train DroidNet on synthetic scenes — the accuracy-parity path.

The reference loads DROID-SLAM's pretrained droid.pth
(/root/reference/src/slam.py:196-208); this box has no network egress, so
tracking quality is established instead by training the same architecture
from scratch on the analytic synthetic domain (data/synthetic.py) and
gating e2e ATE on it (tests/test_accuracy.py).

Training mirrors DROID's recipe on short clips: unroll K update-operator
iterations with dense bundle adjustment in the loop (differentiating
through the damped Cholesky solve — the TPU-native replacement for the
reference's hand-written CUDA BA backward), supervising

  * flow: predicted correspondences vs ground-truth reprojection,
  * pose: geodesic distance to ground-truth after each BA step,

with later iterations weighted higher (gamma^(K-k)), exactly the shape of
DROID's loss. Mixed precision matches the runtime (bf16 features/GRU,
fp32 geometry/BA).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.synthetic import _ray_box_exit
from ..models.droidnet import DroidNet, UpdateModule
from ..ops import corr, dba, lie, projective

EPS_DAMP = 1e-7
MOTION_CLAMP = 64.0


@dataclasses.dataclass
class TrainConfig:
    ht: int = 64
    wd: int = 96
    n_frames: int = 7
    radius: int = 2          # graph |i-j| <= radius
    k_iters: int = 8         # unrolled update iterations
    ba_iters: int = 2
    # identity: all poses start at frame 0's pose, disps perturbed —
    # DROID's training regime, and exactly the runtime's distribution
    # (zero-motion extrapolation + keyframe admission both present the
    # net with multi-pixel flows at zero-flow init; a perturbed-GT-only
    # init taught the round-2 net only sub-pixel residuals and it
    # saturated at runtime). gt_perturb: small perturbations around GT
    # (the near-converged regime) — mixed per-step below with
    # ident_prob (a 50/50 mix over-weighted large flows and the net
    # over-predicted at refinement states; the runtime spends most
    # iterations near convergence).
    init_mode: str = "mixed"
    ident_prob: float = 0.25
    gamma: float = 0.9
    lr: float = 2.5e-4
    weight_decay: float = 1e-5
    steps: int = 4000
    n_scenes: int = 256
    seed: int = 0
    flow_w: float = 0.1
    pose_w: float = 10.0
    clip: float = 2.5
    # refinement-state curriculum (round-3): with warm_prob, run
    # warm_iters update+BA iterations under stop_gradient first, so the
    # supervised unroll starts from PARTIALLY-CONVERGED states — the
    # regime the runtime actually spends most iterations in, where the
    # round-2 net carried a ~0.1-0.2 px systematic flow bias.
    warm_prob: float = 0.3
    warm_iters: int = 3
    # photometric augmentation (exposure gain/bias per clip + pixel
    # noise) — the runtime sees real sensor images, not clean renders
    photo_aug: bool = True
    # additional (ht, wd) resolutions mixed into the scene pool so one
    # checkpoint serves multiple operating regimes (each resolution gets
    # its own compiled train step; fx scales with W so the px/rad gain
    # differs — exactly what the runtime sees across datasets)
    multires: tuple = ()
    # wide-baseline pairs added to the dense |i-j|<=radius graph (see
    # _edges): the backend/loop-closer propose edges at separations the
    # frontend window never sees
    long_skips: tuple = (4, 6)


def _texture_rand(p, ph):
    """Synthetic room texture with randomized frequencies/phases."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r = 0.5 + 0.5 * np.sin(ph[0] * x + ph[1]) * np.cos(ph[2] * y + ph[3])
    g = 0.5 + 0.5 * np.sin(ph[4] * y + ph[5]) * np.cos(ph[6] * z + ph[7])
    b = 0.5 + 0.5 * np.sin(ph[8] * z + ph[9]) * np.cos(ph[10] * x + ph[11])
    return np.stack([r, g, b], axis=-1)


def make_scene(seed: int, cfg: TrainConfig):
    """Render one randomized room clip.

    Returns (images [N,ht,wd,3], poses_w2c [N,7], disps_gt [N,h8,w8],
    intrinsics_8 [4]) as numpy, with disps at 1/8 resolution.
    """
    rng = np.random.default_rng(seed)
    H, W, N = cfg.ht, cfg.wd, cfg.n_frames
    half = rng.uniform(2.0, 4.0)
    ph = np.empty(12)
    ph[0::2] = rng.uniform(1.2, 4.0, 6)
    ph[1::2] = rng.uniform(0.0, 6.28, 6)

    fx = fy = 0.9 * W
    cx, cy = W / 2 - 0.5, H / 2 - 0.5

    # smooth random trajectory inside the room — a MIXTURE of motion
    # regimes (round-3): orbit (yaw+translation, the round-2 recipe),
    # translation-dominant (the runtime's corridor/strafe motion), and
    # rotation-only (in-place pans — pure-rotation flow has no parallax
    # and is a distinct regime for the update operator).
    a0 = rng.uniform(0, 2 * np.pi)
    # per-frame yaw: up to ~0.15 rad so identity-init edge flows span
    # 0..~2*0.15*fx8 px — covering the runtime's admission/extrapolation
    # flow range, not just sub-pixel refinement
    mode = rng.choice(["orbit", "translate", "rotate"],
                      p=[0.4, 0.35, 0.25])
    if mode == "orbit":
        da = rng.uniform(0.02, 0.15) * rng.choice([-1.0, 1.0])
        rad = rng.uniform(0.4, 0.25 * half)
        step_v = np.zeros(3)
    elif mode == "translate":
        da = rng.uniform(0.0, 0.03) * rng.choice([-1.0, 1.0])
        rad = 0.0
        v = rng.standard_normal(3)
        v[1] *= 0.3                      # mostly horizontal
        v /= np.linalg.norm(v) + 1e-9
        # keep the full clip inside the room (the renderer assumes the
        # camera is interior to the box)
        step_v = v * min(rng.uniform(0.05, 0.22), 0.3 * half / N)
    else:                                # rotate (in-place pan)
        da = rng.uniform(0.05, 0.2) * rng.choice([-1.0, 1.0])
        rad = 0.0
        step_v = np.zeros(3)
    base_p = rng.uniform(-0.2 * half, 0.2 * half, 3)
    base_p[1] *= 0.5
    c2ws = []
    for k in range(N):
        a = a0 + da * k
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.asarray([
            [np.cos(a), 0, np.sin(a)],
            [0, 1, 0],
            [-np.sin(a), 0, np.cos(a)]], np.float32)
        if mode == "orbit":
            c2w[:3, 3] = [rad * np.sin(a) + rng.normal(0, 0.01),
                          0.3 * np.sin(2.5 * a) + rng.normal(0, 0.01),
                          rad * np.cos(a) - 0.3 + rng.normal(0, 0.01)]
        else:
            c2w[:3, 3] = base_p + step_v * k + rng.normal(0, 0.01, 3)
        c2ws.append(c2w)

    j, i = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    dirs = np.stack([(i - cx) / fx, (j - cy) / fy, np.ones_like(i)], -1)

    imgs, depths = [], []
    for c2w in c2ws:
        dirs_w = dirs @ c2w[:3, :3].T
        o = c2w[:3, 3]
        t_exit = _ray_box_exit(o, dirs_w, half)
        pts = o[None, None, :] + dirs_w * t_exit[..., None]
        imgs.append(_texture_rand(pts, ph).astype(np.float32))
        depths.append((t_exit * dirs[..., 2]).astype(np.float32))

    images = np.stack(imgs)
    depth = np.stack(depths)
    # 1/8-res GT disparity (strided sample like the motion filter)
    d8 = depth[:, 3::8, 3::8]
    disps_gt = 1.0 / np.maximum(d8, 1e-3)
    # w2c quaternions in pure numpy (a TPU dispatch per pose would cost
    # ~150 ms each through the axon tunnel)
    from scipy.spatial.transform import Rotation
    poses_w2c = np.empty((N, 7), np.float32)
    for k, m in enumerate(c2ws):
        Rw = m[:3, :3].T                      # w2c rotation
        tw = -Rw @ m[:3, 3]
        poses_w2c[k, :3] = tw
        poses_w2c[k, 3:] = Rotation.from_matrix(Rw).as_quat()  # x y z w
    intr8 = np.asarray([fx / 8, fy / 8, cx / 8, cy / 8], np.float32)
    return images, poses_w2c, disps_gt, intr8


def _edges(n: int, radius: int, long_skips: tuple = ()):
    """Dense |i-j| <= radius edges plus symmetric long-skip pairs.

    The runtime's backend proposes proximity edges at separations far
    beyond the frontend window (dense BA radius+2 neighbors, NMS'd
    distance pairs, loop edges at arbitrary separation — backend.py
    25-99).  A net trained only on |i-j| <= 2 carries a flow bias that
    GROWS with baseline (measured round 3: 0.15 px at 1-frame
    separation -> 0.47 px at 8); the long skips put those pairs in the
    training distribution.
    """
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    keep = (ii != jj) & (np.abs(ii - jj) <= radius)
    pairs = {(int(a), int(b)) for a, b in zip(ii[keep], jj[keep])}
    for s in long_skips:
        for i in range(0, n - s):
            pairs.add((i, i + s))
            pairs.add((i + s, i))
    arr = np.asarray(sorted(pairs), np.int32)
    return arr[:, 0], arr[:, 1]


def _pose_loss(poses, poses_gt):
    """Geodesic loss on relative-to-frame-0 poses (gauge-fixed)."""
    ra = lie.rel(jnp.broadcast_to(poses[0], poses.shape), poses)
    rb = lie.rel(jnp.broadcast_to(poses_gt[0], poses_gt.shape), poses_gt)
    dxi = lie.log(lie.compose(ra, lie.inv(rb)))
    return jnp.sqrt((dxi ** 2).sum(-1) + 1e-12).mean()


def make_train_step(cfg: TrainConfig, model: DroidNet, tx):
    N = cfg.n_frames
    ii_np, jj_np = _edges(N, cfg.radius, cfg.long_skips)
    ii = jnp.asarray(ii_np)
    jj = jnp.asarray(jj_np)
    E = len(ii_np)
    valid = jnp.ones((E,), bool)

    def loss_fn(params, images, poses_gt, disps_gt, intr8, key):
        h8, w8 = disps_gt.shape[-2:]
        key, ka1, ka2, ka3 = jax.random.split(key, 4)
        if cfg.photo_aug:
            # exposure gain/bias per clip + per-pixel sensor noise; the
            # encoder must be invariant to what a real camera does to
            # the same scene between frames
            gain = jax.random.uniform(ka1, (1, 1, 1, 3), minval=0.7,
                                      maxval=1.3)
            bias = jax.random.uniform(ka2, (1, 1, 1, 3), minval=-0.1,
                                      maxval=0.1)
            noise = 0.02 * jax.random.normal(ka3, images.shape)
            images = jnp.clip(images * gain + bias + noise, 0.0, 1.0)
        # ImageNet normalization — MUST match the runtime encode path
        # (tracking/motion_filter.py:71-77); training on raw [0,1] images
        # while the runtime feeds normalized ones cost ~4x e2e ATE in
        # round 2 before this line existed.
        from ..tracking.motion_filter import IMAGENET_MEAN, IMAGENET_STD
        x = (images - IMAGENET_MEAN) / IMAGENET_STD
        fmaps = model.apply({"params": params}, x,
                            method=DroidNet.encode_features)
        net0, inp = model.apply({"params": params}, x,
                                method=DroidNet.encode_context)
        pyramid = corr.build_pyramid(fmaps[ii], fmaps[jj])

        gt_coords, _ = projective.transform(poses_gt, disps_gt, intr8,
                                            ii, jj)

        # init distribution (frame 0 fixed; BA optimizes [1, N)):
        # ident_prob of the steps start from identity motion (all frames
        # at frame 0's pose — the runtime's zero-motion extrapolation /
        # admission regime, multi-pixel flows), the rest from small GT
        # perturbations (the near-converged refinement regime that
        # dominates the runtime's update distribution).
        k1, k2, k3 = jax.random.split(key, 3)
        xi = 0.03 * jax.random.normal(k1, (N, 6))
        xi = xi.at[0].set(0.0)
        poses_pert = lie.compose(jax.vmap(lie.exp)(xi), poses_gt)
        poses_ident = jnp.broadcast_to(poses_gt[0], poses_gt.shape)
        use_ident = (jax.random.uniform(k3, ()) < cfg.ident_prob) \
            if cfg.init_mode == "mixed" else \
            jnp.asarray(cfg.init_mode == "identity")
        poses = jnp.where(use_ident, poses_ident, poses_pert)
        disps = disps_gt * jnp.exp(
            0.2 * jax.random.normal(k2, disps_gt.shape))

        net = net0[ii]
        inps = inp[ii]
        target = projective.transform(poses, disps, intr8, ii, jj)[0]

        grid = projective.coords_grid(h8, w8)

        def update_iter(net, poses, disps, target):
            coords1, _ = projective.transform(poses, disps, intr8, ii, jj)
            motion = jnp.clip(
                jnp.concatenate([coords1 - grid, target - coords1], -1),
                -MOTION_CLAMP, MOTION_CLAMP)
            corr_feat = corr.lookup(pyramid, coords1)
            net, delta, weight, eta, _, _ = UpdateModule(
                num_frames=N).apply(
                {"params": params["update"]},
                net.astype(jnp.bfloat16), inps.astype(jnp.bfloat16),
                corr_feat.astype(jnp.bfloat16),
                motion.astype(jnp.bfloat16), ii, valid)
            target = coords1 + delta.astype(jnp.float32)
            weight = weight.astype(jnp.float32)
            eta_ba = 0.2 * eta.astype(jnp.float32) + EPS_DAMP
            poses, disps = dba.ba(
                poses, disps, intr8, jnp.zeros_like(disps), target,
                weight, eta_ba, ii, jj, valid, 1, N,
                iters=cfg.ba_iters, solver="chol", fused=False)
            return net, poses, disps, target, weight

        # refinement-state curriculum: sometimes warm the state into a
        # partially-converged basin first, WITHOUT gradients — the
        # supervised unroll then trains exactly the near-converged
        # update distribution the runtime lives in
        if cfg.warm_prob > 0 and cfg.warm_iters > 0:
            key, kw = jax.random.split(key)
            do_warm = jax.random.uniform(kw, ()) < cfg.warm_prob
            wnet, wposes, wdisps, wtarget = net, poses, disps, target
            for _ in range(cfg.warm_iters):
                wnet, wposes, wdisps, wtarget, _ = update_iter(
                    wnet, wposes, wdisps, wtarget)
            sg = jax.lax.stop_gradient
            pick = lambda a, b: jnp.where(do_warm, sg(a), b)
            net = pick(wnet, net)
            poses = pick(wposes, poses)
            disps = pick(wdisps, disps)
            target = pick(wtarget, target)

        total = 0.0
        metrics = {}
        for k in range(cfg.k_iters):
            net, poses, disps, target, weight = update_iter(
                net, poses, disps, target)
            w_k = cfg.gamma ** (cfg.k_iters - 1 - k)
            fl = jnp.abs(target - gt_coords).mean()
            pl_ = _pose_loss(poses, poses_gt)
            total = total + w_k * (cfg.flow_w * fl + cfg.pose_w * pl_)
            metrics = {"flow_px": fl, "pose_geo": pl_}
        return total, metrics

    @jax.jit
    def train_step(params, opt_state, images, poses_gt, disps_gt, intr8,
                   key):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, images, poses_gt, disps_gt,
                                   intr8, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        gn = optax.global_norm(grads)
        metrics["gnorm"] = gn
        return params, opt_state, metrics

    return train_step


def fit(cfg: TrainConfig, out_path: str, log_every: int = 50,
        params=None, log_file=None):
    """Train and save a checkpoint (pickled fp32 params + config)."""
    from ..system import init_params

    model = DroidNet(num_frames=cfg.n_frames)
    if params is None:
        params = init_params(ht=cfg.ht, wd=cfg.wd)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip),
        optax.adamw(optax.linear_schedule(cfg.lr, cfg.lr * 0.1, cfg.steps),
                    weight_decay=cfg.weight_decay),
    )
    opt_state = tx.init(params)
    step_fn = make_train_step(cfg, model, tx)

    print(f"rendering {cfg.n_scenes} scenes ...", flush=True)
    rescfgs = [cfg] + [dataclasses.replace(cfg, ht=h, wd=w)
                       for (h, w) in (cfg.multires or ())]
    scenes = [make_scene(cfg.seed * 10007 + s, rescfgs[s % len(rescfgs)])
              for s in range(cfg.n_scenes)]

    key = jax.random.PRNGKey(cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    t0 = time.time()
    logf = open(log_file, "a") if log_file else None
    for step in range(cfg.steps):
        images, poses_gt, disps_gt, intr8 = scenes[
            rng.integers(len(scenes))]
        key, k = jax.random.split(key)
        params, opt_state, m = step_fn(
            params, opt_state, jnp.asarray(images), jnp.asarray(poses_gt),
            jnp.asarray(disps_gt), jnp.asarray(intr8), k)
        if step % log_every == 0 or step == cfg.steps - 1:
            m = {k_: float(v) for k_, v in m.items()}
            line = (f"step {step:5d} loss {m['loss']:.4f} "
                    f"flow {m['flow_px']:.3f}px pose {m['pose_geo']:.5f} "
                    f"gnorm {m['gnorm']:.2f} "
                    f"({(time.time() - t0):.0f}s)")
            print(line, flush=True)
            if logf:
                logf.write(line + "\n")
                logf.flush()
            if not np.isfinite(m["loss"]):
                raise RuntimeError("loss diverged")
            save_checkpoint(out_path, params, cfg)
    save_checkpoint(out_path, params, cfg)
    if logf:
        logf.close()
    return params


def save_checkpoint(path: str, params, cfg: TrainConfig):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = {
        "params": jax.tree.map(
            lambda x: np.asarray(x, np.float32), params),
        "config": dataclasses.asdict(cfg),
    }
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        state = pickle.load(f)
    return jax.tree.map(jnp.asarray, state["params"]), state["config"]
