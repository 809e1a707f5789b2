"""SLAMSystem — single-program orchestrator.

Re-design of the reference's 6-process architecture (/root/reference/src/
slam.py:373-390: tracking / optimizing (global BA) / multiview-filter /
mapping / meshing / visualizing processes over shared CUDA memory with
spin-locks): on TPU a single process interleaves jitted steps over one
device-resident state, preserving the observable schedule:

  per frame:     motion filter -> frontend (+ in-frontend loop closing)
  per K frames:  global dense BA (the reference's `optimizing` process)
                 multiview filter -> mapper round
  terminate:     final BA x2, trajectory fill, ATE eval (own Umeyama,
                 replacing evo), checkpoint, final mesh + metrics

The reference already serializes BA phases with ba_locks (depth_video.py:
21-24); a deterministic interleave is behavior-preserving and reproducible.
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import default_config
from .models.droidnet import DroidNet
from .ops import lie
from .tracking.backend import Backend
from .tracking.frontend import Frontend
from .tracking.motion_filter import MotionFilter
from .tracking.multiview_filter import MultiviewFilter
from .tracking.trajectory_filler import TrajectoryFiller
from .tracking.video import VideoBuffer


def init_params(seed: int = 0, ht: int = 64, wd: int = 96):
    """Random-initialized DroidNet params.  For pretrained tracking load a
    converted droid.pth or a trained synthetic checkpoint via
    load_pretrained (see goslam_tpu/train).

    DroidNet is fully convolutional: the param tree is identical at any
    trace resolution, so init always traces at a small one — compiling
    the init program at 240x320 costs ~140 s on a tunneled v5e while
    64x96 is seconds (ht/wd are kept in the signature for callers that
    pass them; they do not change the result).
    """
    del ht, wd
    model = DroidNet(num_frames=8)
    rng = jax.random.PRNGKey(seed)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(rng, img)
    return variables["params"]


def load_pretrained(path: str):
    """Load tracking params from either a torch droid.pth (reference's
    checkpoint, slam.py:196-208) or a goslam_tpu trainer pickle."""
    if path.endswith((".pth", ".pt")):
        from .models.convert import load_torch_checkpoint
        return load_torch_checkpoint(path)["params"]
    from .train.trainer import load_checkpoint
    params, _ = load_checkpoint(path)
    return params


@dataclasses.dataclass
class TrackingResult:
    poses_w2c: np.ndarray          # [N, 7] keyframe poses
    timestamps: np.ndarray         # [N]
    n_keyframes: int


class SLAMSystem:
    def __init__(self, cfg: Optional[dict] = None, params=None,
                 output: Optional[str] = None, only_tracking: bool = False):
        self.cfg = cfg or default_config()
        cam = self.cfg["cam"]
        tr = self.cfg["tracking"]

        self.mode = self.cfg.get("mode", "mono")
        self.only_tracking = only_tracking or self.cfg.get(
            "only_tracking", False)
        self.output = output or self.cfg["data"].get("output", "") or "output"
        os.makedirs(self.output, exist_ok=True)
        stereo = self.mode == "stereo"

        self.video = VideoBuffer(
            buffer=tr["buffer"], ht=cam["H_out"], wd=cam["W_out"],
            stereo=stereo)

        if params is None:
            pre = tr.get("pretrained", "")
            if pre and os.path.exists(pre):
                params = load_pretrained(pre)
            else:
                params = init_params(ht=cam["H_out"], wd=cam["W_out"])
        # weight_calib rides the params pytree into every jitted update
        # kernel (see factor_graph._weight_calib)
        params = dict(params)
        params["weight_calib"] = jnp.asarray(
            float(tr.get("weight_calib", 1.0)), jnp.float32)
        self.params = params

        # Multi-chip scale-out (SURVEY §2.8 target design): when more than
        # one device is visible, global BA shards its edge work and the
        # mapper its ray batches over this mesh (tracking's per-frame path
        # stays single-device — it is latency-bound, not FLOP-bound).
        self.mesh = None
        devs = jax.devices()
        if len(devs) > 1 and self.cfg.get("multichip", True):
            from jax.sharding import Mesh
            self.mesh = Mesh(np.asarray(devs), ("edges",))

        self.motion_filter = MotionFilter(
            params, self.video, thresh=tr["motion_filter"]["thresh"])
        self.backend = Backend(params, self.video, self.cfg,
                               mesh=self.mesh)
        self.frontend = Frontend(params, self.video, self.cfg,
                                 loop_closing=self.backend)
        self.traj_filler = TrajectoryFiller(params, self.video,
                                            self.motion_filter)

        if not self.only_tracking:
            self.multiview_filter = MultiviewFilter(
                self.video, self.cfg, warmup=tr["warmup"])
            from .mapping.mapper import Mapper
            self.mapper = Mapper(self.video, self.cfg, mesh=self.mesh)
        else:
            self.multiview_filter = None
            self.mapper = None

        # cadences (the reference's processes free-run; we interleave)
        self.global_ba_every = tr.get("global_ba_every", 10)
        self.mapping_every = self.cfg["mapping"].get("mapping_every", 5)
        self._kf_since_ba = 0
        self._kf_since_map = 0
        self.frame_count = 0
        # --make_video: save an intermediate mesh after every mapping round
        # (the reference's mesher process re-meshes on each reload_map,
        # generate_video_on_scannet.sh:16-26 + tools/meshvideo.py)
        self.make_video = bool(self.cfg.get("make_video", False))

        # Ingest pipelining: frames are staged on host, shipped to the
        # device as ONE uint8 batch transfer every `ingest_batch` frames,
        # and their device-side admit decisions consumed `pipeline_lag`
        # frames later.  The reference overlaps this work with its process
        # parallelism (slam.py:373-390); here the overlap is the device
        # queue, hiding the per-frame host<->device round trips (which
        # dominate behind a tunneled TPU).
        self.ingest_batch = int(tr.get("ingest_batch", 16))
        self.pipeline_lag = int(tr.get("pipeline_lag", 16))
        self._staged = []
        self._pending = []

        # live viewer (reference: the `visualizing` process, slam.py:280-287
        # — constructed always, enabled per config; headless here)
        self.viewer = None
        if self.cfg.get("viz", False):
            from .utils.visualization import LiveViewer
            v = self.cfg.get("viz_options", {}) or {}
            self.viewer = LiveViewer(
                self.video, self.output,
                filter_thresh=v.get("filter_thresh", 0.005),
                filter_count=v.get("filter_count", 2),
                stride=v.get("stride", 1),
                save_every=v.get("save_every", 10))

    # ------------------------------------------------------------------
    def track(self, timestamp, image, depth=None, intrinsics=None,
              gt_pose=None):
        """Feed one frame (image [rig, ht, wd, 3] float in [0,1]).

        Frames are staged and shipped in batches; returns the list of
        admit decisions drained by this call (frames ~`pipeline_lag`
        back; empty while the pipeline is filling — a staging call can
        drain zero or several frames).  NOTE: the return value is NOT
        "was this frame admitted" — truth-testing it reports pipeline
        fill level, not keyframe admission; use the drained decision
        tuples (or flush() + video.counter) for admission.  Call flush()
        before reading tracking state."""
        self.frame_count += 1
        self._staged.append((timestamp, np.asarray(image),
                             None if depth is None else np.asarray(depth),
                             intrinsics, gt_pose))
        if len(self._staged) >= self.ingest_batch:
            self._submit_staged()
        drained = []
        while len(self._pending) > self.pipeline_lag:
            drained.append(self._drain_one())
        return drained

    def _submit_staged(self):
        """Ship staged frames as one uint8 batch transfer and enqueue
        their motion-filter steps (padded to ingest_batch so the step
        compiles once)."""
        items = self._staged
        self._staged = []
        n, K = len(items), self.ingest_batch
        imgs = np.stack([f[1] for f in items])
        if imgs.dtype != np.uint8:   # quantize for the wire; the datasets'
            # sources are 8-bit to begin with (datasets.py loads PNG/JPG)
            imgs = np.clip(imgs * 255.0 + 0.5, 0, 255).astype(np.uint8)
        deps = None
        if any(f[2] is not None for f in items):
            # fp16 on the wire (~2 mm quantization at 3 m — far below
            # sensor noise); converted back to f32 on device.  Frames
            # missing depth in a mixed batch carry zeros — the append
            # kernel's `sub > 0` masking yields disps_sens = 0 for them,
            # the same no-prior semantics as the per-frame path (a
            # missing depth must not drop the other frames' depths).
            shape = next(f[2].shape for f in items if f[2] is not None)
            deps = np.stack([
                f[2] if f[2] is not None else np.zeros(shape, np.float32)
                for f in items]).astype(np.float16)
        if n < K:                    # pad the final partial batch
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], K - n, 0)])
            if deps is not None:
                deps = np.concatenate(
                    [deps, np.repeat(deps[-1:], K - n, 0)])
        batch = jax.device_put((imgs, deps))
        self._pending += self.motion_filter.step_batch_async(
            [(f[0], f[3], f[4]) for f in items], batch[0], batch[1])

    def flush(self):
        """Drain all in-flight frames (call before reading tracking state)."""
        if self._staged:
            self._submit_staged()
        while self._pending:
            self._drain_one()

    def _drain_one(self):
        is_kf = self.motion_filter.resolve(self._pending.pop(0))
        self.frontend()

        if is_kf and self.frontend.is_initialized:
            self._kf_since_ba += 1
            self._kf_since_map += 1
            if (self.global_ba_every > 0
                    and self._kf_since_ba >= self.global_ba_every):
                self._kf_since_ba = 0
                self._safe("global_ba",
                           lambda: self.backend.dense_ba(
                               0, self.video.counter, steps=2))
            if (self.mapper is not None
                    and self._kf_since_map >= self.mapping_every):
                self._kf_since_map = 0
                did_map = self._safe(
                    "mapping",
                    lambda: (self.mapper(), True)[1]
                    if self.multiview_filter() else None)
                if did_map and self.make_video:
                    self._safe("video_mesh", self._save_intermediate_mesh)
            if self.viewer is not None:
                self._safe("viewer", self.viewer.update)
        return is_kf

    def _save_intermediate_mesh(self):
        """Low-res mesh snapshot for the mesh video (the reference's
        per-reload `{timestamp:05d}_mesh.ply`, mesher.py:293-307)."""
        from .mapping import mesher as M

        cfg_m = self.cfg["meshing"]
        bound = jnp.asarray(self.video.bound, jnp.float32)
        if float(jnp.abs(bound).sum()) < 1e-6:
            return
        v, t = M.extract_mesh(
            self.mapper.model, self.mapper.params, bound, bound,
            resolution=min(int(cfg_m["resolution"]), 192),
            level_set=cfg_m["level_set"])
        if len(t) == 0:
            return
        v, t = M.cull_by_bound(v, t, np.asarray(bound))
        ts = int(float(self.video.timestamp[self.video.counter - 1]))
        mesh_dir = os.path.join(self.output, "mesh")
        os.makedirs(mesh_dir, exist_ok=True)
        M.save_ply(os.path.join(mesh_dir, f"{ts:05d}_mesh.ply"), v, t)

    def _safe(self, name, fn):
        """Run a periodic subsystem; a failure (e.g. a transient compile
        tunnel error) must not kill tracking — log and continue, like the
        reference's independent processes would."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            print(f"WARN: {name} step failed ({type(e).__name__}): {e}")
            return None

    # ------------------------------------------------------------------
    def finalize_tracking(self, final_steps: int = 6):
        """Final global BA passes (the reference runs dense_ba twice when
        tracking ends, slam.py:236-241)."""
        self.flush()
        n = self.video.counter
        if n > 2 and self.frontend.is_initialized:
            self.backend.dense_ba(0, n, steps=final_steps)
            self.backend.dense_ba(0, n, steps=final_steps)
        return TrackingResult(
            poses_w2c=np.asarray(self.video.poses[:n]),
            timestamps=np.asarray(self.video.timestamp[:n]),
            n_keyframes=n,
        )

    # ------------------------------------------------------------------
    def terminate(self, stream=None, eval_mesh_path: str = ""):
        """Post-processing (slam.py:289-370): fill non-keyframe poses,
        evaluate ATE (or write a submission file when GT is absent), save
        the checkpoint, and extract/evaluate the final mesh."""
        from .utils import evaluate

        metrics = {}
        self.finalize_tracking()
        if self.viewer is not None:
            self._safe("viewer", self.viewer.update)
            self.viewer.save_pointcloud()
            self.viewer.save_cameras()

        n = self.video.counter
        self.save_checkpoint(os.path.join(self.output, "go.ckpt"))

        gt_record, ts_record = [], []
        if stream is not None:
            def recording(s):
                for item in s:
                    ts_record.append(item[0])
                    gt_record.append(item[4])
                    yield item

            full_w2c = self.traj_filler(recording(stream))
            c2w = np.asarray(lie.matrix(lie.inv(jnp.asarray(full_w2c))))
        else:
            c2w = np.asarray(
                lie.matrix(lie.inv(self.video.poses[:n])))
        np.save(os.path.join(self.output, "est_poses.npy"), c2w)

        trans_init = None
        gt_list = self._gt_poses(gt_record if stream is not None else None)
        if gt_list is not None:
            res = evaluate.ate_rmse(c2w, gt_list, correct_scale=True)
            trans_init = res["alignment"]
            metrics["ate"] = {k: v for k, v in res.items()
                              if k != "alignment"}
            with open(os.path.join(self.output, "metrics_traj.txt"),
                      "w") as f:
                json.dump(metrics["ate"], f, indent=2)
        else:
            # real image timestamps, as the reference writes for the ETH3D
            # benchmark server (slam.py:326-339; fake indices would make
            # the submission invalid)
            ts = np.asarray(ts_record, np.float64) if ts_record \
                else np.asarray(self.video.timestamp[:n], np.float64)
            evaluate.write_tum_trajectory(
                os.path.join(self.output, "submission.txt"),
                ts[:len(c2w)], c2w)

        if self.mapper is not None and not self.only_tracking:
            if self.multiview_filter is not None:
                self.multiview_filter()
            # post-processing: post_processing_iters full mapping rounds,
            # each at 10x joint iters (slam.py:262-264 + mapping.py:157-158)
            for _ in range(int(self.cfg["mapping"].get(
                    "post_processing_iters", 10))):
                self.mapper(the_end=True)
            mesh_metrics = self.extract_final_mesh(
                eval_mesh_path, est_c2w_list=c2w, trans_init=trans_init)
            if mesh_metrics:
                metrics["mesh"] = mesh_metrics
        return metrics

    def _gt_poses(self, gt_record):
        if gt_record is None:
            if not self.video.has_gt:
                return None
            return np.asarray(self.video.poses_gt[:self.video.counter])
        if any(p is None for p in gt_record) or not gt_record:
            return None
        return np.stack(gt_record)

    def _filtered_obb(self):
        """OBB of the multiview-filtered point cloud (+0.1 m margin) — the
        culling bound the reference computes at the end
        (mesher.py:254-280, update_param_from_mapping)."""
        from .ops import projective
        from .utils.obb import OrientedBoundingBox

        n = self.video.counter
        disps = np.asarray(self.video.disps_filtered[:n])
        masks = np.asarray(self.video.mask_filtered[:n]) > 0
        # reference extra filter: drop far points (mesher.py:271)
        mean_d = disps.reshape(n, -1).mean(axis=1)[:, None, None]
        masks &= disps > 0.01 * mean_d
        if not masks.any():
            return None
        intr = jnp.asarray(self.video.intrinsics) * self.video.device_scale
        pts = np.asarray(projective.iproj_world(
            jnp.asarray(self.video.poses_filtered[:n]),
            jnp.asarray(np.maximum(disps, 1e-6)), intr))
        sel = pts.reshape(-1, 3)[masks.reshape(-1)]
        return OrientedBoundingBox.from_points(sel, extend=0.1)

    def extract_final_mesh(self, gt_mesh_path: str = "",
                           est_c2w_list=None, trans_init=None):
        """Final mesh: extract -> OBB + projection + component + forecast
        cull -> ICP-align (seeded with the ATE Sim3) -> save -> evaluate
        the aligned forecast mesh (mesher.py:157-335, slam.py:352-365)."""
        from .mapping import mesher as M

        cfg_m = self.cfg["meshing"]
        bound = jnp.asarray(self.video.bound, jnp.float32)
        if float(jnp.abs(bound).sum()) < 1e-6:
            return None
        v, t = M.extract_mesh(self.mapper.model, self.mapper.params, bound,
                              bound, resolution=cfg_m["resolution"],
                              level_set=cfg_m["level_set"])
        if len(t) == 0:
            return None

        mesh_dir = os.path.join(self.output, "mesh")
        os.makedirs(mesh_dir, exist_ok=True)
        colors = M.extract_vertex_colors(self.mapper.model,
                                         self.mapper.params, bound, v)
        M.save_ply(os.path.join(mesh_dir, "final_raw.ply"), v, t, colors)

        n = self.video.counter
        if est_c2w_list is None:
            est_c2w_list = self.keyframe_c2w()
        intr = np.asarray(self.video.intrinsics) * self.video.device_scale
        obb = self._filtered_obb()

        (cv_, ct_), (fv, ft) = M.cull_mesh(
            v, t, est_c2w_list, intr, self.video.ht, self.video.wd,
            obb=obb, forecast_radius=cfg_m["forecast_radius"],
            get_largest_components=cfg_m.get("get_largest_components",
                                             False),
            min_area_ratio=cfg_m["remove_small_geometry_threshold"])
        if len(ct_) == 0:
            return None
        M.save_ply(os.path.join(mesh_dir, "cull_mesh.ply"), cv_, ct_)
        M.save_ply(os.path.join(mesh_dir, "forecast_mesh.ply"), fv, ft)

        if cfg_m.get("eval_rec") and gt_mesh_path and os.path.exists(
                gt_mesh_path):
            gv, gt_tris = M.load_ply(gt_mesh_path)
            # ICP alignment of the culled mesh to GT, seeded with the ATE
            # Sim3 (align_mesh, mesher.py:339-357; slam.py keeps trans_init)
            T = M.align_mesh_icp(cv_, gv, init=trans_init)
            cva = cv_ @ T[:3, :3].T + T[:3, 3]
            M.save_ply(os.path.join(mesh_dir, "aligned_mesh.ply"),
                       cva.astype(np.float32), ct_)
            fva = fv @ T[:3, :3].T + T[:3, 3]
            M.save_ply(os.path.join(mesh_dir, "forecast_aligned_mesh.ply"),
                       fva.astype(np.float32), ft)
            # the reference evaluates the aligned *forecast* mesh
            # (mesher.py:319-327)
            res = M.eval_mesh(fva.astype(np.float32), ft, gv, gt_tris,
                              n_points=cfg_m["n_points_to_eval"],
                              threshold=cfg_m["mesh_threshold_to_eval"])
            with open(os.path.join(self.output, "metrics_mesh.txt"),
                      "w") as f:
                json.dump(res, f, indent=2)
            return res
        return None

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str, full: bool = True):
        """go.ckpt equivalent (slam.py:296-301): both networks' params +
        keyframe timestamps/poses/disps — plus, with full=True, the
        per-keyframe features and context the factor graph needs, so a
        later run can RESUME tracking (new capability: the reference only
        saves). Images travel as uint8, features in their bf16 storage
        dtype; a 512-keyframe ScanNet checkpoint is ~250 MB."""
        n = self.video.counter
        v = self.video
        state = {
            "tracking_params": jax.tree.map(np.asarray, self.params),
            "mapping_params": jax.tree.map(
                np.asarray, self.mapper.params) if self.mapper else None,
            "timestamps": np.asarray(v.timestamp[:n]),
            "poses": np.asarray(v.poses[:n]),
            "disps": np.asarray(v.disps[:n]),
            "counter": n,
        }
        if full and n:
            state.update({
                "images_u8": np.clip(np.asarray(v.images[:n]) * 255.0
                                     + 0.5, 0, 255).astype(np.uint8),
                "disps_sens": np.asarray(v.disps_sens[:n]),
                "fmaps": np.asarray(v.fmaps[:n]),
                "nets": np.asarray(v.nets[:n]),
                "inps": np.asarray(v.inps[:n]),
                "poses_gt": np.asarray(v.poses_gt[:n]),
                "has_gt": v.has_gt,
                "intrinsics": np.asarray(v.intrinsics),
            })
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_checkpoint(self, path: str, resume_tracking: bool = True):
        """Restore a checkpoint; a full=True one restores every field the
        factor graph needs, after which tracking can continue (the motion
        filter resumes against the last keyframe's features, and the
        frontend's initialization state is restored here too).

        With resume_tracking=True (the default), a checkpoint missing the
        full fields (old format or save_checkpoint(full=False)) raises:
        resuming from it would leave the motion filter unseeded and
        force-admit the next frame as a fresh 'first' keyframe with
        identity pose, silently corrupting the trajectory. Pass
        resume_tracking=False to load poses/params only (eval use)."""
        with open(path, "rb") as f:
            state = pickle.load(f)
        n = state["counter"]
        if resume_tracking and n and "fmaps" not in state:
            raise ValueError(
                f"checkpoint {path} lacks the full tracking fields "
                f"(fmaps/nets/inps) needed to resume; re-save with "
                f"save_checkpoint(full=True), or pass "
                f"resume_tracking=False to load poses/params only")
        v = self.video
        v.counter = n
        v.poses = v.poses.at[:n].set(jnp.asarray(state["poses"]))
        v.disps = v.disps.at[:n].set(jnp.asarray(state["disps"]))
        v.timestamp = v.timestamp.at[:n].set(
            jnp.asarray(state["timestamps"]))
        if "fmaps" in state and n:
            v.images = v.images.at[:n].set(
                jnp.asarray(state["images_u8"], jnp.float32) / 255.0)
            v.disps_sens = v.disps_sens.at[:n].set(
                jnp.asarray(state["disps_sens"]))
            v.fmaps = v.fmaps.at[:n].set(jnp.asarray(state["fmaps"]))
            v.nets = v.nets.at[:n].set(jnp.asarray(state["nets"]))
            v.inps = v.inps.at[:n].set(jnp.asarray(state["inps"]))
            v.poses_gt = v.poses_gt.at[:n].set(
                jnp.asarray(state["poses_gt"]))
            v.has_gt = bool(state["has_gt"])
            v.intrinsics = jnp.asarray(state["intrinsics"])
            # motion filter resumes against the last keyframe
            self.motion_filter.fmap = v.fmaps[n - 1].astype(jnp.float32)
            self.motion_filter.net = v.nets[n - 1][None].astype(jnp.float32)
            self.motion_filter.inp = v.inps[n - 1][None].astype(jnp.float32)
            self.motion_filter._seen_first = True
            # frontend resume state: a resumed counter is already past the
            # warmup == counter equality that Frontend.__call__ keys
            # initialization on, so restore it explicitly (otherwise new
            # keyframes would never be optimized after --resume)
            self.frontend.is_initialized = (
                n >= self.cfg["tracking"]["warmup"])
            self.frontend.t1 = n
        if state.get("mapping_params") is not None and self.mapper:
            self.mapper.params = jax.tree.map(
                jnp.asarray, state["mapping_params"])
        return state

    def keyframe_c2w(self):
        n = self.video.counter
        return np.asarray(lie.matrix(lie.inv(self.video.poses[:n])))
