"""Factor graph over keyframes — static-capacity, device-resident.

Re-design of /root/reference/src/factor_graph.py for XLA: the reference
grows/shrinks edge tensors with torch.cat (a recompile storm under jit);
here edges live in fixed-capacity slot arrays with a validity mask, so
every update step runs one of a handful of pre-compiled programs
(capacity-bucketed by the optimization-window size).

Host (numpy): edge bookkeeping — endpoints, age, slot allocation, dedup,
eviction. Device (jnp): per-edge GRU hidden state, flow targets/weights,
correlation pyramids, and the fused update kernel:
reproject -> motion features -> corr lookup -> update operator -> DBA.

Two correlation backends, as in the reference:
  * 'volume': precomputed all-pairs pyramids per edge slot (frontend)
  * 'alt':    on-the-fly patch correlation from feature pyramids with
              edge-chunked GRU updates (backend / long sequences;
              factor_graph.py:255-321 update_lowmem)
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.droidnet import GraphAgg, UpdateModule, upsample_disp
from ..ops import corr, dba, projective
from ..utils.greedy import greedy_nms_scan
from ..utils.shapes import bucket
from .video import VideoBuffer

EPS_DAMP = 1e-7
MOTION_CLAMP = 64.0

# Conv compute dtype for the runtime update/GRU kernels: bf16 by default
# (MXU-native; faithful to the reference's fp16 AMP, motion_filter.py:26).
# GOSLAM_BF16=0 or tracking.compute_dtype: float32 forces fp32.  bf16
# conv outputs round differently under different XLA block tilings, so
# bitwise-stable single-vs-sharded parity (tests/test_parallel.py — the
# host greedy edge proposal amplifies ULP flips chaotically across BA
# steps) requires fp32.  Read ONCE at import, like corr._GATHER_MODE.
_DTYPE_DEFAULT = (jnp.float32 if os.environ.get("GOSLAM_BF16", "1") == "0"
                  else jnp.bfloat16)


def _resolve_dtype(name):
    """'bfloat16' | 'float32' | None (None -> env/bf16 default)."""
    if name is None:
        return _DTYPE_DEFAULT
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(name)]


class FactorGraph:
    def __init__(self, video: VideoBuffer, params, max_factors: int = 96,
                 corr_impl: str = "volume", upsample: bool = False,
                 inac_capacity: int = 0, chunk: int = 256, mesh=None,
                 compute_dtype=None):
        self.video = video
        self.params = params
        self.max_factors = max_factors
        self.corr_impl = corr_impl
        self.upsample = upsample
        # conv compute dtype (and hidden-slab storage dtype — fp32 mode
        # must not round hidden states through bf16 between chunks, or
        # the exact-parity guarantee dies at the same ULP boundaries)
        self.cdt = (compute_dtype if compute_dtype is not None
                    else _DTYPE_DEFAULT)
        # multi-device mesh: the low-memory path (global BA) shards its
        # edge work over it (SURVEY §2.8 target design)
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None

        cap = bucket(max_factors + 48)
        self.cap = cap
        # chunk must divide cap exactly: the lowmem kernel updates its
        # slabs in place per chunk, with no padded copies
        c = min(chunk, cap)
        while cap % c:
            c -= 1
        self.chunk = c
        self.cap_inac = bucket(max(inac_capacity, max_factors)) \
            if inac_capacity >= 0 else 0

        h8, w8 = video.h8, video.w8
        self.h8, self.w8 = h8, w8

        # host bookkeeping
        self.ii = np.zeros(cap, np.int32)
        self.jj = np.zeros(cap, np.int32)
        self.age = np.zeros(cap, np.int32)
        self.valid = np.zeros(cap, bool)
        self.ii_inac = np.zeros(self.cap_inac, np.int32)
        self.jj_inac = np.zeros(self.cap_inac, np.int32)
        self.valid_inac = np.zeros(self.cap_inac, bool)
        self.ii_bad: list = []
        self.jj_bad: list = []

        # device state
        self.net = jnp.zeros((cap, h8, w8, 128), self.cdt)
        self.target = jnp.zeros((cap, h8, w8, 2), jnp.float32)
        self.weight = jnp.zeros((cap, h8, w8, 2), jnp.float32)
        self.target_inac = jnp.zeros((self.cap_inac, h8, w8, 2), jnp.float32)
        self.weight_inac = jnp.zeros((self.cap_inac, h8, w8, 2), jnp.float32)

        if corr_impl == "volume":
            hw = h8 * w8
            self.pyramid = [
                jnp.zeros((cap, hw, h8 // 2 ** l, w8 // 2 ** l), jnp.bfloat16)
                for l in range(corr.NUM_LEVELS)
            ]
        else:
            self.pyramid = None

    # ------------------------------------------------------------------
    # host-side edge set operations
    # ------------------------------------------------------------------
    def _active_pairs(self):
        return set(zip(self.ii[self.valid].tolist(),
                       self.jj[self.valid].tolist()))

    def _inactive_pairs(self):
        return set(zip(self.ii_inac[self.valid_inac].tolist(),
                       self.jj_inac[self.valid_inac].tolist()))

    def n_edges(self) -> int:
        return int(self.valid.sum())

    def add_factors(self, ii, jj, remove: bool = False):
        """Add edges (dedup, optional age-based eviction), compute their
        correlation pyramids and initial targets (factor_graph.py:86-131)."""
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)

        seen = self._active_pairs() | self._inactive_pairs()
        keep = [k for k in range(len(ii))
                if (ii[k], jj[k]) not in seen
                and not (seen.add((ii[k], jj[k])))]  # dedup within batch too
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return

        # eviction to make room (reference evicts oldest when remove=True;
        # we must also evict on hard capacity overflow)
        limit = self.max_factors if (remove and self.max_factors > 0) \
            else self.cap
        limit = min(limit, self.cap)
        over = self.n_edges() + len(ii) - limit
        if over > 0:
            act = np.where(self.valid)[0]
            oldest = act[np.argsort(-self.age[act])][:over]
            mask = np.zeros(self.cap, bool)
            mask[oldest] = True
            self.rm_factors(mask, store=True)

        free = np.where(~self.valid)[0][:len(ii)]
        n = len(free)
        ii, jj = ii[:n], jj[:n]

        self.ii[free] = ii
        self.jj[free] = jj
        self.age[free] = 0
        self.valid[free] = True

        self._write_new_edges(jnp.asarray(ii), jnp.asarray(jj),
                              jnp.asarray(free))

    def _write_new_edges(self, ii, jj, slots):
        """Device writes for newly added edges, padded to a count bucket."""
        K = bucket(int(ii.shape[0]), (1, 2, 4, 8, 16, 32, 64, 128, 256,
                                      512, 1024, 2048, 4096, 8192, 16384))
        pad = K - int(ii.shape[0])
        if pad:
            ii = jnp.concatenate([ii, jnp.zeros(pad, ii.dtype)])
            jj = jnp.concatenate([jj, jnp.zeros(pad, jj.dtype)])
            # out-of-range slot -> dropped by scatter
            slots = jnp.concatenate(
                [slots, jnp.full(pad, self.cap, slots.dtype)])

        out = _new_edge_kernel(
            self.corr_impl == "volume", self.video.stereo,
            self.video.poses, self.video.disps, self.video.intrinsics,
            self.video.fmaps, self.video.nets, ii, jj, slots,
            self.net, self.target, self.weight,
            tuple(self.pyramid) if self.pyramid is not None else ())
        if self.pyramid is not None:
            self.net, self.target, self.weight = out[:3]
            self.pyramid = list(out[3:])
        else:
            self.net, self.target, self.weight = out[:3]

    def rm_factors(self, mask, store: bool = False):
        """Drop edges; optionally archive their targets/weights
        (factor_graph.py:134-158)."""
        mask = np.asarray(mask, bool) & self.valid
        if not mask.any():
            return
        if store and self.cap_inac:
            idx = np.where(mask)[0]
            free = np.where(~self.valid_inac)[0]
            if len(free) < len(idx):       # recycle oldest inactive slots
                extra = len(idx) - len(free)
                used = np.where(self.valid_inac)[0][:extra]
                free = np.concatenate([free, used])
            free = free[:len(idx)]
            self.ii_inac[free] = self.ii[idx]
            self.jj_inac[free] = self.jj[idx]
            self.valid_inac[free] = True
            # pad to a count bucket so the copy kernel compiles once
            K = bucket(len(idx), (4, 16, 64, 256, 1024))
            idx_p = np.zeros(K, np.int32)
            idx_p[:len(idx)] = idx
            free_p = np.full(K, self.cap_inac, np.int32)  # OOB -> dropped
            free_p[:len(free)] = free
            self.target_inac, self.weight_inac = _archive_kernel(
                self.target, self.weight, self.target_inac, self.weight_inac,
                jnp.asarray(idx_p), jnp.asarray(free_p),
                self.cap_inac)
        self.valid[mask] = False

    def rm_keyframe(self, ix: int):
        """Remove keyframe ix: video roll-down + edge reindexing
        (factor_graph.py:161-196)."""
        self.video.remove_keyframe(ix)

        m = self.valid & ((self.ii == ix) | (self.jj == ix))
        self.valid[m] = False
        self.ii[self.ii > ix] -= 1
        self.jj[self.jj > ix] -= 1

        mi = self.valid_inac & ((self.ii_inac == ix) | (self.jj_inac == ix))
        self.valid_inac[mi] = False
        self.ii_inac[self.ii_inac > ix] -= 1
        self.jj_inac[self.jj_inac > ix] -= 1

    def clear_edges(self):
        self.valid[:] = False
        self.valid_inac[:] = False

    def print_edges(self):
        """Debug dump of the active edge set (factor_graph.py:56-69)."""
        import numpy as _np
        sel = _np.where(self.valid)[0]
        order = sel[_np.argsort(self.ii[sel])]
        w = _np.asarray(jnp.mean(self.weight, axis=(1, 2, 3)))
        msg = "INFO: Edges of Graph:\n Start  End    Weight\n"
        for k in order:
            msg += f" {self.ii[k]:05d}, {self.jj[k]:05d}, {w[k]:.4f}\n"
        print(msg)

    def filter_edges(self):
        """Drop long-range edges whose mean confidence collapsed
        (factor_graph.py:71-78)."""
        conf = np.asarray(jnp.mean(self.weight, axis=(1, 2, 3)))
        mask = self.valid & (np.abs(self.ii - self.jj) > 2) & (conf < 1e-3)
        self.ii_bad += self.ii[mask].tolist()
        self.jj_bad += self.jj[mask].tolist()
        self.rm_factors(mask, store=False)

    # ------------------------------------------------------------------
    # edge proposal (factor_graph.py:368-450)
    # ------------------------------------------------------------------
    def add_neighborhood_factors(self, t0: int, t1: int, r: int = 3):
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1),
                             indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        c = 1 if self.video.stereo else 0
        keep = (np.abs(ii - jj) > c) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False):
        """Distance-sorted greedy edge proposal with NMS suppression.

        The O(n^2) distance matrix is computed on device; the sequential
        greedy selection runs on host over the downloaded matrix (cheap
        scalar work, matching the reference's Python loop)."""
        t = self.video.counter
        ilen, jlen = t - t0, t - t1
        if ilen <= 0 or jlen <= 0:
            return
        ii0, jj0 = np.meshgrid(np.arange(t0, t), np.arange(t1, t),
                               indexing="ij")
        ii_f, jj_f = ii0.reshape(-1), jj0.reshape(-1)
        d = np.array(self.video.distance(ii_f, jj_f, beta=beta))
        d[ii_f - rad < jj_f] = np.inf
        d[d > 100] = np.inf
        d = d.reshape(ilen, jlen)

        # suppress around existing edges
        ii1 = np.concatenate([self.ii[self.valid],
                              np.asarray(self.ii_bad, np.int32),
                              self.ii_inac[self.valid_inac]])
        jj1 = np.concatenate([self.jj[self.valid],
                              np.asarray(self.jj_bad, np.int32),
                              self.jj_inac[self.valid_inac]])
        for i, j in zip(ii1, jj1):
            if t0 <= i < t and t1 <= j < t:
                di, dj = i - t0, j - t1
                d[max(0, di - nms):di + nms + 1,
                  max(0, dj - nms):dj + nms + 1] = np.inf

        es = []
        for i in range(t0, t):
            if self.video.stereo:
                es.append((i, i))
                d[i - t0, i - t1] = np.inf
            for j in range(max(i - rad, 0), i):
                es.append((i, j))
                es.append((j, i))
                di, dj = i - t0, j - t1
                d[max(0, di - nms):di + nms + 1,
                  max(0, dj - nms):dj + nms + 1] = np.inf

        def accept(di, dj):
            if len(es) > self.max_factors:
                return False
            es.append((di + t0, dj + t1))
            es.append((dj + t1, di + t0))
            return True

        greedy_nms_scan(d, thresh, nms, accept)

        if es:
            ii, jj = np.asarray(es, np.int32).T
            self.add_factors(ii, jj, remove)

    # ------------------------------------------------------------------
    # the fused update step (factor_graph.py:199-252)
    # ------------------------------------------------------------------
    def update(self, t0: Optional[int] = None, t1: Optional[int] = None,
               iters: int = 2, use_inactive: bool = False,
               motion_only: bool = False, ba_lm: float = 1e-4,
               ba_ep: float = 0.1):
        """One GRU/flow step + `iters` Gauss-Newton DBA iterations."""
        if not self.valid.any():
            return
        vi, vj = self.ii[self.valid], self.jj[self.valid]
        if t0 is None:
            t0 = max(1, int(vi.min()) + 1)
        t0 = max(1, t0)
        if t1 is None:
            t1 = int(max(vi.max(), vj.max())) + 1

        # inactive edges participating in the BA (factor_graph.py:229-234)
        if use_inactive and self.cap_inac:
            inac_ok = self.valid_inac & (self.ii_inac >= t0 - 3) & \
                (self.jj_inac >= t0 - 3)
        else:
            inac_ok = np.zeros(self.cap_inac, bool)

        lows = [vi.min(), vj.min(), t0 - 1]
        if inac_ok.any():
            lows += [self.ii_inac[inac_ok].min(), self.jj_inac[inac_ok].min()]
        base = int(min(lows))
        P = bucket(t1 - base)
        base = max(0, min(base, self.video.buffer - P))

        ii_all = self.ii[self.valid]
        if inac_ok.any():
            ii_all = np.concatenate([ii_all, self.ii_inac[inac_ok]])
        deg = int(np.bincount(ii_all, minlength=1).max()) if len(ii_all) \
            else 1
        max_deg = bucket(deg, (4, 8, 12, 16, 24, 32, 48, 64, 96, 128))

        out = _update_kernel(
            P, self.cap, self.cap_inac, self.upsample, max_deg,
            self.params,
            self.video.poses, self.video.disps, self.video.disps_sens,
            self.video.damping, self.video.disps_up, self.video.intrinsics,
            self.video.inps,
            self.net, self.target, self.weight,
            tuple(self.pyramid),
            jnp.asarray(self.ii), jnp.asarray(self.jj),
            jnp.asarray(self.valid),
            jnp.asarray(self.ii_inac), jnp.asarray(self.jj_inac),
            jnp.asarray(inac_ok),
            self.target_inac, self.weight_inac,
            base, t0, t1, iters, ba_lm, ba_ep, motion_only,
            cdt=self.cdt)

        (self.video.poses, self.video.disps, self.video.damping,
         self.video.disps_up, self.net, self.target, self.weight) = out

        self.age[self.valid] += 1
        self.video.dirty[int(vi.min()):t1] = True

    def update_fast(self, t0=None, t1=None, iters=2, steps=8,
                    motion_only=False):
        """Multi-step volume-corr update (factor_graph.py:324-366):
        `steps` GRU+BA rounds over the precomputed pyramids with the loop
        damping regime (lm=1e-4, ep=1e-1)."""
        for _ in range(steps):
            self.update(t0=t0, t1=t1, iters=iters, motion_only=motion_only,
                        ba_lm=1e-4, ba_ep=1e-1)

    # ------------------------------------------------------------------
    # low-memory update for global BA (factor_graph.py:255-321)
    # ------------------------------------------------------------------
    def update_lowmem(self, t0=None, t1=None, iters=2, steps=8, max_t=None,
                      ba_type="dense", motion_only=False):
        """steps x (edge-chunked alt-corr GRU + full BA)."""
        if not self.valid.any():
            return
        vi, vj = self.ii[self.valid], self.jj[self.valid]
        if t0 is None:
            t0 = max(1, int(vi.min()) + 1)
        t0 = max(1, t0)
        if t1 is None:
            t1 = int(max(vi.max(), vj.max())) + 1
        t = max_t if max_t is not None else self.video.counter

        lm, ep = (1e-4, 1e-1) if ba_type == "loop" else (1e-5, 1e-2)

        rig = self.video.rig
        Tb = bucket(min((t + 2) * rig, self.video.buffer * rig))

        P = bucket(t1)
        base = 0

        for _ in range(steps):
            self._lowmem_step(P, Tb, self.video.fmaps, base, t0, t1,
                              iters, lm, ep, motion_only)
        self.video.dirty[:t] = True

    def _lowmem_step(self, P, Tb, fmaps, base, t0, t1, iters, lm, ep,
                     motion_only):
        rig = self.video.rig
        # stereo edge (ii==jj) looks up the right image: 2*jj + 1
        ii_r = self.ii * rig
        jj_r = self.jj * rig + (self.ii == self.jj).astype(np.int32) \
            if self.video.stereo else self.jj
        nchunks = self.cap // self.chunk
        ii_all = self.ii[self.valid]
        deg = int(np.bincount(ii_all, minlength=1).max()) if len(ii_all) \
            else 1
        max_deg = bucket(deg, (4, 8, 12, 16, 24, 32, 48, 64, 96, 128))
        # large optimization windows use the matrix-free PCG solver
        # (validated against chol in tests/test_dba.py); the dense-Cholesky
        # solve dominates beyond a few hundred poses
        solver = "cg" if P >= 192 else "chol"

        if self.mesh is not None and not motion_only:
            self._lowmem_step_sharded(P, Tb, fmaps, base, t0, t1, iters,
                                      lm, ep, max_deg, ii_r, jj_r)
            return

        out = _lowmem_kernel(
            P, self.cap, self.chunk, nchunks, max_deg, Tb,
            self.params,
            self.video.poses, self.video.disps, self.video.disps_sens,
            self.video.damping, self.video.intrinsics, self.video.inps,
            fmaps,
            self.net, self.target, self.weight,
            jnp.asarray(self.ii), jnp.asarray(self.jj),
            jnp.asarray(ii_r), jnp.asarray(jj_r),
            jnp.asarray(self.valid),
            base, t0, t1, iters, lm, ep, motion_only, solver=solver,
            cdt=self.cdt)
        (self.video.poses, self.video.disps, self.video.damping,
         self.net, self.target, self.weight) = out

    def _lowmem_step_sharded(self, P, Tb, fmaps, base, t0, t1, iters,
                             lm, ep, max_deg, ii_r, jj_r):
        """Multi-device low-memory step: edges partitioned by source frame
        over the mesh, alt-corr + GRU + DBA sharded over the edge dim
        (SURVEY §2.8). Results match the single-device path (validated in
        tests/test_parallel.py)."""
        from ..parallel.sharded_ba import partition_edge_slots

        # the shard body reprojects against the window slice with
        # absolute frame indices — valid only for base == 0, which is
        # what update_lowmem always uses
        assert base == 0, "sharded lowmem path requires base == 0"
        S = int(self.mesh.devices.size)
        cap = self.cap
        slot_idx = partition_edge_slots(self.ii, self.valid, P, S)
        pad_ok = slot_idx < cap
        sc = np.minimum(slot_idx, cap - 1)
        ii_sh = np.where(pad_ok, self.ii[sc], 0).astype(np.int32)
        jj_sh = np.where(pad_ok, self.jj[sc], 0).astype(np.int32)
        ii_rsh = np.where(pad_ok, np.asarray(ii_r)[sc], 0).astype(np.int32)
        jj_rsh = np.where(pad_ok, np.asarray(jj_r)[sc], 0).astype(np.int32)
        ok_sh = pad_ok & self.valid[sc]

        out = _lowmem_kernel_sharded(
            P, self.chunk, max_deg, self.mesh, Tb,
            self.params,
            self.video.poses, self.video.disps, self.video.disps_sens,
            self.video.damping, self.video.intrinsics, self.video.inps,
            fmaps, self.net, self.target, self.weight,
            jnp.asarray(ii_sh), jnp.asarray(jj_sh),
            jnp.asarray(ii_rsh), jnp.asarray(jj_rsh),
            jnp.asarray(ok_sh), jnp.asarray(slot_idx),
            base, t0, t1, iters, lm, ep, cdt=self.cdt)
        (self.video.poses, self.video.disps, self.video.damping,
         self.net, self.target, self.weight) = out


# ---------------------------------------------------------------------------
# jitted kernels (module-level for cache sharing across graphs)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("volume_impl", "stereo"),
                   donate_argnums=(10, 11, 12, 13))
def _new_edge_kernel(volume_impl, stereo, poses, disps, intrinsics, fmaps,
                     nets_v, ii, jj, slots, net, target, weight, pyramid):
    """Initialize state for new edge slots: GRU hidden from the source
    frame, correlation pyramid, reprojected target, zero weight."""
    coords, _ = projective.transform(poses, disps, intrinsics, ii, jj)
    target = target.at[slots].set(coords, mode="drop")
    weight = weight.at[slots].set(0.0, mode="drop")
    net = net.at[slots].set(nets_v[ii], mode="drop")

    if volume_impl:
        c = (ii == jj).astype(jnp.int32) if stereo else jnp.zeros_like(ii)
        f1 = fmaps[ii, 0]
        f2 = fmaps[jj, c]
        pyr = corr.build_pyramid(f1, f2)
        pyramid = tuple(
            p.at[slots].set(lvl, mode="drop")
            for p, lvl in zip(pyramid, pyr.levels))
        return (net, target, weight) + pyramid
    return (net, target, weight)


@functools.partial(jax.jit, static_argnames=("cap_inac",))
def _archive_kernel(target, weight, target_inac, weight_inac, idx, free,
                    cap_inac):
    tg = target[idx]
    wt = weight[idx]
    return (target_inac.at[free].set(tg, mode="drop"),
            weight_inac.at[free].set(wt, mode="drop"))


def _motion_features(coords1, target, h8, w8):
    grid = projective.coords_grid(h8, w8)
    motion = jnp.concatenate([coords1 - grid, target - coords1], axis=-1)
    return jnp.clip(motion, -MOTION_CLAMP, MOTION_CLAMP)


def _weight_calib(params):
    """Confidence calibration for the BA weights (cfg tracking.weight_calib,
    carried as a scalar leaf in the params pytree so it reaches every
    jitted update kernel without new plumbing).

    A from-scratch synthetic-trained net can rank pixels well yet be
    globally underconfident (round-3 probe: mean w ~0.016 where the
    reference's pretrained droid.pth sits near ~0.9 on good matches),
    which lets the BA damping (ep/lm/eta at reference-parity values,
    droid_kernels.cu WEIGHT_SCALE semantics) drown the photometric term.
    One temperature-style scalar at the net output boundary fixes the
    scale; BA math is untouched."""
    c = params.get("weight_calib") if hasattr(params, "get") else None
    return 1.0 if c is None else c


def _gru_chunk_scan(update_op, params, fpyr, inps_v, coords1, motion,
                    net_in, ii_s, ii_rs, jj_rs, nchunks, chunk):
    """Edge-chunked alt-corr + ConvGRU as ONE lax.scan over chunks.

    A python-unrolled chunk loop at backend scale (48+ chunks of 256
    edges over thousands of keyframes) explodes XLA compile time; scan
    compiles the chunk body once. GraphAgg is NOT part of the body:
    after the scan, the returned net slab holds every edge's updated
    hidden state, so the caller runs the whole aggregation once per
    step (_agg_eta_from_nets).

    All edge arrays must be pre-padded to nchunks*chunk. Returns
    (net_new, delta, w_new) at [nchunks*chunk, ...]."""
    resh = lambda a: a.reshape((nchunks, chunk) + a.shape[1:])

    cdt = update_op.dtype or jnp.float32

    def body(_, ch):
        coords_ch, motion_ch, net_ch, ii_ch, iir_ch, jjr_ch = ch
        corr_feat = corr.alt_corr_dispatch(fpyr, coords_ch, iir_ch, jjr_ch)
        net_c, delta_c, w_c = update_op.apply(
            {"params": params["update"]},
            net_ch.astype(cdt), inps_v[ii_ch],
            corr_feat.astype(cdt),
            motion_ch.astype(cdt))
        w_c = w_c * jnp.asarray(_weight_calib(params), w_c.dtype)
        return None, (net_c, delta_c, w_c)

    _, (net_new, delta, w_new) = jax.lax.scan(
        body,
        None,
        (resh(coords1), resh(motion), resh(net_in), resh(ii_s),
         resh(ii_rs), resh(jj_rs)))

    flat = lambda a: a.reshape((nchunks * chunk,) + a.shape[2:])
    return flat(net_new), flat(delta), flat(w_new)


def _agg_eta_from_nets(agg_op, params, nets, ii_loc, valid, P, axis=None):
    """Whole-graph GraphAgg: damping from every edge's final hidden
    state in ONE pass (conv1 over the edge slab, one scatter-add, the
    [P,...] frame-side convs once).

    The reference's keyframe-chunked GRU hands GraphAgg every edge of a
    frame in one call (factor_graph.py:279-303), so the global segment
    mean is exactly its semantics.  Running it per edge-chunk instead
    costs 48x the frame-side convs (+2.65 s/step measured at 2048 kf),
    and accumulating segment sums in the chunk loop's carry costs +7 s
    (fp32) of loop-carried HBM traffic per trigger — one pass over the
    final net slab avoids both.

    nets: [E,h8,w8,128]; ii_loc: [E] window-local source frames;
    valid: [E] bool.  Returns (eta [P,h8,w8] fp32, has_any [P] bool).

    The pass is sliced into <=3072-edge blocks (python-unrolled, so XLA
    chains the scatter-adds in place): one 12k-edge conv1 output is a
    7.3 GB fp32 temp that OOMs the 16 GB chip next to the BA state."""
    E = nets.shape[0]
    h8, w8 = nets.shape[1:3]
    okf = valid.astype(jnp.float32)
    seg_sum = jnp.zeros((P, h8, w8, 128), jnp.float32)
    seg_cnt = jnp.zeros((P,), jnp.float32).at[ii_loc].add(okf)
    block = min(E, 3072)
    for s0 in range(0, E, block):
        sl = slice(s0, min(s0 + block, E))
        ef = agg_op.apply({"params": params["update"]["agg"]},
                          nets[sl].astype(agg_op.dtype or jnp.float32),
                          method="edge_features").astype(jnp.float32)
        seg_sum = seg_sum.at[ii_loc[sl]].add(
            ef * okf[sl][:, None, None, None])
    if axis is not None:
        # shard_map callers: frames are shard-local, psum recovers the
        # global per-frame sums; the [P,...] head runs replicated
        seg_sum = jax.lax.psum(seg_sum, axis)
        seg_cnt = jax.lax.psum(seg_cnt, axis)
    agg = seg_sum / jnp.maximum(seg_cnt, 1.0)[:, None, None, None]
    eta, _ = agg_op.apply({"params": params["update"]["agg"]}, agg,
                          want_upmask=False, method="frame_head")
    return eta.astype(jnp.float32), seg_cnt > 0


@functools.partial(jax.jit, static_argnames=(
    "P", "cap", "cap_inac", "upsample", "max_deg", "iters", "motion_only",
    "cdt"))
def _update_kernel(P, cap, cap_inac, upsample, max_deg, params,
                   poses, disps, disps_sens, damping, disps_up, intrinsics,
                   inps_v,
                   net, target, weight, pyramid,
                   ii, jj, valid, ii_inac, jj_inac, inac_ok,
                   target_inac, weight_inac,
                   base, t0, t1, iters, lm, ep, motion_only,
                   cdt=jnp.bfloat16):
    """Fused: reproject -> motion -> corr lookup -> update op -> DBA."""
    h8, w8 = disps.shape[-2:]

    ii_s = jnp.where(valid, ii, 0)
    jj_s = jnp.where(valid, jj, 0)

    coords1, _ = projective.transform(poses, disps, intrinsics, ii_s, jj_s)
    motion = _motion_features(coords1, target, h8, w8)

    corr_feat = corr.lookup(corr.CorrPyramid(list(pyramid)), coords1)

    ii_local = jnp.clip(ii_s - base, 0, P - 1)
    jj_local = jnp.clip(jj_s - base, 0, P - 1)

    update_op = UpdateModule(num_frames=P, dtype=cdt)
    net_new, delta, w_new, eta, upmask, has_edge = update_op.apply(
        {"params": params["update"]},
        net.astype(cdt), inps_v[ii_s],
        corr_feat.astype(cdt), motion.astype(cdt),
        ii_local, valid)

    vf = valid[:, None, None, None].astype(jnp.float32)
    net = jnp.where(valid[:, None, None, None], net_new, net)
    target = jnp.where(vf > 0, coords1 + delta.astype(jnp.float32), target)
    weight = jnp.where(
        vf > 0, w_new.astype(jnp.float32) * _weight_calib(params), weight)

    # damping update for frames with edges (factor_graph.py:227)
    damping_w = jax.lax.dynamic_slice(
        damping, (base, 0, 0), (P, h8, w8))
    damping_w = jnp.where(has_edge[:, None, None],
                          eta.astype(jnp.float32), damping_w)
    damping = jax.lax.dynamic_update_slice(damping, damping_w, (base, 0, 0))

    # ---- DBA over the window ----------------------------------------
    poses_w = jax.lax.dynamic_slice(poses, (base, 0), (P, 7))
    disps_w = jax.lax.dynamic_slice(disps, (base, 0, 0), (P, h8, w8))
    sens_w = jax.lax.dynamic_slice(disps_sens, (base, 0, 0), (P, h8, w8))
    eta_ba = 0.2 * damping_w + EPS_DAMP

    if cap_inac:
        ii_ba = jnp.concatenate([ii_local, jnp.clip(ii_inac - base, 0, P - 1)])
        jj_ba = jnp.concatenate([jj_local, jnp.clip(jj_inac - base, 0, P - 1)])
        tg_ba = jnp.concatenate([target, target_inac], axis=0)
        wt_ba = jnp.concatenate([weight, weight_inac], axis=0)
        ok_ba = jnp.concatenate([valid, inac_ok])
    else:
        ii_ba, jj_ba, tg_ba, wt_ba, ok_ba = (
            ii_local, jj_local, target, weight, valid)

    poses_w, disps_w = dba.ba(
        poses_w, disps_w, intrinsics, sens_w, tg_ba, wt_ba, eta_ba,
        ii_ba, jj_ba, ok_ba, t0 - base, t1 - base, iters=iters, lm=lm,
        ep=ep, motion_only=motion_only, max_deg=max_deg)

    poses = jax.lax.dynamic_update_slice(poses, poses_w, (base, 0))
    disps = jax.lax.dynamic_update_slice(disps, disps_w, (base, 0, 0))

    if upsample:
        up = upsample_disp(disps_w, upmask.astype(jnp.float32))
        up_w = jax.lax.dynamic_slice(
            disps_up, (base, 0, 0), (P, 8 * h8, 8 * w8))
        up_w = jnp.where(has_edge[:, None, None], up, up_w)
        disps_up = jax.lax.dynamic_update_slice(disps_up, up_w, (base, 0, 0))

    return poses, disps, damping, disps_up, net, target, weight


@functools.partial(jax.jit, static_argnames=(
    "P", "cap", "chunk", "nchunks", "max_deg", "Tb", "iters",
    "motion_only", "solver", "cdt"),
    donate_argnums=(7, 8, 10, 14, 15, 16))
def _lowmem_kernel(P, cap, chunk, nchunks, max_deg, Tb, params,
                   poses, disps, disps_sens, damping, intrinsics, inps_v,
                   fmaps, net, target, weight,
                   ii, jj, ii_r, jj_r, valid,
                   base, t0, t1, iters, lm, ep, motion_only,
                   solver="chol", cdt=jnp.bfloat16):
    """One step of the low-memory path: alt-corr GRU over edge chunks,
    then full-window DBA (factor_graph.py:272-318).

    MEMORY CONTRACT (this is the long-sequence scaling path): the GRU
    hidden slab [cap, h8, w8, 128] is the dominant allocation at backend
    scale (~4 GB at 12k edges x 1200 px); it must exist ONCE. The chunk
    loop is a fori_loop carrying (net, target, weight) and updating them
    in place with dynamic_update_slice — XLA aliases the carry — and the
    input buffers are donated (the caller reassigns from the outputs).
    chunk must divide cap exactly (FactorGraph picks the largest divisor
    <= the configured chunk), so no padded copies exist either."""
    assert nchunks * chunk == cap, "chunk must divide cap (no padding)"
    h8, w8 = disps.shape[-2:]

    ii_s = jnp.where(valid, ii, 0)
    jj_s = jnp.where(valid, jj, 0)
    ii_rs = jnp.where(valid, ii_r, 0)
    jj_rs = jnp.where(valid, jj_r, 0)

    # slice + rig-flatten INSIDE the program (a host-side reshape of the
    # [B, rig, h8, w8, 128] feature buffer materializes a full copy that
    # tips HBM over at multi-thousand-keyframe scale)
    fm = fmaps[:Tb // fmaps.shape[1]].reshape(-1, h8, w8, 128)
    fpyr = corr.build_feature_pyramid(fm)
    update_op = UpdateModule(num_frames=P, dtype=cdt)
    agg_op = GraphAgg(num_frames=P, dtype=cdt)

    def body(c, carry):
        net, target, weight = carry
        c0 = c * chunk
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c0, chunk)
        ii_ch, jj_ch = sl(ii_s), sl(jj_s)
        iir_ch, jjr_ch = sl(ii_rs), sl(jj_rs)
        ok_ch = sl(valid)
        tgt_ch = sl(target)
        wt_ch = sl(weight)
        net_ch = sl(net)
        coords_ch, _ = projective.transform(poses, disps, intrinsics,
                                            ii_ch, jj_ch)
        motion_ch = _motion_features(coords_ch, tgt_ch, h8, w8)
        corr_feat = corr.alt_corr_dispatch(fpyr, coords_ch, iir_ch, jjr_ch)
        net_c, delta_c, w_c = update_op.apply(
            {"params": params["update"]},
            net_ch.astype(cdt), inps_v[ii_ch],
            corr_feat.astype(cdt),
            motion_ch.astype(cdt))
        okm = ok_ch[:, None, None, None]
        up = lambda a, v: jax.lax.dynamic_update_slice_in_dim(a, v, c0, 0)
        net = up(net, jnp.where(okm, net_c.astype(net.dtype), net_ch))
        target = up(target, jnp.where(
            okm, coords_ch + delta_c.astype(jnp.float32), tgt_ch))
        weight = up(weight, jnp.where(
            okm, w_c.astype(jnp.float32) * _weight_calib(params), wt_ch))
        return net, target, weight

    net, target, weight = jax.lax.fori_loop(
        0, nchunks, body, (net, target, weight))

    # whole-graph GraphAgg over the final hidden states (the chunk loop
    # carries no [P,...] accumulator — see _agg_eta_from_nets)
    ii_loc_all = jnp.clip(ii_s - base, 0, P - 1)
    eta_mean, has_frame = _agg_eta_from_nets(
        agg_op, params, net, ii_loc_all, valid, P)

    damping_w = jax.lax.dynamic_slice(damping, (base, 0, 0), (P, h8, w8))
    damping_w = jnp.where(has_frame[:, None, None], eta_mean, damping_w)
    damping = jax.lax.dynamic_update_slice(damping, damping_w, (base, 0, 0))

    poses_w = jax.lax.dynamic_slice(poses, (base, 0), (P, 7))
    disps_w = jax.lax.dynamic_slice(disps, (base, 0, 0), (P, h8, w8))
    sens_w = jax.lax.dynamic_slice(disps_sens, (base, 0, 0), (P, h8, w8))
    eta_ba = 0.2 * damping_w + EPS_DAMP

    ii_local = jnp.clip(ii_s - base, 0, P - 1)
    jj_local = jnp.clip(jj_s - base, 0, P - 1)
    poses_w, disps_w = dba.ba(
        poses_w, disps_w, intrinsics, sens_w, target, weight, eta_ba,
        ii_local, jj_local, valid, t0 - base, t1 - base, iters=iters,
        lm=lm, ep=ep, motion_only=motion_only, max_deg=max_deg,
        solver=solver, cg_iters=32)

    poses = jax.lax.dynamic_update_slice(poses, poses_w, (base, 0))
    disps = jax.lax.dynamic_update_slice(disps, disps_w, (base, 0, 0))
    return poses, disps, damping, net, target, weight


@functools.partial(jax.jit, static_argnames=(
    "P", "chunk", "max_deg", "mesh", "Tb", "iters", "cdt"))
def _lowmem_kernel_sharded(P, chunk, max_deg, mesh, Tb, params,
                           poses, disps, disps_sens, damping, intrinsics,
                           inps_v, fmaps, net, target, weight,
                           ii_sh, jj_sh, ii_rsh, jj_rsh, ok_sh, slot_idx,
                           base, t0, t1, iters, lm, ep, cdt=jnp.bfloat16):
    """Sharded low-memory step (new capability vs the single-GPU
    reference): edges live in [S, Es] shard blocks partitioned by source
    frame; each device runs alt-corr + chunked GRU on its own edge block,
    per-frame damping is combined with psum (each frame is owned by
    exactly one shard), and the DBA normal equations are psum'd over ICI
    with a replicated reduced solve (parallel/sharded_ba.ba_shard_gn)."""
    from jax.sharding import PartitionSpec as PSpec

    from ..parallel.sharded_ba import ba_shard_gn

    h8, w8 = disps.shape[-2:]
    S, Es = ii_sh.shape
    axis = mesh.axis_names[0]
    cap = net.shape[0]
    nchunks = (Es + chunk - 1) // chunk
    csize = min(chunk, Es)

    poses_w0 = jax.lax.dynamic_slice(poses, (base, 0), (P, 7))
    disps_w0 = jax.lax.dynamic_slice(disps, (base, 0, 0), (P, h8, w8))
    sens_w = jax.lax.dynamic_slice(disps_sens, (base, 0, 0), (P, h8, w8))
    damping_w0 = jax.lax.dynamic_slice(damping, (base, 0, 0), (P, h8, w8))

    fm = fmaps[:Tb // fmaps.shape[1]].reshape(-1, h8, w8, 128)
    fpyr = corr.build_feature_pyramid(fm)
    update_op = UpdateModule(num_frames=P, dtype=cdt)

    # gather per-edge device state into shard-major layout [S*Es, ...]
    sflat = slot_idx.reshape(-1)
    sclip = jnp.minimum(sflat, cap - 1)
    net_g = net[sclip]
    tgt_g = target[sclip]
    w_g = weight[sclip]

    sharded = PSpec(axis)
    repl = PSpec()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, sharded, sharded,
                  sharded, repl, repl, repl, repl, repl, repl, repl),
        out_specs=(repl, repl, repl, sharded, sharded, sharded),
    )
    def run(net_e, tgt_e, w_e, ii_e, jj_e, ii_re, jj_re,
            poses_w, disps_w, sens_w, damping_w, intr, inps_rep, fpyr_rep):
        # block shapes: edge-dim args arrive as this shard's [Es, ...]
        ok_e = ii_e >= 0
        ii_l = jnp.where(ok_e, ii_e, 0)
        jj_l = jnp.where(ok_e, jj_e, 0)
        ii_rl = jnp.where(ok_e, ii_re, 0)
        jj_rl = jnp.where(ok_e, jj_re, 0)

        coords1, _ = projective.transform(poses_w, disps_w, intr,
                                          ii_l, jj_l)
        motion = _motion_features(coords1, tgt_e, h8, w8)

        # pad to nchunks*csize for the chunk scan
        cpad = nchunks * csize - Es
        if cpad:
            pz = lambda a: jnp.concatenate(
                [a, jnp.zeros((cpad,) + a.shape[1:], a.dtype)])
            coords1_c, motion_c, net_in = pz(coords1), pz(motion), pz(net_e)
            ii_lc, ii_rlc, jj_rlc = pz(ii_l), pz(ii_rl), pz(jj_rl)
            ok_c = pz(ok_e)
        else:
            coords1_c, motion_c, net_in = coords1, motion, net_e
            ii_lc, ii_rlc, jj_rlc = ii_l, ii_rl, jj_rl
            ok_c = ok_e

        net_new, delta, w_new = _gru_chunk_scan(
            update_op, params, fpyr_rep, inps_rep, coords1_c, motion_c,
            net_in, ii_lc, ii_rlc, jj_rlc, nchunks, csize)
        net_new, delta, w_new = net_new[:Es], delta[:Es], w_new[:Es]

        # per-frame damping: whole-graph GraphAgg over this shard's
        # final hidden states, segment sums psum'd across shards
        eta_mean, has_frame = _agg_eta_from_nets(
            GraphAgg(num_frames=P, dtype=cdt), params, net_new,
            jnp.clip(ii_l - base, 0, P - 1), ok_e, P, axis=axis)
        damping_new = jnp.where(has_frame[:, None, None], eta_mean,
                                damping_w)

        vmask = ok_e[:, None, None, None]
        net_out = jnp.where(vmask, net_new, net_e)
        tgt_out = jnp.where(vmask, coords1 + delta.astype(jnp.float32),
                            tgt_e)
        w_out = jnp.where(vmask, w_new.astype(jnp.float32), w_e)

        eta_ba = 0.2 * damping_new + EPS_DAMP
        ii_ba = jnp.clip(ii_l - base, 0, P - 1)
        jj_ba = jnp.clip(jj_l - base, 0, P - 1)
        poses_o, disps_o = ba_shard_gn(
            axis, poses_w, disps_w, sens_w, tgt_out, w_out, eta_ba,
            ii_ba, jj_ba, ok_e, intr, t0 - base, t1 - base, iters,
            lm, ep, max_deg)
        return poses_o, disps_o, damping_new, net_out, tgt_out, w_out

    # encode padding in ii (>= 0 test inside the shard body)
    ii_tag = jnp.where(ok_sh, ii_sh, -1).reshape(-1)
    out = run(net_g, tgt_g, w_g, ii_tag, jj_sh.reshape(-1),
              ii_rsh.reshape(-1), jj_rsh.reshape(-1),
              poses_w0, disps_w0, sens_w, damping_w0, intrinsics,
              inps_v, fpyr)
    poses_w, disps_w, damping_w, net_o, tgt_o, w_o = out

    poses = jax.lax.dynamic_update_slice(poses, poses_w, (base, 0))
    disps = jax.lax.dynamic_update_slice(disps, disps_w, (base, 0, 0))
    damping = jax.lax.dynamic_update_slice(damping, damping_w,
                                           (base, 0, 0))
    # scatter shard results back to their slots (OOB padding dropped)
    net = net.at[sflat].set(net_o.astype(net.dtype), mode="drop")
    target = target.at[sflat].set(tgt_o, mode="drop")
    weight = weight.at[sflat].set(w_o, mode="drop")
    return poses, disps, damping, net, target, weight
