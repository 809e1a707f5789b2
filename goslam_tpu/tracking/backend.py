"""Backend — global bundle adjustment and loop closing.

Host-side orchestration mirroring /root/reference/src/backend.py: builds a
sparse edge set over [t_start, t_end) from the device-computed flow-distance
matrix (greedy NMS selection; loop mode additionally requires a
neighborhood-consistency vote before accepting a loop candidate), then runs
the low-memory update (alt-corr + chunked GRU + full DBA) over it.
"""
from __future__ import annotations

from copy import deepcopy

import numpy as np

from ..utils.greedy import greedy_nms_scan
from .factor_graph import FactorGraph, _resolve_dtype
from .video import VideoBuffer


class Backend:
    # observability: accepted loop-vote candidates (loop-closure proof in
    # tests). Class-level defaults so partially-constructed instances
    # (tests use Backend.__new__ to drive _propose_edges alone) count too.
    last_loop_accepts = 0
    total_loop_accepts = 0

    def __init__(self, params, video: VideoBuffer, cfg: dict, mesh=None):
        t = cfg["tracking"]
        self.params = params
        self.video = video
        # multi-device mesh: global BA shards its edge work over it
        self.mesh = mesh
        self.beta = t["beta"]
        self.upsample = t.get("upsample", False)

        b = t["backend"]
        self.backend_thresh = b["thresh"]
        self.backend_radius = b["radius"]
        self.backend_nms = b["nms"]
        self.backend_loop_window = b["loop_window"]
        self.backend_loop_thresh = b["loop_thresh"]
        self.backend_loop_radius = b["loop_radius"]
        self.backend_loop_nms = b["loop_nms"]
        self.compute_dtype = _resolve_dtype(t.get("compute_dtype"))
        self.last_loop_accepts = 0
        self.total_loop_accepts = 0

    # ------------------------------------------------------------------
    def _propose_edges(self, t_start, t_end, t_start_loop, radius, nms,
                       thresh, max_factors, loop, existing_es):
        """Greedy distance-sorted edge proposal (backend.py:25-99)."""
        ilen = t_end - t_start_loop
        jlen = t_end - t_start
        ii0, jj0 = np.meshgrid(np.arange(t_start_loop, t_end),
                               np.arange(t_start, t_end), indexing="ij")
        ii_f, jj_f = ii0.reshape(-1), jj0.reshape(-1)
        d = np.array(self.video.distance(ii_f, jj_f, beta=self.beta),
                     np.float64)
        rawd = d.reshape(ilen, jlen).copy()
        d[ii_f - radius < jj_f] = np.inf
        d[d > thresh] = np.inf
        d = d.reshape(ilen, jlen)

        es = list(existing_es)
        for i in range(t_start_loop, t_end):
            if self.video.stereo and not loop:
                es.append((i, i))
                d[i - t_start_loop, i - t_start] = np.inf
            for j in range(max(i - radius, t_start_loop), i):
                es.append((i, j))
                es.append((j, i))
                di, dj = i - t_start_loop, j - t_start
                d[max(0, di - nms):di + nms + 1,
                  max(0, dj - nms):dj + nms + 1] = np.inf

        n_neigh = 1

        # native scan: the Python greedy loop costs ~33 s of a
        # 2048-keyframe trigger on one core; the C++ twin is ms.
        # GOSLAM_NATIVE_GREEDY=0 forces the Python path (parity tests).
        import os
        if os.environ.get("GOSLAM_NATIVE_GREEDY", "1") != "0":
            try:
                from ..native import greedy_propose
                pairs, n_acc = greedy_propose(
                    d, rawd, thresh, nms, len(es), max_factors, loop,
                    n_neigh, t_start_loop, t_start, t_end)
                es.extend(tuple(p) for p in pairs.tolist())
                self.last_loop_accepts += n_acc
                self.total_loop_accepts += n_acc
                return es
            except Exception as e:  # noqa: BLE001 — g++ missing, etc.
                import warnings
                warnings.warn(f"native greedy unavailable ({e}); "
                              "falling back to the Python scan")

        def accept(di, dj):
            if len(es) > max_factors:
                return False
            i, j = di + t_start_loop, dj + t_start
            if loop:
                # neighborhood-consistency vote (backend.py:79-89)
                sub, votes = [], 0
                for si in range(max(i - n_neigh, t_start_loop),
                                min(i + n_neigh + 1, t_end)):
                    for sj in range(max(j - n_neigh, t_start),
                                    min(j + n_neigh + 1, t_end)):
                        if rawd[si - t_start_loop, sj - t_start] <= thresh:
                            votes += 1
                            if si != sj:
                                sub.append((si, sj))
                if votes > int(((2 * n_neigh + 1) ** 2) * 0.5):
                    es.extend(sub)
                    self.last_loop_accepts += 1
                    self.total_loop_accepts += 1
            else:
                es.append((i, j))
                es.append((j, i))
            return True

        greedy_nms_scan(d, thresh, nms, accept)
        return es

    # ------------------------------------------------------------------
    def ba(self, t_start, t_end, steps, graph: FactorGraph, nms, radius,
           thresh, max_factors, t_start_loop=None, loop=False,
           motion_only=False):
        """Edge proposal + low-memory global update (backend.py:25-123)."""
        if t_start_loop is None or not loop:
            t_start_loop = t_start
        assert t_start_loop >= t_start

        es = self._propose_edges(t_start, t_end, t_start_loop, radius, nms,
                                 thresh, max_factors, loop, [])
        if len(es) < 3:
            return 0

        ii, jj = np.asarray(sorted(set(es)), np.int32).T
        graph.add_factors(ii, jj, remove=True)
        edge_num = graph.n_edges()

        # ba_type is 'dense' even for loop closing: the reference's
        # Backend.ba hardcodes it (backend.py:112), so loop BA runs with
        # the dense damping regime lm=1e-5/ep=1e-2 (factor_graph.py:313-318
        # selects on ba_type, and 'loop' is never passed from the backend)
        graph.update_lowmem(
            t0=t_start_loop + 1, t1=t_end, iters=2, steps=steps,
            max_t=t_end, ba_type="dense",
            motion_only=motion_only)

        graph.clear_edges()
        self.video.dirty[t_start:t_end] = True
        return edge_num

    # ------------------------------------------------------------------
    def dense_ba(self, t_start, t_end, steps=6, motion_only=False):
        """Full-sequence BA (backend.py:126-138)."""
        n = t_end - t_start
        max_factors = (int(self.video.stereo)
                       + (self.backend_radius + 2) * 2) * n
        graph = FactorGraph(self.video, self.params,
                            max_factors=max_factors, corr_impl="alt",
                            upsample=self.upsample, inac_capacity=-1,
                            mesh=self.mesh,
                            compute_dtype=self.compute_dtype)
        n_edges = self.ba(t_start, t_end, steps, graph, self.backend_nms,
                          self.backend_radius, self.backend_thresh,
                          max_factors, motion_only=motion_only)
        return n, n_edges

    def loop_ba(self, t_start, t_end, steps=6, motion_only=False,
                local_graph=None):
        """Windowed loop closing seeded with the frontend's live edges
        (backend.py:141-163)."""
        max_factors = 8 * self.backend_loop_window
        t_start_loop = max(0, t_end - self.backend_loop_window)
        self.last_loop_accepts = 0

        graph = FactorGraph(self.video, self.params,
                            max_factors=max_factors, corr_impl="alt",
                            upsample=self.upsample, inac_capacity=-1,
                            mesh=self.mesh,
                            compute_dtype=self.compute_dtype)
        if local_graph is not None:
            # copy the frontend's live edges (targets/weights/hidden state)
            sel = np.where(local_graph.valid)[0]
            graph.ii[:len(sel)] = local_graph.ii[sel]
            graph.jj[:len(sel)] = local_graph.jj[sel]
            graph.age[:len(sel)] = local_graph.age[sel]
            graph.valid[:len(sel)] = True
            graph.net = graph.net.at[:len(sel)].set(local_graph.net[sel])
            graph.target = graph.target.at[:len(sel)].set(
                local_graph.target[sel])
            graph.weight = graph.weight.at[:len(sel)].set(
                local_graph.weight[sel])

        left = max_factors - graph.n_edges()
        n_edges = self.ba(t_start, t_end, steps, graph,
                          self.backend_loop_nms, self.backend_loop_radius,
                          self.backend_loop_thresh, left,
                          t_start_loop=t_start_loop, loop=True,
                          motion_only=motion_only)
        return t_end - t_start_loop, n_edges
