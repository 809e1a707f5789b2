"""Greedy edge proposal must match the reference algorithm exactly.

The reference (backend.py:25-99, factor_graph.py:373-446) sorts candidate
distances once, pre-filters to <= thresh, then *continues* past candidates
whose live distance was NMS-suppressed after the sort — breaking only on
max_factors. Round 1 `break`-ed instead, starving the loop/proximity graph.
These tests pit Backend._propose_edges against a line-faithful numpy port
of the reference loop on randomized distance matrices.
"""
from types import SimpleNamespace

import numpy as np
import pytest

from goslam_tpu.tracking.backend import Backend

pytestmark = pytest.mark.quick


def _ref_propose(dist, t_start, t_end, t_start_loop, radius, nms, thresh,
                 max_factors, stereo, loop):
    """Numpy port of /root/reference/src/backend.py:25-99 (torch removed)."""
    ilen = t_end - t_start_loop
    jlen = t_end - t_start
    ii0, jj0 = np.meshgrid(np.arange(t_start_loop, t_end),
                           np.arange(t_start, t_end), indexing="ij")
    ii_f, jj_f = ii0.reshape(-1), jj0.reshape(-1)
    d = dist[ii_f, jj_f].astype(np.float64).copy()
    rawd = d.copy().reshape(ilen, jlen)
    d[ii_f - radius < jj_f] = np.inf
    d[d > thresh] = np.inf
    d = d.reshape(ilen, jlen)

    es = []
    for i in range(t_start_loop, t_end):
        if stereo and not loop:
            es.append((i, i))
            d[i - t_start_loop, i - t_start] = np.inf
        for j in range(max(i - radius, t_start_loop), i):
            es.append((i, j))
            es.append((j, i))
            di, dj = i - t_start_loop, j - t_start
            d[di, dj] = np.inf
            d[max(0, di - nms):min(ilen, di + nms + 1),
              max(0, dj - nms):min(jlen, dj + nms + 1)] = np.inf

    vals = d.reshape(-1)
    ix = np.argsort(vals, kind="stable")
    ix = ix[vals[ix] <= thresh].tolist()

    n_neighboring = 1
    while len(ix) > 0:
        k = ix.pop(0)
        di, dj = k // jlen, k % jlen
        if d[di, dj] > thresh:
            continue
        if len(es) > max_factors:
            break
        i, j = int(ii_f[k]), int(jj_f[k])
        if loop:
            sub_es, num_loop = [], 0
            for si in range(max(i - n_neighboring, t_start_loop),
                            min(i + n_neighboring + 1, t_end)):
                for sj in range(max(j - n_neighboring, t_start),
                                min(j + n_neighboring + 1, t_end)):
                    if rawd[si - t_start_loop, sj - t_start] <= thresh:
                        num_loop += 1
                        if si != sj:
                            sub_es.append((si, sj))
            if num_loop > int(((n_neighboring * 2 + 1) ** 2) * 0.5):
                es += sub_es
        else:
            es.append((i, j))
            es.append((j, i))
        d[max(0, di - nms):min(ilen, di + nms + 1),
          max(0, dj - nms):min(jlen, dj + nms + 1)] = np.inf
    return es


def _make_backend(dist, stereo):
    video = SimpleNamespace(
        stereo=stereo,
        distance=lambda ii, jj, beta=0.3: dist[np.asarray(ii),
                                               np.asarray(jj)],
    )
    be = Backend.__new__(Backend)
    be.video = video
    be.beta = 0.3
    return be


@pytest.mark.parametrize("impl", ["native", "python"])
@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("loop,stereo", [(False, False), (False, True),
                                         (True, False)])
def test_propose_edges_matches_reference(seed, loop, stereo, impl,
                                         monkeypatch):
    # the C++ scan (native/greedy.cpp) and the Python fallback must both
    # reproduce the reference loop — the runtime uses the native one
    monkeypatch.setenv("GOSLAM_NATIVE_GREEDY",
                       "1" if impl == "native" else "0")
    rng = np.random.default_rng(seed)
    n = 24
    # symmetric-ish distances with clusters so NMS suppression kicks in
    dist = 20.0 * rng.random((n, n)).astype(np.float64)
    dist = (dist + dist.T) / 2
    t_start, t_end = 0, n
    t_start_loop = 8 if loop else t_start
    radius, nms, thresh = 2, 1, 12.0
    max_factors = 160

    be = _make_backend(dist, stereo)
    got = be._propose_edges(t_start, t_end, t_start_loop, radius, nms,
                            thresh, max_factors, loop, [])
    want = _ref_propose(dist, t_start, t_end, t_start_loop, radius, nms,
                        thresh, max_factors, stereo, loop)
    assert sorted(got) == sorted(
        (int(a), int(b)) for a, b in want), (
        f"edge sets diverge: got {len(got)}, want {len(want)}")


def test_loop_ba_uses_dense_damping_regime():
    """Reference Backend.ba hardcodes ba_type='dense' (backend.py:112) even
    when loop closing — lm=1e-5/ep=1e-2, never the 'loop' regime."""
    n = 32
    rng = np.random.default_rng(0)
    dist = 5.0 * rng.random((n, n))
    dist = (dist + dist.T) / 2
    be = _make_backend(dist, stereo=False)
    be.video.dirty = np.zeros(n, bool)

    calls = {}

    class Graph:
        def add_factors(self, ii, jj, remove=False):
            pass

        def n_edges(self):
            return 10

        def update_lowmem(self, **kw):
            calls.update(kw)

        def clear_edges(self):
            pass

    be.ba(0, n, steps=2, graph=Graph(), nms=1, radius=2, thresh=20.0,
          max_factors=200, t_start_loop=8, loop=True)
    assert calls["ba_type"] == "dense"


def test_nms_suppressed_candidate_does_not_starve_selection():
    """Regression: the 2nd-best candidate sits inside the 1st's NMS window;
    selection must skip it and still take the (far-away) 3rd-best."""
    n = 16
    dist = np.full((n, n), 50.0)
    dist[2, 10] = dist[10, 2] = 1.0   # best
    dist[3, 10] = dist[10, 3] = 1.1   # NMS-suppressed by (2,10) with nms=1
    dist[8, 14] = dist[14, 8] = 2.0   # must still be selected
    be = _make_backend(dist, stereo=False)
    es = be._propose_edges(0, n, 0, 0, 1, 10.0, 100, False, [])
    assert (8, 14) in es and (14, 8) in es
    assert (3, 10) not in es
