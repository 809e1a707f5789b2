"""Multi-chip dense bundle adjustment via shard_map over the edge dim.

New capability vs the reference (which is single-GPU): the per-edge system
build — the FLOP-dominant half of DBA — is sharded across a device mesh;
Hessian/rhs/Schur blocks are combined with psum over ICI, the reduced
system is solved replicated (identical on every chip), and depth updates
are combined with a masked psum.

Correctness requires every same-source edge pair to be shard-local (the
Schur complement has (jj_e1, jj_e2) terms for edges sharing ii): edges are
partitioned by contiguous source-frame blocks, so all pair products stay
on one chip and never cross ICI.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import dba, lie
from ..utils.shapes import bucket


def partition_edges_by_source(ii: np.ndarray, jj: np.ndarray,
                              valid: np.ndarray, n_frames: int,
                              n_shards: int):
    """Assign edges to shards by contiguous source-frame blocks.

    Returns (ii_s, jj_s, valid_s) arrays of shape [n_shards, cap_shard]
    with per-shard padding, such that all edges with the same ii land on
    the same shard.
    """
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    valid = np.asarray(valid, bool)
    block = (n_frames + n_shards - 1) // n_shards
    shard_of = np.clip(ii // block, 0, n_shards - 1)

    counts = [int(((shard_of == s) & valid).sum()) for s in range(n_shards)]
    cap = bucket(max(max(counts), 1))

    ii_s = np.zeros((n_shards, cap), np.int32)
    jj_s = np.zeros((n_shards, cap), np.int32)
    ok_s = np.zeros((n_shards, cap), bool)
    for s in range(n_shards):
        sel = np.where((shard_of == s) & valid)[0]
        ii_s[s, :len(sel)] = ii[sel]
        jj_s[s, :len(sel)] = jj[sel]
        ok_s[s, :len(sel)] = True
    return ii_s, jj_s, ok_s


def partition_edge_slots(ii: np.ndarray, valid: np.ndarray,
                         n_frames: int, n_shards: int):
    """Assign edge SLOTS to shards by contiguous source-frame blocks.

    Unlike partition_edges_by_source (which returns edge VALUES), this
    returns indices into the cap-length edge arrays, for gathering the
    per-edge device state (net/target/weight) into shard layout and
    scattering results back.

    Returns slot_idx [n_shards, Es] int32 with cap (out-of-bounds)
    padding — OOB gathers are masked by the validity, OOB scatters are
    dropped. Slot order is preserved within each shard, so per-frame
    reductions sum in the same order as the single-device path.
    """
    ii = np.asarray(ii)
    valid = np.asarray(valid, bool)
    cap = len(ii)
    block = (n_frames + n_shards - 1) // n_shards
    shard_of = np.clip(ii // block, 0, n_shards - 1)
    counts = [int(((shard_of == s) & valid).sum()) for s in range(n_shards)]
    Es = bucket(max(max(counts), 1))
    slot_idx = np.full((n_shards, Es), cap, np.int32)
    for s in range(n_shards):
        sel = np.where((shard_of == s) & valid)[0]
        slot_idx[s, :len(sel)] = sel
    return slot_idx


def ba_shard_gn(axis: str, poses, disps, disps_sens, tw, ww, eta,
                ii, jj, valid, intrinsics, t0, t1, iters: int,
                lm, ep, max_deg: int):
    """Per-shard Gauss-Newton loop — call INSIDE a shard_map over `axis`.

    poses/disps/disps_sens/eta/intrinsics are replicated; tw/ww/ii/jj/valid
    are the shard-local edge block. All edges sharing a source frame must
    be shard-local (partition_edges_by_source guarantees this). Returns
    replicated (poses, disps) — partial normal equations are psum'd over
    ICI, the reduced solve runs identically on every chip.
    """
    Pn = poses.shape[0]
    ht, wd = disps.shape[-2:]
    hw = ht * wd
    frames = jnp.arange(Pn)

    def gn_step(_, state):
        poses, disps = state
        sys = dba.build_edge_system(poses, disps, intrinsics, tw, ww,
                                    ii, jj, valid)

        pose_mask = (frames >= t0) & (frames < t1)
        pm_f = pose_mask.astype(jnp.float32)
        kx_local = jnp.zeros(Pn, bool).at[ii].max(valid, mode="drop")
        kx_mask = pose_mask | jax.lax.psum(
            kx_local.astype(jnp.int32), axis) > 0

        ar6 = jnp.arange(6)

        def br(idx):
            return (idx[..., None] * 6 + ar6)[..., :, None]

        def bc(idx):
            return (idx[..., None] * 6 + ar6)[..., None, :]

        gi = pose_mask[ii].astype(jnp.float32)
        gj = pose_mask[jj].astype(jnp.float32)
        P6 = Pn * 6
        L = jnp.zeros((P6, P6), jnp.float32)
        L = L.at[br(ii), bc(ii)].add(
            sys.H[:, :6, :6] * gi[:, None, None], mode="drop")
        L = L.at[br(ii), bc(jj)].add(
            sys.H[:, :6, 6:] * (gi * gj)[:, None, None], mode="drop")
        L = L.at[br(jj), bc(ii)].add(
            sys.H[:, 6:, :6] * (gj * gi)[:, None, None], mode="drop")
        L = L.at[br(jj), bc(jj)].add(
            sys.H[:, 6:, 6:] * gj[:, None, None], mode="drop")
        b = jnp.zeros((Pn, 6), jnp.float32)
        b = b.at[ii].add(sys.v[:, :6] * gi[:, None], mode="drop")
        b = b.at[jj].add(sys.v[:, 6:] * gj[:, None], mode="drop")

        disps_flat = disps.reshape(Pn, hw)
        sens_flat = disps_sens.reshape(Pn, hw)
        m = (sens_flat > 0).astype(jnp.float32)

        Cacc = jnp.zeros((Pn, hw), jnp.float32).at[ii].add(
            sys.Cii, mode="drop")
        Cacc = jax.lax.psum(Cacc, axis)
        C = Cacc + m * dba.ALPHA_RGBD + (1 - m) * eta.reshape(Pn, hw)
        w_rhs = jnp.zeros((Pn, hw), jnp.float32).at[ii].add(
            sys.bz, mode="drop")
        w_rhs = jax.lax.psum(w_rhs, axis) \
            - m * dba.ALPHA_RGBD * (disps_flat - sens_flat)
        Q = kx_mask[:, None] / jnp.maximum(C, 1e-12)

        # Ei rows: shard-local partial sums; since all edges with a
        # given ii are on ONE shard, the local sum is already complete
        # for owned frames and zero elsewhere — no psum needed before
        # the outer products, but the dense S must be psum'd.
        Ei = jnp.zeros((Pn, 6, hw), jnp.float32).at[ii].add(
            sys.Eii, mode="drop") * pm_f[:, None, None]
        Eij_m = sys.Eij * gj[:, None, None]

        Skk = jnp.einsum("kah,kh,kbh->kab", Ei, Q, Ei)
        L = L.at[br(frames), bc(frames)].add(-Skk, mode="drop")
        Sx = jnp.einsum("eah,eh,ebh->eab", Ei[ii], Q[ii], Eij_m)
        L = L.at[br(ii), bc(jj)].add(-Sx, mode="drop")
        L = L.at[br(jj), bc(ii)].add(-jnp.swapaxes(Sx, -1, -2),
                                     mode="drop")

        tbl, _ = dba._source_table(ii, valid, Pn, max_deg)
        ok_t = tbl >= 0
        idx_t = jnp.maximum(tbl, 0)
        G = Eij_m[idx_t] * ok_t[..., None, None]
        GQ = G * Q[:, None, None, :]
        Spp = jnp.einsum("kdah,kebh->kdeab", GQ, G)
        pj = jj[idx_t]
        okrc = ok_t[:, :, None] & ok_t[:, None, :]
        rows = (pj[:, :, None, None] * 6 + ar6)[..., :, None]
        cols = (pj[:, None, :, None] * 6 + ar6)[..., None, :]
        L = L.at[rows, cols].add(-Spp * okrc[..., None, None],
                                 mode="drop")

        bs = jnp.einsum("kah,kh,kh->ka", Ei, Q, w_rhs)
        bx = jnp.einsum("eah,eh,eh->ea", Eij_m, Q[ii], w_rhs[ii])
        b_schur = bs + jnp.zeros((Pn, 6), jnp.float32).at[jj].add(
            bx, mode="drop")

        # combine partial normal equations across shards (ICI psum)
        L = jax.lax.psum(L, axis)
        rf = jax.lax.psum((b - b_schur).reshape(Pn * 6), axis)
        pm6 = jnp.repeat(pm_f, 6)
        L = L * pm6[:, None] * pm6[None, :]
        diag = jnp.diagonal(L)
        L = L + jnp.diag((ep + lm * diag) * pm6 + (1.0 - pm6))
        rf = rf * pm6

        dx = dba._solve_spd(L, rf).reshape(Pn, 6) * pm_f[:, None]
        poses = lie.retr(poses, dx)

        dw = jnp.einsum("kah,ka->kh", Ei, dx)
        dwe = jnp.einsum("eah,ea->eh", Eij_m, dx[jj])
        dw = dw + jnp.zeros((Pn, hw), jnp.float32).at[ii].add(
            dwe, mode="drop")
        dw = jax.lax.psum(dw, axis)
        dz = Q * (w_rhs - dw)
        disps = jnp.maximum(disps + dz.reshape(Pn, ht, wd), dba.DISP_MIN)
        return poses, disps

    return jax.lax.fori_loop(0, iters, gn_step, (poses, disps))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "iters", "max_deg"),
)
def ba_sharded(mesh: Mesh, poses, disps, intrinsics, disps_sens,
               target, weight, eta, ii_s, jj_s, valid_s,
               t0, t1, iters: int = 2, lm: float = 1e-4, ep: float = 0.1,
               max_deg: int = 24):
    """Sharded full BA.

    Args are as dba.ba except the edge arrays carry a leading shard dim:
    target/weight: [S, Es, ht, wd, 2]; ii_s/jj_s/valid_s: [S, Es].
    poses/disps/... are replicated.
    """
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
    )
    def run(poses, disps, disps_sens, tw, ww, edges, eta, intrinsics):
        ii, jj, valid = edges[..., 0], edges[..., 1], edges[..., 2] != 0
        # shard_map passes blocks with the leading shard dim of size 1
        ii, jj, valid = ii[0], jj[0], valid[0]
        tw, ww = tw[0], ww[0]
        return ba_shard_gn(axis, poses, disps, disps_sens, tw, ww, eta,
                           ii, jj, valid, intrinsics, t0, t1, iters,
                           lm, ep, max_deg)

    edges = jnp.stack([ii_s, jj_s, valid_s.astype(jnp.int32)], axis=-1)
    return run(poses, disps, disps_sens, target, weight, edges, eta,
               intrinsics)
