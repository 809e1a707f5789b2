"""Pallas TPU kernels — fused DBA edge-system build.

The Gauss-Newton edge-system build (dba.build_edge_system, mirroring
projective_transform_kernel, droid_kernels.cu:176-424) is the FLOP-light,
bandwidth-heavy half of dense BA: the XLA version materializes the
12-row Jacobians [E, 12, hw] in HBM (~700 MB/pass at backend scale)
before contracting them. This kernel computes the Jacobians in VMEM
per edge-block and writes only the contracted outputs:

  reads : disps[ii] gather [E, hw], target/weight [E, 2, hw], Gij [E, 8]
  writes: H [E,12,12], v [E,12], Eii/Eij [E,6,hw], Cii/bz [E,hw]

~1.1 GB of traffic instead of ~4 GB, with the per-pixel geometry on the
VPU and the Gram products on the MXU ([16, hw] @ [hw, 16] per edge; the
13th row carries the residual so H and v come out of one dot).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lie

MIN_DEPTH = 0.25          # droid_kernels.cu:26
WEIGHT_SCALE = 0.001      # droid_kernels.cu:305


def _rot(qx, qy, qz, qw, vx, vy, vz):
    """Rotate per-lane 3-vectors by a per-edge quaternion (actSO3,
    droid_kernels.cu:58-68). q* are [EB, 1], v* are [EB, hw]."""
    ux = 2.0 * (qy * vz - qz * vy)
    uy = 2.0 * (qz * vx - qx * vz)
    uz = 2.0 * (qx * vy - qy * vx)
    return (vx + qw * ux + (qy * uz - qz * uy),
            vy + qw * uy + (qz * ux - qx * uz),
            vz + qw * uz + (qx * uy - qy * ux))


def _edge_system_kernel(wd: int, eb: int,
                        intr_ref, d_ref, tgt_ref, w_ref, g_ref,
                        H_ref, v_ref, Eii_ref, Eij_ref, C_ref, bz_ref,
                        Ju_ref, Jv_ref):
    fx = intr_ref[0, 0]
    fy = intr_ref[0, 1]
    cx = intr_ref[0, 2]
    cy = intr_ref[0, 3]

    d = d_ref[:]                                        # [EB, hw]
    p = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    u = (p % wd).astype(jnp.float32)
    vpix = (p // wd).astype(jnp.float32)
    X = (u - cx) / fx
    Y = (vpix - cy) / fy
    one = jnp.ones_like(d)

    tx = g_ref[:, 0:1]
    ty = g_ref[:, 1:2]
    tz = g_ref[:, 2:3]
    qx = g_ref[:, 3:4]
    qy = g_ref[:, 4:5]
    qz = g_ref[:, 5:6]
    qw = g_ref[:, 6:7]
    stereo = g_ref[:, 7:8]

    # Xj = Gij . [X, Y, 1, d] (actSE3: rotate xyz, translate by h*t)
    rx, ry, rz = _rot(qx, qy, qz, qw, X, Y, one)
    x = rx + d * tx
    y = ry + d * ty
    z = rz + d * tz
    h = d

    ok = z >= MIN_DEPTH
    dd = jnp.where(ok, 1.0 / jnp.where(ok, z, 1.0), 0.0)
    d2 = dd * dd

    wu = jnp.where(ok, w_ref[:, 0, :], 0.0) * WEIGHT_SCALE
    wv = jnp.where(ok, w_ref[:, 1, :], 0.0) * WEIGHT_SCALE
    ru = tgt_ref[:, 0, :] - (fx * dd * x + cx)
    rv = tgt_ref[:, 1, :] - (fy * dd * y + cy)

    # d(proj)/d(xi_j) rows, [trans, rot] (droid_kernels.cu:236-259)
    ju0 = fx * h * dd
    ju1 = jnp.zeros_like(d)
    ju2 = -fx * x * h * d2
    ju3 = -fx * x * y * d2
    ju4 = fx * (1.0 + x * x * d2)
    ju5 = -fx * y * dd
    jv0 = jnp.zeros_like(d)
    jv1 = fy * h * dd
    jv2 = -fy * y * h * d2
    jv3 = -fy * (1.0 + y * y * d2)
    jv4 = fy * x * y * d2
    jv5 = fy * x * dd

    # d(proj)/d(disp_i) (droid_kernels.cu:261-265)
    jz_u = fx * (tx * dd - tz * (x * d2))
    jz_v = fy * (ty * dd - tz * (y * d2))

    # depth blocks use pre-stereo weights (droid_kernels.cu:320-321)
    C_ref[:] = wu * jz_u * jz_u + wv * jz_v * jz_v
    bz_ref[:] = wu * ru * jz_u + wv * rv * jz_v

    # stereo edges do not constrain poses (droid_kernels.cu:323,356)
    wu_p = wu * (1.0 - stereo)
    wv_p = wv * (1.0 - stereo)

    # dual-adjoint transport to the pose-i tangent (droid_kernels.cu:85-89,
    # 325-326): Y[:3] = R^T a; Y[3:] = R^T (b + a x t); negated
    qix, qiy, qiz = -qx, -qy, -qz

    def adjT(a0, a1, a2, b0, b1, b2):
        c0 = a1 * tz - a2 * ty
        c1 = a2 * tx - a0 * tz
        c2 = a0 * ty - a1 * tx
        r0, r1, r2 = _rot(qix, qiy, qiz, qw, a0, a1, a2)
        s0, s1, s2 = _rot(qix, qiy, qiz, qw, b0 + c0, b1 + c1, b2 + c2)
        return -r0, -r1, -r2, -s0, -s1, -s2

    ui = adjT(ju0, ju1, ju2, ju3, ju4, ju5)
    vi = adjT(jv0, jv1, jv2, jv3, jv4, jv5)

    # scratch layout: rows 0-5 pose-i, 6-11 pose-j, 12 residual, 13-15 zero
    zero = jnp.zeros_like(d)
    for r, val in enumerate(ui):
        Ju_ref[:, r, :] = val
    for r, val in enumerate((ju0, ju1, ju2, ju3, ju4, ju5)):
        Ju_ref[:, 6 + r, :] = val
    Ju_ref[:, 12, :] = ru
    for r, val in enumerate(vi):
        Jv_ref[:, r, :] = val
    for r, val in enumerate((jv0, jv1, jv2, jv3, jv4, jv5)):
        Jv_ref[:, 6 + r, :] = val
    Jv_ref[:, 12, :] = rv
    for r in range(13, 16):
        Ju_ref[:, r, :] = zero
        Jv_ref[:, r, :] = zero

    # pose-depth couplings (droid_kernels.cu:316-356)
    eu = wu_p * jz_u
    ev = wv_p * jz_v
    Eii_ref[:] = (eu[:, None, :] * Ju_ref[:, 0:6, :]
                  + ev[:, None, :] * Jv_ref[:, 0:6, :])
    Eij_ref[:] = (eu[:, None, :] * Ju_ref[:, 6:12, :]
                  + ev[:, None, :] * Jv_ref[:, 6:12, :])

    # Gram products on the MXU: G = (W A) A^T with the residual as row 12,
    # so H = G[:12,:12] and v = G[12,:12].  The eb edges are stacked into
    # ONE [eb*16, hw] x [hw, eb*16] dot (a full 128x128 MXU tile at eb=8)
    # instead of eb tiny 16x16-output dots at ~1.5% MXU utilization; the
    # cross-edge blocks of G are discarded.  HIGHEST keeps the fp32
    # mantissa through the MXU (the SURVEY mixed-precision contract keeps
    # BA/geometry in fp32).
    Au = Ju_ref[:].reshape(eb * 16, -1)                 # [eb*16, hw]
    Av = Jv_ref[:].reshape(eb * 16, -1)
    WAu = (Ju_ref[:] * wu_p[:, None, :]).reshape(eb * 16, -1)
    WAv = (Jv_ref[:] * wv_p[:, None, :]).reshape(eb * 16, -1)
    G = (jnp.dot(WAu, Au.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
         + jnp.dot(WAv, Av.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST))
    for e in range(eb):
        H_ref[e] = G[e * 16:e * 16 + 12, e * 16:e * 16 + 12]
        v_ref[e] = G[e * 16 + 12, e * 16:e * 16 + 12]


@functools.partial(jax.jit,
                   static_argnames=("eb", "interpret"))
def build_edge_system_fused(poses, disps, intrinsics, target, weight,
                            ii, jj, valid, eb: int = 8,
                            interpret: bool = False):
    """Drop-in fused replacement for dba.build_edge_system.

    Returns (H [E,12,12], v [E,12], Eii [E,6,hw], Eij [E,6,hw],
    Cii [E,hw], bz [E,hw]) as float32, numerically matching the XLA
    version (same formulas, fp32 accumulation).
    """
    E = ii.shape[0]
    ht, wd = disps.shape[-2:]
    hw = ht * wd

    Gij = lie.rel(poses[ii], poses[jj])
    stereo = (ii == jj)
    Gij = jnp.where(stereo[:, None],
                    jnp.asarray([-0.1, 0, 0, 0, 0, 0, 1.0], Gij.dtype), Gij)
    g = jnp.concatenate(
        [Gij, stereo[:, None].astype(jnp.float32)], axis=-1)   # [E, 8]

    d_i = disps[ii].reshape(E, hw)
    tgt = jnp.swapaxes(target.reshape(E, hw, 2), 1, 2)          # [E, 2, hw]
    wgt = jnp.swapaxes(
        (weight.reshape(E, hw, 2)
         * valid[:, None, None].astype(weight.dtype)), 1, 2)

    Ep = ((E + eb - 1) // eb) * eb
    if Ep != E:
        pad = Ep - E
        d_i = jnp.pad(d_i, ((0, pad), (0, 0)), constant_values=1.0)
        tgt = jnp.pad(tgt, ((0, pad), (0, 0), (0, 0)))
        wgt = jnp.pad(wgt, ((0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
        g = g.at[E:, 6].set(1.0)        # identity quaternion

    intr = intrinsics.reshape(1, 4).astype(jnp.float32)

    grid = (Ep // eb,)
    kernel = functools.partial(_edge_system_kernel, wd, eb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((eb, hw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 2, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 2, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((eb, 12, 12), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 12), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 6, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 6, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, hw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, hw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Ep, 12, 12), jnp.float32),
            jax.ShapeDtypeStruct((Ep, 12), jnp.float32),
            jax.ShapeDtypeStruct((Ep, 6, hw), jnp.float32),
            jax.ShapeDtypeStruct((Ep, 6, hw), jnp.float32),
            jax.ShapeDtypeStruct((Ep, hw), jnp.float32),
            jax.ShapeDtypeStruct((Ep, hw), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((eb, 16, hw), jnp.float32),
            pltpu.VMEM((eb, 16, hw), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(intr, d_i.astype(jnp.float32), tgt.astype(jnp.float32),
      wgt.astype(jnp.float32), g.astype(jnp.float32))

    H, v, Eii, Eij, Cii, bz = out
    if Ep != E:
        H, v = H[:E], v[:E]
        Eii, Eij = Eii[:E], Eij[:E]
        Cii, bz = Cii[:E], bz[:E]
    return H, v, Eii, Eij, Cii, bz


# ---------------------------------------------------------------------------
# fused Schur matvec for the PCG solver
# ---------------------------------------------------------------------------
#
# y_S = Ei u + scatter_jj(Eij u[ii]),  u = Q (Ei^T x + sum_e Eij^T x[jj])
#
# The XLA expression streams Eij [E, 6, hw] twice per CG iteration plus
# scatter/gather of [*, hw] rows (~2.5 ms at backend scale). This kernel
# reads Eij exactly ONCE per matvec: edges are sorted by source frame, so
# each frame-block's rows are one contiguous DMA slab; u is accumulated,
# Q-scaled, and consumed entirely in VMEM; per-edge jj-contributions come
# back as a tiny [*, 6] array that XLA scatter-adds. One-hot MXU dots do
# the edge->frame reduction and frame->edge broadcast.


def _schur_matvec_kernel(fb: int, cap: int,
                         cstart_ref, x_ref, ei_ref, q_ref, oh_ref,
                         xj_ref, eij_hbm, h_hbm,
                         yf_ref, oc_ref,
                         slab, hslab, sem0, sem1):
    """One block of the full GN system matvec y = (A - E Q E^T) x.

    The pose-Hessian (A) part rides the same slab machinery as the Schur
    part: per sorted edge, H [12,12] acts on [x[ii]|x[jj]], the ii half
    reduced in-block via the one-hot, the jj half returned through oc for
    the single XLA scatter.

    Slabs are double-buffered across grid steps (the TPU grid runs
    sequentially and scratch persists): block b's compute overlaps the
    HBM->VMEM DMA of block b+1's slabs, which makes the matvec
    compute-bound instead of alternating DMA/compute."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)
    nslot = jax.lax.rem(b + 1, 2)

    def eij_copy(blk, s):
        st = pl.multiple_of(cstart_ref[blk], 8)
        return pltpu.make_async_copy(
            eij_hbm.at[pl.ds(st, cap)], slab.at[s], sem0.at[s])

    def h_copy(blk, s):
        st = pl.multiple_of(cstart_ref[blk], 8)
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(st, cap)], hslab.at[s], sem1.at[s])

    @pl.when(b == 0)
    def _():
        h_copy(0, 0).start()
        eij_copy(0, 0).start()

    @pl.when(b + 1 < nb)
    def _():
        h_copy(b + 1, nslot).start()
        eij_copy(b + 1, nslot).start()

    start = pl.multiple_of(cstart_ref[b], 8)
    x_blk = x_ref[pl.ds(b * fb, fb), :]                  # [FB, 6]
    xj = xj_ref[pl.ds(start, cap), :]                    # [CAP, 8]
    oh = oh_ref[0]                                       # [CAP, FB]

    # x[ii] per slab row (foreign rows get 0 via the one-hot)
    x8 = jnp.concatenate(
        [x_blk, jnp.zeros((fb, 2), jnp.float32)], axis=1)
    xi = jnp.dot(oh, x8, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)    # [CAP, 8]

    # ---- A part: [yi|yj] = H [xi|xj] per edge ---------------------------
    # H rows live flat on the lane dim ([CAP, 144]: k = 12a + b); the
    # matvec is (Hf * (xc @ T)) @ S with constant selector matrices
    # (Mosaic supports dots where it rejects [CAP,12,12] reshapes):
    #   T[b, k] = [k % 12 == b]  replicates xc along each block row,
    #   S[k, a] = [k // 12 == a] sums each 12-lane group.
    h_copy(b, slot).wait()
    Hf = hslab[slot, :, :144]                            # [CAP, 144]
    xc = jnp.concatenate([xi[:, :6], xj[:, :6]], axis=1)  # [CAP, 12]
    kk = jax.lax.broadcasted_iota(jnp.int32, (12, 144), 1)
    bb = jax.lax.broadcasted_iota(jnp.int32, (12, 144), 0)
    T = (kk % 12 == bb).astype(jnp.float32)
    kk2 = jax.lax.broadcasted_iota(jnp.int32, (144, 12), 0)
    aa = jax.lax.broadcasted_iota(jnp.int32, (144, 12), 1)
    S = (kk2 // 12 == aa).astype(jnp.float32)
    xc_rep = jnp.dot(xc, T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # [CAP, 144]
    yfull = jnp.dot(Hf * xc_rep, S,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)   # [CAP, 12]
    yj = yfull[:, 6:12]

    # ---- Schur part ------------------------------------------------------
    ei = ei_ref[:]                                       # [FB, 6, hw]
    # u_mine = Ei^T x (per owned frame)
    u = jnp.sum(ei * x_blk[:, :, None], axis=1)          # [FB, hw]
    eij_copy(b, slot).wait()
    G = slab[slot].astype(jnp.float32)                   # [CAP, 8, hw]
    # per-edge contribution Eij^T x[jj] (pad rows 6,7 are zero)
    contrib = jnp.sum(G * xj[:, :, None], axis=1)        # [CAP, hw]
    # edge -> frame reduction (invalid slab rows: all-zero one-hot)
    u = u + jnp.dot(oh.T, contrib,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    u = q_ref[:] * u                                     # [FB, hw]
    # frame part: yf = -Ei u + sum_owned yi
    yf = -jnp.sum(ei * u[:, None, :], axis=-1)           # [FB, 6]
    # edge part: oc = yj - Eij u[ii]
    ug = jnp.dot(oh, u, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)    # [CAP, hw]
    oc = -jnp.sum(G * ug[:, None, :], axis=-1)           # [CAP, 8]

    # (Mosaic can't concat lane-offset slices: accumulate yi through a
    # [FB, 12] dot and merge yj with lane-slice stores instead)
    yA = jnp.dot(oh.T, yfull, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)    # [FB, 12]
    yf_ref[:] = yf + yA[:, 0:6]
    oc_ref[0, :, 0:6] = oc[:, 0:6] + yj
    oc_ref[0, :, 6:8] = jnp.zeros((cap, 2), jnp.float32)


def schur_pack(Ei, Eij_sorted, Q, H_sorted):
    """Pack the matvec operands to DMA-tileable shapes, once per GN step:
    Eij [E, 6, hw] -> [E8, 8, hwp] (fp32 sublane/lane tiles), Ei/Q padded
    to hwp lanes, H [E, 12, 12] -> [E8, 12, 12].  All pad entries are
    zero so they contribute nothing."""
    E, _, hw = Eij_sorted.shape
    E8 = ((E + 7) // 8) * 8
    hwp = ((hw + 127) // 128) * 128
    # Eij rides HBM->VMEM once per CG iteration — it dominates the matvec
    # traffic, so it travels as bf16 (a ~0.4% relative operator
    # perturbation, far inside the GN linearization error; quality is
    # gated against the exact solver in tests/test_dba.py).  Ei/Q stay
    # fp32.
    Eij_p = jnp.pad(Eij_sorted, ((0, E8 - E), (0, 2), (0, hwp - hw))
                    ).astype(jnp.bfloat16)
    Ei_p = jnp.pad(Ei, ((0, 0), (0, 0), (0, hwp - hw)))
    Q_p = jnp.pad(Q, ((0, 0), (0, hwp - hw)))
    # flat lane-aligned layout ([E8, 256]) so the slab DMA tiles cleanly
    H_p = jnp.pad(H_sorted.reshape(E, 144), ((0, E8 - E), (0, 112)))
    return Ei_p, Eij_p, Q_p, H_p


def schur_matvec(x, Ei, Eij_packed, Q, H_packed, xj, cstart, onehot,
                 jj_pad, fb: int = 8, interpret: bool = False):
    """One full GN system matvec y = (A - E Q E^T) x (damping excluded).

    Preconditions (prepared once per dba.ba call by `schur_matvec_plan`,
    once per GN step by `schur_pack`, which also lane-pads Ei/Q): edges
    sorted by ii; Eij_packed [E8, 8, hwp]; H_packed [E8, 12, 12] holds
    the masked pose-pair Hessians in the same order; cstart [nb]
    8-aligned slab starts (start+cap <= E8); onehot [nb, cap, fb] maps
    slab rows to owned frames (zero rows mask foreign/invalid/pad edges);
    xj [E, 6] = x[jj] per matvec (tiny).
    """
    P, _, hw = Ei.shape
    E8 = Eij_packed.shape[0]
    nb, cap, fb_ = onehot.shape
    assert fb_ == fb and nb * fb == P and cap <= E8

    xj8 = jnp.pad(xj, ((0, E8 - xj.shape[0]), (0, 2)))

    yf, oc = pl.pallas_call(
        functools.partial(_schur_matvec_kernel, fb, cap),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # cstart [nb]
            pl.BlockSpec(memory_space=pltpu.VMEM),           # x [P, 6]
            pl.BlockSpec((fb, 6, hw), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),           # Ei
            pl.BlockSpec((fb, hw), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),           # Q
            pl.BlockSpec((1, cap, fb), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),           # onehot
            pl.BlockSpec(memory_space=pltpu.VMEM),           # xj [E8, 8]
            pl.BlockSpec(memory_space=pl.ANY),               # Eij (HBM)
            pl.BlockSpec(memory_space=pl.ANY),               # H (HBM)
        ],
        out_specs=[
            pl.BlockSpec((fb, 6), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, 6), jnp.float32),
            jax.ShapeDtypeStruct((nb, cap, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, cap, 8, Eij_packed.shape[-1]),
                       Eij_packed.dtype),
            pltpu.VMEM((2, cap, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the double-buffered slabs alone are ~16 MiB at backend scale
        # (cap=392, hwp=1280 -> 15.3 MiB bf16 + 0.77 MiB H), just over the
        # default 16 MiB scoped-vmem budget; raise it (v5e has 128 MiB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(cstart, x, Ei, Q, onehot, xj8, Eij_packed, H_packed)

    # scatter the per-edge contributions to their jj frames (tiny)
    y = yf + jnp.zeros((P, 6), jnp.float32).at[jj_pad.reshape(-1)].add(
        oc[..., :6].reshape(-1, 6), mode="drop")
    return y


def schur_matvec_plan(ii, jj, valid, P: int, max_deg: int, fb: int = 8):
    """Static per-call plan for schur_matvec: sort edges by source frame,
    8-aligned block-clamped slab starts, one-hot row->frame map, per-row
    jj.

    Returns (order, cstart, onehot, jj_pad). `order` must also be applied
    to the edge data (target/weight/Eij) by the caller. A frame with more
    than max_deg valid edges overflows its block's slab and the tail is
    dropped from the matvec — same capacity semantics as dba._source_table
    (callers bucket max_deg from the true degree).
    """
    E = ii.shape[0]
    E8 = ((E + 7) // 8) * 8
    nb = P // fb
    cap = fb * max_deg + 8          # +8 covers the start down-alignment
    key = jnp.where(valid, ii, P)
    order = jnp.argsort(key, stable=True)
    ii_s = key[order]                       # invalid edges sort to P
    jj_s = jj[order]
    starts = jnp.searchsorted(ii_s, jnp.arange(0, P, fb))
    starts = (starts // 8) * 8              # sublane-aligned DMA starts
    cstart = jnp.minimum(starts, jnp.maximum(E8 - cap, 0)).astype(jnp.int32)

    rows_raw = cstart[:, None] + jnp.arange(cap)[None, :]   # [nb, cap]
    in_range = rows_raw < E
    rows = jnp.minimum(rows_raw, E - 1)
    rii = jnp.where(in_range, ii_s[rows], P)                # [nb, cap]
    frames = (jnp.arange(nb) * fb)[:, None, None] \
        + jnp.arange(fb)[None, None, :]
    owned = rii[:, :, None] == frames
    onehot = owned.astype(jnp.float32)
    jj_pad = jnp.where(owned.any(-1), jj_s[rows], P + 1).astype(jnp.int32)
    return order, cstart, onehot, jj_pad
