"""SE(3) group operations on quaternion-parameterized poses.

A pose is a 7-vector ``[tx, ty, tz, qx, qy, qz, qw]`` storing a rigid
transform ``X -> R(q) X + t`` (the same world-to-camera convention the
reference keeps in its keyframe buffer; see /root/reference/src/depth_video.py:43
and the device helpers in /root/reference/src/lib/droid_kernels.cu:58-175,
which these functions reproduce in pure JAX so they vmap/jit/grad freely).

All functions broadcast over arbitrary leading batch dimensions and are
differentiable.  Homogeneous points are ``[x, y, z, h]`` where ``h`` is the
inverse-depth weight: ``act(G, X)[:3] = R X[:3] + h t`` (droid_kernels.cu:70-77).

Tangent vectors are 6-vectors ``[tau (trans), phi (rot)]``; ``retr`` applies a
*left* increment ``G' = exp(xi) . G`` (droid_kernels.cu:877-895).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_TAYLOR = 1e-8  # theta^2 threshold below which Taylor expansions kick in


def identity(shape=()) -> jnp.ndarray:
    """Identity pose(s) with the given leading batch shape."""
    p = jnp.zeros(shape + (7,), dtype=jnp.float32)
    return p.at[..., 6].set(1.0)


# ---------------------------------------------------------------------------
# quaternion primitives ([qx, qy, qz, qw] layout)
# ---------------------------------------------------------------------------

def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a (x) b."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (== inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector(s) v by unit quaternion(s) q (actSO3,
    droid_kernels.cu:58-68)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion [qx,qy,qz,qw].

    Branch-free Shepperd-style construction usable under jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions; pick the numerically best via where
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12)) / 2
    q0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0), qw0], axis=-1)

    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12)) / 2
    q1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1),
                    (m21 - m12) / (4 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12)) / 2
    q2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2),
                    (m02 - m20) / (4 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12)) / 2
    q3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3,
                    (m10 - m01) / (4 * qz3)], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# SE(3) pose operations
# ---------------------------------------------------------------------------

def act3(pose: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to regular 3D point(s): R x + t."""
    return quat_rotate(pose[..., 3:7], x) + pose[..., 0:3]


def act(pose: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to homogeneous point(s) [x,y,z,h]: [R x + h t, h]
    (actSE3, droid_kernels.cu:70-77)."""
    xyz = quat_rotate(pose[..., 3:7], X[..., :3]) + X[..., 3:4] * pose[..., 0:3]
    return jnp.concatenate([xyz, X[..., 3:4]], axis=-1)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Group composition G = Ga . Gb  (first apply b, then a)."""
    q = quat_mul(a[..., 3:7], b[..., 3:7])
    t = a[..., 0:3] + quat_rotate(a[..., 3:7], b[..., 0:3])
    return jnp.concatenate([t, q], axis=-1)


def inv(pose: jnp.ndarray) -> jnp.ndarray:
    qinv = quat_inv(pose[..., 3:7])
    t = -quat_rotate(qinv, pose[..., 0:3])
    return jnp.concatenate([t, qinv], axis=-1)


def rel(pose_i: jnp.ndarray, pose_j: jnp.ndarray) -> jnp.ndarray:
    """Relative transform G_ij = G_j . G_i^-1 mapping frame-i coordinates to
    frame-j coordinates (relSE3, droid_kernels.cu:96-107)."""
    qij = quat_mul(pose_j[..., 3:7], quat_inv(pose_i[..., 3:7]))
    tij = pose_j[..., 0:3] - quat_rotate(qij, pose_i[..., 0:3])
    return jnp.concatenate([tij, qij], axis=-1)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map: 6-vector [tau, phi] -> pose
    (expSE3, droid_kernels.cu:147-175; full V(phi) tau, no truncation)."""
    tau = xi[..., 0:3]
    phi = xi[..., 3:6]
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)

    # grad-safety: sqrt'(0) = inf leaks NaN through the untaken where
    # branch, so the exact branch must never see theta_sq == 0
    small = theta_sq < _EPS_TAYLOR
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)

    # quaternion from phi (expSO3)
    theta_p4 = theta_sq * theta_sq
    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_p4 / 3840.0,
        jnp.sin(0.5 * theta) / theta,
    )
    real = jnp.where(
        small,
        1.0 - theta_sq / 8.0 + theta_p4 / 384.0,
        jnp.cos(0.5 * theta),
    )
    q = jnp.concatenate([imag * phi, real], axis=-1)

    # t = V(phi) tau with V = I + a [phi]_x + b [phi]_x^2
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / safe_sq)
    b = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (theta * safe_sq),
    )
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = tau + a * c1 + b * c2
    return jnp.concatenate([t, q], axis=-1)


def log(pose: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm: pose -> 6-vector [tau, phi]; inverse of exp."""
    q = pose[..., 3:7]
    t = pose[..., 0:3]
    # enforce qw >= 0 so the rotation angle is in [0, pi]
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    qv = q[..., :3]
    qw = jnp.clip(q[..., 3:4], -1.0, 1.0)
    nv_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = nv_sq < 1e-12
    nv = jnp.sqrt(jnp.where(small, 1.0, nv_sq))     # grad-safe sqrt
    theta = 2.0 * jnp.arctan2(jnp.where(small, 0.0, nv), qw)
    scale = jnp.where(small, 2.0 + theta * theta / 12.0, theta / nv)
    phi = scale * qv

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small2 = theta_sq < _EPS_TAYLOR
    safe_sq = jnp.where(small2, 1.0, theta_sq)
    th = jnp.sqrt(safe_sq)
    # V^{-1} = I - 1/2 [phi]_x + cc [phi]_x^2
    half_th = 0.5 * th
    cot_term = jnp.where(
        small2,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half_th * jnp.cos(half_th)
         / jnp.where(small2, 1.0, jnp.sin(half_th))) / safe_sq,
    )
    c1 = jnp.cross(phi, t)
    c2 = jnp.cross(phi, c1)
    tau = t - 0.5 * c1 + cot_term * c2
    return jnp.concatenate([tau, phi], axis=-1)


def retr(pose: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Retraction G' = exp(xi) . G (left increment, retrSE3
    droid_kernels.cu:877-895)."""
    return compose(exp(xi), pose)


def adjT(pose: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Dual adjoint transport of a 6-covector (gradient row), i.e.
    Y = Adj(G)^T X, matching adjSE3 in droid_kernels.cu:79-94 (whose
    cross-product operand order gives X[:3] x t) and lietorch ``SE3.adjT``:

      Y[:3] = R^T X[:3]
      Y[3:] = R^T X[3:] - R^T (t x X[:3])
    """
    qinv = quat_inv(pose[..., 3:7])
    a = quat_rotate(qinv, X[..., 0:3])
    b = quat_rotate(qinv, X[..., 3:6])
    c = quat_rotate(qinv, jnp.cross(X[..., 0:3], pose[..., 0:3]))
    return jnp.concatenate([a, b + c], axis=-1)


def matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """Pose 7-vector -> 4x4 homogeneous matrix."""
    R = quat_to_matrix(pose[..., 3:7])
    t = pose[..., 0:3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous matrix -> pose 7-vector."""
    q = matrix_to_quat(m[..., :3, :3])
    t = m[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def normalize(pose: jnp.ndarray) -> jnp.ndarray:
    """Renormalize the quaternion part (fights drift after many retractions)."""
    q = pose[..., 3:7]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([pose[..., 0:3], q], axis=-1)


def interp(pose_a: jnp.ndarray, pose_b: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Geodesic interpolation exp(w * log(Gb . Ga^-1)) . Ga
    (the reference's trajectory filler uses this form,
    trajectory_filler.py:46-56)."""
    dP = compose(pose_b, inv(pose_a))
    w = jnp.asarray(w)[..., None]
    return compose(exp(w * log(dP)), pose_a)
