"""Quaternion / SO(3) / SE(3) math core.

TPU-native replacement for the reference's scipy.spatial.transform.Rotation usage
(reference: gym_quadruped/utils/math_utils.py and quadruped_env.py:961-997).

Conventions (MuJoCo-compatible):
  * quaternions are (w, x, y, z), unit norm
  * rotation matrices are world_R_body (column vectors = body axes in world)
  * all functions are dtype-polymorphic, shape-polymorphic over leading batch dims,
    jit/vmap/grad-safe (no data-dependent control flow)
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*p, both (..., 4) wxyz."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4): R(q) @ v."""
    w = q[..., :1]
    u = q[..., 1:]
    # v' = v + 2 w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """R(q)^T @ v."""
    return quat_rotate(quat_conj(q), v)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, jnp.asarray(eps, q.dtype))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis (..., 3), angle (...,) -> quaternion (..., 4)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz. Branch-free Shepperd's method via jnp.where."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate solutions; pick the numerically best one per element.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, jnp.asarray(1e-30, m.dtype)))

    q_w = jnp.stack(
        [1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    q_x = jnp.stack(
        [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1
    )
    q_y = jnp.stack(
        [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1
    )
    q_z = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1
    )
    # Decide which diagonal term dominates.
    cand = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                      1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(cand, axis=-1)
    sel = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4q, 4comp)
    q = jnp.take_along_axis(sel, idx[..., None, None], axis=-2)[..., 0, :]
    # reorder: candidate k has the dominant component at position k with value cand[k]
    q = q * (0.5 / _safe_sqrt(jnp.take_along_axis(cand, idx[..., None], axis=-1)))
    # canonical sign: w >= 0 to match a stable convention
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """MuJoCo mju_quatIntegrate: rotate q by local angular velocity omega for dt.

    MuJoCo free joints store angular velocity in the *body* (child) frame; position
    integration is q' = q * exp(0.5 * omega_body * dt)  (mj_integratePos semantics).
    """
    angle = jnp.linalg.norm(omega, axis=-1) * dt
    # safe axis
    n = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    axis = omega / jnp.maximum(n, jnp.asarray(1e-12, q.dtype))
    dq = quat_from_axis_angle(axis, angle)
    return quat_normalize(quat_mul(q, dq))


def quat_to_euler_xyz(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> extrinsic XYZ Euler angles (roll, pitch, yaw).

    Matches scipy Rotation.as_euler('xyz') used by the reference
    (quadruped_env.py:982-987): R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_xyz_to_quat(e: jnp.ndarray) -> jnp.ndarray:
    """Extrinsic XYZ (roll, pitch, yaw) -> quaternion wxyz; R = Rz @ Ry @ Rx."""
    half = 0.5 * e
    cr, cp, cy = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sr, sp, sy = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix (reference math_utils.py:7)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def angle_between_vectors(v1, v2) -> jnp.ndarray:
    """Heading angle helper matching reference math_utils.py:37-51.

    NOTE: the reference computes atan2 over the *difference* vector v2 - v1,
    i.e. the heading of the segment from v1 to v2 projected on the xy plane.
    """
    d = jnp.asarray(v2) - jnp.asarray(v1)
    return jnp.arctan2(d[..., 1], d[..., 0])


def homogenous_transform(p: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply a (..., 4, 4) homogeneous transform to points (..., 3)."""
    return jnp.einsum('...ij,...j->...i', X[..., :3, :3], p) + X[..., :3, 3]


def process_range(values):
    """Normalize a scalar or (min, max) pair to a (min, max) tuple (reference
    math_utils.py:54 _process_range). Host-side helper for constructor args."""
    import numbers

    if isinstance(values, numbers.Number):
        return (values, values)
    values = tuple(values)
    if len(values) != 2:
        raise ValueError(f'Invalid range, expected (min, max), got: {values}')
    return values
