"""Forward kinematics over the kinematic tree.

Replaces MuJoCo's mj_kinematics / mj_comPos stage (the reference reaches it through
mj_step / mj_forward — SURVEY.md L0). Single-environment functions over (Model, qpos);
batching is `jax.vmap` over the leading axis, so the per-body Python loop (≤ ~20
bodies, unrolled at trace time) compiles to a short chain of fused vector ops whose
parallelism comes from the env batch.

MuJoCo semantics notes:
  * hinge/slide joints subtract the reference pose `qpos0` (the XML `ref` attribute,
    possibly mutated post-compile as the reference env does for mini_cheetah,
    quadruped_env.py:171-173).
  * free-joint orientation is used as-is (normalized defensively).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import BALL, FREE, HINGE, SLIDE, Model
from gym_quadruped_tpu.utils.maths import (
    quat_from_axis_angle,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Kin:
    """World-frame pose quantities (one env; batch via vmap)."""

    xpos: Any      # (nbody, 3) body frame origin
    xquat: Any     # (nbody, 4) body frame orientation
    xipos: Any     # (nbody, 3) body CoM position
    ximat: Any     # (nbody, 3, 3) inertial frame orientation
    xanchor: Any   # (njnt, 3) joint anchor
    xaxis: Any     # (njnt, 3) joint axis
    geom_xpos: Any  # (ngeom, 3)
    geom_xmat: Any  # (ngeom, 3, 3)
    site_xpos: Any  # (nsite, 3)
    site_xmat: Any  # (nsite, 3, 3)
    subtree_com: Any  # (nbody, 3) CoM of each body's subtree


def fk(m: Model, qpos: jnp.ndarray) -> Kin:
    """mj_kinematics equivalent: body/geom/site world poses from qpos."""
    dtype = qpos.dtype
    body_pos = jnp.asarray(m.body_pos, dtype)
    body_quat = jnp.asarray(m.body_quat, dtype)
    jnt_pos = jnp.asarray(m.jnt_pos, dtype)
    jnt_axis = jnp.asarray(m.jnt_axis, dtype)
    qpos0 = jnp.asarray(m.qpos0, dtype)

    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0.0, 0.0, 0.0], dtype)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for b in range(1, m.nbody):
        p = int(m.body_parentid[b])
        pos = xpos[p] + quat_rotate(xquat[p], body_pos[b])
        quat = quat_mul(xquat[p], body_quat[b])

        for j in range(int(m.body_jntadr[b]), int(m.body_jntadr[b]) + int(m.body_jntnum[b])):
            jtype = int(m.jnt_type[j])
            qadr = int(m.jnt_qposadr[j])
            if jtype == FREE:
                pos = qpos[qadr:qadr + 3]
                quat = quat_normalize(qpos[qadr + 3:qadr + 7])
                xanchor[j] = pos
                xaxis[j] = jnt_axis[j]  # free joint axis is not rotated (mjData.xaxis)
            elif jtype == BALL:
                anchor = pos + quat_rotate(quat, jnt_pos[j])
                qloc = quat_normalize(qpos[qadr:qadr + 4])
                quat = quat_mul(quat, qloc)
                pos = anchor - quat_rotate(quat, jnt_pos[j])
                xanchor[j] = anchor
                xaxis[j] = quat_rotate(quat, jnt_axis[j])
            elif jtype == SLIDE:
                pos = pos + quat_rotate(quat, jnt_axis[j]) * (qpos[qadr] - qpos0[qadr])
                xanchor[j] = pos + quat_rotate(quat, jnt_pos[j])
                xaxis[j] = quat_rotate(quat, jnt_axis[j])
            else:  # HINGE
                anchor = pos + quat_rotate(quat, jnt_pos[j])
                qloc = quat_from_axis_angle(jnt_axis[j], qpos[qadr] - qpos0[qadr])
                quat = quat_mul(quat, qloc)
                pos = anchor - quat_rotate(quat, jnt_pos[j])
                xanchor[j] = anchor
                xaxis[j] = quat_rotate(quat, jnt_axis[j])

        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = quat_to_mat(xquat)

    # inertial frames
    xipos = xpos + quat_rotate(xquat, jnp.asarray(m.body_ipos, dtype))
    ximat = quat_to_mat(quat_mul(xquat, jnp.asarray(m.body_iquat, dtype)))

    # geoms / sites
    gb = m.geom_bodyid
    geom_xpos = xpos[gb] + quat_rotate(xquat[gb], jnp.asarray(m.geom_pos, dtype))
    geom_xmat = quat_to_mat(quat_mul(xquat[gb], jnp.asarray(m.geom_quat, dtype)))
    sb = m.site_bodyid
    if m.nsite > 0:
        site_xpos = xpos[sb] + quat_rotate(xquat[sb], jnp.asarray(m.site_pos, dtype))
        site_xmat = quat_to_mat(quat_mul(xquat[sb], jnp.asarray(m.site_quat, dtype)))
    else:
        site_xpos = jnp.zeros((0, 3), dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype)

    # subtree CoM (mj_comPos): accumulate child → parent in reverse topological order
    mass = jnp.asarray(m.body_mass, dtype)
    sub_mass = [mass[b] for b in range(m.nbody)]
    sub_mom = [mass[b] * xipos[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = int(m.body_parentid[b])
        sub_mass[p] = sub_mass[p] + sub_mass[b]
        sub_mom[p] = sub_mom[p] + sub_mom[b]
    subtree_com = jnp.stack(
        [sub_mom[b] / jnp.maximum(sub_mass[b], jnp.asarray(1e-12, dtype))
         for b in range(m.nbody)])

    return Kin(xpos=xpos, xquat=xquat, xipos=xipos, ximat=ximat,
               xanchor=jnp.stack(xanchor) if m.njnt else jnp.zeros((0, 3), dtype),
               xaxis=jnp.stack(xaxis) if m.njnt else jnp.zeros((0, 3), dtype),
               geom_xpos=geom_xpos, geom_xmat=geom_xmat,
               site_xpos=site_xpos, site_xmat=site_xmat,
               subtree_com=subtree_com)


def spatial_origin(kin: Kin) -> jnp.ndarray:
    """Reference point for all (ω; v) spatial vectors: the whole-robot CoM.

    Using a fixed world origin is frame-invariant in exact arithmetic but melts
    down in f32 when the robot is far from the origin (mass-matrix entries grow
    like |p|² and the local inertia lives in their cancellations) — MuJoCo centers
    its c-frame at the subtree CoM for exactly this reason. World bodies are
    massless, so subtree_com[0] is the robot CoM."""
    return kin.subtree_com[0]


def cdof(m: Model, kin: Kin, dtype=None) -> jnp.ndarray:
    """Per-dof 6D motion subspace vectors (ω; v) about spatial_origin(kin).

    Free-joint angular dofs are the body-frame axes (MuJoCo stores free-joint
    angular velocity in the child frame — quadruped_env.py:523-531 relies on it).
    """
    dtype = dtype or kin.xpos.dtype
    c = spatial_origin(kin)
    rows = []
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        b = int(m.jnt_bodyid[j])
        if jtype == FREE:
            zero = jnp.zeros(3, dtype)
            for k in range(3):
                e = jnp.zeros(3, dtype).at[k].set(1.0)
                rows.append(jnp.concatenate([zero, e]))
            R = quat_to_mat(kin.xquat[b])
            p = kin.xpos[b] - c
            for k in range(3):
                axis = R[:, k]
                rows.append(jnp.concatenate([axis, jnp.cross(p, axis)]))
        elif jtype == BALL:
            R = quat_to_mat(kin.xquat[b])
            p = kin.xanchor[j] - c
            for k in range(3):
                axis = R[:, k]
                rows.append(jnp.concatenate([axis, jnp.cross(p, axis)]))
        elif jtype == SLIDE:
            rows.append(jnp.concatenate([jnp.zeros(3, dtype), kin.xaxis[j]]))
        else:  # HINGE
            axis = kin.xaxis[j]
            rows.append(jnp.concatenate(
                [axis, jnp.cross(kin.xanchor[j] - c, axis)]))
    return jnp.stack(rows)  # (nv, 6)


def point_jacobian(m: Model, kin: Kin, cdof_: jnp.ndarray, point: jnp.ndarray,
                   body_id: int) -> jnp.ndarray:
    """Translational Jacobian (3, nv) of a world point attached to body_id.

    mj_jac equivalent (reference quadruped_env.py:727-735): column i is the linear
    velocity at `point` induced by unit dof-i velocity, zero for dofs outside the
    ancestor chain.
    """
    # velocity at point from the 6D screw about c: v(p) = v_c + ω × (p − c)
    c = spatial_origin(kin)
    omega = cdof_[:, :3]
    v0 = cdof_[:, 3:]
    vp = v0 + jnp.cross(omega, (point - c)[None, :])
    mask = jnp.asarray(ancestor_dof_mask(m, body_id), vp.dtype)
    return (vp * mask[:, None]).T


def cdof_dot(m: Model, kin: Kin, qvel: jnp.ndarray,
             cdof_: jnp.ndarray) -> jnp.ndarray:
    """(nv, 6) time derivative of the motion subspace vectors (mjData.cdof_dot).

    Ṡ = v_child ×ₘ S for axes fixed in the moving child body; free-joint
    TRANSLATION axes are fixed in the world, so their derivative is zero
    (same split as the RNE velocity-product term, dynamics.rne_bias).
    """
    from gym_quadruped_tpu.physics import dynamics

    dtype = qvel.dtype
    vel = dynamics.body_velocities(m, kin, qvel, cdof_)  # (nbody, 6)
    w = vel[m.dof_bodyid, :3]
    v = vel[m.dof_bodyid, 3:]
    sw = cdof_[:, :3]
    sv = cdof_[:, 3:]
    dot = jnp.concatenate(
        [jnp.cross(w, sw), jnp.cross(w, sv) + jnp.cross(v, sw)], axis=1)
    # zero the free-joint translation dofs (world-fixed axes)
    import numpy as np

    mask = np.ones((m.nv, 1))
    for j in range(m.njnt):
        if int(m.jnt_type[j]) == FREE:
            adr = int(m.jnt_dofadr[j])
            mask[adr:adr + 3] = 0.0
    return dot * jnp.asarray(mask, dtype)


def point_jacobian_dot(m: Model, kin: Kin, cdof_: jnp.ndarray,
                       qvel: jnp.ndarray, point: jnp.ndarray,
                       body_id: int) -> jnp.ndarray:
    """(3, nv) time derivative of the translational point Jacobian (mj_jacDot,
    reference feet_jacobians_dot — quadruped_env.py:742-798).

    d/dt[v0ᵢ + ωᵢ×(p−c)] = v̇0ᵢ + ω̇ᵢ×(p−c) + ωᵢ×v(p), with (ω̇ᵢ; v̇0ᵢ) from
    cdof_dot and v(p) the material point velocity; c (the spatial origin) is
    treated as instantaneously fixed, matching MuJoCo's c-frame convention.
    """
    from gym_quadruped_tpu.physics import dynamics

    c = spatial_origin(kin)
    rel = point - c
    dot = cdof_dot(m, kin, qvel, cdof_)
    vel_b = dynamics.body_velocities(m, kin, qvel, cdof_)[body_id]
    v_p = vel_b[3:] + jnp.cross(vel_b[:3], rel)

    omega = cdof_[:, :3]
    jdot = (dot[:, 3:] + jnp.cross(dot[:, :3], rel[None, :])
            + jnp.cross(omega, v_p[None, :]))
    mask = jnp.asarray(ancestor_dof_mask(m, body_id), jdot.dtype)
    return (jdot * mask[:, None]).T


def ancestor_dof_mask(m: Model, body_id: int):
    """Static (numpy) 0/1 mask of dofs on the kinematic chain from world to body."""
    import numpy as np

    mask = np.zeros(m.nv, np.float64)
    b = body_id
    while b > 0:
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        mask[adr:adr + num] = 1.0
        b = int(m.body_parentid[b])
    return mask
