"""Smooth (unconstrained) dynamics: CRBA mass matrix, RNE bias forces, passive and
actuation forces.

Replaces MuJoCo's mj_crb / mj_rne / mj_passive / mj_fwdActuation stages that the
reference reaches via mj_step and reads back through mj_fullM / qfrc_bias /
qfrc_passive (reference quadruped_env.py:880-916, 931-959).

All spatial algebra uses 6D vectors (ω; v) about the WORLD ORIGIN in world axes —
frame-invariant results (M, bias) match MuJoCo's CoM-based formulation exactly.
Everything is dense: nv ≤ ~18 for quadrupeds, so batched (B, nv, nv) ops map onto
the TPU's VPU/MXU; sparsity tricks that pay on CPUs would only add gather/scatter
overhead here.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics.kinematics import Kin, cdof as _cdof
from gym_quadruped_tpu.utils.maths import skew


# ---------------------------------------------------------------------------------
# static structure helpers (numpy, computed once per model)
# ---------------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _dof_ancestor_mask_cached(key):
    m: Model = _MODEL_CACHE[key]
    mask = np.zeros((m.nv, m.nv), np.float64)
    for i in range(m.nv):
        j = i
        while j >= 0:
            mask[i, j] = 1.0
            j = int(m.dof_parentid[j])
    return mask


_MODEL_CACHE: dict = {}


def dof_ancestor_mask(m: Model) -> np.ndarray:
    """mask[i, j] = 1 iff dof j is dof i or an ancestor of dof i (static sparsity
    pattern of the mass matrix's lower triangle)."""
    key = id(m)
    _MODEL_CACHE[key] = m
    return _dof_ancestor_mask_cached(key)


# ---------------------------------------------------------------------------------
# spatial algebra (ω; v) about world origin
# ---------------------------------------------------------------------------------

def spatial_inertia(m: Model, kin: Kin) -> jnp.ndarray:
    """(nbody, 6, 6) spatial inertia of each body about spatial_origin(kin)."""
    from gym_quadruped_tpu.physics.kinematics import spatial_origin

    dtype = kin.xpos.dtype
    mass = jnp.asarray(m.body_mass, dtype)
    diag_inertia = jnp.asarray(m.body_inertia, dtype)
    R = kin.ximat  # (nbody, 3, 3)
    # rotational inertia about CoM in world axes
    I_c = jnp.einsum('bij,bj,bkj->bik', R, diag_inertia, R)
    c = kin.xipos - spatial_origin(kin)[None, :]
    Sc = skew(c)
    eye = jnp.eye(3, dtype=dtype)
    A = I_c + mass[:, None, None] * (
        jnp.sum(c * c, -1)[:, None, None] * eye - jnp.einsum('bi,bj->bij', c, c))
    B = mass[:, None, None] * Sc
    C = mass[:, None, None] * jnp.broadcast_to(eye, Sc.shape)
    top = jnp.concatenate([A, B], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(B, -1, -2), C], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _cross_motion(v1, v2):
    """Motion × motion: (ω1,v1)×(ω2,v2) = (ω1×ω2, ω1×v2 + v1×ω2)."""
    w1, l1 = v1[..., :3], v1[..., 3:]
    w2, l2 = v2[..., :3], v2[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, w2), jnp.cross(w1, l2) + jnp.cross(l1, w2)], axis=-1)


def _cross_force(v, f):
    """Motion ×* force: (ω,v)×*(n,f) = (ω×n + v×f, ω×f)."""
    w, l = v[..., :3], v[..., 3:]
    n, p = f[..., :3], f[..., 3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(l, p), jnp.cross(w, p)], axis=-1)


# ---------------------------------------------------------------------------------
# CRBA: dense mass matrix
# ---------------------------------------------------------------------------------

def mass_matrix(m: Model, kin: Kin, cdof: jnp.ndarray | None = None) -> jnp.ndarray:
    """(nv, nv) joint-space inertia matrix, equals mj_fullM (armature included)."""
    dtype = kin.xpos.dtype
    if cdof is None:
        cdof = _cdof(m, kin)
    I_sp = spatial_inertia(m, kin)
    # composite subtree inertias (reverse topological accumulation, unrolled)
    Ic = [I_sp[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = int(m.body_parentid[b])
        Ic[p] = Ic[p] + Ic[b]
    Ic = jnp.stack(Ic)  # (nbody, 6, 6)

    F = jnp.einsum('vij,vj->vi', Ic[m.dof_bodyid], cdof)  # (nv, 6)
    raw = F @ cdof.T  # (nv, nv); only ancestor entries are meaningful
    mask = jnp.asarray(dof_ancestor_mask(m), dtype)
    lower = raw * mask  # rows i, cols j<=i on the kinematic chain
    M = lower + lower.T - jnp.diag(jnp.diag(lower))
    return M + jnp.diag(jnp.asarray(m.dof_armature, dtype))


# ---------------------------------------------------------------------------------
# velocities + RNE bias
# ---------------------------------------------------------------------------------

def body_velocities(m: Model, kin: Kin, qvel: jnp.ndarray,
                    cdof: jnp.ndarray | None = None) -> jnp.ndarray:
    """(nbody, 6) spatial velocity (ω; v_origin) of each body, world-origin coords."""
    dtype = qvel.dtype
    if cdof is None:
        cdof = _cdof(m, kin)
    vel = [jnp.zeros(6, dtype)]
    for b in range(1, m.nbody):
        p = int(m.body_parentid[b])
        v = vel[p]
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        if num:
            v = v + qvel[adr:adr + num] @ cdof[adr:adr + num]
        vel.append(v)
    return jnp.stack(vel)


def rne_bias(m: Model, kin: Kin, qvel: jnp.ndarray,
             cdof: jnp.ndarray | None = None) -> jnp.ndarray:
    """qfrc_bias: Coriolis + centrifugal + gravity generalized forces (mj_rne)."""
    dtype = qvel.dtype
    if cdof is None:
        cdof = _cdof(m, kin)
    I_sp = spatial_inertia(m, kin)
    gravity = jnp.asarray(m.gravity, dtype)

    # forward: velocities and (qacc = 0) accelerations; gravity enters as a base
    # acceleration of -g (d'Alembert trick)
    # Velocity-product acceleration term Σ Ṡ_i q̇_i: the motion subspace of
    # free-joint *translation* dofs is fixed in the world (Ṡ = 0) while rotation
    # dofs (and ball/hinge/slide subspaces) move with a body, so Ṡ = v × S. The
    # two must not be lumped: v × vJ_trans is spurious.
    from gym_quadruped_tpu.models.model import BALL, FREE

    a0 = jnp.concatenate([jnp.zeros(3, dtype), -gravity])
    vel = [jnp.zeros(6, dtype)]
    acc = [a0]
    for b in range(1, m.nbody):
        p = int(m.body_parentid[b])
        v, a = vel[p], acc[p]
        for j in range(int(m.body_jntadr[b]), int(m.body_jntadr[b]) + int(m.body_jntnum[b])):
            jtype = int(m.jnt_type[j])
            adr = int(m.jnt_dofadr[j])
            if jtype == FREE:
                vj_trans = qvel[adr:adr + 3] @ cdof[adr:adr + 3]
                vj_rot = qvel[adr + 3:adr + 6] @ cdof[adr + 3:adr + 6]
                v = v + vj_trans + vj_rot
                a = a + _cross_motion(v, vj_rot)  # rotation axes fixed in child
            else:
                ndof = 3 if jtype == BALL else 1
                vj = qvel[adr:adr + ndof] @ cdof[adr:adr + ndof]
                v = v + vj
                a = a + _cross_motion(v, vj)  # v × vJ (self-cross vanishes)
        vel.append(v)
        acc.append(a)

    # body forces
    f = []
    for b in range(m.nbody):
        Iv = I_sp[b] @ vel[b]
        f.append(I_sp[b] @ acc[b] + _cross_force(vel[b], Iv))

    # backward accumulation, then project onto dofs
    for b in range(m.nbody - 1, 0, -1):
        p = int(m.body_parentid[b])
        f[p] = f[p] + f[b]
    f = jnp.stack(f)
    return jnp.einsum('vj,vj->v', cdof, f[m.dof_bodyid])


def body_accelerations(m: Model, kin: Kin, qvel: jnp.ndarray, qacc: jnp.ndarray,
                       cdof: jnp.ndarray | None = None,
                       gravity_offset: bool = True) -> jnp.ndarray:
    """(nbody, 6) spatial acceleration (α; a_origin) of each body, world-origin
    coords (mj_rnePostConstraint's cacc). With gravity_offset the chain starts from
    −g, matching MuJoCo's accelerometer convention (reads +9.81 z at rest)."""
    from gym_quadruped_tpu.models.model import BALL, FREE

    dtype = qvel.dtype
    if cdof is None:
        cdof = _cdof(m, kin)
    gravity = jnp.asarray(m.gravity, dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype),
                          -gravity if gravity_offset else jnp.zeros(3, dtype)])
    vel = [jnp.zeros(6, dtype)]
    acc = [a0]
    for b in range(1, m.nbody):
        p = int(m.body_parentid[b])
        v, a = vel[p], acc[p]
        for j in range(int(m.body_jntadr[b]),
                       int(m.body_jntadr[b]) + int(m.body_jntnum[b])):
            jtype = int(m.jnt_type[j])
            adr = int(m.jnt_dofadr[j])
            if jtype == FREE:
                vj_trans = qvel[adr:adr + 3] @ cdof[adr:adr + 3]
                vj_rot = qvel[adr + 3:adr + 6] @ cdof[adr + 3:adr + 6]
                v = v + vj_trans + vj_rot
                a = (a + qacc[adr:adr + 6] @ cdof[adr:adr + 6]
                     + _cross_motion(v, vj_rot))
            else:
                ndof = 3 if jtype == BALL else 1
                vj = qvel[adr:adr + ndof] @ cdof[adr:adr + ndof]
                v = v + vj
                a = a + qacc[adr:adr + ndof] @ cdof[adr:adr + ndof] + \
                    _cross_motion(v, vj)
        vel.append(v)
        acc.append(a)
    return jnp.stack(acc)


# ---------------------------------------------------------------------------------
# passive + actuation
# ---------------------------------------------------------------------------------

def passive_force(m: Model, qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """qfrc_passive: joint damping + hinge/slide springs (mj_passive).

    NOTE: dof frictionloss is NOT a passive force in MuJoCo — it is a constraint
    handled by the solver (see physics/constraints.py), reproduced the same way here.
    """
    dtype = qvel.dtype
    qfrc = -jnp.asarray(m.dof_damping, dtype) * qvel
    # springs act per joint; only scalar joints supported (quadrupeds: hinge-only)
    stiffness = np.asarray(m.jnt_stiffness)
    if np.any(stiffness != 0):
        spring = jnp.zeros_like(qfrc)
        qpos_spring = jnp.asarray(m.qpos_spring, dtype)
        for j in range(m.njnt):
            if stiffness[j] == 0 or int(m.jnt_type[j]) not in (2, 3):
                continue
            qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
            spring = spring.at[dadr].set(
                -stiffness[j] * (qpos[qadr] - qpos_spring[qadr]))
        qfrc = qfrc + spring
    return qfrc


def actuator_force(m: Model, ctrl: jnp.ndarray) -> jnp.ndarray:
    """qfrc_actuator for direct-drive torque motors (mj_fwdActuation).

    The shipped robots use <motor> actuators on joints with scalar gear
    (e.g. go2.xml:228-241); ctrl is clamped to ctrlrange when ctrllimited.
    """
    dtype = ctrl.dtype
    lo = jnp.asarray(m.actuator_ctrlrange[:, 0], dtype)
    hi = jnp.asarray(m.actuator_ctrlrange[:, 1], dtype)
    limited = jnp.asarray(m.actuator_ctrllimited, bool)
    c = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)
    force = c * jnp.asarray(m.actuator_gear, dtype)
    flo = jnp.asarray(m.actuator_forcerange[:, 0], dtype)
    fhi = jnp.asarray(m.actuator_forcerange[:, 1], dtype)
    flim = jnp.asarray(m.actuator_forcelimited, bool)
    force = jnp.where(flim, jnp.clip(force, flo, fhi), force)

    # scatter to dofs: actuator a acts on joint trnid[a]'s dof
    qfrc = jnp.zeros(m.nv, dtype)
    dof_of_act = m.jnt_dofadr[m.actuator_trnid]  # static numpy indexing
    return qfrc.at[dof_of_act].add(force)
