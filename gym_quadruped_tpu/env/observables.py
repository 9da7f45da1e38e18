"""The observation pipeline: all 31 reference observables as one fused computation.

Reproduces QuadrupedEnv._get_obs (quadruped_env.py:1146-1226) and the kinematic
accessors it fans out to (:488-1007). The reference recomputes Jacobians / mass
matrices / contact scans per observable through separate mj_* calls; here every
observable is an expression over ONE Forward result, so XLA fuses the whole obs dict
into the step program and dead-code-eliminates observables that are not requested.

Frame-semantics notes (preserved exactly; see SURVEY.md §8.5):
  * qvel[0:3] is the base linear velocity in the WORLD frame; qvel[3:6] is the base
    angular velocity in the BODY frame (MuJoCo free-joint convention).
  * After mj_step, mjData's kinematic registers (geom_xpos, Jacobians, contact set,
    qacc, qM) correspond to the PRE-integration state while qpos/qvel are post-step.
    The reference reads both (quadruped_env.py:251-288) — so do we: `fwd` is the
    forward dynamics evaluated at the pre-step state, qpos/qvel are post-step.
  * feet_vel_rel subtracts raw qvel[3:6] as if it were a world angular velocity
    (quadruped_env.py:661) — reproduced verbatim: it is observation semantics.
  * kinetic_energy / work implement the reference's *intended* semantics (its code
    raises NameError — quadruped_env.py:939-954, SURVEY.md §8.1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics.constraints import _point_jacobians, constraint_layout
from gym_quadruped_tpu.physics.engine import Forward
from gym_quadruped_tpu.physics.forces import feet_contact_forces, feet_contact_state
from gym_quadruped_tpu.utils.maths import quat_to_euler_xyz, quat_to_mat

BASE_OBS = [
    'base_pos', 'base_lin_vel', 'base_lin_vel_err', 'base_lin_acc',
    'base_ang_vel', 'base_ang_vel_err', 'base_ori_euler_xyz',
    'base_ori_quat_wxyz', 'base_ori_SO3', 'gravity_vector:base',
]
BASE_OBS_BASE_FRAME = [
    'base_lin_vel:base', 'base_lin_vel_err:base', 'base_lin_acc:base',
    'base_ang_vel:base', 'base_ang_vel_err:base',
]
GEN_COORDS_OBS = ['qpos', 'qvel', 'tau_ctrl_setpoint', 'qpos_js', 'qvel_js',
                  'kinetic_energy', 'work']
FEET_OBS = [
    'feet_pos', 'feet_pos:base', 'feet_vel', 'feet_vel_rel', 'feet_vel:base',
    'feet_vel_rel:base', 'contact_state', 'contact_forces', 'contact_forces:base',
]
ALL_OBS = BASE_OBS + BASE_OBS_BASE_FRAME + GEN_COORDS_OBS + FEET_OBS


def obs_dim(m: Model, name: str) -> int:
    """Observation dims (reference configure_observation_space,
    quadruped_utils.py:235-325)."""
    base = name.split(':')[0]
    if name == 'qpos':
        return m.nq
    if name == 'qvel':
        return m.nv
    if name == 'tau_ctrl_setpoint':
        return m.nu
    if name == 'qpos_js':
        return m.nq - 7
    if name == 'qvel_js':
        return m.nv - 6
    if base in ('base_pos', 'base_lin_vel', 'base_lin_vel_err', 'base_lin_acc',
                'base_ang_vel', 'base_ang_vel_err', 'base_ori_euler_xyz',
                'gravity_vector'):
        return 3
    if base == 'base_ori_quat_wxyz':
        return 4
    if base == 'base_ori_SO3':
        return 9
    if base.startswith('feet_pos') or base.startswith('feet_vel'):
        return 12
    if base == 'contact_state':
        return 4
    if base.startswith('contact_forces'):
        return 12
    if base.startswith('imu'):
        return 3
    if base in ('work', 'kinetic_energy'):
        return 1
    raise ValueError(f'Invalid observation name: {name}, available: {ALL_OBS}')


def obs_limits(m: Model, name: str) -> tuple[np.ndarray, np.ndarray]:
    """(low, high) bounds per observable (reference configure_observation_space,
    quadruped_utils.py:235-325): joint ranges bound qpos/qpos_js, ctrlrange
    bounds tau_ctrl_setpoint, contact_state is [0, 1], everything else ±inf.

    The reference indexes jnt_range[1:] — i.e. it assumes joint 0 is the free
    joint and every other joint contributes one qpos; that holds for every
    shipped robot and is reproduced here."""
    dim = obs_dim(m, name)
    lo = np.full(dim, -np.inf)
    hi = np.full(dim, np.inf)
    jr = np.asarray(m.jnt_range)
    if name == 'qpos':
        lo[7:] = jr[1:, 0]
        hi[7:] = jr[1:, 1]
    elif name == 'qpos_js':
        lo[:] = jr[1:, 0]
        hi[:] = jr[1:, 1]
    elif name == 'tau_ctrl_setpoint':
        cr = np.asarray(m.actuator_ctrlrange)
        lo[:] = cr[:, 0]
        hi[:] = cr[:, 1]
    elif name.split(':')[0] == 'contact_state':
        lo[:] = 0.0
        hi[:] = 1.0
    return lo, hi


def heading_R(qpos) -> jnp.ndarray:
    """Yaw-only SO(3) (reference heading_orientation_SO3, quadruped_env.py:989)."""
    yaw = quat_to_euler_xyz(qpos[3:7])[2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    return jnp.stack([jnp.stack([c, -s, z]), jnp.stack([s, c, z]),
                      jnp.stack([z, z, o])])


def target_base_vel(qpos, ref_lin_vel_H, ref_yaw_dot):
    """World-frame velocity command (reference target_base_vel,
    quadruped_env.py:488-499)."""
    Rh = heading_R(qpos)
    ref_lin = Rh @ ref_lin_vel_H
    ref_ang = jnp.stack([jnp.zeros_like(ref_yaw_dot), jnp.zeros_like(ref_yaw_dot),
                         ref_yaw_dot])
    return ref_lin, ref_ang


def compute_obs(m: Model, names, qpos, qvel, ctrl, fwd: Forward,
                ref_lin_vel_H, ref_yaw_dot) -> dict:
    """Obs dict for `names`. qpos/qvel/ctrl post-step; fwd at the pre-step state."""
    dtype = qpos.dtype
    R = quat_to_mat(qpos[3:7])          # base orientation (world←base), post-step
    base_pos = qpos[0:3]
    lin_w = qvel[0:3]                   # world frame
    ang_b = qvel[3:6]                   # body frame
    ang_w = R @ ang_b
    ref_lin_w, ref_ang_w = target_base_vel(qpos, ref_lin_vel_H, ref_yaw_dot)

    # feet kinematics from the pre-step Forward (mjData staleness semantics)
    feet_pos_w = fwd.kin.geom_xpos[jnp.asarray(m.feet_geom_id)]       # (4, 3)
    jacp, _ = _point_jacobians(m, fwd.kin, fwd.cdof, feet_pos_w, m.feet_body_id)
    feet_vel_w = jnp.einsum('fiv,v->fi', jacp, qvel)                  # (4, 3)
    # relative: subtract base linear vel and qvel[3:6]×(p_foot − p_base)
    # (reference uses raw qvel[3:6] here — quadruped_env.py:655-663)
    feet_vel_rel_w = (feet_vel_w - lin_w[None, :]
                      - jnp.cross(jnp.broadcast_to(ang_b, (4, 3)),
                                  feet_pos_w - base_pos[None, :]))

    lay = constraint_layout(m)
    contact_state = feet_contact_state(m, lay, fwd)                   # (4,) bool
    grf_w = feet_contact_forces(m, lay, fwd)                          # (4, 3) world

    out = {}
    for name in names:
        base_name, _, frame = name.partition(':')
        frame = frame or 'world'
        Rt = R.T if frame == 'base' else jnp.eye(3, dtype=dtype)

        if name == 'qpos':
            v = qpos
        elif name == 'qvel':
            v = qvel
        elif name == 'tau_ctrl_setpoint':
            v = ctrl
        elif name == 'qpos_js':
            v = qpos[7:]
        elif name == 'qvel_js':
            v = qvel[6:]
        elif name == 'base_pos':
            v = base_pos
        elif base_name == 'base_lin_vel_err':
            v = (Rt @ ref_lin_w) - (Rt @ lin_w)
        elif base_name == 'base_lin_vel':
            v = Rt @ lin_w
        elif base_name == 'base_lin_acc':
            v = Rt @ fwd.qacc[0:3]
        elif base_name == 'base_ang_vel_err':
            # base frame: raw qvel[3:6] (body frame); world: R @ qvel[3:6]
            ang = ang_b if frame == 'base' else ang_w
            v = (Rt @ ref_ang_w) - ang
        elif base_name == 'base_ang_vel':
            v = ang_b if frame == 'base' else ang_w
        elif name == 'base_ori_euler_xyz':
            v = quat_to_euler_xyz(qpos[3:7])
        elif name == 'base_ori_quat_wxyz':
            v = qpos[3:7]
        elif name == 'base_ori_SO3':
            v = R.reshape(9)
        elif base_name == 'feet_pos':
            p = feet_pos_w if frame == 'world' else \
                jnp.einsum('ij,fj->fi', R.T, feet_pos_w - base_pos[None, :])
            v = p.reshape(12)
        elif base_name == 'feet_vel_rel':
            v = jnp.einsum('ij,fj->fi', Rt, feet_vel_rel_w).reshape(12)
        elif base_name == 'feet_vel':
            v = jnp.einsum('ij,fj->fi', Rt, feet_vel_w).reshape(12)
        elif name == 'contact_state':
            v = contact_state.astype(dtype)
        elif base_name == 'contact_forces':
            v = jnp.einsum('ij,fj->fi', Rt, grf_w).reshape(12)
        elif name == 'gravity_vector:base':
            v = R.T @ jnp.asarray(np.array([0.0, 0.0, -1.0]), dtype)
        elif name == 'kinetic_energy':
            v = (0.5 * qvel @ fwd.M @ qvel)[None]
        elif name == 'work':
            v = ((fwd.M @ fwd.qacc) @ qvel)[None]
        else:
            raise ValueError(f'Invalid observation name: {name}, '
                             f'available: {ALL_OBS}')
        out[name] = v
    return out
