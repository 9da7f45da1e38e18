"""Closed-loop MPC control-sequence parity vs a CPU (numpy/scipy) reference.

BASELINE acceptance: "baseline controller control sequence within tolerance of
reference over the same horizon". The gate rolls go2/flat under the jitted
centroidal MPC (the exact production tick from examples/go2_mpc_locomotion.py)
and, at every replan, solves the SAME condensed QP with an independent CPU
reference — float64 numpy condensing + scipy SLSQP on the explicit
friction-pyramid/box constraint set — then maps both force plans through
torques() and gates the torque sequence.

Fast mode: 40 sim steps (8 replans). RUN_SLOW=1: 200 steps (40 replans).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_quadruped_tpu.env import QuadrupedEnv
from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.mpc import CentroidalMPC, GaitConfig, MPCConfig
from gym_quadruped_tpu.mpc import centroidal as srb
from gym_quadruped_tpu.mpc import qp as qpmod
from gym_quadruped_tpu.mpc.gait import contact_schedule
from gym_quadruped_tpu.physics.constraints import _point_jacobians
from gym_quadruped_tpu.physics.kinematics import cdof, fk
from gym_quadruped_tpu.utils.maths import quat_to_euler_xyz

N_STEPS = 200 if os.environ.get('RUN_SLOW') else 40
REPLAN = 5


def _np_condense(A, B, x0, x_ref, q_diag, r_scalar):
    """Float64 numpy mirror of qp.condense (independent arithmetic path)."""
    A, B = np.asarray(A, np.float64), np.asarray(B, np.float64)
    x0, x_ref = np.asarray(x0, np.float64), np.asarray(x_ref, np.float64)
    H, NX, NU = A.shape[0], A.shape[1], B.shape[2]
    Sx = np.zeros((H, NX, NX))
    Su = np.zeros((H, NX, H * NU))
    phi = np.eye(NX)
    row = np.zeros((NX, H * NU))
    for k in range(H):
        phi = A[k] @ phi
        row = A[k] @ row
        row[:, k * NU:(k + 1) * NU] += B[k]
        Sx[k] = phi
        Su[k] = row
    Su = Su.reshape(H * NX, H * NU)
    Qd = np.tile(np.asarray(q_diag, np.float64), H)
    r = (Sx @ x0).reshape(-1) - x_ref.reshape(-1)
    Hq = Su.T @ (Qd[:, None] * Su) + r_scalar * np.eye(H * NU)
    q = Su.T @ (Qd * r)
    return Hq, q


def _scipy_qp(Hq, q, stance, mu, fz_min, fz_max, x_init):
    """Solve min ½UᵀHqU + qᵀU over the friction pyramid with SLSQP."""
    from scipy import optimize

    n = Hq.shape[0]
    rows = n // 3

    # linear inequality set G U >= h (per leg-knot: 4 wedge + 2 box rows)
    G = np.zeros((6 * rows, n))
    h = np.zeros(6 * rows)
    for i in range(rows):
        fx, fy, fz = 3 * i, 3 * i + 1, 3 * i + 2
        c = float(stance[i])
        G[6 * i + 0, [fx, fz]] = [-1.0, mu]
        G[6 * i + 1, [fx, fz]] = [1.0, mu]
        G[6 * i + 2, [fy, fz]] = [-1.0, mu]
        G[6 * i + 3, [fy, fz]] = [1.0, mu]
        G[6 * i + 4, fz] = 1.0
        h[6 * i + 4] = fz_min * c
        G[6 * i + 5, fz] = -1.0
        h[6 * i + 5] = -fz_max * c

    res = optimize.minimize(
        lambda U: 0.5 * U @ Hq @ U + q @ U, x_init,
        jac=lambda U: Hq @ U + q, method='SLSQP',
        constraints=[{'type': 'ineq', 'fun': lambda U: G @ U - h,
                      'jac': lambda U: G}],
        options={'maxiter': 300, 'ftol': 1e-12})
    return res.x


@pytest.mark.filterwarnings('ignore::RuntimeWarning')
def test_closed_loop_control_sequence_matches_cpu_reference():
    m = load_model('go2', 'flat')
    env = QuadrupedEnv('go2', state_obs_names=('qpos', 'qvel'), scene='flat',
                       base_vel_command_type='forward', ref_base_lin_vel=0.4,
                       model=m)
    cfg = MPCConfig(gait=GaitConfig('trot', period=0.5), iterations=50)
    mpc = CentroidalMPC(m, cfg)
    ref = jnp.array([0.4, 0.0, 0.0])

    def _tick(state, warm):
        kin = fk(m, state.qpos)
        cd = cdof(m, kin)
        feet = kin.geom_xpos[jnp.asarray(m.feet_geom_id)]
        jacp, _ = _point_jacobians(m, kin, cd, feet, m.feet_body_id)
        forces, warm = mpc.solve(state.qpos, state.qvel, feet, state.time,
                                 ref, jnp.asarray(0.0), warmstart=warm)
        tau = mpc.torques(state.qpos, state.qvel, feet, jacp, forces[0],
                          state.time, ref)
        return tau, warm, forces, feet, jacp

    tick_cold = jax.jit(lambda s: _tick(s, None))
    tick_warm = jax.jit(_tick)
    step = jax.jit(env.step)
    state, _ = jax.jit(lambda k: env.reset(
        k, qpos=jnp.asarray(m.key_qpos[0]), qvel=jnp.zeros(m.nv)))(
            jax.random.PRNGKey(0))

    tau, warm, *_ = tick_cold(state)
    tau_err, f_scale = [], []
    for i in range(N_STEPS):
        if i % REPLAN == 0:
            tau, warm, forces, feet, jacp = tick_warm(state, warm)

            # CPU reference on the SAME state (independent float64 pipeline)
            qpos = np.asarray(state.qpos, np.float64)
            qvel = np.asarray(state.qvel, np.float64)
            euler = np.asarray(quat_to_euler_xyz(state.qpos[3:7]), np.float64)
            x0 = np.asarray(srb.state_from_env(state.qpos, state.qvel,
                                               jnp.asarray(euler)), np.float64)
            # schedule from the SAME traced time value solve() used — a f64
            # reconstruction can flip a stance knot at a phase boundary and
            # compare against a different QP entirely
            sched = np.asarray(contact_schedule(cfg.gait, state.time,
                                                cfg.horizon, cfg.mpc_dt),
                               np.float64)
            com = qpos[0:3]
            A, B = srb.build_horizon(
                mpc.params, jnp.asarray(euler[2], state.qpos.dtype),
                feet - jnp.asarray(com, state.qpos.dtype)[None, :],
                jnp.asarray(sched, state.qpos.dtype), cfg.mpc_dt)
            x_ref = srb.reference_trajectory(
                jnp.asarray(x0, state.qpos.dtype), ref, jnp.asarray(0.0),
                mpc.stand_height, cfg.horizon, cfg.mpc_dt)
            Hq, qv = _np_condense(A, B, x0, np.asarray(x_ref),
                                  np.asarray(cfg.weights.q_diag),
                                  cfg.weights.r_diag)
            U_tpu = np.asarray(forces.reshape(-1), np.float64)
            U_ref = _scipy_qp(Hq + cfg.rho * np.eye(Hq.shape[0]), qv,
                              sched.reshape(-1), float(mpc.params.mu),
                              float(mpc.params.fz_min),
                              float(mpc.params.fz_max), U_tpu)
            f_ref = jnp.asarray(U_ref.reshape(cfg.horizon, 4, 3),
                                state.qpos.dtype)
            tau_ref = mpc.torques(state.qpos, state.qvel, feet, jacp,
                                  f_ref[0], state.time, ref)
            tau_err.append(float(jnp.max(jnp.abs(tau - tau_ref))))
            f_scale.append(float(jnp.max(jnp.abs(forces))))
        state, *_ = step(state, tau)

    worst = max(tau_err)
    scale = max(f_scale)
    # measured decomposition (scripts-free probes, 2026-08-21): cold ADMM-50
    # sits ≤0.05 N of the scipy optimum (ADMM-200 is exact); the warm-10
    # replan adds ≤0.3 N·m of first-knot torque slack vs cold-50. 0.5 N·m on
    # a ~30 N·m torque scale (~1.5%) bounds both with margin.
    assert worst < 0.5, (
        f'closed-loop torque sequence diverges from the CPU reference QP: '
        f'max |Δτ| = {worst:.3f} N·m over {len(tau_err)} replans '
        f'(force scale {scale:.1f} N)')
