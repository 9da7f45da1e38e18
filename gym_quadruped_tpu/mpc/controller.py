"""Centroidal MPC controller: gait → SRB QP → ground-reaction forces → torques.

New-scope component per BASELINE.json: velocity-command tracking MPC at H=12 whose
solve is fully batched (vmap over envs, shard over chips). One `solve()` is:
gait schedule → SRB (A, B) horizon → dense condensing → 144×144 Cholesky +
fixed-iteration ADMM (mpc/qp.py) → (H, 4, 3) force plan. `torques()` maps the
first-step plan to joint torques: stance legs Jᵀf (force control through the foot
Jacobians the env exposes — reference feet_jacobians, quadruped_env.py:681), swing
legs Cartesian PD to a Raibert-heuristic foothold.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.mpc import centroidal as srb
from gym_quadruped_tpu.mpc import qp
from gym_quadruped_tpu.mpc.gait import GaitConfig, contact_schedule, swing_phase
from gym_quadruped_tpu.utils.maths import quat_to_euler_xyz, quat_to_mat


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    horizon: int = 12
    mpc_dt: float = 0.02
    iterations: int = 30
    # ADMM budget when a warmstart from the previous replan is supplied: the
    # consensus variables start feasible-adjacent, so ~1/3 the cold budget
    # reaches the same plan quality (bench_mpc.py closed-loop check)
    warm_iterations: int = 10
    rho: float = 1e-4
    gait: GaitConfig = GaitConfig('trot')
    weights: qp.MPCWeights = qp.MPCWeights()
    swing_height: float = 0.06
    kp_swing: float = 300.0
    kd_swing: float = 10.0
    # outward lateral bias of the swing foothold (m): keeps the swing calf
    # clear of the stance-side calf — with self-collision modeled (r2), the
    # bare Raibert target makes the front calves brush mid-trot (matches
    # MuJoCo contact-for-contact) and the graze destabilizes the gait
    stance_width_offset: float = 0.05


class CentroidalMPC:
    """Static config + pure solve/torque functions (jit/vmap-able)."""

    def __init__(self, model: Model, config: MPCConfig = MPCConfig(), **params_kw):
        self.model = model
        self.cfg = config
        self.params = srb.CentroidalParams.from_model(model, **params_kw)
        # nominal standing height from the keyframe
        self.stand_height = float(model.key_qpos[0][2]) if \
            model.key_qpos.shape[0] else model.hip_height

    # ------------------------------------------------------------------ solve

    def solve(self, qpos, qvel, feet_pos_w, t, ref_lin_vel_w, ref_yaw_dot,
              warmstart=None):
        """One MPC solve. Returns (forces (H, 4, 3) world frame, warmstart).

        feet_pos_w: (4, 3) current foot positions (world); frozen over the horizon
        (classic convex-MPC simplification).
        """
        cfg = self.cfg
        dtype = qpos.dtype
        euler = quat_to_euler_xyz(qpos[3:7])
        x0 = srb.state_from_env(qpos, qvel, euler)

        schedule = contact_schedule(cfg.gait, t, cfg.horizon, cfg.mpc_dt)
        com = qpos[0:3]
        A, B = srb.build_horizon(self.params, euler[2], feet_pos_w - com[None, :],
                                 schedule, cfg.mpc_dt)
        x_ref = srb.reference_trajectory(x0, ref_lin_vel_w, ref_yaw_dot,
                                         self.stand_height, cfg.horizon,
                                         cfg.mpc_dt)
        Hq, qv = qp.condense(A, B, x0, x_ref, cfg.weights.q_diag,
                             cfg.weights.r_diag)
        iters = cfg.iterations if warmstart is None else cfg.warm_iterations
        U, warm = qp.admm_solve(Hq, qv, schedule, self.params.mu,
                                self.params.fz_min, self.params.fz_max,
                                iterations=iters, rho=cfg.rho,
                                warmstart=warmstart)
        forces = U.reshape(cfg.horizon, 4, 3)
        return forces, warm

    # ---------------------------------------------------------------- torques

    def torques(self, qpos, qvel, feet_pos_w, feet_jac_w, grf_plan, t,
                ref_lin_vel_w, qfrc_bias_legs=None):
        """Map the first-step force plan to joint torques (nu,).

        feet_jac_w: (4, 3, nv) world translational foot Jacobians.
        grf_plan: (4, 3) first-knot ground-reaction forces.
        """
        m = self.model
        cfg = self.cfg
        dtype = qpos.dtype
        stance = contact_schedule(cfg.gait, t, 1, cfg.mpc_dt)[0]  # (4,)
        sw_phase = swing_phase(cfg.gait, t)

        # swing foothold: Raibert heuristic under the hip + half-stance travel
        R = quat_to_mat(qpos[3:7])
        hip_w = self._hip_positions_w(qpos)
        duty = cfg.gait.resolved()[1]
        t_stance = duty * cfg.gait.period
        v = qvel[0:3]
        side = jnp.asarray([1.0, -1.0, 1.0, -1.0], dtype)  # FL FR RL RR
        foothold = hip_w + 0.5 * t_stance * ref_lin_vel_w[None, :] \
            + 0.03 * (v - ref_lin_vel_w)[None, :] \
            + cfg.stance_width_offset * side[:, None] * R[:, 1][None, :]
        ground_z = feet_pos_w[:, 2].min()
        foothold = foothold.at[:, 2].set(ground_z)

        # swing trajectory: cycloidal interpolation lift
        lift = cfg.swing_height * jnp.sin(jnp.pi * sw_phase)
        p_des = (feet_pos_w * (1 - sw_phase[:, None]) +
                 foothold * sw_phase[:, None])
        p_des = p_des.at[:, 2].add(lift)

        foot_vel = jnp.einsum('fiv,v->fi', feet_jac_w, qvel)
        f_swing = (cfg.kp_swing * (p_des - feet_pos_w)
                   - cfg.kd_swing * foot_vel)

        f_cmd = jnp.where(stance[:, None] > 0, -grf_plan, f_swing)  # (4, 3)

        tau = jnp.zeros(m.nv, dtype)
        for leg in range(4):
            tau = tau + feet_jac_w[leg].T @ f_cmd[leg]
        # project to actuated joints (per-leg tau indices)
        tau_act = jnp.zeros(m.nu, dtype)
        for leg in range(4):
            idx_v = m.legs_qvel_idx[leg]
            idx_u = m.legs_tau_idx[leg]
            leg_tau = tau[jnp.asarray(idx_v)]
            if qfrc_bias_legs is not None:
                leg_tau = leg_tau + qfrc_bias_legs[leg] * (1 - stance[leg])
            tau_act = tau_act.at[jnp.asarray(idx_u)].set(leg_tau)
        del R
        return tau_act

    def _hip_positions_w(self, qpos):
        """(4, 3) hip positions from base pose + static hip offsets
        (reference hip_positions, quadruped_env.py:564)."""
        m = self.model
        R = quat_to_mat(qpos[3:7])
        offs = []
        for b in np.asarray(m.hip_body_id):
            if b < 0:
                offs.append(np.zeros(3))
            else:
                # body_pos chain from base to hip body (one hop for all robots)
                offs.append(np.asarray(m.body_pos[b]))
        offs = jnp.asarray(np.stack(offs), qpos.dtype)
        return qpos[0:3][None, :] + offs @ R.T
