"""Gymnasium-compatible stateful adapter around the functional QuadrupedEnv.

Drop-in for the reference's `QuadrupedEnv(gym.Env)` surface (quadruped_env.py:71):
same constructor kwargs, `reset(qpos=..., qvel=..., seed=...)`, `step(action)`
returning `(obs_dict, reward, terminated, truncated, info)` in numpy, the same
action/observation spaces, and the kinematic accessor surface (`feet_pos`,
`feet_jacobians`, `legs_mass_matrix`, ...) backed by the fused Forward results.

Single-env interactive use only — for batched simulation use the functional core
directly (`jax.vmap(env.step)`), which is the whole point of this framework.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

try:
    import gymnasium as gym
    from gymnasium import spaces
    _GYM_BASE = gym.Env
except ImportError:  # pragma: no cover - gymnasium is available in CI
    gym = None
    spaces = None
    _GYM_BASE = object

from gym_quadruped_tpu.env.env import QuadrupedEnv
from gym_quadruped_tpu.physics import engine
from gym_quadruped_tpu.physics.constraints import _point_jacobians, constraint_layout
from gym_quadruped_tpu.physics.forces import feet_contact_forces, feet_contact_state
from gym_quadruped_tpu.utils.legs import LegsAttr


class QuadrupedGymEnv(_GYM_BASE):
    """Stateful gym.Env facade; all compute stays jitted on-device."""

    metadata = {'render.modes': ['human'], 'version': 0}
    ALL_OBS = QuadrupedEnv.ALL_OBS

    def __init__(self, **kwargs):
        self.core = QuadrupedEnv(**kwargs)
        self._key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        self._state = None
        self._fwd = None  # Forward of the last step (pre-integration registers)
        self.is_paused = False  # toggled by space in the viewer (teleop)

        self._jit_reset = jax.jit(lambda k: self.core.reset(k))
        self._jit_reset_to = jax.jit(
            lambda k, qp, qv: self.core.reset(k, qpos=qp, qvel=qv))
        self._jit_step = jax.jit(self.core.step)
        self._jit_forward = jax.jit(
            lambda qp, qv, ctrl: engine.forward(self.core.model, qp, qv, ctrl))

        if spaces is not None:
            low, high = self.core.action_space_bounds()
            self.action_space = spaces.Box(
                low=low.astype(np.float32), high=high.astype(np.float32),
                shape=(self.core.model.nu,), dtype=np.float32)
            # per-obs bounds: joint ranges / ctrlrange / [0,1] contact flags
            # (reference configure_observation_space, quadruped_utils.py:235-325)
            lims = self.core.observation_space_limits()
            self.observation_space = spaces.Dict({
                name: spaces.Box(low=lo.astype(np.float32),
                                 high=hi.astype(np.float32),
                                 shape=lo.shape, dtype=np.float32)
                for name, (lo, hi) in lims.items()})

    # ----------------------------------------------------------------- gym API

    def reset(self, qpos=None, qvel=None, seed=None, random=True,
              options: dict | None = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        if qpos is None and qvel is None and random:
            self._state, obs = self._jit_reset(k)
        else:
            m = self.core.model
            qp = np.asarray(qpos if qpos is not None else
                            (m.key_qpos[0] if m.key_qpos.shape[0] else m.qpos0))
            qv = np.asarray(qvel if qvel is not None else np.zeros(m.nv))
            self._state, obs = self._jit_reset_to(k, jnp.asarray(qp), jnp.asarray(qv))
        self._refresh_fwd()
        return {k_: np.asarray(v) for k_, v in obs.items()}

    def step(self, action):
        self._state, obs, reward, terminated, truncated, info = \
            self._jit_step(self._state, jnp.asarray(action))
        self._fwd = None  # recompute lazily only if an accessor needs it
        return ({k: np.asarray(v) for k, v in obs.items()}, float(reward),
                bool(terminated), bool(truncated),
                {k: np.asarray(v) for k, v in info.items()})

    def _key_callback(self, keycode):
        """Viewer teleop (reference _key_callback, quadruped_env.py:1330):
        arrows steer the velocity command, ctrl zeros it, space pauses (the
        host loop should poll `self.is_paused` between steps)."""
        import dataclasses

        s = self._state
        hh = float(self.core.model.hip_height)
        lin = np.asarray(s.ref_base_lin_vel_H).copy()
        yaw = float(s.ref_base_ang_yaw_dot)
        if keycode == 262:            # arrow right
            yaw -= np.pi / 6
        elif keycode == 263:          # arrow left
            yaw += np.pi / 6
        elif keycode == 265:          # arrow up
            lin[0] += 0.25 * hh
        elif keycode == 264:          # arrow down
            lin[0] -= 0.25 * hh
        elif keycode == 345:          # ctrl
            lin[:] = 0.0
            yaw = 0.0
        elif keycode == 32:           # space
            self.is_paused = not getattr(self, 'is_paused', False)
            print('Pausing simulation.' if self.is_paused
                  else 'Resuming simulation.')
        yaw = float(np.clip(yaw, -2 * np.pi, 2 * np.pi))
        lin[0] = float(np.clip(lin[0], -6 * hh, 6 * hh))
        self._state = dataclasses.replace(
            s, ref_base_lin_vel_H=jnp.asarray(lin, s.qpos.dtype),
            ref_base_ang_yaw_dot=jnp.asarray(yaw, s.qpos.dtype))

    def render(self, mode='human', tint_robot=False, ghost_qpos=None,
               ghost_alpha=0.5):
        """Live interactive viewer (reference render(), quadruped_env.py:408):
        mirrors the on-device state into a CPU-MuJoCo passive viewer, draws the
        commanded/actual velocity arrows and optional ghost robots. The physics
        stays on-device — the viewer's MjData is display-only."""
        import mujoco
        import mujoco.viewer as mj_viewer

        from gym_quadruped_tpu.models.builder import build_display_mj_model
        from gym_quadruped_tpu.utils.mujoco_visual import (
            change_robot_appearance,
            render_ghost_robot,
            render_vector,
        )

        if not hasattr(self, '_vis'):
            mj, _ = build_display_mj_model(
                self.core.robot_name, self.core.scene_name,
                self.core.model.timestep)
            if tint_robot:
                change_robot_appearance(mj, alpha=1.0)
            d = mujoco.MjData(mj)
            ghost_d = mujoco.MjData(mj)
            handle = mj_viewer.launch_passive(
                mj, d, key_callback=self._key_callback)
            self._vis = {'mj': mj, 'd': d, 'ghost_d': ghost_d,
                         'viewer': handle, 'arrow_ids': [-1, -1],
                         'ghost_geoms': {}}

        v = self._vis
        v['d'].qpos[:] = np.asarray(self._state.qpos)
        v['d'].qvel[:] = np.asarray(self._state.qvel)
        mujoco.mj_forward(v['mj'], v['d'])

        base_pos = np.asarray(self._state.qpos[0:3])
        vel = np.asarray(self._state.qvel[0:3])
        speed = float(np.linalg.norm(vel) + 1e-9)
        v['arrow_ids'][0] = render_vector(
            v['viewer'], vel / speed, base_pos + [0, 0, 0.15], 0.3 * speed,
            color=[0.2, 0.7, 0.2, 1.0], geom_id=v['arrow_ids'][0])
        ref_lin = np.asarray(self._state.ref_base_lin_vel_H)
        ref_speed = float(np.linalg.norm(ref_lin) + 1e-9)
        v['arrow_ids'][1] = render_vector(
            v['viewer'], ref_lin / ref_speed, base_pos + [0, 0, 0.2],
            0.3 * ref_speed, color=[0.2, 0.2, 0.9, 1.0],
            geom_id=v['arrow_ids'][1])

        if ghost_qpos is not None:
            for q in np.atleast_2d(np.asarray(ghost_qpos)):
                v['ghost_geoms'] = render_ghost_robot(
                    v['viewer'], v['mj'], v['ghost_d'], q, alpha=ghost_alpha,
                    ghost_geoms=v['ghost_geoms'])
        v['viewer'].sync()

    def close(self):
        if hasattr(self, '_vis'):
            self._vis['viewer'].close()
            del self._vis

    # -------------------------------------------------------------- accessors
    # Reference accessor surface (quadruped_env.py:488-1007) as LegsAttr numpy.

    @property
    def fwd(self):
        if self._fwd is None:
            self._refresh_fwd()
        return self._fwd

    def _refresh_fwd(self):
        s = self._state
        self._fwd = self._jit_forward(s.qpos, s.qvel, s.ctrl)

    @property
    def mj_state(self):
        return self._state

    @property
    def qpos(self) -> np.ndarray:
        """Generalized positions (reference users read env.mjData.qpos)."""
        return np.asarray(self._state.qpos)

    @property
    def qvel(self) -> np.ndarray:
        """Generalized velocities (reference users read env.mjData.qvel)."""
        return np.asarray(self._state.qvel)

    @property
    def base_pos(self):
        return np.asarray(self._state.qpos[0:3])

    @property
    def base_ori_quat_wxyz(self):
        return np.asarray(self._state.qpos[3:7])

    @property
    def simulation_dt(self):
        return self.core.model.timestep

    @property
    def simulation_time(self):
        return float(self._state.time)

    @property
    def legs_qvel_idx(self):
        m = self.core.model
        return LegsAttr(*[np.asarray(m.legs_qvel_idx[i]) for i in range(4)])

    @property
    def legs_qpos_idx(self):
        m = self.core.model
        return LegsAttr(*[np.asarray(m.legs_qpos_idx[i]) for i in range(4)])

    @property
    def legs_tau_idx(self):
        m = self.core.model
        return LegsAttr(*[np.asarray(m.legs_tau_idx[i]) for i in range(4)])

    def feet_pos(self, frame='world') -> LegsAttr:
        p = np.asarray(self.fwd.kin.geom_xpos)[np.asarray(self.core.model.feet_geom_id)]
        if frame == 'base':
            R, t = self._base_RT()
            p = (p - t) @ R
        return LegsAttr(*list(p))

    def feet_jacobians(self, frame='world') -> LegsAttr:
        m = self.core.model
        pts = jnp.asarray(np.asarray(self.fwd.kin.geom_xpos)[np.asarray(m.feet_geom_id)])
        jacp, _ = _point_jacobians(m, self.fwd.kin, self.fwd.cdof, pts, m.feet_body_id)
        jacp = np.asarray(jacp)
        if frame == 'base':
            R, _ = self._base_RT()
            jacp = np.einsum('ij,fjv->fiv', R.T, jacp)
        return LegsAttr(*list(jacp))

    def feet_jacobians_dot(self, frame='world') -> LegsAttr:
        """mj_jacDot parity (reference quadruped_env.py:742)."""
        from gym_quadruped_tpu.physics.kinematics import point_jacobian_dot

        m = self.core.model
        pts = np.asarray(self.fwd.kin.geom_xpos)[np.asarray(m.feet_geom_id)]
        jds = [np.asarray(point_jacobian_dot(
            m, self.fwd.kin, self.fwd.cdof, self._state.qvel,
            jnp.asarray(pts[i]), int(m.feet_body_id[i]))) for i in range(4)]
        if frame == 'base':
            R, _ = self._base_RT()
            jds = [R.T @ j for j in jds]
        return LegsAttr(*jds)

    def feet_vel(self, frame='world', relative=False) -> LegsAttr:
        """Reference feet_vel semantics (quadruped_env.py:631-679)."""
        m = self.core.model
        jac = self.feet_jacobians('world')
        qvel = np.asarray(self._state.qvel)
        feet_p = self.feet_pos('world')
        base_p = self.base_pos
        out = []
        for leg in ('FL', 'FR', 'RL', 'RR'):
            v = jac[leg] @ qvel
            if relative:
                v = v - qvel[0:3] - np.cross(qvel[3:6], feet_p[leg] - base_p)
            out.append(v)
        if frame == 'base':
            R, _ = self._base_RT()
            out = [R.T @ v for v in out]
        return LegsAttr(*out)

    def hip_positions(self, frame='world') -> LegsAttr:
        """Reference hip_positions (quadruped_env.py:564): R.T @ hip_xpos."""
        m = self.core.model
        xpos = np.asarray(self.fwd.kin.xpos)
        R = np.eye(3) if frame == 'world' else self._base_RT()[0]
        return LegsAttr(*[R.T @ xpos[b] if b >= 0 else None
                          for b in np.asarray(m.hip_body_id)])

    def get_base_inertia(self) -> np.ndarray:
        """Reflected base rotational inertia = M[3:6, 3:6]
        (reference quadruped_env.py:543)."""
        return np.asarray(self.fwd.M)[3:6, 3:6]

    def base_lin_vel(self, frame='world'):
        v = np.asarray(self._state.qvel[0:3])
        return v if frame == 'world' else self._base_RT()[0].T @ v

    def base_ang_vel(self, frame='base'):
        w = np.asarray(self._state.qvel[3:6])
        return w if frame == 'base' else self._base_RT()[0] @ w

    def target_base_vel(self, frame='world'):
        """Commanded base linear/angular velocity (reference target_base_vel,
        quadruped_env.py:488)."""
        from gym_quadruped_tpu.env.observables import target_base_vel

        s = self._state
        lin, ang = target_base_vel(s.qpos, s.ref_base_lin_vel_H,
                                   s.ref_base_ang_yaw_dot)
        lin, ang = np.asarray(lin), np.asarray(ang)
        if frame == 'base':
            R = self._base_RT()[0]
            return R.T @ lin, R.T @ ang
        return lin, ang

    def base_lin_vel_err(self, frame='world'):
        """Commanded-minus-actual base linear velocity (quadruped_env.py:511)."""
        return self.target_base_vel(frame)[0] - self.base_lin_vel(frame)

    def base_ang_vel_err(self, frame='world'):
        """Commanded-minus-actual base angular velocity (quadruped_env.py:517)."""
        return self.target_base_vel(frame)[1] - self.base_ang_vel(frame)

    def base_lin_acc(self, frame='world'):
        """Base linear acceleration of the last solve (quadruped_env.py:533)."""
        a = np.asarray(self._state.qacc[0:3])
        return a if frame == 'world' else self._base_RT()[0].T @ a

    @property
    def torque_ctrl_setpoint(self) -> np.ndarray:
        """Last commanded actuator torques (quadruped_env.py:999)."""
        return np.asarray(self._state.ctrl)

    @property
    def robot_model(self):
        """The compiled array model (reference exposes mjModel, :1028)."""
        return self.core.model

    @property
    def obs_group_reps(self):
        """Group representations of each observable (quadruped_env.py:1038);
        requires the optional morpho_symm extra."""
        from gym_quadruped_tpu.utils.symmetry import (
            configure_observation_space_representations,
        )

        return configure_observation_space_representations(
            robot_name=self.core.robot_name,
            obs_names=self.core.state_obs_names)

    @property
    def base_configuration(self) -> np.ndarray:
        R, t = self._base_RT()
        X = np.eye(4)
        X[:3, :3] = R
        X[:3, 3] = t
        return X

    @property
    def heading_orientation_SO3(self) -> np.ndarray:
        from gym_quadruped_tpu.env.observables import heading_R

        return np.asarray(heading_R(self._state.qpos))

    @property
    def base_ori_euler_xyz(self) -> np.ndarray:
        from gym_quadruped_tpu.utils.maths import quat_to_euler_xyz

        return np.asarray(quat_to_euler_xyz(self._state.qpos[3:7]))

    @property
    def gravity_vector(self) -> np.ndarray:
        return self._base_RT()[0].T @ np.array([0.0, 0.0, -1.0])

    @property
    def joint_space_state(self):
        return (np.asarray(self._state.qpos[7:]), np.asarray(self._state.qvel[6:]))

    @property
    def kinetic_energy(self) -> float:
        qvel = np.asarray(self._state.qvel)
        return float(0.5 * qvel @ np.asarray(self.fwd.M) @ qvel)

    @property
    def work(self) -> float:
        return float((np.asarray(self.fwd.M) @ np.asarray(self.fwd.qacc))
                     @ np.asarray(self._state.qvel))

    def feet_contact_state(self, frame='world', ground_reaction_forces=False):
        """Boolean foot-ground contact state (+ optional per-foot GRFs).

        Returns (state, contacts, [forces]) like the reference
        (quadruped_env.py:799); the middle element is the reference's per-foot
        MjContact list and is always None here — contact slots are static
        arrays, use `forces` or the contact observables instead.
        """
        m = self.core.model
        lay = constraint_layout(m)
        cs = np.asarray(feet_contact_state(m, lay, self.fwd))
        state = LegsAttr(*[bool(x) for x in cs])
        if not ground_reaction_forces:
            return state, None
        f = np.asarray(feet_contact_forces(m, lay, self.fwd))
        if frame == 'base':
            R, _ = self._base_RT()
            f = f @ R
        return state, None, LegsAttr(*list(f))

    @property
    def legs_mass_matrix(self) -> LegsAttr:
        m = self.core.model
        M = np.asarray(self.fwd.M)
        return LegsAttr(*[M[np.ix_(m.legs_qvel_idx[i], m.legs_qvel_idx[i])]
                          for i in range(4)])

    @property
    def legs_qfrc_bias(self) -> LegsAttr:
        m = self.core.model
        b = np.asarray(self.fwd.qfrc_bias)
        return LegsAttr(*[b[m.legs_qvel_idx[i]] for i in range(4)])

    @property
    def legs_qfrc_passive(self) -> LegsAttr:
        m = self.core.model
        b = np.asarray(self.fwd.qfrc_passive)
        return LegsAttr(*[b[m.legs_qvel_idx[i]] for i in range(4)])

    @property
    def com(self) -> np.ndarray:
        m = self.core.model
        xipos = np.asarray(self.fwd.kin.xipos)
        mass = np.asarray(m.body_mass)
        return (mass[:, None] * xipos).sum(0) / mass.sum()

    def get_hyperparameters(self):
        return self.core.get_hyperparameters()

    def _base_RT(self):
        from gym_quadruped_tpu.utils.maths import quat_to_mat
        R = np.asarray(quat_to_mat(self._state.qpos[3:7]))
        return R, np.asarray(self._state.qpos[0:3])
