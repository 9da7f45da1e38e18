"""QuadrupedEnv: the functional TPU-native environment core.

Reproduces the reference QuadrupedEnv (quadruped_env.py:71-1433) as pure functions
over (Model, EnvState): `reset(key) -> (state, obs)` and
`step(state, action) -> (state, obs, reward, terminated, truncated, info)`.
Both are jit-able and vmap-able; batch 4096 envs with `jax.vmap(env.step)`,
shard over a mesh with `gym_quadruped_tpu.parallel`.

Config (command type, ranges, obs names, sensors) is static Python held by the env
object — it selects the traced program, mirroring the reference's constructor kwargs
(quadruped_env.py:85-99). All randomness flows through EnvState.rng (the reference
uses the global numpy RNG — quadruped_env.py:338; per-env jax streams replace it).

A gym.Env-compatible single-env adapter lives in env/gym_adapter.py.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.env import observables as obslib
from gym_quadruped_tpu.env.state import EnvState, init_state
from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.models.robots import get_robot_config
from gym_quadruped_tpu.physics import engine
from gym_quadruped_tpu.physics.collision import collide, contact_layout
from gym_quadruped_tpu.physics.constraints import constraint_layout, runtime_con_mu
from gym_quadruped_tpu.physics.forces import feet_slot_mask, invalid_contact
from gym_quadruped_tpu.physics.kinematics import fk
from gym_quadruped_tpu.utils.maths import euler_xyz_to_quat


def _process_range(v) -> tuple:
    """Scalar → (v, v); (min, max) passes through (reference math_utils.py:54)."""
    if isinstance(v, (int, float, np.number)):
        return (float(v), float(v))
    assert len(v) == 2, f'Invalid range, expected (min, max): {v}'
    return (float(v[0]), float(v[1]))


class QuadrupedEnv:
    """Functional quadruped environment. See module docstring."""

    ALL_OBS = obslib.ALL_OBS
    _DEFAULT_OBS = ('qpos', 'qvel', 'tau_ctrl_setpoint', 'feet_pos:base',
                    'feet_vel:base')

    def __init__(
        self,
        robot: str,
        state_obs_names: Sequence[str] = _DEFAULT_OBS,
        scene: str = 'flat',
        sim_dt: float = 0.002,
        base_vel_command_type: str = 'forward',
        ref_base_lin_vel=0.5,
        ref_base_ang_vel=0.0,
        ground_friction_coeff=1.0,
        legs_order: tuple = ('FL', 'FR', 'RL', 'RR'),
        sensors: Sequence[type] | None = None,
        sensors_kwargs: Sequence[dict] | None = None,
        external_disturbances_kwargs: dict | None = None,
        model: Model | None = None,
        solver_iterations: int | None = None,
        max_contacts: int | None = None,
    ):
        self.robot_name = robot
        self.robot_cfg = get_robot_config(robot)
        self.scene_name = scene
        self.base_vel_command_type = base_vel_command_type
        self.base_lin_vel_range = _process_range(ref_base_lin_vel) \
            if not callable(ref_base_lin_vel) else ref_base_lin_vel
        self.base_ang_vel_range = _process_range(ref_base_ang_vel) \
            if not callable(ref_base_ang_vel) else ref_base_ang_vel
        self.ground_friction_coeff_range = _process_range(ground_friction_coeff)
        assert tuple(legs_order) == ('FL', 'FR', 'RL', 'RR'), \
            'leg arrays are fixed FL,FR,RL,RR order'
        self.legs_order = tuple(legs_order)
        self.state_obs_names = tuple(state_obs_names)
        self.external_disturbances_kwargs = external_disturbances_kwargs
        self.solver_iterations = (engine.DEFAULT_SOLVER_ITERS
                                  if solver_iterations is None
                                  else solver_iterations)
        # per-scene override of the cone-contact cap (engine.MAX_CONE_CONTACTS):
        # raise for cluttered scenes where >32 slots can touch simultaneously
        self.max_contacts = (engine.MAX_CONE_CONTACTS if max_contacts is None
                             else int(max_contacts))

        self.model = model if model is not None else load_model(robot, scene, sim_dt)
        self.terrain_limits = self.model.terrain_limits

        # sensors: constructed with (model, **kwargs); must expose the functional
        # Sensor protocol (sensors/base.py)
        self.sensors = []
        if sensors is not None:
            sensors_kwargs = sensors_kwargs or [{}] * len(sensors)
            for cls, kw in zip(sensors, sensors_kwargs):
                self.sensors.append(cls(model=self.model, **kw))

        # static tables used by reset/termination
        self._friction_geom_mask = self._build_friction_mask()

        # Callable velocity commands (reference type hint VelCallable,
        # quadruped_env.py:68,92-93: time [s] → velocity): tabulated host-side
        # at construction onto a per-step time grid so the jit-traced step can
        # look the command up by sim time — arbitrary Python callables cannot
        # run under jit, and the reference's own sampling path would not
        # accept them either (_process_range, math_utils.py:54-60, falls
        # through). Horizon 60 s, clamped beyond.
        self._vel_table_dt = float(self.model.timestep)
        n_tab = int(round(60.0 / self._vel_table_dt)) + 1
        if callable(self.base_lin_vel_range):
            fn = self.base_lin_vel_range
            tab = np.stack([np.broadcast_to(
                np.asarray(fn(k * self._vel_table_dt), np.float64), (3,))
                for k in range(n_tab)])
            self._lin_vel_table = jnp.asarray(tab)          # (T, 3)
        else:
            self._lin_vel_table = None
        if callable(self.base_ang_vel_range):
            fn = self.base_ang_vel_range
            tab = np.array([float(np.asarray(fn(k * self._vel_table_dt)).reshape(-1)[-1])
                            for k in range(n_tab)])
            self._ang_vel_table = jnp.asarray(tab)          # (T,)
        else:
            self._ang_vel_table = None

        # validate obs names early (sensor names route to sensors)
        for name in self.state_obs_names:
            if not self._is_sensor_obs(name):
                obslib.obs_dim(self.model, name)

        self._hparams = dict(
            robot=robot, state_obs_names=tuple(state_obs_names), scene=scene,
            sim_dt=sim_dt, base_vel_command_type=base_vel_command_type,
            ref_base_lin_vel=ref_base_lin_vel, ref_base_ang_vel=ref_base_ang_vel,
            ground_friction_coeff=ground_friction_coeff,
            legs_order=tuple(legs_order),
            external_disturbances_kwargs=external_disturbances_kwargs,
            max_contacts=max_contacts,
        )

    # ------------------------------------------------------------------ helpers

    def _is_sensor_obs(self, name: str) -> bool:
        return any(name in s.available_observations() for s in self.sensors)

    def _build_friction_mask(self) -> np.ndarray:
        """Geoms whose friction is randomized: ground-named geoms + feet
        (reference _set_ground_friction, quadruped_env.py:1277-1298)."""
        m = self.model
        mask = np.zeros(m.ngeom, bool)
        for gid, name in enumerate(m.geom_names):
            if name and name.lower() in ('ground', 'floor', 'hfield', 'terrain'):
                mask[gid] = True
        mask[np.asarray(m.feet_geom_id)] = True
        return mask

    def observation_space_dims(self) -> dict:
        dims = {}
        for name in self.state_obs_names:
            if self._is_sensor_obs(name):
                for s in self.sensors:
                    if name in s.available_observations():
                        dims[name] = s.observation_dim(name)
                        break
            else:
                dims[name] = obslib.obs_dim(self.model, name)
        return dims

    def observation_space_limits(self) -> dict:
        """name → (low, high) bounds (reference configure_observation_space,
        quadruped_utils.py:235-325); sensor observables are unbounded."""
        lims = {}
        for name in self.state_obs_names:
            if self._is_sensor_obs(name):
                for s in self.sensors:
                    if name in s.available_observations():
                        d = s.observation_dim(name)
                        lims[name] = (np.full(d, -np.inf), np.full(d, np.inf))
                        break
            else:
                lims[name] = obslib.obs_limits(self.model, name)
        return lims

    def action_space_bounds(self) -> tuple:
        """(low, high) torque bounds (reference quadruped_env.py:214-225)."""
        m = self.model
        low = np.where(m.actuator_forcelimited, m.actuator_forcerange[:, 0], -np.inf)
        high = np.where(m.actuator_forcelimited, m.actuator_forcerange[:, 1], np.inf)
        return low, high

    def get_hyperparameters(self) -> dict:
        """Constructor kwargs snapshot — travels with datasets so an equivalent env
        can be reconstructed (reference _save_hyperparameters, quadruped_env.py:1352)."""
        return dict(self._hparams)

    @property
    def simulation_dt(self) -> float:
        return self.model.timestep

    # ------------------------------------------------------- command sampling

    def _sample_ref_vel(self, rng, dtype):
        """(lin_vel_H (3,), yaw_dot (), steps_until ()) — quadruped_env.py:1046-1072."""
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        ct = self.base_vel_command_type
        if self._lin_vel_table is not None or self._ang_vel_table is not None:
            # callable commands are time-driven (table lookup in _vel_command
            # each step); sampling returns the t=0 entry, no reset cadence
            lin = (self._lin_vel_table[0] if self._lin_vel_table is not None
                   else jnp.zeros(3, dtype))
            yaw = (self._ang_vel_table[0] if self._ang_vel_table is not None
                   else jnp.zeros((), dtype))
            return lin.astype(dtype), yaw.astype(dtype), \
                jnp.asarray(-1, jnp.int32)
        lo, hi = self.base_lin_vel_range
        if 'forward' in ct:
            norm = jax.random.uniform(k1, (), dtype, lo, hi)
            head = jnp.asarray(np.array([1.0, 0, 0]), dtype)
        elif 'random' in ct:
            norm = jax.random.uniform(k1, (), dtype, lo, hi)
            ang = jax.random.uniform(k2, (), dtype, -math.pi, math.pi)
            head = jnp.stack([jnp.cos(ang), jnp.sin(ang), jnp.zeros((), dtype)])
        elif 'human' in ct:
            norm = jnp.zeros((), dtype)
            head = jnp.asarray(np.array([1.0, 0, 0]), dtype)
        else:
            raise ValueError(f'Invalid base velocity command type: {ct}')
        if 'rotate' in ct:
            alo, ahi = self.base_ang_vel_range
            yaw_dot = jax.random.uniform(k3, (), dtype, alo, ahi)
        else:
            yaw_dot = jnp.zeros((), dtype)
        if 'reset' in ct:
            steps = jax.random.randint(k4, (), 1000, 3000)
        else:
            steps = jnp.asarray(-1, jnp.int32)
        return norm * head, yaw_dot, steps.astype(jnp.int32)

    def _sample_disturbance(self, rng, dtype):
        """(wrench (6,), steps_until ()) — quadruped_env.py:1074-1139."""
        kw = self.external_disturbances_kwargs
        if kw is None:
            return jnp.zeros(6, dtype), jnp.asarray(-1, jnp.int32)
        keys = jax.random.split(rng, 7)
        vals = []
        for i, axis in enumerate(('x', 'y', 'z', 'roll', 'pitch', 'yaw')):
            if axis in kw:
                rng_spec = kw[axis]
                if len(rng_spec) == 1:
                    vals.append(jnp.asarray(float(rng_spec[0]), dtype))
                else:
                    vals.append(jax.random.uniform(
                        keys[i], (), dtype, float(rng_spec[0]), float(rng_spec[1])))
            else:
                vals.append(jnp.zeros((), dtype))
        steps = (jax.random.randint(keys[6], (), 1000, 3000).astype(jnp.int32)
                 if kw.get('type') == 'reset' else jnp.asarray(-1, jnp.int32))
        return jnp.stack(vals), steps

    def _sample_friction(self, rng, dtype):
        """Per-env geom_friction table with randomized ground/feet tangential
        coefficient (torsional=0.005, rolling=0.0 — quadruped_env.py:1284-1286)."""
        m = self.model
        base = jnp.asarray(m.geom_friction, dtype)
        lo, hi = self.ground_friction_coeff_range
        t = jax.random.uniform(rng, (), dtype, lo, hi)
        new = jnp.stack([t, jnp.asarray(0.005, dtype), jnp.zeros((), dtype)])
        mask = jnp.asarray(self._friction_geom_mask)[:, None]
        return jnp.where(mask, new[None, :], base)

    # ----------------------------------------------------------------- reset

    def _randomize_qpos(self, rng, dtype, options=None):
        """Keyframe-0 pose + white noise + spawn pose (quadruped_env.py:342-373)."""
        m = self.model
        options = options or {}
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        qpos = jnp.asarray(m.key_qpos[0] if m.key_qpos.shape[0] else m.qpos0, dtype)
        qvel = jnp.zeros(m.nv, dtype)

        q_pos_amp = options.get('angle_sweep', 20 * math.pi / 180)
        qpos = qpos.at[7:].add(
            jax.random.uniform(k1, (m.nq - 7,), dtype, -q_pos_amp, q_pos_amp))
        qvel = qvel.at[6:].set(jax.random.uniform(k2, (m.nv - 6,), dtype, -0.5, 0.5))

        # terrain_limits order is (x_max, x_min, y_max, y_min); jax.random.uniform
        # clamps when minval > maxval (numpy tolerates swapped bounds), so order them
        x_max, x_min, y_max, y_min = m.terrain_limits
        xy = jnp.stack([
            jax.random.uniform(k3, (), dtype, min(x_min, x_max), max(x_min, x_max)),
            jax.random.uniform(k4, (), dtype, min(y_min, y_max), max(y_min, y_max))])
        qpos = qpos.at[0:2].set(xy)
        qpos = qpos.at[2].set(jnp.asarray(m.hip_height, dtype))

        roll_sweep = options.get('roll_sweep', 10 * math.pi / 180)
        pitch_sweep = options.get('pitch_sweep', 10 * math.pi / 180)
        k5a, k5b = jax.random.split(k5)
        # yaw faces the origin (reference angle_between_vectors semantics:
        # atan2 of (origin − spawn) — math_utils.py:37-51)
        theta = jnp.arctan2(-xy[1], -xy[0])
        euler = jnp.stack([
            jax.random.uniform(k5a, (), dtype, -roll_sweep, roll_sweep),
            jax.random.uniform(k5b, (), dtype, -pitch_sweep, pitch_sweep),
            theta])
        qpos = qpos.at[3:7].set(euler_xyz_to_quat(euler))
        return qpos, qvel

    def _lift_until_no_contact(self, qpos):
        """Raise base z until no foot touches ground, ≤100 iters
        (quadruped_env.py:376-388), as a bounded lax.while_loop."""
        m = self.model
        lay = constraint_layout(m)
        foot_slot = jnp.asarray(np.any(np.asarray(feet_slot_mask(m)) > 0, axis=0))
        margin = jnp.asarray(lay.con_incl, qpos.dtype)
        if foot_slot.shape[0] == 0:
            return qpos

        def feet_pen(q):
            c = collide(m, fk(m, q))
            act = (c.dist < margin) & foot_slot
            pen = jnp.where(act, jnp.abs(c.dist), 0.0)
            return jnp.any(act), jnp.max(pen)

        def cond(carry):
            _, i, in_contact, _ = carry
            return in_contact & (i < 100)

        def body(carry):
            q, i, _, max_pen = carry
            q = q.at[2].add(1.1 * max_pen)
            in_contact, pen = feet_pen(q)
            return q, i + 1, in_contact, pen

        in_contact0, pen0 = feet_pen(qpos)
        qpos, _, _, _ = jax.lax.while_loop(
            cond, body, (qpos, jnp.zeros((), jnp.int32), in_contact0, pen0))
        return qpos

    def reset(self, rng, qpos=None, qvel=None, options: dict | None = None,
              dtype=None) -> tuple[EnvState, dict]:
        """Pure reset (quadruped_env.py:309-406): sample/accept an initial state,
        lift out of penetration, run one zero-torque engine step, sample command +
        friction, return (state, obs)."""
        m = self.model
        dtype = dtype or jnp.zeros(0).dtype
        k_state, k_vel, k_fric, k_dist, k_next = jax.random.split(rng, 5)

        if qpos is None and qvel is None:
            qp, qv = self._randomize_qpos(k_state, dtype, options)
            qp = self._lift_until_no_contact(qp)
        else:
            qp = jnp.asarray(qpos, dtype)
            qv = jnp.asarray(qvel, dtype) if qvel is not None \
                else jnp.zeros(m.nv, dtype)

        ref_lin_H, yaw_dot, vel_steps = self._sample_ref_vel(k_vel, dtype)
        friction = self._sample_friction(k_fric, dtype)
        wrench, dist_steps = self._sample_disturbance(k_dist, dtype)

        # full pipeline refresh: one zero-ctrl step (reference mj_step at reset end,
        # quadruped_env.py:397)
        ctrl = jnp.zeros(m.nu, dtype)
        con_mu = runtime_con_mu(m, friction)
        qp2, qv2, fwd = engine.step(m, qp, qv, ctrl,
                                    solver_iterations=self.solver_iterations,
                                    con_mu=con_mu,
                                    max_contacts=self.max_contacts)

        k_next, k_sens = jax.random.split(k_next)
        sensor_states = tuple(
            s.init(k, dtype) for s, k in zip(
                self.sensors, jax.random.split(k_sens, max(len(self.sensors), 1))))
        state = EnvState(
            qpos=qp2, qvel=qv2, ctrl=ctrl, qacc=fwd.qacc,
            time=jnp.asarray(m.timestep, dtype),
            step_num=jnp.zeros((), jnp.int32), rng=k_next,
            ref_base_lin_vel_H=ref_lin_H, ref_base_ang_yaw_dot=yaw_dot,
            steps_until_resample_vel=vel_steps,
            external_wrench=wrench, steps_until_resample_wrench=dist_steps,
            geom_friction=friction, sensors=sensor_states)
        state = self._step_sensors(state, qp, qv, fwd)
        return state, self._obs(state, fwd)

    # ------------------------------------------------------------------ step

    def step(self, state: EnvState, action) -> tuple:
        """Pure step (quadruped_env.py:251-306). Returns
        (state', obs, reward, terminated, truncated, info)."""
        m = self.model
        dtype = state.qpos.dtype
        ctrl = jnp.asarray(action, dtype)

        qfrc_applied = None
        if self.external_disturbances_kwargs is not None:
            qfrc_applied = jnp.zeros(m.nv, dtype).at[:6].set(state.external_wrench)

        # Warm start from the previous step's qacc — MuJoCo's qacc_warmstart
        # semantics (mj_forward starts the constraint solver there). On easy
        # states it changes nothing, but on hard multi-contact states the cold
        # solver needs ~14 Newton iterations where the warm one converges in
        # ≤10 (measured at go2 tumble step 136: cold it=10 qacc err 25.8 vs
        # warm 4e-11) — without it, long-horizon parity breaks at 1e-3.
        con_mu = runtime_con_mu(m, state.geom_friction)
        qp, qv, fwd = engine.step(m, state.qpos, state.qvel, ctrl,
                                  qfrc_applied=qfrc_applied,
                                  warmstart=state.qacc,
                                  solver_iterations=self.solver_iterations,
                                  con_mu=con_mu,
                                  max_contacts=self.max_contacts)

        lay = constraint_layout(m)
        terminated = invalid_contact(m, lay, fwd) | self._out_of_bounds(qp)
        truncated = jnp.zeros((), bool)
        reward = jnp.zeros((), dtype)  # reference _compute_reward → 0 (:1141)

        # velocity-command / disturbance resampling on 'reset' command types
        rng = state.rng
        vel_steps = state.steps_until_resample_vel
        ref_lin_H, yaw_dot = state.ref_base_lin_vel_H, state.ref_base_ang_yaw_dot
        if self._lin_vel_table is not None or self._ang_vel_table is not None:
            # callable (time → velocity) commands: per-step table lookup
            t_new = state.time + jnp.asarray(m.timestep, dtype)
            idx = jnp.clip(jnp.round(t_new / self._vel_table_dt).astype(
                jnp.int32), 0,
                (self._lin_vel_table if self._lin_vel_table is not None
                 else self._ang_vel_table).shape[0] - 1)
            if self._lin_vel_table is not None:
                ref_lin_H = self._lin_vel_table[idx].astype(dtype)
            if self._ang_vel_table is not None:
                yaw_dot = self._ang_vel_table[idx].astype(dtype)
        elif 'reset' in self.base_vel_command_type:
            rng, k = jax.random.split(rng)
            new_lin, new_yaw, new_steps = self._sample_ref_vel(k, dtype)
            hit = vel_steps <= 1
            ref_lin_H = jnp.where(hit, new_lin, ref_lin_H)
            yaw_dot = jnp.where(hit, new_yaw, yaw_dot)
            vel_steps = jnp.where(hit, new_steps, vel_steps - 1)

        wrench = state.external_wrench
        dist_steps = state.steps_until_resample_wrench
        if (self.external_disturbances_kwargs is not None
                and self.external_disturbances_kwargs.get('type') == 'reset'):
            rng, k = jax.random.split(rng)
            new_wrench, new_steps = self._sample_disturbance(k, dtype)
            hit = dist_steps <= 1
            wrench = jnp.where(hit, new_wrench, wrench)
            dist_steps = jnp.where(hit, new_steps, dist_steps - 1)

        new_state = EnvState(
            qpos=qp, qvel=qv, ctrl=ctrl, qacc=fwd.qacc,
            time=state.time + jnp.asarray(m.timestep, dtype),
            step_num=state.step_num + 1, rng=rng,
            ref_base_lin_vel_H=ref_lin_H, ref_base_ang_yaw_dot=yaw_dot,
            steps_until_resample_vel=vel_steps,
            external_wrench=wrench, steps_until_resample_wrench=dist_steps,
            geom_friction=state.geom_friction, sensors=state.sensors)
        new_state = self._step_sensors(new_state, state.qpos, state.qvel, fwd)

        obs = self._obs(new_state, fwd)
        info = {'time': new_state.time, 'step_num': new_state.step_num,
                'invalid_contacts': invalid_contact(m, lay, fwd),
                'culled_contacts': self._culled_contacts(fwd)}
        return new_state, obs, reward, terminated, truncated, info

    def _culled_contacts(self, fwd):
        """Active-but-culled cone slots this step: touching slots beyond the
        max_contacts cap are silently dropped from the solve, so a nonzero
        counter flags that the cap needs raising for this scene."""
        lay = constraint_layout(self.model)
        cs = np.asarray(lay.cone_slots)
        if cs.size == 0 or cs.size <= self.max_contacts:
            return jnp.zeros((), jnp.int32)
        dtype = fwd.contacts.dist.dtype
        margin = jnp.asarray(np.asarray(lay.con_incl)[cs], dtype)
        touching = jnp.sum((fwd.contacts.dist[cs] < margin).astype(jnp.int32))
        return jnp.maximum(touching - self.max_contacts, 0)

    def _out_of_bounds(self, qpos):
        """quadruped_env.py:1250-1257 (terrain_limits = x_max, x_min, y_max, y_min)."""
        x_max, x_min, y_max, y_min = self.model.terrain_limits
        return ((qpos[0] > x_max) | (qpos[0] < x_min) |
                (qpos[1] > y_max) | (qpos[1] < y_min))

    def _step_sensors(self, state: EnvState, qpos_pre, qvel_pre, fwd) -> EnvState:
        """Advance every sensor's state pytree. Sensors see the PRE-integration
        (qpos, qvel) + Forward — MuJoCo computes sensordata inside mj_step's forward
        pass, so after a step sensordata reflects the pre-step state; the reference
        reads it there (quadruped_env.py:273-274, imu.py:102)."""
        if not self.sensors:
            return state
        new = tuple(s.step(ss, qpos_pre, qvel_pre, fwd)
                    for s, ss in zip(self.sensors, state.sensors))
        import dataclasses as _dc
        return _dc.replace(state, sensors=new)

    def _obs(self, state: EnvState, fwd) -> dict:
        core_names = [n for n in self.state_obs_names if not self._is_sensor_obs(n)]
        obs = obslib.compute_obs(
            self.model, core_names, state.qpos, state.qvel, state.ctrl, fwd,
            state.ref_base_lin_vel_H, state.ref_base_ang_yaw_dot)
        for name in self.state_obs_names:
            if self._is_sensor_obs(name):
                for sensor, ss in zip(self.sensors, state.sensors):
                    if name in sensor.available_observations():
                        obs[name] = sensor.get_observation(name, ss)
                        break
        return obs
