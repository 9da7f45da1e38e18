"""Callable velocity commands (reference VelCallable, quadruped_env.py:68,92).

The reference type-hints `ref_base_lin_vel`/`ref_base_ang_vel` as
time → velocity callables; here they are tabulated at construction and looked
up by sim time inside the jitted step (env/env.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from gym_quadruped_tpu.env.env import QuadrupedEnv


def test_callable_velocity_commands():
    def lin(t):
        return np.array([0.2 + 0.1 * t, 0.05, 0.0])

    def ang(t):
        return 0.3 - 0.05 * t

    env = QuadrupedEnv('go2', scene='flat', base_vel_command_type='forward',
                       ref_base_lin_vel=lin, ref_base_ang_vel=ang)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(state.ref_base_lin_vel_H),
                               lin(0.0), atol=1e-6)
    step = jax.jit(env.step)
    a = jnp.zeros(env.model.nu)
    for _ in range(3):
        state, *_ = step(state, a)
    t = float(state.time)
    np.testing.assert_allclose(np.asarray(state.ref_base_lin_vel_H), lin(t),
                               atol=1e-5)
    np.testing.assert_allclose(float(state.ref_base_ang_yaw_dot), ang(t),
                               atol=1e-5)
