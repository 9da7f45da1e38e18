"""Closed-loop locomotion gate: go2 trots at the commanded velocity.

The end-to-end acceptance test for the control stack (BASELINE north star):
centroidal MPC (H=12, 100 Hz replan) + swing/stance torque mapping + the full
contact physics, 2.4 s of sim time. Written as one jitted lax.scan so the whole
closed loop is a single XLA program (and the same code scales to a batch).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.env import QuadrupedEnv
from gym_quadruped_tpu.mpc import CentroidalMPC, GaitConfig, MPCConfig
from gym_quadruped_tpu.physics.constraints import _point_jacobians
from gym_quadruped_tpu.physics.kinematics import cdof, fk

VX = 0.4


def test_go2_trot_tracks_velocity_command():
    env = QuadrupedEnv('go2', state_obs_names=('qpos',), scene='flat')
    m = env.model
    mpc = CentroidalMPC(m, MPCConfig(gait=GaitConfig('trot', period=0.5),
                                     iterations=50))
    ref = jnp.array([VX, 0.0, 0.0])

    def tick(state, warm):
        kin = fk(m, state.qpos)
        cd = cdof(m, kin)
        feet = kin.geom_xpos[jnp.asarray(m.feet_geom_id)]
        jacp, _ = _point_jacobians(m, kin, cd, feet, m.feet_body_id)
        # warm-started replans (production regime: warm_iterations ADMM steps)
        forces, warm = mpc.solve(state.qpos, state.qvel, feet, state.time,
                                 ref, jnp.asarray(0.0), warmstart=warm)
        tau = mpc.torques(state.qpos, state.qvel, feet, jacp, forces[0],
                          state.time, ref)
        return tau, warm

    @jax.jit
    def run(key):
        state, _ = env.reset(key, qpos=jnp.asarray(m.key_qpos[0]),
                             qvel=jnp.zeros(m.nv))
        kin0 = fk(m, state.qpos)
        feet0 = kin0.geom_xpos[jnp.asarray(m.feet_geom_id)]
        _, warm0 = mpc.solve(state.qpos, state.qvel, feet0, state.time, ref,
                             jnp.asarray(0.0))   # cold solve seeds the carry

        def outer(carry, _):
            state, warm = carry
            tau, warm = tick(state, warm)

            def inner(s, __):
                s2, *_ = env.step(s, tau)
                return s2, None

            state, _ = jax.lax.scan(inner, state, None, length=5)
            return (state, warm), (state.qpos[2], state.qvel[0])

        (state, _), (zs, vxs) = jax.lax.scan(outer, (state, warm0), None,
                                             length=240)
        return state, zs, vxs

    state, zs, vxs = run(jax.random.PRNGKey(0))
    zs, vxs = np.asarray(zs), np.asarray(vxs)
    assert zs.min() > 0.18, f'robot fell: min z {zs.min():.3f}'
    assert zs.max() < 0.45, f'robot bounced: max z {zs.max():.3f}'
    vx_mean = vxs[120:].mean()
    assert abs(vx_mean - VX) < 0.12, \
        f'velocity tracking failed: {vx_mean:.3f} vs {VX}'
    # heading held (no yaw command)
    yaw_quat = np.asarray(state.qpos[3:7])
    assert abs(yaw_quat[3]) < 0.3, f'yaw drifted: quat {yaw_quat}'
