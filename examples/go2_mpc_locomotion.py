"""go2 trots under the centroidal MPC — the full TPU-native control stack.

New-scope demo per BASELINE.json: velocity-command tracking MPC at H=12 (100 Hz
replan, 500 Hz sim) on the batched physics engine. The same `tick`/`step`
functions vmap over thousands of envs unchanged.

Run: python examples/go2_mpc_locomotion.py [--vx 0.4 --seconds 3.0]
"""

import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:  # examples run without the package installed
    _sys.path.insert(0, _repo)

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.env import QuadrupedEnv
from gym_quadruped_tpu.mpc import CentroidalMPC, MPCConfig, GaitConfig
from gym_quadruped_tpu.physics.constraints import _point_jacobians
from gym_quadruped_tpu.physics.kinematics import cdof, fk


def main(vx: float, seconds: float, record: str | None):
    env = QuadrupedEnv('go2', state_obs_names=('qpos', 'qvel', 'contact_state'),
                       scene='flat', base_vel_command_type='forward',
                       ref_base_lin_vel=vx)
    m = env.model
    mpc = CentroidalMPC(m, MPCConfig(gait=GaitConfig('trot', period=0.5),
                                     iterations=50))
    ref = jnp.array([vx, 0.0, 0.0])

    def _tick(state, warm):
        kin = fk(m, state.qpos)
        cd = cdof(m, kin)
        feet = kin.geom_xpos[jnp.asarray(m.feet_geom_id)]
        jacp, _ = _point_jacobians(m, kin, cd, feet, m.feet_body_id)
        # warm=None -> cold solve (first replan); afterwards each replan is
        # warm-started from the previous one (cfg.warm_iterations ADMM steps)
        forces, warm = mpc.solve(state.qpos, state.qvel, feet, state.time,
                                 ref, jnp.asarray(0.0), warmstart=warm)
        tau = mpc.torques(state.qpos, state.qvel, feet, jacp, forces[0],
                          state.time, ref)
        return tau, warm

    tick_cold = jax.jit(lambda s: _tick(s, None))
    tick_warm = jax.jit(_tick)

    step = jax.jit(env.step)
    state, _ = jax.jit(lambda k: env.reset(
        k, qpos=jnp.asarray(m.key_qpos[0]), qvel=jnp.zeros(m.nv)))(
            jax.random.PRNGKey(0))

    n_steps = int(seconds / m.timestep)
    replan = 5  # 100 Hz
    tau, warm = tick_cold(state)
    qpos_hist, vxs = [], []
    t0 = time.time()
    for i in range(n_steps):
        if i % replan == 0:
            tau, warm = tick_warm(state, warm)
        state, obs, reward, term, trunc, info = step(state, tau)
        qpos_hist.append(np.asarray(state.qpos))
        vxs.append(float(state.qvel[0]))
        if (i + 1) % 500 == 0:
            print(f't={float(state.time):.2f}s  z={float(state.qpos[2]):.3f}  '
                  f'vx(last s)={np.mean(vxs[-500:]):.3f}  '
                  f'contacts={np.asarray(obs["contact_state"])}')
    print(f'{n_steps} steps + {n_steps // replan} MPC solves in '
          f'{time.time() - t0:.1f}s wall')

    if record:
        from gym_quadruped_tpu.utils.data import H5Writer

        w = H5Writer(record, obs_dims={'qpos': m.nq}, action_dim=m.nu,
                     env_hparams=env.get_hyperparameters())
        w.append_trajectory({'qpos': np.stack(qpos_hist)},
                            np.arange(n_steps)[:, None] * m.timestep)
        print(f'recorded to {record} — replay with '
              f'gym_quadruped_tpu.utils.replay.replay_h5')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--vx', type=float, default=0.4)
    p.add_argument('--seconds', type=float, default=3.0)
    p.add_argument('--record', default=None)
    main(**vars(p.parse_args()))
