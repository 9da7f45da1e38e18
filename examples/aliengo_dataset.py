"""Record a batched dataset, read it back, reconstruct the env from the file.

Port of the reference examples/aliengo_dataset.py (record → read → reconstruct)
with the TPU-native twist: episodes are simulated as ONE vmapped batch instead of
a serial Python loop, then written to the same H5 schema the reference tooling
reads. (The reference example is stale — it imports a nonexistent module,
SURVEY.md §8.3; this is the working equivalent.)

Run: python examples/aliengo_dataset.py  [--episodes 4 --steps 200]
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

OBS = ('qpos', 'qvel', 'base_lin_vel', 'base_ang_vel', 'feet_pos:base',
       'contact_state')


def record(path: str, episodes: int, steps: int):
    env = QuadrupedEnv('aliengo', state_obs_names=OBS, scene='flat',
                       base_vel_command_type='random',
                       ref_base_lin_vel=(-1.0, 1.0))
    writer = H5Writer(path, env=env)

    keys = jax.random.split(jax.random.PRNGKey(0), episodes)
    state, obs = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))

    traj = {k: [np.asarray(v)] for k, v in obs.items()}
    actions = [np.zeros((episodes, env.model.nu))]
    times = [np.asarray(state.time)]
    rng = np.random.RandomState(0)
    for _ in range(steps - 1):
        a = jnp.asarray(rng.uniform(-5, 5, (episodes, env.model.nu)))
        state, obs, reward, term, trunc, info = step(state, a)
        for k, v in obs.items():
            traj[k].append(np.asarray(v))
        actions.append(np.asarray(a))
        times.append(np.asarray(state.time))

    batch = {k: np.stack(v, axis=1) for k, v in traj.items()}
    batch['action'] = np.stack(actions, axis=1)
    writer.append_batch(batch, np.stack(times, axis=1))
    print(f'wrote {episodes} episodes × {steps} steps to {path}')


def read_back(path: str):
    reader = H5Reader(path)
    print(f'{reader.n_trajectories} episodes; env_hparams: '
          f'{ {k: v for k, v in reader.env_hparams.items() if k != "state_obs_names"} }')
    # env reconstruction from the file (reference round-trip property)
    env2 = QuadrupedEnv(**reader.env_hparams)
    print(f'reconstructed env: {env2.robot_name} / {env2.scene_name}')

    dataset = ProprioceptiveDataset(
        path, x_obs_names=['qpos', 'qvel'], y_obs_names=['contact_state'],
        x_frames=10, y_frames=1, mode='dynamic')
    x, y = dataset[0]
    print(f'{dataset} — x window qpos {np.asarray(x["qpos"]).shape}, '
          f'y {np.asarray(y["contact_state"]).shape}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--episodes', type=int, default=4)
    p.add_argument('--steps', type=int, default=200)
    p.add_argument('--path', default='/tmp/aliengo_dataset.h5')
    args = p.parse_args()
    record(args.path, args.episodes, args.steps)
    read_back(args.path)
