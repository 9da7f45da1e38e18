"""HDF5 trajectory store — file-format compatible with the reference.

Schema identical to the reference utils/data/h5py.py:90-213: a `recordings` group
with per-observable datasets shaped (episode, time, *obs_shape) (resizable), a
`time` dataset (episode, time, 1), an `action` dataset, and an `env_hparams` group
storing the env constructor kwargs (lists JSON-encoded in attrs, classes as
'TYPE:module.Class' strings) so the env can be reconstructed from the file
(`QuadrupedEnv(**reader.env_hparams)` — examples/aliengo_dataset.py:154-166).

Batched extension: `append_batch` writes a whole (B, T, ...) vmapped rollout as B
episodes in one call — the natural output of the TPU batch simulator.
"""

from __future__ import annotations

import importlib
import json
from pathlib import Path

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def save_dict_to_h5(h5group, data: dict):
    """Recursively save a nested dict to an HDF5 group (h5py.py:23-48 contract)."""
    for key, value in data.items():
        if isinstance(value, dict):
            save_dict_to_h5(h5group.require_group(key), value)
        elif isinstance(value, (list, tuple)):
            try:
                h5group.attrs[key] = json.dumps(value)
            except TypeError:
                first = value[0]
                if isinstance(first, type):
                    h5group.attrs[key] = json.dumps(
                        [f'TYPE:{v.__module__}.{v.__name__}' for v in value])
                else:
                    raise NotImplementedError(
                        f'Cannot store {type(first)} objects')
        elif isinstance(value, (str, int, float, bool, np.ndarray, np.number)):
            h5group.attrs[key] = value
        elif value is None:
            pass
        else:
            raise TypeError(f"Cannot save type {type(value)} for key '{key}'")


def load_dict_from_h5(h5group) -> dict:
    """Recursively load a nested dict (h5py.py:51-88 contract, incl. TYPE: refs)."""

    def import_class(ref: str):
        module_name, class_name = ref.split(':', 1)[1].rsplit('.', 1)
        return getattr(importlib.import_module(module_name), class_name)

    data = {}
    for key, value in h5group.attrs.items():
        try:
            decoded = json.loads(value)
            if isinstance(decoded, list):
                decoded = [import_class(e) if isinstance(e, str) and
                           e.startswith('TYPE:') else e for e in decoded]
            data[key] = decoded
        except (json.JSONDecodeError, TypeError):
            data[key] = value
    for key, sub in h5group.items():
        if isinstance(sub, h5py.Group):
            data[key] = load_dict_from_h5(sub)
    return data


class H5Writer:
    """Trajectory writer (reference H5Writer, h5py.py:90-172).

    Args:
        file_path: output .h5 path.
        env: any object exposing observation_space_dims() -> {name: dim},
            model.nu, and get_hyperparameters() — the functional QuadrupedEnv and
            the gym adapter both qualify.
        extra_obs: {name: obs_shape tuple} additional datasets.
    """

    def __init__(self, file_path, env=None, obs_dims: dict | None = None,
                 action_dim: int | None = None, env_hparams: dict | None = None,
                 extra_obs: dict | None = None):
        if h5py is None:
            raise ImportError('h5py is required for dataset recording')
        if env is not None:
            core = getattr(env, 'core', env)
            obs_dims = obs_dims or core.observation_space_dims()
            action_dim = action_dim if action_dim is not None else core.model.nu
            env_hparams = env_hparams or core.get_hyperparameters()
        self.file_path = Path(file_path)
        self.file_path.parent.mkdir(parents=True, exist_ok=True)

        with h5py.File(self.file_path, 'w') as hf:
            save_dict_to_h5(hf.create_group('env_hparams'), env_hparams or {})
            rec = hf.create_group('recordings')
            rec.create_dataset('time', shape=(0, 0, 1), maxshape=(None, None, 1),
                               dtype='float64')
            for key, dim in (obs_dims or {}).items():
                shape = (dim,) if np.isscalar(dim) else tuple(dim)
                rec.create_dataset(key, shape=(0, 0) + shape,
                                   maxshape=(None, None) + shape, dtype='float64')
            if action_dim:
                rec.create_dataset('action', shape=(0, 0, action_dim),
                                   maxshape=(None, None, action_dim),
                                   dtype='float64')
            for key, shape in (extra_obs or {}).items():
                shape = tuple(shape)
                rec.create_dataset(key, shape=(0, 0) + shape,
                                   maxshape=(None, None) + shape, dtype='float64')

    def append_trajectory(self, state_obs_traj: dict, time: np.ndarray):
        """Append one episode: each value (T, *obs_shape), time (T, 1)."""
        time = np.asarray(time).reshape(-1, 1)
        T = time.shape[0]
        for key, value in state_obs_traj.items():
            if np.asarray(value).shape[0] != T:
                raise ValueError(f'Observation {key} has inconsistent time steps: '
                                 f'{np.asarray(value).shape[0]} vs {T}')
        with h5py.File(self.file_path, 'a') as hf:
            rec = hf['recordings']
            e = rec['time'].shape[0]
            rec['time'].resize((e + 1, T, 1))
            rec['time'][e] = time
            for key, value in state_obs_traj.items():
                value = np.asarray(value)
                ds = rec[key]
                ds.resize((e + 1, T) + value.shape[1:])
                ds[e] = value

    def append_batch(self, batch_obs_traj: dict, time: np.ndarray):
        """Append a vmapped rollout: each value (B, T, *obs_shape), time (B, T)
        or (T,) shared across the batch."""
        sample = next(iter(batch_obs_traj.values()))
        B, T = np.asarray(sample).shape[:2]
        time = np.asarray(time)
        if time.ndim == 1:
            time = np.broadcast_to(time, (B, T))
        for b in range(B):
            self.append_trajectory({k: np.asarray(v)[b]
                                    for k, v in batch_obs_traj.items()},
                                   time[b].reshape(-1, 1))


class H5Reader:
    """Trajectory reader (reference H5Reader, h5py.py:175-213)."""

    def __init__(self, file_path):
        if h5py is None:
            raise ImportError('h5py is required for dataset reading')
        self.file_path = Path(file_path)
        assert self.file_path.exists(), f'File not found: {self.file_path}'
        self.h5py_file = h5py.File(self.file_path, 'r')
        self.recordings = self.h5py_file['recordings']
        self.env_hparams = load_dict_from_h5(self.h5py_file['env_hparams'])
        self.n_trajectories = self.recordings['time'].shape[0]

    def len(self):
        return self.n_trajectories

    def get_trajectory(self, traj_idx):
        time = self.recordings['time'][traj_idx]
        traj_data = {key: self.recordings[key][traj_idx]
                     for key in self.recordings if key != 'time'}
        return time, traj_data

    def close(self):
        self.h5py_file.close()
