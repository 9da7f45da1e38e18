"""Windowed supervised dataset over recorded trajectories.

API-parity port of the reference ProprioceptiveDataset
(data/proprioceptive_datasets.py:11-278): sliding-window (x_frames → y_frames)
sampling over the H5 trajectory store, static/dynamic framing, per-observable
moment computation, trajectory subsetting, optional RAM/device preload.

Backend-agnostic core: windows are served as numpy views; a torch adapter exposes
the torch.utils.data.Dataset interface when torch is installed (torch is a
consumer-side dependency here — the simulator itself never imports it). For JAX
training, `as_jax_batches` yields stacked device-ready batches.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gym_quadruped_tpu.utils.data.h5 import H5Reader

try:
    import torch
    from torch.utils.data import Dataset as _TorchDataset
except ImportError:  # pragma: no cover
    torch = None
    _TorchDataset = object


def slices_from_traj_len(time_horizon: int, context_length: int,
                         time_lag: int = 1) -> list:
    """Context-window slices (reference _slices_from_traj_len, :209-237).

    >>> [(s.start, s.stop) for s in slices_from_traj_len(10, 4, 2)]
    [(0, 4), (2, 6), (4, 8), (6, 10)]
    """
    return [slice(s, s + context_length)
            for s in range(0, time_horizon - context_length + 1, time_lag)]


class ProprioceptiveDataset(_TorchDataset):
    """(x_frames → y_frames) windowed pairs over H5 trajectories."""

    def __init__(self, data_file, x_obs_names, y_obs_names,
                 x_frames: int = 1, y_frames: int = 1, mode: str = 'static',
                 load_to_memory: bool = False, dtype=None, device=None):
        assert x_frames > 0 and y_frames > 0, \
            'X and Y need at least one frame each.'
        self.x_frames, self.y_frames = x_frames, y_frames
        self.h5file = H5Reader(data_file)
        for name in list(x_obs_names) + list(y_obs_names):
            assert name in self.h5file.recordings, \
                f'Observation {name} not in {list(self.h5file.recordings)}'
        self.x_obs_names = list(x_obs_names)
        self.y_obs_names = list(y_obs_names)
        self.device = device
        self.dtype = dtype if dtype is not None else (
            torch.float32 if torch is not None else np.float32)
        self.mean_vars = {}
        self._mode = mode
        self._load_to_memory = load_to_memory
        self._traj_lengths = {}
        self._indices = []
        self._compute_sample_indices()
        self._memory_data = None
        if load_to_memory:
            self._load_dataset_to_memory()

    def _compute_sample_indices(self):
        first = self.x_obs_names[0]
        if self._mode == 'static':
            context = max(self.x_frames, self.y_frames)
        elif self._mode == 'dynamic':
            context = self.x_frames + self.y_frames
        else:
            raise ValueError(f"Mode {self._mode}: choose 'static' or 'dynamic'.")
        for tid in range(self.h5file.n_trajectories):
            T = self.h5file.recordings[first][tid].shape[0]
            self._indices.extend(
                [(tid, s) for s in slices_from_traj_len(T, context, 1)])
            self._traj_lengths[tid] = T
            for name in self.x_obs_names + self.y_obs_names:
                assert self.h5file.recordings[name][tid].shape[0] == T, \
                    f'{name} time dim mismatch in trajectory {tid}'

    # --------------------------------------------------------------- access

    @property
    def n_trajectories(self):
        return len(self._traj_lengths)

    @property
    def raw_data(self):
        return self._memory_data if self._load_to_memory \
            else self.h5file.recordings

    def _load_dataset_to_memory(self):
        self._memory_data = {}
        for name in self.x_obs_names + self.y_obs_names:
            trajs = []
            for tid in range(self.h5file.n_trajectories):
                arr = self.h5file.recordings[name][tid]
                if torch is not None and isinstance(self.dtype, torch.dtype):
                    arr = torch.tensor(arr).to(device=self.device,
                                               dtype=self.dtype)
                else:
                    arr = np.asarray(arr, self.dtype)
                trajs.append(arr)
            self._memory_data[name] = trajs

    def shuffle(self, seed=None):
        if seed is not None:
            np.random.seed(seed)
        np.random.shuffle(self._indices)

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, idx):
        tid, window = self._indices[idx]
        if self._mode == 'static':
            x_slice = slice(-self.x_frames, None)
            y_slice = slice(-self.y_frames, None)
        else:
            x_slice = slice(0, self.x_frames)
            y_slice = slice(-self.y_frames, None)
        x = {n: self.raw_data[n][tid][window][x_slice] for n in self.x_obs_names}
        y = {n: self.raw_data[n][tid][window][y_slice] for n in self.y_obs_names}
        return x, y

    # --------------------------------------------------------------- utilities

    def compute_obs_moments(self, obs_reps: dict | None = None):
        """Per-observable (mean, var); optionally symmetry-aware when group
        representations are given (reference :167-179)."""
        for name in self.x_obs_names + self.y_obs_names:
            trajs = [self.h5file.recordings[name][tid]
                     for tid in self._traj_lengths]
            data = np.concatenate(trajs, axis=0).astype(np.float32)
            if obs_reps is not None and name in obs_reps:
                from symmetric_learning.nn.symmetric.stats import var_mean

                var, mean = var_mean(torch.tensor(data), obs_reps[name])
                self.mean_vars[name] = (mean, var)
            else:
                self.mean_vars[name] = (data.mean(0), data.var(0))
        return self.mean_vars

    def subset_dataset(self, trajectory_ids) -> 'ProprioceptiveDataset':
        assert len(trajectory_ids) > 0
        sub = ProprioceptiveDataset(
            self.h5file.file_path, self.x_obs_names, self.y_obs_names,
            self.x_frames, self.y_frames, mode=self._mode,
            load_to_memory=self._load_to_memory, dtype=self.dtype,
            device=self.device)
        sub._indices = [i for i in self._indices if i[0] in trajectory_ids]
        for tid in list(sub._traj_lengths):
            if tid not in trajectory_ids:
                sub._traj_lengths.pop(tid)
        return sub

    def as_jax_batches(self, batch_size: int, seed: int = 0):
        """Generator of stacked numpy batches ready for jnp.asarray — the JAX
        training path (no torch DataLoader needed)."""
        order = np.random.RandomState(seed).permutation(len(self))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[j] for j in order[i:i + batch_size]]
            x = {n: np.stack([np.asarray(it[0][n]) for it in items])
                 for n in self.x_obs_names}
            y = {n: np.stack([np.asarray(it[1][n]) for it in items])
                 for n in self.y_obs_names}
            yield x, y

    def __repr__(self):
        return (f'{len(self._traj_lengths)} trajectories and '
                f'{len(self)} total samples.')
