"""Mixed-robot batches: one jitted program stepping heterogeneous robots.

BASELINE config 5 (SURVEY.md §7 hard part (e)): a 4096-env batch containing
several robot models in one program. The TPU-native design is group partitioning,
not per-env dynamic dispatch: the batch is a concatenation of homogeneous
sub-batches (one per robot), each stepped by its own exact vmapped engine program
inside ONE jit — XLA compiles the groups into a single module and runs them
back-to-back on-device with no host round trips. Compared with padding Model
arrays to max(nq, nv, slots) per env, this wastes zero FLOPs on padding rows,
keeps every group's static contact layout/unrolls intact, and is exact by
construction (each sub-batch runs the same program as its homogeneous batch —
asserted in tests/test_mixed.py).

The user-facing surface is padded to the max dims across groups so callers can
treat the batch as one array-shaped thing:

    env = MixedQuadrupedEnv([('go2', 2048), ('aliengo', 1024),
                             ('mini_cheetah', 1024)], scene='flat')
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    state, obs, reward, term, trunc, info = jax.jit(env.step)(state, actions)

`actions` is (B, nu_max); each env reads its first nu entries. Obs arrays are
(B, dim_max) zero-padded; `env.obs_masks()` gives the valid-lane masks and
`env.robot_ids` the per-env group index.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.env.env import QuadrupedEnv


def _pad_to(x, dim):
    """Zero-pad the trailing axis of (G, d) → (G, dim)."""
    if x.shape[-1] == dim:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, dim - x.shape[-1])]
    return jnp.pad(x, pad)


class MixedQuadrupedEnv:
    """Group-partitioned mixed-robot batch. See module docstring."""

    def __init__(self, robots: Sequence[tuple], scene: str = 'flat',
                 state_obs_names=QuadrupedEnv._DEFAULT_OBS, **kwargs):
        """robots: sequence of (robot, count) or (robot, count, extra_kwargs)
        — extra_kwargs (e.g. per-group sensors) override the shared kwargs."""
        assert len(robots) > 0
        self.groups = []
        self.counts = []
        for entry in robots:
            robot, count = entry[0], entry[1]
            extra = dict(entry[2]) if len(entry) > 2 else {}
            assert count > 0
            self.groups.append(QuadrupedEnv(
                robot, scene=scene,
                state_obs_names=extra.pop('state_obs_names', state_obs_names),
                **{**kwargs, **extra}))
            self.counts.append(int(count))
        self.batch_size = sum(self.counts)
        self.state_obs_names = tuple(state_obs_names)

        self.nq_max = max(e.model.nq for e in self.groups)
        self.nv_max = max(e.model.nv for e in self.groups)
        self.nu_max = max(e.model.nu for e in self.groups)
        # obs surface = union over groups (a group without a name contributes
        # zeros there — e.g. a camera obs only the camera-equipped robot has)
        self._group_dims = [e.observation_space_dims() for e in self.groups]
        names = list(self.state_obs_names)
        for gd in self._group_dims:
            names.extend(n for n in gd if n not in names)
        self.obs_names = tuple(names)
        self._obs_dims = {
            name: max(gd.get(name, 0) for gd in self._group_dims)
            for name in self.obs_names}

        ids = np.concatenate([
            np.full(c, g, np.int32) for g, c in enumerate(self.counts)])
        self.robot_ids = jnp.asarray(ids)

    # ------------------------------------------------------------------ masks

    def obs_masks(self) -> dict:
        """name → (B, dim_max) float 0/1 mask of valid lanes per env."""
        masks = {}
        for name, dmax in self._obs_dims.items():
            rows = []
            for gd, count in zip(self._group_dims, self.counts):
                row = np.zeros(dmax, np.float32)
                row[:gd.get(name, 0)] = 1.0
                rows.append(np.tile(row, (count, 1)))
            masks[name] = jnp.asarray(np.concatenate(rows))
        return masks

    def action_masks(self) -> jnp.ndarray:
        """(B, nu_max) float 0/1 mask of valid actuator lanes per env."""
        rows = []
        for env, count in zip(self.groups, self.counts):
            row = np.zeros(self.nu_max, np.float32)
            row[:env.model.nu] = 1.0
            rows.append(np.tile(row, (count, 1)))
        return jnp.asarray(np.concatenate(rows))

    # ------------------------------------------------------------- reset/step

    def _split(self, x):
        """(B, ...) → per-group slices (static boundaries)."""
        out, i = [], 0
        for c in self.counts:
            out.append(x[i:i + c])
            i += c
        return out

    def _merge_obs(self, per_group_obs) -> dict:
        obs = {}
        for name in self.obs_names:
            dmax = self._obs_dims[name]
            parts = []
            for o, count in zip(per_group_obs, self.counts):
                if name in o:
                    parts.append(_pad_to(o[name], dmax))
                else:
                    dt = next(iter(o.values())).dtype
                    parts.append(jnp.zeros((count, dmax), dt))
            obs[name] = jnp.concatenate(parts)
        return obs

    def reset(self, rng) -> tuple:
        """rng: a single key or (B,) keys → (state tuple, padded obs dict)."""
        keys = (jax.random.split(rng, self.batch_size)
                if jnp.ndim(rng) == 1 else rng)
        states, obses = [], []
        for env, ks in zip(self.groups, self._split(keys)):
            s, o = jax.vmap(env.reset)(ks)
            states.append(s)
            obses.append(o)
        return tuple(states), self._merge_obs(obses)

    def step(self, state, action) -> tuple:
        """state: per-group EnvState tuple; action: (B, nu_max)."""
        acts = self._split(action)
        states, obses, rewards, terms, truncs, infos = [], [], [], [], [], []
        for env, s, a in zip(self.groups, state, acts):
            s2, o, r, te, tr, info = jax.vmap(env.step)(s, a[:, :env.model.nu])
            states.append(s2)
            obses.append(o)
            rewards.append(r)
            terms.append(te)
            truncs.append(tr)
            infos.append(info)
        # every info leaf is per-env (vmap batches constants too) → concat
        info = {k: jnp.concatenate([i[k] for i in infos]) for k in infos[0]}
        return (tuple(states), self._merge_obs(obses),
                jnp.concatenate(rewards), jnp.concatenate(terms),
                jnp.concatenate(truncs), info)

    # ------------------------------------------------------- padded state view

    def padded_qpos(self, state) -> jnp.ndarray:
        """(B, nq_max) zero-padded qpos across groups (monitoring/logging)."""
        return jnp.concatenate([_pad_to(s.qpos, self.nq_max) for s in state])

    def padded_qvel(self, state) -> jnp.ndarray:
        return jnp.concatenate([_pad_to(s.qvel, self.nv_max) for s in state])
