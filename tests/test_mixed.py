"""Mixed-robot batch: one jitted program, per-env parity vs homogeneous runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_quadruped_tpu.env.env import QuadrupedEnv
from gym_quadruped_tpu.env.mixed import MixedQuadrupedEnv

OBS = ('qpos', 'qvel', 'contact_state')


@pytest.fixture(scope='module')
def mixed():
    return MixedQuadrupedEnv([('go2', 2), ('mini_cheetah', 2)], scene='flat',
                             state_obs_names=OBS)


def test_mixed_shapes_and_ids(mixed):
    assert mixed.batch_size == 4
    assert list(np.asarray(mixed.robot_ids)) == [0, 0, 1, 1]
    key = jax.random.PRNGKey(0)
    state, obs = jax.jit(mixed.reset)(key)
    assert obs['qpos'].shape == (4, mixed.nq_max)
    masks = mixed.obs_masks()
    assert masks['qpos'].shape == (4, mixed.nq_max)

    actions = jnp.zeros((4, mixed.nu_max))
    state, obs, reward, term, trunc, info = jax.jit(mixed.step)(state, actions)
    assert obs['qpos'].shape == (4, mixed.nq_max)
    assert reward.shape == (4,) and term.shape == (4,)
    assert info['step_num'].shape == (4,)


def test_mixed_matches_homogeneous(mixed):
    """Each group's envs in the mixed batch step EXACTLY like the same envs in
    a homogeneous batch (group partitioning is exact by construction — this
    guards the slicing/padding plumbing)."""
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, 4)
    state, _ = jax.jit(mixed.reset)(keys)
    actions = 0.5 * jax.random.normal(jax.random.PRNGKey(2),
                                      (4, mixed.nu_max))
    state2 = state
    for _ in range(3):
        state2, obs2, *_ = jax.jit(mixed.step)(state2, actions)

    for g, (env, sl) in enumerate(zip(mixed.groups, [slice(0, 2), slice(2, 4)])):
        s, _ = jax.jit(jax.vmap(env.reset))(keys[sl])
        step = jax.jit(lambda st, a, e=env: jax.vmap(e.step)(st, a))
        for _ in range(3):
            s, o, *_ = step(s, actions[sl, :env.model.nu])
        np.testing.assert_allclose(np.asarray(state2[g].qpos),
                                   np.asarray(s.qpos), rtol=0, atol=0)
        np.testing.assert_allclose(
            np.asarray(obs2['qpos'][sl, :env.model.nq]),
            np.asarray(o['qpos']), rtol=0, atol=0)
