"""Env-layer integration tests.

Ports the reference's smoke matrix (tests/env_test.py:14-51: robots × terrains,
ALL_OBS shape checks, reset variants, random-torque steps) and adds batching (vmap)
checks the reference has no equivalent of.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_quadruped_tpu.env import ALL_OBS, QuadrupedEnv

COMBOS = [
    ('mini_cheetah', 'flat'),     # pyramidal cone path
    ('go2', 'flat'),              # elliptic cone path (go2.xml:4)
    ('mini_cheetah', 'perlin'),   # heightfield collision
]


@pytest.fixture(scope='module', params=COMBOS, ids=[f'{r}-{s}' for r, s in COMBOS])
def env(request):
    robot, scene = request.param
    return QuadrupedEnv(
        robot, state_obs_names=ALL_OBS, scene=scene,
        base_vel_command_type='random', ref_base_lin_vel=(-1.0, 1.0),
        ref_base_ang_vel=(-0.5, 0.5), ground_friction_coeff=(0.5, 1.5))


def test_reset_variants(env):
    key = jax.random.PRNGKey(42)
    reset = jax.jit(lambda k: env.reset(k))
    s1, obs1 = reset(key)
    s2, _ = reset(key)
    np.testing.assert_allclose(s1.qpos, s2.qpos)  # same seed → same state

    s3, _ = reset(jax.random.PRNGKey(7))
    assert not np.allclose(s1.qpos, s3.qpos)      # different seed → different

    # explicit state reset (reference env_test.py:32)
    m = env.model
    qpos0, qvel0 = m.key_qpos[0], np.zeros(m.nv)
    s4, _ = jax.jit(lambda k: env.reset(k, qpos=jnp.asarray(qpos0),
                                        qvel=jnp.asarray(qvel0)))(key)
    assert np.isfinite(np.asarray(s4.qpos)).all()


def test_obs_shapes_and_steps(env):
    """Reference env_test.py:35-51: every observable matches its declared dim;
    10 random-torque steps produce finite states."""
    key = jax.random.PRNGKey(0)
    state, obs = jax.jit(lambda k: env.reset(k))(key)
    dims = env.observation_space_dims()
    assert set(obs.keys()) == set(ALL_OBS)
    for name, v in obs.items():
        assert v.shape == (dims[name],), f'{name}: {v.shape} != {dims[name]}'

    step = jax.jit(env.step)
    rng = np.random.RandomState(0)
    for _ in range(10):
        a = jnp.asarray(rng.uniform(-2, 2, env.model.nu))
        state, obs, reward, term, trunc, info = step(state, a)
        assert np.isfinite(np.asarray(state.qpos)).all()
        assert np.isfinite(np.asarray(state.qvel)).all()
    assert float(reward) == 0.0  # reference reward stub (quadruped_env.py:1141)
    assert int(state.step_num) == 10


def test_vmap_batching(env):
    """4-env batch: vmapped reset/step agree elementwise with single-env calls."""
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    bstate, bobs = jax.jit(jax.vmap(env.reset))(keys)
    a = jnp.zeros((4, env.model.nu))
    bstate2, bobs2, br, bterm, btrunc, binfo = jax.jit(jax.vmap(env.step))(bstate, a)

    # batched and single-env programs fuse differently under XLA; the iterative
    # Newton solve amplifies the last-ulp differences, so compare at 1e-6
    s0, _ = jax.jit(lambda k: env.reset(k))(keys[0])
    s0b, obs0b, *_ = jax.jit(env.step)(s0, a[0])
    np.testing.assert_allclose(np.asarray(bstate2.qpos[0]), np.asarray(s0b.qpos),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bobs2['qvel'][0]),
                               np.asarray(obs0b['qvel']), rtol=0, atol=1e-6)


# ---------------------------------------------------------------------------------
# Broad robots × terrains smoke matrix (reference tests/env_test.py:14-15:
# 7 robots × {flat, perlin} with ALL_OBS; we add spot). The two combos the
# fast suite must always cover (spot/flat, hyqreal1/flat — precompiled
# archives that round 2 never stepped) run unconditionally; the rest are
# nightly (RUN_SLOW=1): each env costs minutes of x64-CPU compile.
# ---------------------------------------------------------------------------------

SMOKE_ROBOTS = ('b2', 'go1', 'go2', 'hyqreal1', 'hyqreal2', 'mini_cheetah',
                'aliengo', 'spot')
FAST_SMOKE = {('spot', 'flat'), ('hyqreal1', 'flat')}
SMOKE_MATRIX = [(r, s) for r in SMOKE_ROBOTS for s in ('flat', 'perlin')]


@pytest.mark.parametrize('robot,scene', SMOKE_MATRIX,
                         ids=[f'{r}-{s}' for r, s in SMOKE_MATRIX])
def test_smoke_matrix(robot, scene):
    """Construct with ALL_OBS, reset (seeded + explicit-state), step 10 random
    torques, check every observable's declared shape — the reference's smoke
    matrix (env_test.py:17-53)."""
    import os
    if (robot, scene) not in FAST_SMOKE and not os.environ.get('RUN_SLOW'):
        pytest.skip('full smoke matrix is nightly-only (RUN_SLOW=1)')
    env = QuadrupedEnv(robot, state_obs_names=ALL_OBS, scene=scene,
                       base_vel_command_type='forward+rotate',
                       ref_base_lin_vel=(0.5, 1.0),
                       ground_friction_coeff=(0.2, 1.5))
    key = jax.random.PRNGKey(1)
    state, obs = jax.jit(env.reset)(key)
    # explicit-state reset variant (reference env_test.py:32)
    state, obs = jax.jit(lambda k, qp, qv: env.reset(k, qpos=qp, qvel=qv))(
        key, state.qpos, state.qvel)

    dims = env.observation_space_dims()
    assert set(obs.keys()) == set(ALL_OBS)
    for name, v in obs.items():
        assert v.shape == (dims[name],), f'{name}: {v.shape} != {dims[name]}'

    step = jax.jit(env.step)
    rng = np.random.RandomState(0)
    for _ in range(10):
        a = jnp.asarray(rng.uniform(-2, 2, env.model.nu))
        state, obs, reward, term, trunc, info = step(state, a)
    assert np.isfinite(np.asarray(state.qpos)).all()
    assert np.isfinite(np.asarray(state.qvel)).all()
