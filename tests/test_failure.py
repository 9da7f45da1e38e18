"""NaN quarantine + batched EnvState checkpoint (SURVEY.md §5 rows 3-4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_quadruped_tpu.env.batch import bad_state_mask, quarantine_step
from gym_quadruped_tpu.env.env import QuadrupedEnv
from gym_quadruped_tpu.utils import checkpoint


@pytest.fixture(scope='module')
def env():
    return QuadrupedEnv(robot='go2', scene='flat',
                        state_obs_names=('qpos', 'qvel'))


@pytest.fixture(scope='module')
def batch_state(env):
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    return state


def test_quarantine_resets_nan_env(env, batch_state):
    state = batch_state
    # poison env 0 with a NaN base position
    qpos = state.qpos.at[0, 0].set(jnp.nan)
    import dataclasses
    state = dataclasses.replace(state, qpos=qpos)
    assert list(np.asarray(bad_state_mask(state))) == [True, False]

    action = jnp.zeros((2, env.model.nu), state.qpos.dtype)
    step = jax.jit(lambda s, a: quarantine_step(env, s, a))
    state2, obs, reward, term, trunc, info = step(state, action)

    assert int(info['quarantined']) == 1
    assert bool(term[0])
    # env 0 came back finite (auto-reset); env 1 stepped normally
    assert np.isfinite(np.asarray(state2.qpos)).all()
    assert not np.asarray(bad_state_mask(state2)).any()


def test_quarantine_noop_when_healthy(env, batch_state):
    action = jnp.zeros((2, env.model.nu), batch_state.qpos.dtype)
    step = jax.jit(lambda s, a: quarantine_step(env, s, a))
    state2, obs, reward, term, trunc, info = step(batch_state, action)
    assert int(info['quarantined']) == 0
    ref2, *_ = jax.jit(lambda s, a: jax.vmap(env.step)(s, a))(
        batch_state, action)
    np.testing.assert_array_equal(np.asarray(state2.qpos),
                                  np.asarray(ref2.qpos))


def test_checkpoint_roundtrip(tmp_path, batch_state):
    p = tmp_path / 'state.npz'
    checkpoint.save(p, batch_state)
    like = jax.tree.map(jnp.zeros_like, batch_state)
    restored = checkpoint.restore(p, like)
    for (kp_a, a), (kp_b, b) in zip(
            jax.tree_util.tree_flatten_with_path(batch_state)[0],
            jax.tree_util.tree_flatten_with_path(restored)[0]):
        assert jax.tree_util.keystr(kp_a) == jax.tree_util.keystr(kp_b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch(tmp_path, batch_state):
    p = tmp_path / 'state.npz'
    checkpoint.save(p, batch_state)
    import dataclasses
    wrong = dataclasses.replace(batch_state, qpos=batch_state.qpos[:1])
    with pytest.raises(KeyError):
        checkpoint.restore(p, wrong)


def test_rollout_with_sensors_cadence(env, batch_state):
    """Chunked sensor cadence (env/batch.py rollout_with_sensors): the sensor
    fires once per chunk and the carried dynamics match a plain step loop."""
    from gym_quadruped_tpu.env.batch import rollout_with_sensors

    B, nu = 2, env.model.nu
    T, chunk = 6, 3
    acts = jax.random.uniform(jax.random.PRNGKey(1), (T, B, nu),
                              batch_state.qpos.dtype, -1, 1)
    fired = []

    def sensor(s):
        return jnp.sum(s.qpos, axis=-1)  # stand-in for a camera readout

    step = jax.vmap(env.step)
    final, seq = jax.jit(lambda s, a: rollout_with_sensors(
        step, s, a, sensor, steps_per_chunk=chunk))(batch_state, acts)
    assert seq.shape == (T // chunk, B)

    # parity with a plain loop + manual sensor at chunk boundaries
    s = batch_state
    expect = []
    for t in range(T):
        s, *_ = jax.jit(step)(s, acts[t])
        if (t + 1) % chunk == 0:
            expect.append(np.asarray(sensor(s)))
    np.testing.assert_allclose(np.asarray(seq), np.stack(expect), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(final.qpos), np.asarray(s.qpos),
                               rtol=1e-12)


def test_rollout_with_sensors_rejects_ragged():
    from gym_quadruped_tpu.env.batch import rollout_with_sensors

    with pytest.raises(ValueError):
        rollout_with_sensors(lambda s, a: (s,), jnp.zeros(3),
                             jnp.zeros((5, 1)), lambda s: s, steps_per_chunk=2)
