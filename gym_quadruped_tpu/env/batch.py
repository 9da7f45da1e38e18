"""Batched stepping with NaN quarantine + in-batch auto-reset.

SURVEY.md §5 (failure detection): a diverged env (NaN/Inf state from an extreme
contact configuration) must not silently poison batch statistics. The reference
cannot diverge this way (MuJoCo warns and auto-resets via mj_warning); the
batched TPU analog is: detect non-finite / exploded states after each step and
replace those envs with freshly reset states inside the same jitted program.

The reset fan-in is wrapped in a batch-level `lax.cond` on `any(bad)`: in the
common all-healthy case the program only pays the finiteness reduction, not the
reset computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# |qvel| beyond this is treated as diverged even when still finite: contact
# resolution at 500 Hz never produces multi-km/s joint speeds in a valid state.
QVEL_EXPLODED = 1e6


def bad_state_mask(state) -> jnp.ndarray:
    """(B,) bool: envs whose state is non-finite or exploded."""
    qp_ok = jnp.all(jnp.isfinite(state.qpos), axis=-1)
    qv = state.qvel
    qv_ok = jnp.all(jnp.isfinite(qv) & (jnp.abs(qv) < QVEL_EXPLODED), axis=-1)
    return ~(qp_ok & qv_ok)


def rollout_with_sensors(step_fn, state, actions, sensor_fn,
                         steps_per_chunk: int):
    """Scan `step_fn` over `actions`, firing `sensor_fn` every `steps_per_chunk`
    physics steps — the supported batched cadence pattern for expensive
    sensors (cameras).

    The reference gates its camera by wall-clock fps
    (/root/reference/gym_quadruped/sensors/rgbd_camera.py:32-33: render only
    when sim_time advances past 1/fps). Under `vmap`/`jit` a per-step
    `lax.cond` fps gate is useless: XLA executes BOTH branches, so a B=4096
    batch would pay the full render cost every physics step. The TPU-idiomatic
    equivalent is structural: scan fixed-size chunks of `steps_per_chunk`
    steps and render once per chunk boundary (e.g. 16 steps at dt=0.002 ==
    the reference's ~30 fps cadence). Single-env/interactive use keeps the
    in-step gated path (sensors/rgbd_camera.py Camera.step).

    Args:
      step_fn: `(state, action) -> (state, *rest)` — an already-batched step
        (e.g. `jax.vmap(env.step)` or `MixedQuadrupedEnv.step`). Only the
        first output is carried.
      state: initial (batched) EnvState pytree.
      actions: `(T, ...)` action sequence; `T` must be a multiple of
        `steps_per_chunk`.
      sensor_fn: `(state) -> pytree` — the sensor readout fired once per
        chunk (e.g. a batched `Camera.shoot` over `state.qpos`).
      steps_per_chunk: physics steps between sensor firings.

    Returns:
      `(final_state, sensor_seq)` where `sensor_seq` is `sensor_fn`'s output
      stacked over the `T // steps_per_chunk` chunk boundaries.
    """
    n_steps = actions.shape[0]
    if n_steps % steps_per_chunk != 0:
        raise ValueError(
            f'actions length {n_steps} not a multiple of '
            f'steps_per_chunk={steps_per_chunk}')
    n_chunks = n_steps // steps_per_chunk
    acts = actions.reshape((n_chunks, steps_per_chunk) + actions.shape[1:])

    def chunk(s, a_chunk):
        def body(s2, a):
            out = step_fn(s2, a)
            return out[0], None

        s, _ = jax.lax.scan(body, s, a_chunk)
        return s, sensor_fn(s)

    return jax.lax.scan(chunk, state, acts)


def quarantine_step(env, state, action):
    """vmap(env.step) with NaN quarantine.

    Returns (state', obs, reward, terminated, truncated, info); diverged envs
    are re-initialized from their own rng stream, reported `terminated=True`,
    and counted in info['quarantined'] (a scalar). jit-able; batch axis leading.
    """
    state2, obs, reward, term, trunc, info = jax.vmap(env.step)(state, action)
    bad = bad_state_mask(state2)

    def merge(_):
        keys = jax.vmap(lambda k: jax.random.split(k)[1])(state2.rng)
        fresh_state, fresh_obs = jax.vmap(env.reset)(keys)

        def sel(f, s):
            b = bad.reshape(bad.shape + (1,) * (f.ndim - 1))
            return jnp.where(b, f, s)

        st = jax.tree.map(sel, fresh_state, state2)
        ob = jax.tree.map(sel, fresh_obs, obs)
        return st, ob

    state3, obs3 = jax.lax.cond(jnp.any(bad), merge,
                                lambda _: (state2, obs), None)
    term = term | bad
    info = dict(info)
    info['quarantined'] = jnp.sum(bad.astype(jnp.int32))
    return state3, obs3, reward, term, trunc, info
