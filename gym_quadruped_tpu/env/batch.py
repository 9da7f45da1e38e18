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
