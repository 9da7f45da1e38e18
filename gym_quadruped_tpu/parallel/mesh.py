"""Device-mesh utilities: shard the env batch over TPU chips and hosts.

The reference has no parallelism of any kind (SURVEY.md §2: one serial MjData).
This module supplies the TPU-native scale-out path: env-batch data parallelism over
a (dcn=hosts, ici=chips) mesh. The batch axis is embarrassingly parallel, so the
program is `vmap(env.step)` + sharding constraints; XLA partitions it with zero
communication, and cross-chip collectives only appear in reductions (metrics, MPC).

Usage:
    mesh = make_mesh()                      # all visible devices
    reset, step = shard_env(env, mesh)      # jitted, batch sharded over the mesh
    state, obs = reset(jax.random.split(key, 4096))
"""

from __future__ import annotations

import functools

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=('dcn', 'ici')) -> Mesh:
    """Mesh over (hosts × local chips). With a single process this is
    (1, n_devices); under jax.distributed it spans all hosts."""
    devices = devices if devices is not None else jax.devices()
    n_hosts = max(jax.process_count(), 1)
    per_host = len(devices) // n_hosts
    dev_array = np.asarray(devices).reshape(n_hosts, per_host)
    return Mesh(dev_array, axis_names)


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding the leading (env-batch) axis over every mesh axis."""
    return P(mesh.axis_names)


def shard_env(env, mesh: Mesh):
    """(reset, step) jitted with the env batch sharded over the mesh.

    reset: (B,) keys → (EnvState_B, obs_B);  step: (EnvState_B, (B, nu)) → ...
    B must be divisible by the mesh size.
    """
    spec = batch_spec(mesh)
    shard = NamedSharding(mesh, spec)
    repl = NamedSharding(mesh, P())

    def shard_tree(tree):
        return jax.tree.map(lambda _: shard, tree)

    reset = jax.jit(jax.vmap(env.reset), in_shardings=(shard,))
    step = jax.jit(jax.vmap(env.step))

    def reset_fn(keys):
        keys = jax.device_put(keys, shard)
        return reset(keys)

    def step_fn(state, action):
        return step(state, action)

    del repl, shard_tree
    return reset_fn, step_fn


def rollout(env, steps: int):
    """Jittable batched rollout: scan `steps` env steps with zero-order-hold
    actions from a (B, T, nu) plan or a policy callable. Episode time is the
    sequential axis — lax.scan, not Python (SURVEY.md §5 long-context note)."""
    import jax.numpy as jnp

    def run(state, actions):
        def body(s, a):
            s2, obs, r, term, trunc, info = jax.vmap(env.step)(s, a)
            return s2, (obs, r, term)

        final, (obs, r, term) = jax.lax.scan(body, state,
                                             jnp.swapaxes(actions, 0, 1))
        return final, obs, r, term

    return run
