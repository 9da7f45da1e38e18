"""Scaling-efficiency harness: env steps/s and MPC solves/s vs device count.

BASELINE.json: ">=85% solves/s scaling efficiency at 4 hosts". On a real pod this
runs under jax.distributed with the (dcn, ici) mesh from parallel.make_mesh; in
CI / single-host it runs the same code on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu) to
validate the sharding and measure the harness itself. Prints one JSON line per
device count.

Run (virtual 8-device): XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python scripts/bench_scaling.py
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, '.')

import jax

if os.environ.get('JAX_PLATFORMS'):
    try:
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    except Exception:
        pass
jax.config.update('jax_default_matmul_precision', 'highest')
# persistent compile cache: the r4 attempt at this table died on compile cost
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.physics import engine


def bench_mesh(n_dev: int, per_dev_batch: int = None, n_steps: int = None) -> float:
    # Small defaults: the r4 attempt at this table died on CPU compile cost at
    # per_dev_batch=256/n_steps=10; the table's purpose is the sharding-overhead
    # BOUND (docs/SCALING.md §1.3), which small shapes measure just as well.
    per_dev_batch = per_dev_batch or int(os.environ.get('SCALE_PER_DEV_BATCH', 64))
    n_steps = n_steps or int(os.environ.get('SCALE_N_STEPS', 5))
    devices = np.asarray(jax.devices()[:n_dev]).reshape(1, n_dev)
    mesh = Mesh(devices, ('dcn', 'ici'))
    shard = NamedSharding(mesh, P(('dcn', 'ici')))
    model = load_model('go2', 'flat')
    B = per_dev_batch * n_dev

    qp = jax.device_put(jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32),
                                 (B, 1)), shard)
    qv = jax.device_put(jnp.zeros((B, model.nv), jnp.float32), shard)
    cs = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(0), (n_steps, B, model.nu), jnp.float32, -2, 2),
        NamedSharding(mesh, P(None, ('dcn', 'ici'))))

    @jax.jit
    def run(qp, qv, cs):
        def body(c, u):
            a, b, _ = jax.vmap(
                lambda x, y, z: engine.step(model, x, y, z,
                                            solver_iterations=4))(c[0], c[1], u)
            return (a, b), None

        (a, b), _ = jax.lax.scan(body, (qp, qv), cs)
        return a, b

    out = run(qp, qv, cs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(qp, qv, cs)
    _ = float(jnp.sum(out[0]))
    dt = time.perf_counter() - t0
    return B * n_steps / dt


def main():
    total = len(jax.devices())
    counts = sorted({1, 2, total} | {2 ** k for k in range(
        int(math.log2(total)) + 1)})
    counts = [c for c in counts if c <= total]
    base = None
    for n in counts:
        rate = bench_mesh(n)
        if base is None:
            base = rate
        # On the virtual mesh all devices share one physical core, so aggregate
        # steps/s CANNOT rise with n; what it CAN do is FALL if the sharded
        # program adds reshards/collective scheduling. sharding_overhead is the
        # measurable bound here (docs/SCALING.md §1.3); scaling_efficiency is
        # the pod-formula value, meaningless on shared hardware (kept for
        # schema compatibility with the pod run).
        print(json.dumps({
            'metric': f'env_steps_per_s_{n}dev', 'value': round(rate, 1),
            'unit': 'steps/s', 'scaling_efficiency': round(rate / (base * n), 3),
            'sharding_overhead_vs_1dev': round(max(0.0, 1.0 - rate / base), 3),
        }))


if __name__ == '__main__':
    main()
