"""MPC solves/s benchmark: batched centroidal QP solves on the default backend.

BASELINE.json headline #2: "MPC solves/s at H=12" with thousands of envs per
solve batch. One solve = gait schedule → SRB horizon → dense condensing →
144×144 Cholesky + fixed-iteration consensus ADMM. Prints one JSON line per
batch size.

Run: python scripts/bench_mpc.py
"""

import json
import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.mpc import CentroidalMPC, GaitConfig, MPCConfig


def main():
    model = load_model('go2', 'flat')
    mpc = CentroidalMPC(model, MPCConfig(gait=GaitConfig('trot'), iterations=30))
    feet0 = jnp.asarray(
        [[0.19, 0.14, 0.02], [0.19, -0.14, 0.02],
         [-0.19, 0.14, 0.02], [-0.19, -0.14, 0.02]], jnp.float32)

    def one_solve(qpos, qvel, t, ref):
        forces, _ = mpc.solve(qpos, qvel, feet0 + qpos[0:3][None, :] * 0, t,
                              ref, jnp.asarray(0.0, qpos.dtype))
        return forces[0]

    for B in (512, 4096):
        key = jax.random.PRNGKey(0)
        qpos = jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32), (B, 1))
        qpos = qpos + 0.01 * jax.random.normal(key, qpos.shape, jnp.float32)
        qvel = 0.1 * jax.random.normal(key, (B, model.nv), jnp.float32)
        ts = jax.random.uniform(key, (B,), jnp.float32, 0.0, 1.0)
        refs = jnp.tile(jnp.asarray([0.4, 0, 0], jnp.float32), (B, 1))

        solve = jax.jit(jax.vmap(one_solve))
        out = solve(qpos, qvel, ts, refs)
        jax.block_until_ready(out)
        times = []
        for r in range(3):
            qv_r = qvel + 0.001 * r
            t0 = time.perf_counter()
            out = solve(qpos, qv_r, ts, refs)
            _ = float(jnp.sum(out))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        assert np.isfinite(np.asarray(out)).all()
        print(json.dumps({
            'metric': f'mpc_solves_per_s_go2_H12_b{B}',
            'value': round(B / dt, 1), 'unit': 'solves/s',
            'batched_solve_ms': round(dt * 1000, 2),
        }))


if __name__ == '__main__':
    main()
