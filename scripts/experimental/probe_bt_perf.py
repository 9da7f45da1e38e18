"""Fused Newton kernel (ops/newton_bt.py) vs XLA solver on real TPU:
(a) steps/s at B=4096 go2/flat random-torque warm-started (the headline bench
    configuration), and
(b) 100-step trajectory agreement between the two paths from the keyframe
    (warm-started, f32) — the acceptance gate for flipping ENABLE on.

Usage: python scripts/probe_bt_perf.py [batch] [iters]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_default_matmul_precision', 'highest')

    from gym_quadruped_tpu.models.builder import load_model
    import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).parent)); import newton_bt
    from gym_quadruped_tpu.physics import engine

    model = load_model('go2', 'flat')
    n_steps = 50
    qpos0 = jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32), (batch, 1))
    qvel0 = jnp.zeros((batch, model.nv), jnp.float32)
    warm0 = jnp.zeros((batch, model.nv), jnp.float32)

    def make_run():
        @jax.jit
        def run(qpos, qvel, warm, ctrl_seq):
            def body(carry, ctrl):
                qp, qv, fwd = engine.step_batched(
                    model, carry[0], carry[1], ctrl, warmstart=carry[2],
                    solver_iterations=iters)
                return (qp, qv, fwd.qacc), None

            (qp, qv, warm), _ = jax.lax.scan(body, (qpos, qvel, warm), ctrl_seq)
            return qp, qv, warm

        return run

    def measure(run, reps=3):
        def force(o):
            return float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))

        ctrl = jax.random.uniform(jax.random.PRNGKey(0),
                                  (n_steps, batch, model.nu), jnp.float32,
                                  -2, 2)
        out = run(qpos0, qvel0, warm0, ctrl)
        force(out)
        out = run(out[0], out[1], out[2], ctrl)
        force(out)
        times = []
        carry = out
        for r in range(reps):
            c = jax.random.uniform(jax.random.PRNGKey(r + 1),
                                   (n_steps, batch, model.nu), jnp.float32,
                                   -2, 2)
            jax.block_until_ready(c)
            t0 = time.perf_counter()
            out = run(carry[0], carry[1], carry[2], c)
            s = float(jnp.sum(out[0]))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s)
            carry = out
        return batch * n_steps / float(np.median(times))

    results = {'batch': batch, 'iters': iters}

    # trajectory agreement: 100 warm-started steps, same ctrl, both paths
    def rollout(n):
        ctrl = jax.random.uniform(jax.random.PRNGKey(7),
                                  (n, 64, model.nu), jnp.float32, -2, 2)
        run = make_run()
        qp = jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32), (64, 1))
        qv = jnp.zeros((64, model.nv), jnp.float32)
        w = jnp.zeros((64, model.nv), jnp.float32)
        out = run(qp, qv, w, ctrl)
        jax.block_until_ready(out)
        return np.asarray(out[0]), np.asarray(out[1])

    newton_bt.ENABLE = True
    qp_k, qv_k = rollout(100)
    rate_kernel = measure(make_run())
    results['steps_per_s_kernel'] = round(rate_kernel, 1)

    newton_bt.ENABLE = False
    qp_x, qv_x = rollout(100)
    rate_xla = measure(make_run())
    newton_bt.ENABLE = True
    results['steps_per_s_xla'] = round(rate_xla, 1)
    results['speedup'] = round(rate_kernel / rate_xla, 3)
    results['traj100_qpos_maxdiff'] = float(np.max(np.abs(qp_k - qp_x)))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
