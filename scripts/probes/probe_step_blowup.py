"""Where does the 950 ms/step come from? Single fused step vs scan lengths.

Round-3 finding: vmapped solve alone = 37 ms; presolve-only scan = 2.3 ms/step;
full step in a 50-step scan = 950 ms/step. Bisect: full single step (no scan),
scan of 2, 5, 20; with/without warmstart threading; solver while_loop vs
cap-1.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.physics import engine

B = 4096
model = load_model('go2', 'flat')
qpos0 = jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32), (B, 1))
qvel0 = jnp.zeros((B, model.nv), jnp.float32)
warm0 = jnp.zeros((B, model.nv), jnp.float32)


def bench(name, fn, args, n_units):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    print(f'{name}: {np.median(ts)*1e3/n_units:8.2f} ms/step '
          f'({np.median(ts)*1e3:.1f} ms total)', flush=True)


def single_step(qp, qv, w, ctrl, iters=10):
    qp2, qv2, fwd = engine.step_batched(model, qp, qv, ctrl, warmstart=w,
                                        solver_iterations=iters)
    return qp2, qv2, fwd.qacc


ctrl1 = jax.random.uniform(jax.random.PRNGKey(9), (B, model.nu),
                           jnp.float32, -2, 2)
bench('single step it=10', single_step, (qpos0, qvel0, warm0, ctrl1), 1)
bench('single step it=1',
      lambda a, b, c, d: single_step(a, b, c, d, iters=1),
      (qpos0, qvel0, warm0, ctrl1), 1)


def scan_steps(n, iters=10, thread_warm=True):
    def fn(qp, qv, w, ctrl_seq):
        def body(carry, ctrl):
            qp, qv, w = carry
            qp2, qv2, fwd = engine.step_batched(
                model, qp, qv, ctrl, warmstart=w, solver_iterations=iters)
            w2 = fwd.qacc if thread_warm else w
            return (qp2, qv2, w2), None

        carry, _ = jax.lax.scan(body, (qp, qv, w), ctrl_seq)
        return carry

    ctrl_seq = jax.random.uniform(jax.random.PRNGKey(3),
                                  (n, B, model.nu), jnp.float32, -2, 2)
    return fn, (qpos0, qvel0, warm0, ctrl_seq)


for n in (2, 5, 20):
    fn, args = scan_steps(n)
    bench(f'scan {n} it=10', fn, args, n)

fn, args = scan_steps(5, thread_warm=False)
bench('scan 5 no-warm-thread', fn, args, 5)
