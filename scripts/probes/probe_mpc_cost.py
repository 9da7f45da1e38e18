"""Where does the MPC solve's time go at B=4096, H=12 on real TPU?

Measures, as separate jitted programs with the bench timing hygiene:
  condense-only | condense+Kinv | full solve with 1/10/30 ADMM iterations.
The warm-vs-cold bench gap was only 4% (8233 vs 7893 solves/s), so the
iteration count is NOT the driver — this pins down what is.
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

import jax

jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')

import jax.numpy as jnp
import numpy as np

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.mpc import CentroidalMPC, GaitConfig, MPCConfig
from gym_quadruped_tpu.mpc import qp as qp_mod


def median_time(fn, args, reps=3):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    B = int(os.environ.get('B', 4096))
    model = load_model('go2', 'flat')
    mpc = CentroidalMPC(model, MPCConfig(gait=GaitConfig('trot'),
                                         iterations=30))
    cfg = mpc.cfg
    feet0 = jnp.asarray(
        [[0.19, 0.14, 0.02], [0.19, -0.14, 0.02],
         [-0.19, 0.14, 0.02], [-0.19, -0.14, 0.02]], jnp.float32)
    key = jax.random.PRNGKey(0)
    qpos = jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32), (B, 1))
    qpos = qpos + 0.01 * jax.random.normal(key, qpos.shape, jnp.float32)
    qvel = 0.1 * jax.random.normal(key, (B, model.nv), jnp.float32)
    ts = jax.random.uniform(key, (B,), jnp.float32, 0.0, 1.0)
    ref = jnp.tile(jnp.asarray([0.4, 0, 0], jnp.float32), (B, 1))

    def phases(qp, qv, t, rf):
        # mirror CentroidalMPC.solve's setup up to the QP (controller.py)
        return mpc.build_qp(qp, qv, feet0, t, rf, jnp.asarray(0.0, jnp.float32))

    if not hasattr(mpc, 'build_qp'):
        # fall back: time sub-pieces with synthetic A, B of the right shapes
        H = cfg.horizon if hasattr(cfg, 'horizon') else 12
        NX, NU = 13, 12
        A = jnp.tile(jnp.eye(NX, dtype=jnp.float32), (B, H, 1, 1))
        Bm = 0.01 * jax.random.normal(key, (B, H, NX, NU), jnp.float32)
        x0 = 0.1 * jax.random.normal(key, (B, NX), jnp.float32)
        xref = jnp.zeros((B, H, NX), jnp.float32)
        sched = jnp.ones((B, H, 4), jnp.float32)

        cond = jax.jit(jax.vmap(lambda a, b, x, xr: qp_mod.condense(
            a, b, x, xr, qp_mod.MPCWeights().q_diag, 1e-5)))
        t_cond = median_time(cond, (A, Bm, x0, xref))
        print(f'condense only:        {t_cond*1e3:8.1f} ms '
              f'({B/t_cond:,.0f}/s)')

        Hq, q = cond(A, Bm, x0, xref)

        def kinv(Hq):
            K = Hq + 1e-4 * jnp.eye(Hq.shape[-1], dtype=jnp.float32)
            return jnp.linalg.inv(K)

        kinv_j = jax.jit(jax.vmap(kinv))
        t_inv = median_time(kinv_j, (Hq,))
        print(f'K inverse only:       {t_inv*1e3:8.1f} ms '
              f'({B/t_inv:,.0f}/s)')

        for iters in (1, 10, 30):
            solve = jax.jit(jax.vmap(
                lambda hq, qq, s, it=iters: qp_mod.admm_solve(
                    hq, qq, s, 0.5, 10.0, 500.0, iterations=it)))
            t_s = median_time(solve, (Hq, q, sched))
            print(f'admm_solve it={iters:2d}:    {t_s*1e3:8.1f} ms '
                  f'({B/t_s:,.0f}/s)')


if __name__ == '__main__':
    main()
