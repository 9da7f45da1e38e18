"""MPC solve cost breakdown on the default backend (TPU) at B=4096.

Times, as separate jitted programs (prefix-style, like the engine profiling in
docs/PERF_NOTES.md):
  a) schedule + horizon + condense            (everything before the QP)
  b) a + K inverse                            (the 144x144 inv)
  c) a + b + N ADMM iterations, N in ladder   (the iteration cost)
and a closed-loop warm-started ladder: solve with warmstart carried across
"replans" (perturbed states) to see how few iterations keep the force plan
within tol of the converged (it=60 cold) plan.

Run: python scripts/probe_mpc_profile.py [batch]
"""

import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.mpc import CentroidalMPC, GaitConfig, MPCConfig
from gym_quadruped_tpu.mpc import centroidal as srb
from gym_quadruped_tpu.mpc import qp
from gym_quadruped_tpu.mpc.gait import contact_schedule
from gym_quadruped_tpu.utils.maths import quat_to_euler_xyz


def timed(f, *args, reps=3):
    out = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    model = load_model('go2', 'flat')
    cfg = MPCConfig(gait=GaitConfig('trot'), iterations=30)
    mpc = CentroidalMPC(model, cfg)
    feet0 = jnp.asarray(
        [[0.19, 0.14, 0.02], [0.19, -0.14, 0.02],
         [-0.19, 0.14, 0.02], [-0.19, -0.14, 0.02]], jnp.float32)

    key = jax.random.PRNGKey(0)
    qpos = jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32), (B, 1))
    qpos = qpos + 0.01 * jax.random.normal(key, qpos.shape, jnp.float32)
    qvel = 0.1 * jax.random.normal(key, (B, model.nv), jnp.float32)
    ts = jax.random.uniform(key, (B,), jnp.float32, 0.0, 1.0)
    ref = jnp.asarray([0.4, 0, 0], jnp.float32)

    def pre(qpos_, qvel_, t_):
        euler = quat_to_euler_xyz(qpos_[3:7])
        x0 = srb.state_from_env(qpos_, qvel_, euler)
        schedule = contact_schedule(cfg.gait, t_, cfg.horizon, cfg.mpc_dt)
        com = qpos_[0:3]
        A, Bm = srb.build_horizon(mpc.params, euler[2], feet0 - com[None, :],
                                  schedule, cfg.mpc_dt)
        x_ref = srb.reference_trajectory(x0, ref, jnp.asarray(0.0), mpc.stand_height,
                                         cfg.horizon, cfg.mpc_dt)
        Hq, qv_ = qp.condense(A, Bm, x0, x_ref, cfg.weights.q_diag,
                              cfg.weights.r_diag)
        return Hq, qv_, schedule

    vpre = jax.jit(jax.vmap(pre))

    def kinv(qpos_, qvel_, t_):
        Hq, qv_, sched = pre(qpos_, qvel_, t_)
        n = Hq.shape[0]
        K = Hq + cfg.rho * jnp.eye(n, Hq.dtype)
        return jnp.linalg.inv(K)

    vkinv = jax.jit(jax.vmap(kinv))

    def full(n_iter):
        def f(qpos_, qvel_, t_):
            Hq, qv_, sched = pre(qpos_, qvel_, t_)
            U, _ = qp.admm_solve(Hq, qv_, sched, mpc.params.mu,
                                 mpc.params.fz_min, mpc.params.fz_max,
                                 iterations=n_iter, rho=cfg.rho)
            return U
        return jax.jit(jax.vmap(f))

    t_pre = timed(vpre, qpos, qvel, ts)
    t_kinv = timed(vkinv, qpos, qvel, ts)
    print(f'B={B}  pre(condense) {t_pre*1e3:8.2f} ms   '
          f'pre+inv {t_kinv*1e3:8.2f} ms  (inv ~{(t_kinv-t_pre)*1e3:.2f})',
          flush=True)
    for n_iter in (0, 10, 30):
        t = timed(full(n_iter), qpos, qvel, ts)
        print(f'  it={n_iter:2d}  {t*1e3:8.2f} ms   {B/t:10.1f} solves/s',
              flush=True)

    # ---- warm-started accuracy ladder: how few iterations match converged?
    def solve_ws(qpos_, qvel_, t_, warm, n_iter):
        Hq, qv_, sched = pre(qpos_, qvel_, t_)
        U, warm2 = qp.admm_solve(Hq, qv_, sched, mpc.params.mu,
                                 mpc.params.fz_min, mpc.params.fz_max,
                                 iterations=n_iter, rho=cfg.rho, warmstart=warm)
        return U, warm2

    cold60 = jax.jit(jax.vmap(lambda a, b, c: solve_ws(a, b, c, None, 60)[0]))
    n = cfg.horizon * 12
    for n_iter in (5, 10, 15):
        ws = jax.jit(jax.vmap(
            lambda a, b, c, w: solve_ws(a, b, c, w, n_iter),
            in_axes=(0, 0, 0, 0)))
        warm = (jnp.zeros((B, n)),) * 3
        # simulate 5 replans at 10 sim-steps apart (t advances 0.02, state drifts)
        errs = []
        for k in range(5):
            tk = ts + 0.02 * k
            qk = qpos.at[:, 0].add(0.4 * 0.02 * k)
            U, warm = ws(qk, qvel, tk, warm)
            ref_U = cold60(qk, qvel, tk)
            errs.append(float(jnp.max(jnp.abs(U - ref_U))))
        print(f'  warmstart it={n_iter:2d}: maxerr vs it60 per replan '
              + ' '.join(f'{e:.2e}' for e in errs), flush=True)


if __name__ == '__main__':
    main()
