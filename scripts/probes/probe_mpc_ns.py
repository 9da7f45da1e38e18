"""Newton-Schulz SPD inverse vs jnp.linalg.inv for the ADMM x-update.

Profile (probe_mpc_cost.py): the batched (4096,144,144) LU inverse costs
468 ms on v5e — 95% of the whole MPC solve. NS is matmul-only (MXU). This
probe measures, on REAL condensed MPC matrices (go2 trot, H=12):
  - NS residual ||I - X K|| vs iteration count (convergence / f32 behavior)
  - end-to-end ADMM solution difference (LU-inv vs NS-inv x-updates)
  - wall time of NS at the production batch
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
from gym_quadruped_tpu.mpc import qp
from gym_quadruped_tpu.mpc import centroidal as srb
from gym_quadruped_tpu.utils.maths import quat_to_euler_xyz


def build_real_K(B, rho=1e-4):
    model = load_model('go2', 'flat')
    mpc = CentroidalMPC(model, MPCConfig(gait=GaitConfig('trot')))
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

    def build(qp_, qv_, t_, rf_):
        euler = quat_to_euler_xyz(qp_[3:7])
        x0 = srb.state_from_env(qp_, qv_, euler)
        from gym_quadruped_tpu.mpc.gait import contact_schedule
        schedule = contact_schedule(cfg.gait, t_, cfg.horizon, cfg.mpc_dt)
        com = qp_[0:3]
        A, Bm = srb.build_horizon(mpc.params, euler[2],
                                  feet0 - com[None, :], schedule, cfg.mpc_dt)
        x_ref = srb.reference_trajectory(x0, rf_, jnp.asarray(0.0, jnp.float32),
                                         mpc.stand_height, cfg.horizon,
                                         cfg.mpc_dt)
        Hq, qv2 = qp.condense(A, Bm, x0, x_ref, cfg.weights.q_diag,
                              cfg.weights.r_diag)
        return Hq, qv2, schedule

    Hq, qvec, sched = jax.jit(jax.vmap(build))(qpos, qvel, ts, ref)
    K = Hq + rho * jnp.eye(Hq.shape[-1], dtype=jnp.float32)
    return Hq, qvec, sched, K, mpc


def ns_inverse(K, iters):
    n = K.shape[-1]
    a = jnp.max(jnp.sum(jnp.abs(K), axis=-1), axis=-1)
    b = jnp.max(jnp.sum(jnp.abs(K), axis=-2), axis=-1)
    X = K / (a * b)[..., None, None]          # K SPD → K^T = K
    eye = jnp.eye(n, dtype=K.dtype)

    def body(_, X):
        return X @ (2.0 * eye - K @ X)

    return jax.lax.fori_loop(0, iters, body, X)


def ns_inverse_bf16(K, iters=18, polish=2):
    """Production candidate: identity/row-sum init, bf16 NS loop (NS is
    self-correcting, tolerates low-precision multiplies), f32-highest polish."""
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    lam = jnp.max(jnp.sum(jnp.abs(K), axis=-1), axis=-1)   # >= lambda_max
    X0 = eye / lam[..., None, None]
    Kb = K.astype(jnp.bfloat16)
    two_eye_b = (2.0 * eye).astype(jnp.bfloat16)

    def body_b(_, Xb):
        KX = jnp.matmul(Kb, Xb, precision=jax.lax.Precision.DEFAULT)
        return jnp.matmul(Xb, two_eye_b - KX,
                          precision=jax.lax.Precision.DEFAULT)

    Xb = jax.lax.fori_loop(0, iters, body_b, X0.astype(jnp.bfloat16))
    X = Xb.astype(K.dtype)

    def body_f(_, X):
        return X @ (2.0 * eye - K @ X)

    return jax.lax.fori_loop(0, polish, body_f, X)


def main():
    B = int(os.environ.get('B', 256))
    Hq, qvec, sched, K, mpc = build_real_K(B)
    print('K: shape', K.shape, 'dtype', K.dtype)
    # condition estimate on a few (f64 host)
    Kh = np.asarray(K[:4], np.float64)
    for i in range(4):
        w = np.linalg.eigvalsh(Kh[i])
        print(f'  K[{i}]: lmin={w[0]:.3e} lmax={w[-1]:.3e} '
              f'cond={w[-1]/w[0]:.2e}')

    inv_lu = jax.jit(jnp.linalg.inv)
    Xlu = inv_lu(K)
    jax.block_until_ready(Xlu)

    eye = np.eye(K.shape[-1], dtype=np.float32)
    for iters in (10, 20, 30, 40, 50):
        f = jax.jit(lambda K, it=iters: ns_inverse(K, it))
        X = f(K)
        r = np.asarray(jax.vmap(lambda k, x: jnp.linalg.norm(
            jnp.eye(k.shape[-1], dtype=k.dtype) - x @ k))(K, X))
        rlu = np.asarray(jax.vmap(lambda k, x: jnp.linalg.norm(
            jnp.eye(k.shape[-1], dtype=k.dtype) - x @ k))(K, Xlu))
        print(f'NS it={iters}: resid med={np.median(r):.3e} '
              f'max={r.max():.3e}  (LU resid med={np.median(rlu):.3e})')

    # end-to-end ADMM solution difference, LU vs NS x-update
    stance_args = (sched, mpc.params.mu, mpc.params.fz_min, mpc.params.fz_max)

    def admm_with(Kinv, Hq, q, schedule, iterations=30, rho=1e-4):
        stance = schedule.reshape(-1).astype(jnp.float32)
        U = jnp.zeros_like(q)
        z = jnp.zeros_like(q)
        y = jnp.zeros_like(q)

        def body(_, carry):
            U, z, y = carry
            U = Kinv @ (rho * (z - y) - q)
            z = qp.project_pyramid(U + y, stance, mpc.params.mu,
                                   mpc.params.fz_min, mpc.params.fz_max)
            y = y + U - z
            return U, z, y

        U, z, y = jax.lax.fori_loop(0, 30, body, (U, z, y))
        return z

    # eigen-spectrum: how much of the bad conditioning is the swing floor?
    w = np.linalg.eigvalsh(np.asarray(K[:8], np.float64))
    print('eig quantiles over 8 matrices:',
          np.round(np.quantile(w, [0, .1, .25, .5, .75, 1]), 6))

    def ns_prec(K, iters, prec, shift=0.0):
        """NS at f32 with given matmul precision; optional swing-column
        spectral shift: swing rows/cols of K are EXACTLY (r+rho)I (zero Su
        columns), so K2 = K + shift*(I - M) has the same inverse up to an
        analytic diagonal correction on the swing block."""
        n = K.shape[-1]
        eye = jnp.eye(n, dtype=K.dtype)
        base = 1e-4 + 1e-5
        if shift:
            swing = jnp.abs(jnp.diagonal(K, axis1=-2, axis2=-1)
                            - base) < 1e-8
            D = jnp.where(swing, shift, 0.0)
            K = K + jax.vmap(jnp.diag)(D)
        lam = jnp.max(jnp.sum(jnp.abs(K), axis=-1), axis=-1)
        X = eye / lam[..., None, None]

        def body(_, X):
            KX = jnp.matmul(K, X, precision=prec)
            return jnp.matmul(X, 2.0 * eye - KX, precision=prec)

        X = jax.lax.fori_loop(0, iters, body, X)
        if shift:
            corr = 1.0 / base - 1.0 / (base + shift)
            X = X + jax.vmap(jnp.diag)(jnp.where(swing, corr, 0.0))
        return X

    import functools
    for name, prec, iters, shift in (
            ('HIGHEST-6+shift', jax.lax.Precision.HIGHEST, 6, 0.02),
            ('HIGHEST-8+shift', jax.lax.Precision.HIGHEST, 8, 0.02),
            ('HIGHEST-10+shift', jax.lax.Precision.HIGHEST, 10, 0.02),
            ('HIGHEST-12+shift', jax.lax.Precision.HIGHEST, 12, 0.02)):
        f = jax.jit(functools.partial(ns_prec, iters=iters, prec=prec,
                                      shift=shift))
        X = f(K)
        r = np.asarray(jax.vmap(lambda k, x: jnp.linalg.norm(
            jnp.eye(k.shape[-1], dtype=k.dtype) - x @ k))(K, X))
        print(f'NS {name}: resid med={np.median(r):.3e} max={r.max():.3e}')

    X40 = jax.jit(functools.partial(
        ns_prec, iters=8, prec=jax.lax.Precision.HIGHEST, shift=0.02))(K)
    z_lu = jax.jit(jax.vmap(admm_with))(Xlu, Hq, qvec, sched)
    z_ns = jax.jit(jax.vmap(admm_with))(X40, Hq, qvec, sched)
    d = np.asarray(jnp.max(jnp.abs(z_lu - z_ns), axis=-1))
    scale = float(jnp.max(jnp.abs(z_lu)))
    print(f'ADMM solution diff (HIGHEST-8+shift vs LU): med={np.median(d):.3e} '
          f'max={d.max():.3e} (scale {scale:.1f} N)')

    # timing at the production batch
    B2 = 4096
    Kb = jnp.tile(K, (B2 // B, 1, 1))
    for name, f in (
            ('HIGHEST-8+shift', functools.partial(
                ns_prec, iters=8, prec=jax.lax.Precision.HIGHEST,
                shift=0.02)),
            ('HIGHEST-12+shift', functools.partial(
                ns_prec, iters=12, prec=jax.lax.Precision.HIGHEST,
                shift=0.02))):
        fj = jax.jit(f)
        X = fj(Kb)
        float(jnp.sum(X))
        t0 = time.perf_counter()
        X = fj(Kb)
        float(jnp.sum(X))
        print(f'{name} at B={B2}: {(time.perf_counter()-t0)*1e3:.1f} ms')


if __name__ == '__main__':
    main()
