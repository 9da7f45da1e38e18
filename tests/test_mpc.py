"""MPC stack tests: QP correctness vs a CPU reference solver, and a closed-loop
locomotion gate (go2 trots at a commanded velocity without falling).

BASELINE gates: control-sequence match vs a CPU reference solver (scipy), and the
solve staying real-time-budget shaped (fixed iterations, no dynamic shapes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.mpc import CentroidalMPC, MPCConfig
from gym_quadruped_tpu.mpc import qp
from gym_quadruped_tpu.mpc.gait import GaitConfig, contact_schedule


def _scipy_reference_qp(H, q, G, l, u):
    """CPU reference: solve the same box-constrained QP with scipy SLSQP."""
    from scipy.optimize import minimize

    n = H.shape[0]
    cons = [
        {'type': 'ineq', 'fun': lambda x, G=G, u=u: u - G @ x,
         'jac': lambda x, G=G: -G},
        {'type': 'ineq', 'fun': lambda x, G=G, l=l: G @ x - l,
         'jac': lambda x, G=G: G},
    ]
    res = minimize(lambda x: 0.5 * x @ H @ x + q @ x,
                   np.zeros(n), jac=lambda x: H @ x + q,
                   constraints=cons, method='SLSQP',
                   options={'maxiter': 500, 'ftol': 1e-12})
    return res.x


def test_admm_matches_cpu_reference():
    """ADMM solution within 1e-3 of scipy on a random strongly-convex QP with
    friction-pyramid constraints (BASELINE parity gate). The same set C is handed
    to scipy in constraint-matrix form (pyramid_constraints/bounds)."""
    rng = np.random.RandomState(0)
    n = 24  # 2 knots × 12 forces (small for SLSQP's sake)
    A = rng.randn(n, n)
    H = A @ A.T + 5.0 * np.eye(n)
    q = 10.0 * rng.randn(n)
    sched = jnp.ones((2, 4))
    U, _ = qp.admm_solve(jnp.asarray(H), jnp.asarray(q), sched, 0.7, 0.0, 100.0,
                         iterations=4000, rho=1.0)

    G = np.asarray(qp.pyramid_constraints(2, mu=0.7, dtype=jnp.float64))
    l, u = qp.pyramid_bounds(sched, 0.0, 100.0, jnp.float64)
    x_ref = _scipy_reference_qp(H, q, G, np.asarray(l), np.asarray(u))
    err = np.max(np.abs(np.asarray(U) - x_ref)) / (1 + np.max(np.abs(x_ref)))
    assert err < 1e-3, f'ADMM vs scipy mismatch: {err:.2e}'


def test_qp_unconstrained_matches_cholesky():
    """When the optimum is strictly inside the pyramid the ADMM fixed point is
    the Newton solution."""
    rng = np.random.RandomState(1)
    n = 24
    A = rng.randn(n, n)
    H = A @ A.T + 10.0 * np.eye(n)
    # craft an interior optimum: fz = 10, |fx|, |fy| < mu*fz
    x_star = np.tile([1.0, -1.5, 10.0], n // 3)
    q = -H @ x_star
    sched = jnp.ones((2, 4))
    U, _ = qp.admm_solve(jnp.asarray(H), jnp.asarray(q), sched,
                         mu=0.7, fz_min=0.0, fz_max=100.0,
                         iterations=400, rho=0.5)
    np.testing.assert_allclose(np.asarray(U), x_star, atol=1e-6)


def test_gait_schedule_properties():
    cfg = GaitConfig('trot', period=0.5)
    sched = np.asarray(contact_schedule(cfg, jnp.asarray(0.0), 25, 0.02))
    assert sched.shape == (25, 4)
    # trot: diagonal pairs share phase
    np.testing.assert_array_equal(sched[:, 0], sched[:, 3])
    np.testing.assert_array_equal(sched[:, 1], sched[:, 2])
    # duty 0.6 → mean stance fraction ≈ 0.6 over one period
    assert 0.4 < sched.mean() < 0.8
    stand = np.asarray(contact_schedule(GaitConfig('stand'), jnp.asarray(0.3),
                                        10, 0.02))
    assert stand.min() == 1.0


def test_mpc_standing_forces_support_weight():
    """Standing MPC solve: vertical forces ≈ m·g in total, distributed on 4 feet."""
    model = load_model('go2', 'flat')
    mpc = CentroidalMPC(model, MPCConfig(gait=GaitConfig('stand'),
                                         iterations=100))
    qpos = jnp.asarray(model.key_qpos[0])
    qvel = jnp.zeros(model.nv)
    # nominal feet under hips
    feet = jnp.asarray(
        [[0.19, 0.14, 0.02], [0.19, -0.14, 0.02],
         [-0.19, 0.14, 0.02], [-0.19, -0.14, 0.02]], qpos.dtype)
    solve = jax.jit(lambda *a: mpc.solve(*a))
    forces, _ = solve(qpos, qvel, feet, jnp.asarray(0.0),
                      jnp.zeros(3, qpos.dtype), jnp.asarray(0.0, qpos.dtype))
    f0 = np.asarray(forces[0])
    weight = mpc.params.mass * 9.81
    assert abs(f0[:, 2].sum() - weight) / weight < 0.2, \
        f'total fz {f0[:, 2].sum():.1f} vs weight {weight:.1f}'
    assert (f0[:, 2] > 0.05 * weight).all()
    # friction pyramid respected
    assert (np.abs(f0[:, 0]) <= 0.7 * f0[:, 2] + 1e-6).all()


def test_spd_inverse_matches_lu():
    """Newton-Schulz x-update inverse (qp.spd_inverse) vs LU on matrices with
    the production structure: swing columns exactly (r+rho)I, flat stance
    tangentials at the same floor, stiff block on top."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gym_quadruped_tpu.mpc import qp

    rng = np.random.RandomState(0)
    n, n_stiff = 144, 36
    r, rho = 1e-5, 1e-4
    # random PSD with a stiff range and a flat remainder + (r+rho) diag
    V = rng.normal(size=(n, n_stiff))
    V, _ = np.linalg.qr(V)
    lams = rng.uniform(1e-3, 0.14, n_stiff)
    Hq = (V * lams) @ V.T + r * np.eye(n)
    K = jnp.asarray(Hq + rho * np.eye(n))
    # swing mask: zero out those rows/cols to exactly (r+rho) e_i
    swing = np.zeros(n, bool)
    swing[:60] = True
    Kn = np.array(K)
    Kn[swing, :] = 0.0
    Kn[:, swing] = 0.0
    idx = np.where(swing)[0]
    Kn[idx, idx] = r + rho
    K = jnp.asarray(Kn)

    X = jax.jit(lambda K: qp.spd_inverse(K, jnp.asarray(swing)))(K)
    Xlu = np.linalg.inv(np.asarray(K, np.float64))
    resid = np.linalg.norm(np.eye(n) - np.asarray(X, np.float64) @
                           np.asarray(K, np.float64))
    assert resid < 1e-5, resid         # f64 CPU: NS converges well past f32
    # and the action on a vector matches LU
    b = rng.normal(size=n)
    np.testing.assert_allclose(np.asarray(X) @ b, Xlu @ b, atol=1e-5)
