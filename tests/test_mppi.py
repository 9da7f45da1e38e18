"""MPPI sampling MPC: single-chip solve and sharded multi-chip solve agree."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.mpc import MPPI, MPPIConfig, velocity_tracking_cost
from gym_quadruped_tpu.parallel import make_mesh


def _setup(n_samples=32, horizon=8):
    m = load_model('mini_cheetah', 'flat')
    cost = velocity_tracking_cost(m, jnp.array([0.3, 0.0, 0.0]),
                                  jnp.asarray(0.0), float(m.key_qpos[0][2]))
    mppi = MPPI(m, cost, MPPIConfig(horizon=horizon, n_samples=n_samples,
                                    sigma=1.0, solver_iterations=2))
    qpos = jnp.asarray(m.key_qpos[0])
    qvel = jnp.zeros(m.nv)
    u0 = jnp.zeros((horizon, m.nu))
    return m, mppi, qpos, qvel, u0


def test_mppi_improves_cost():
    m, mppi, qpos, qvel, u0 = _setup()
    solve = jax.jit(mppi.solve)
    u1, info = solve(jax.random.PRNGKey(0), qpos, qvel, u0)
    assert u1.shape == u0.shape
    c0 = jax.jit(mppi._rollout_cost)(qpos, qvel, u0)
    c1 = jax.jit(mppi._rollout_cost)(qpos, qvel, u1)
    assert np.isfinite(float(c1))
    # the weighted update should not be (much) worse than the nominal
    assert float(c1) <= float(c0) * 1.05, (float(c0), float(c1))
    assert float(info['ess']) >= 1.0


def test_mppi_sharded_matches_math():
    """8-virtual-device sharded solve: weights normalize globally (ESS sane) and
    the update stays finite; exact sample-set differs from single-chip (per-chip
    RNG streams) by design."""
    m, mppi, qpos, qvel, u0 = _setup(n_samples=32, horizon=4)
    mesh = make_mesh()
    u1, info = jax.jit(lambda r, a, b, u: mppi.solve_sharded(mesh, r, a, b, u))(
        jax.random.PRNGKey(1), qpos, qvel, u0)
    assert np.isfinite(np.asarray(u1)).all()
    ess = float(info['ess'])
    assert 1.0 <= ess <= 32.0, ess
