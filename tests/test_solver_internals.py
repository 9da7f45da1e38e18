"""Internal solver identities: the closed-form cone Hessian must match the
jacfwd Jacobian of the force law exactly (same zones, same arithmetic), and
the GEMM-ordered J^T Cb J must match the naive einsum."""
import numpy as np
import jax
import jax.numpy as jnp

import gym_quadruped_tpu.physics.solver as S


def _random_cone_inputs(key, C):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = jax.random.normal(k1, (C, 6), jnp.float64)
    D = jax.random.uniform(k2, (C, 6), jnp.float64, 0.1, 10.0)
    mu = jnp.tile(jnp.asarray([0.8, 0.8, 0.6, 0.01, 0.01], jnp.float64),
                  (C, 1)) * jax.random.uniform(k3, (C, 1), jnp.float64,
                                               0.5, 1.5)
    # mix of condim-3 (pyramid of the first 3 axes) and condim-6 masks
    full = jnp.ones((C, 6), jnp.float64)
    c3 = jnp.asarray([1, 1, 1, 0, 0, 0], jnp.float64)
    dim_mask = jnp.where(jax.random.bernoulli(k4, 0.5, (C, 1)), full, c3)
    return u, D, mu, dim_mask


def test_analytic_hessian_matches_jacfwd():
    key = jax.random.PRNGKey(0)
    for i in range(5):
        u, D, mu, dm = _random_cone_inputs(jax.random.fold_in(key, i), 64)
        H_ad = S.cone_hessian(u, D, mu, dm)
        H_an = S.cone_hessian_analytic(u, D, mu, dm)
        np.testing.assert_allclose(np.asarray(H_an), np.asarray(H_ad),
                                   rtol=0, atol=1e-12)


def test_cone_quad_matches_naive_einsum():
    key = jax.random.PRNGKey(7)
    C, v = 32, 18
    cJ = jax.random.normal(key, (C, 6, v), jnp.float64)
    u, D, mu, dm = _random_cone_inputs(key, C)
    Cb = S.cone_hessian_analytic(u, D, mu, dm)
    H = S._cone_quad(cJ, Cb)
    H_ref = jnp.einsum('cdv,cde,cew->vw', cJ, Cb, cJ)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                               rtol=0, atol=1e-10)
    # batched (the production shape)
    B = 8
    cJb = jax.random.normal(key, (B, C, 6, v), jnp.float64)
    Cbb = jnp.tile(Cb, (B, 1, 1, 1))
    Hb = jax.vmap(S._cone_quad)(cJb, Cbb)
    Hb_ref = jnp.einsum('bcdv,bcde,bcew->bvw', cJb, Cbb, cJb)
    np.testing.assert_allclose(np.asarray(Hb), np.asarray(Hb_ref),
                               rtol=0, atol=1e-10)


def test_solve_batched_matches_vmap_solve():
    """solve_batched (batch-trailing layout) vs vmap(solve): identical math,
    different op order — f64 agreement to 1e-9 on a real engine state."""
    from gym_quadruped_tpu.models.builder import build_model
    from gym_quadruped_tpu.physics import engine
    from gym_quadruped_tpu.physics.constraints import constraint_layout

    m = build_model('go2', 'flat', 0.002)
    B = 8
    key = jax.random.PRNGKey(3)
    qpos = (jnp.tile(m.key_qpos[0], (B, 1))
            + 0.02 * jax.random.normal(key, (B, m.nq), jnp.float64))
    # drop a little so several envs touch ground with varied contact sets
    qpos = qpos.at[:, 2].add(-0.02 * jax.random.uniform(key, (B,)))
    qvel = 0.5 * jax.random.normal(key, (B, m.nv), jnp.float64)
    ctrl = 5.0 * jax.random.normal(key, (B, m.nu), jnp.float64)

    pre = jax.vmap(lambda a, b, c: engine._pre_solve(m, a, b, c))(
        qpos, qvel, ctrl)
    M, qacc_smooth, efc = pre[2], pre[7], pre[9]
    lay = constraint_layout(m)

    ref = jax.vmap(lambda Mi, ai, ei: S.solve(m, lay, Mi, ai, ei,
                                              iterations=6))(
        M, qacc_smooth, efc)
    got = S.solve_batched(m, lay, M, qacc_smooth, efc, iterations=6)

    for r, g, name in zip(ref, got, ('qacc', 'f_simple', 'f_cone', 'qfrc')):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0, atol=1e-9, err_msg=name)


def test_hessian_rows_match_analytic():
    key = jax.random.PRNGKey(11)
    for i in range(3):
        u, D, mu, dm = _random_cone_inputs(jax.random.fold_in(key, i), 48)
        H = S.cone_hessian_analytic(u, D, mu, dm)
        rows = S.cone_hessian_rows(u, D, mu, dm)
        for d in range(6):
            np.testing.assert_allclose(np.asarray(rows[d]),
                                       np.asarray(H[:, d]),
                                       rtol=0, atol=1e-12)
    cJ = jax.random.normal(key, (48, 6, 18), jnp.float64)
    np.testing.assert_allclose(np.asarray(S._cone_quad_rows(cJ, rows)),
                               np.asarray(S._cone_quad(cJ, H)),
                               rtol=0, atol=1e-10)
