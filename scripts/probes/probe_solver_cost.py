"""Bisect the ~950 ms/step solver cost seen in round 3 (was ~13 ms in round 2).

Times single jitted programs at B=4096 on go2/flat efc data:
  a) full vmapped solve, it=1
  b) newton body without linesearch (fixed t=1)
  c) newton body without spd_solve (diag preconditioner step)
  d) spd_solve alone x10
  e) linesearch alone (grid+bisect on fixed p)
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.ops.spd_solve import spd_solve
from gym_quadruped_tpu.physics import engine, solver
from gym_quadruped_tpu.physics.constraints import constraint_layout

B = 4096
model = load_model('go2', 'flat')
lay = constraint_layout(model)

qpos = jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32), (B, 1))
qpos = qpos + 0.01 * jax.random.normal(jax.random.PRNGKey(0), qpos.shape)
qvel = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, model.nv),
                               jnp.float32)
ctrl = jnp.zeros((B, model.nu), jnp.float32)

pre = jax.jit(jax.vmap(lambda a, b, c: engine._pre_solve(
    model, a, b, c, None, None, engine.MAX_CONE_CONTACTS)))(qpos, qvel, ctrl)
M, qacc_smooth, efc = pre[2], pre[7], pre[9]
jax.block_until_ready(qacc_smooth)
print('ns =', efc.J.shape, 'C =', efc.con_J.shape, flush=True)


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    print(f'{name}: {np.median(ts)*1e3:8.2f} ms', flush=True)


# a) full solve it=1
bench('full solve it=1', lambda M, a, e: jax.vmap(
    lambda Mi, ai, ei: solver.solve(model, lay, Mi, ai, ei, iterations=1))(
        M, a, e), M, qacc_smooth, efc)

# d) spd_solve x10 chained
def spd10(M, b):
    def body(i, x):
        return spd_solve(M + 1e-8 * x[0, 0] * jnp.eye(M.shape[-1], dtype=M.dtype), x)
    return jax.lax.fori_loop(0, 10, body, b)
bench('vmapped spd_solve x10', lambda M, b: jax.vmap(spd10)(M, b),
      M, qacc_smooth)

# single newton pieces, vmapped (one env then vmap)
def newton_pieces(Mi, ai, ei, do_solve, do_ls):
    dtype = ai.dtype
    nv = ai.shape[0]
    C = ei.con_J.shape[0]
    unilateral = (ei.frictionloss <= 0).astype(dtype)
    act_f = ei.active.astype(dtype)
    D_s = act_f * (1.0 / ei.R)
    dim_mask = ei.cone_dim_mask
    mu = ei.cone_mu
    con_act_f = ei.con_active.astype(dtype)
    D_c = con_act_f[:, None] * (1.0 / ei.con_R) * dim_mask
    a = ai
    us = ei.J @ a - ei.aref
    uc = jnp.einsum('cdv,v->cd', ei.con_J, a) - ei.con_aref
    fs = solver.simple_force(us, D_s, ei.frictionloss, unilateral)
    fc = solver.cone_force(uc, D_c, mu, dim_mask)
    g = Mi @ (a - ai) - ei.J.T @ fs - jnp.einsum('cdv,cd->v', ei.con_J, fc)
    cw = solver.simple_hess_weight(us, D_s, ei.frictionloss, unilateral)
    H = Mi + ei.J.T @ (cw[:, None] * ei.J)
    rows = solver.cone_hessian_rows(uc, D_c, mu, dim_mask)
    H = H + solver._cone_quad_rows(ei.con_J, rows)
    H = H + 1e-10 * jnp.trace(Mi) / nv * jnp.eye(nv, dtype=dtype)
    if do_solve:
        p = -spd_solve(H, g)
    else:
        p = -g / jnp.diagonal(H)
    if do_ls:
        dus = ei.J @ p
        duc = jnp.einsum('cdv,v->cd', ei.con_J, p)

        def dphi(t):
            fs_t = solver.simple_force(us + t * dus, D_s, ei.frictionloss,
                                       unilateral)
            fc_t = solver.cone_force(uc + t * duc, D_c, mu, dim_mask)
            return (jnp.dot(p, Mi @ (a + t * p - ai)) - jnp.dot(fs_t, dus)
                    - jnp.sum(fc_t * duc))

        grid = jnp.asarray(np.geomspace(1e-3, 256.0, 15), dtype)
        vals = jax.vmap(dphi)(grid)
        neg = vals < 0
        lo = jnp.max(jnp.where(neg, grid, jnp.zeros_like(grid)))
        hi = jnp.min(jnp.where(neg, jnp.full_like(grid, 256.0), grid))

        def bisect(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            v = dphi(mid)
            return jnp.where(v < 0, mid, lo), jnp.where(v < 0, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 6, bisect, (lo, hi))
        t = 0.5 * (lo + hi)
    else:
        t = jnp.asarray(1.0, dtype)
    return a + t * p


for do_solve, do_ls, name in [(True, True, 'body full (no while)'),
                              (True, False, 'body no-linesearch'),
                              (False, True, 'body no-spdsolve'),
                              (False, False, 'body neither')]:
    bench(name, lambda M, a, e, s=do_solve, l=do_ls: jax.vmap(
        lambda Mi, ai, ei: newton_pieces(Mi, ai, ei, s, l))(M, a, e),
        M, qacc_smooth, efc)

# full solve it=1 inside a while_loop vs unrolled: isolate while_loop overhead
def solve_unrolled1(Mi, ai, ei):
    return newton_pieces(Mi, ai, ei, True, True)
bench('unrolled 1 iter (same math)', lambda M, a, e: jax.vmap(
    solve_unrolled1)(M, a, e), M, qacc_smooth, efc)
