"""Round-3 step cost breakdown on real TPU (go2/flat, B=4096).

Ablations:
  presolve   — FK→collide→efc only (integrate with qacc_smooth)
  it=k       — full step with Newton cap k (marginal per-iteration cost)
  ls=j       — linesearch bisection count j (grid eval held fixed)
  grid=g     — linesearch grid size g
  iters_hist — per-env Newton exit iteration distribution in a warm rollout

Usage: python scripts/profile_step3.py [section ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.physics import engine, solver
from gym_quadruped_tpu.physics.constraints import constraint_layout

B = int(os.environ.get('B', 4096))
N_STEPS = int(os.environ.get('N_STEPS', 50))
model = load_model('go2', 'flat')
lay = constraint_layout(model)


def timed(run, args, reps=3, units=B * N_STEPS):
    out = run(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    out = run(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    return units / med, med / N_STEPS * 1e3  # steps/s, ms/step


def make_inputs(seed=0):
    qpos = jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32), (B, 1))
    qvel = jnp.zeros((B, model.nv), jnp.float32)
    warm = jnp.zeros((B, model.nv), jnp.float32)
    ctrl = jax.random.uniform(jax.random.PRNGKey(seed),
                              (N_STEPS, B, model.nu), jnp.float32, -2, 2)
    return qpos, qvel, warm, ctrl


def scan_step(solve_fn):
    """Build a jitted 50-step scan around vmap(_pre_solve) + solve_fn + euler."""

    @jax.jit
    def run(qpos, qvel, warm, ctrl_seq):
        def body(carry, ctrl):
            qp, qv, warm = carry
            pre = jax.vmap(lambda a, b, c: engine._pre_solve(
                model, a, b, c, None, None, engine.MAX_CONE_CONTACTS))(
                    qp, qv, ctrl)
            (kin, cdof, M, bias, passive, act, qfrc_smooth, qacc_smooth,
             contacts, efc) = pre
            qacc, fs, fc, qfrc_c = solve_fn(M, qacc_smooth, efc, warm)
            fwd = engine.Forward(
                kin=kin, cdof=cdof, M=M, qfrc_bias=bias, qfrc_passive=passive,
                qfrc_actuator=act, qfrc_smooth=qfrc_smooth,
                qacc_smooth=qacc_smooth, contacts=contacts, efc=efc, qacc=qacc,
                efc_force=fs, f_cone=fc, qfrc_constraint=qfrc_c)
            qp2, qv2 = jax.vmap(lambda a, b, f: engine.euler(model, a, b, f))(
                qp, qv, fwd)
            return (qp2, qv2, qacc), None

        carry, _ = jax.lax.scan(body, (qpos, qvel, warm), ctrl_seq)
        return carry

    return run


def xla_solve(iterations=10, ls_iterations=6):
    def fn(M, a_smooth, efc, warm):
        return jax.vmap(lambda Mi, ai, ei, wi: solver.solve(
            model, lay, Mi, ai, ei, warmstart=wi, iterations=iterations,
            ls_iterations=ls_iterations))(M, a_smooth, efc, warm)
    return fn


def presolve_only(M, a_smooth, efc, warm):
    zfs = jnp.zeros_like(efc.aref)
    zfc = jnp.zeros(efc.con_aref.shape, a_smooth.dtype)
    return a_smooth, zfs, zfc, jnp.zeros_like(a_smooth)


sections = sys.argv[1:] or ['presolve', 'iters', 'ls', 'hist']

if 'presolve' in sections:
    r, ms = timed(scan_step(presolve_only), make_inputs())
    print(f'presolve-only: {r:,.0f} steps/s  {ms:.2f} ms/step', flush=True)

if 'iters' in sections:
    for it in (1, 2, 4, 10):
        r, ms = timed(scan_step(xla_solve(iterations=it)), make_inputs())
        print(f'it={it:2d}: {r:,.0f} steps/s  {ms:.2f} ms/step', flush=True)

if 'ls' in sections:
    for ls in (0, 3, 6):
        r, ms = timed(scan_step(xla_solve(iterations=10, ls_iterations=ls)),
                      make_inputs())
        print(f'ls={ls}: {r:,.0f} steps/s  {ms:.2f} ms/step', flush=True)

if 'hist' in sections:
    # Per-env Newton exit iterations along a warm rollout: instrument solve's
    # while_loop by re-running it with a bumping counter.
    def solve_iters(Mi, ai, ei, wi):
        qacc, *_ = solver.solve(model, lay, Mi, ai, ei, warmstart=wi,
                                iterations=10)
        return qacc

    @jax.jit
    def rollout_iters(qpos, qvel, warm, ctrl_seq):
        def body(carry, ctrl):
            qp, qv, warm = carry
            qp2, qv2, fwd = engine.step_batched(model, qp, qv, ctrl,
                                                warmstart=warm)
            # count iterations: rerun solve loop body until convergence
            return (qp2, qv2, fwd.qacc), None

        carry, _ = jax.lax.scan(body, (qpos, qvel, warm), ctrl_seq)
        return carry

    qpos, qvel, warm, ctrl = make_inputs()
    qp, qv, warm2 = rollout_iters(qpos, qvel, warm, ctrl)
    jax.block_until_ready(warm2)
    # now measure iteration counts on the FINAL state's solve
    pre = jax.jit(jax.vmap(lambda a, b, c: engine._pre_solve(
        model, a, b, c, None, None, engine.MAX_CONE_CONTACTS)))(
            qp, qv, ctrl[-1])
    M, qacc_smooth, efc = pre[2], pre[7], pre[9]

    def count_iters(Mi, ai, ei, wi):
        # replicate solve's loop, returning the exit iteration
        import gym_quadruped_tpu.physics.solver as S
        dtype = ai.dtype
        # piggyback: call solve with iterations k and compare to converged
        outs = []
        ref, *_ = S.solve(model, lay, Mi, ai, ei, warmstart=wi, iterations=10)
        for k in range(0, 11):
            qk, *_ = S.solve(model, lay, Mi, ai, ei, warmstart=wi,
                             iterations=k) if k else (wi,)
            outs.append(jnp.max(jnp.abs(qk - ref)) < 1e-4 * (
                1 + jnp.max(jnp.abs(ref))))
        return jnp.argmax(jnp.stack(outs))

    its = jax.jit(jax.vmap(lambda Mi, ai, ei, wi: count_iters(Mi, ai, ei, wi))
                  )(M, qacc_smooth, efc, warm2)
    its = np.asarray(its)
    print('newton exit-iteration histogram (warm, after 50 tumble steps):')
    print(np.bincount(its, minlength=11), flush=True)
