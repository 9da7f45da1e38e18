"""Probe: does the fused batch-trailing Newton kernel (ops/newton_bt.py)
compile and run on the real TPU at a given cone-slot count C?

Round-2 blocker: compiles only to C=4; C>=6 crashed the remote compile helper
with no diagnostic (docs/PERF_NOTES.md "Batch-trailing fused solver"). The
helper is known-flaky (HTTP 500s), so re-probe before believing the wall.

Usage: python scripts/probe_bt_compile.py <C> [iterations]
Exit 0 = compiled + ran + matched the XLA solver; prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    C = int(sys.argv[1])
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_default_matmul_precision', 'highest')

    from gym_quadruped_tpu.models.builder import load_model
    import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).parent)); import newton_bt
    from gym_quadruped_tpu.physics import engine
    from gym_quadruped_tpu.physics.constraints import constraint_layout

    newton_bt.ENABLE = True

    model = load_model('go2', 'flat')
    B = 1024
    rng = np.random.RandomState(0)
    qpos = jnp.asarray(np.tile(np.asarray(model.key_qpos[0], np.float32),
                               (B, 1)))
    # perturb so contacts are active and varied
    qpos = qpos.at[:, 2].add(jnp.asarray(
        rng.uniform(-0.05, 0.01, B).astype(np.float32)))
    qvel = jnp.asarray(rng.uniform(-0.5, 0.5, (B, model.nv)).astype(np.float32))
    ctrl = jnp.asarray(rng.uniform(-2, 2, (B, model.nu)).astype(np.float32))

    lay = constraint_layout(model)

    @jax.jit
    def pre(qpos, qvel, ctrl):
        out = jax.vmap(lambda a, b, c: engine._pre_solve(
            model, a, b, c, None, None, C))(qpos, qvel, ctrl)
        return out[2], out[7], out[9]  # M, qacc_smooth, efc

    M, a_smooth, efc = pre(qpos, qvel, ctrl)
    jax.block_until_ready(a_smooth)

    @jax.jit
    def run_kernel(M, a_smooth, efc):
        return newton_bt.solve_batched_bt(model, lay, M, a_smooth, efc,
                                          iterations=iters)

    t0 = time.time()
    qacc_k, fs_k, fc_k, qfrc_k = run_kernel(M, a_smooth, efc)
    s = float(jnp.sum(qacc_k))
    compile_s = time.time() - t0
    assert np.isfinite(s), 'kernel produced non-finite qacc'

    # reference: vmapped XLA solver
    newton_bt.ENABLE = False

    @jax.jit
    def run_xla(M, a_smooth, efc):
        return newton_bt.solve_batched_bt(model, lay, M, a_smooth, efc,
                                          iterations=iters)

    qacc_x, *_ = run_xla(M, a_smooth, efc)
    err = float(jnp.max(jnp.abs(qacc_k - qacc_x)))
    scale = float(jnp.max(jnp.abs(qacc_x))) + 1.0
    print(json.dumps({'C': C, 'iters': iters, 'ok': True,
                      'compile_s': round(compile_s, 1),
                      'max_abs_err': err, 'rel_err': err / scale}))


if __name__ == '__main__':
    main()
