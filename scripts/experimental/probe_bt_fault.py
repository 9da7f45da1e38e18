"""Isolate the fused-kernel TPU worker crash: which envelope kills it?
  A: B=4096 direct (grid=4, no scan)
  B: B=64 direct (padded to 1024, grid=1)
  C: B=1024 under a 5-step scan (grid=1)
  D: B=4096 under a 5-step scan (grid=4)
Usage: python scripts/probe_bt_fault.py {A|B|C|D}
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    case = sys.argv[1]
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_default_matmul_precision', 'highest')

    from gym_quadruped_tpu.models.builder import load_model
    import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).parent)); import newton_bt
    from gym_quadruped_tpu.physics import engine

    newton_bt.ENABLE = True
    model = load_model('go2', 'flat')
    B = {'A': 4096, 'B': 64, 'C': 1024, 'D': 4096}[case]
    scan = case in ('C', 'D')
    qpos = jnp.tile(jnp.asarray(model.key_qpos[0], jnp.float32), (B, 1))
    qvel = jnp.zeros((B, model.nv), jnp.float32)
    warm = jnp.zeros((B, model.nv), jnp.float32)

    if not scan:
        @jax.jit
        def run(qpos, qvel, ctrl, warm):
            return engine.step_batched(model, qpos, qvel, ctrl,
                                       warmstart=warm)[0]

        ctrl = jax.random.uniform(jax.random.PRNGKey(0), (B, model.nu),
                                  jnp.float32, -2, 2)
        out = run(qpos, qvel, ctrl, warm)
    else:
        @jax.jit
        def run(qpos, qvel, warm, ctrl_seq):
            def body(carry, ctrl):
                qp, qv, fwd = engine.step_batched(
                    model, carry[0], carry[1], ctrl, warmstart=carry[2])
                return (qp, qv, fwd.qacc), None

            (qp, qv, w), _ = jax.lax.scan(body, (qpos, qvel, warm), ctrl_seq)
            return qp

        ctrl = jax.random.uniform(jax.random.PRNGKey(0),
                                  (5, B, model.nu), jnp.float32, -2, 2)
        out = run(qpos, qvel, warm, ctrl)
    s = float(jnp.sum(out))
    print(f'case {case}: OK sum={s:.4f} finite={np.isfinite(s)}')


if __name__ == '__main__':
    main()
