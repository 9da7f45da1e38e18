"""Batch-trailing fused Newton kernel vs the XLA solver (interpreter mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.ops import newton_bt
from gym_quadruped_tpu.physics import engine, solver
from gym_quadruped_tpu.physics.constraints import constraint_layout, cull_cone_slots


def test_bt_solver_matches_xla_interpret():
    m = load_model('go2', 'flat')
    lay = constraint_layout(m)
    B = 8
    key = jax.random.PRNGKey(0)
    qpos = jnp.tile(jnp.asarray(m.key_qpos[0], jnp.float32), (B, 1))
    qpos = qpos.at[:, 2].add(
        jax.random.uniform(key, (B,), jnp.float32, -0.02, 0.01))
    qvel = 0.3 * jax.random.normal(key, (B, m.nv), jnp.float32)
    ctrl = jax.random.uniform(key, (B, m.nu), jnp.float32, -3, 3)

    pre = jax.vmap(lambda a, b, c: engine._pre_solve(m, a, b, c))(
        qpos, qvel, ctrl)
    M, qacc_smooth, efc = pre[2], pre[7], pre[9]
    efc, _ = jax.vmap(lambda e: cull_cone_slots(e, engine.MAX_CONE_CONTACTS))(efc)

    ref = jax.vmap(lambda Mi, ai, ei: solver.solve(m, lay, Mi, ai, ei))(
        M, qacc_smooth, efc)

    newton_bt.INTERPRET = True
    try:
        out = newton_bt.solve_batched_bt(m, lay, M, qacc_smooth, efc)
    finally:
        newton_bt.INTERPRET = False

    for name, a, b in zip(('qacc', 'f_simple', 'f_cone', 'qfrc'), out, ref):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        scale = 1 + float(np.max(np.abs(np.asarray(b))))
        assert err / scale < 1e-4, f'{name}: rel err {err / scale:.2e}'
