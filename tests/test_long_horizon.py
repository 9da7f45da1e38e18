"""Long-horizon MuJoCo-parity (SURVEY §7 hard part (a)): ≥1000 contact-rich
steps against the oracle, qacc-warmstart threaded exactly like
mjData.qacc_warmstart. The fast suite runs 200 steps (tests/test_obs_parity);
these stretch to 1000 and are gated behind RUN_SLOW=1 (CI nightly) since each
costs minutes of x64 CPU.

Reference anchor: the demo horizon in gym_quadruped's examples is 20k steps
(reference simulation.py); the bar here is 1e-3 qpos over 1000 steps.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')
import jax  # noqa: E402
import mujoco  # noqa: E402

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics import engine

pytestmark = pytest.mark.skipif(
    not os.environ.get('RUN_SLOW'),
    reason='long-horizon parity is nightly-only (RUN_SLOW=1)')


@pytest.mark.parametrize('robot,scene', [('go2', 'flat'), ('go2', 'perlin')])
def test_long_horizon_parity(robot, scene, n_steps=1000):
    mj, limits = build_mj_model(robot, scene)
    model = extract_model(mj, robot, scene, limits)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    if scene != 'flat':
        d.qpos[2] += 0.5
    mujoco.mj_forward(mj, d)

    rng = np.random.RandomState(2)
    ctrl_seq = rng.uniform(-2.0, 2.0, (n_steps, mj.nu))
    qpos = jnp.asarray(d.qpos.copy())
    qvel = jnp.asarray(d.qvel.copy())
    warm = jnp.asarray(d.qacc_warmstart.copy())

    @jax.jit
    def step(qp, qv, c, w):
        qp2, qv2, fwd = engine.step(model, qp, qv, c, warmstart=w)
        return qp2, qv2, fwd.qacc

    err, err_at = 0.0, -1
    for t in range(n_steps):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
        qpos, qvel, warm = step(qpos, qvel, jnp.asarray(ctrl_seq[t]), warm)
        e = float(np.max(np.abs(np.asarray(qpos) - d.qpos)))
        if e > err:
            err, err_at = e, t
        assert e < 1e-3, (
            f'{robot}/{scene}: qpos diverged to {e:.3e} at step {t} '
            f'(worst so far {err:.3e} @ {err_at})')
