"""Long-horizon MuJoCo-parity (SURVEY §7 hard part (a)), qacc-warmstart
threaded exactly like mjData.qacc_warmstart. Gated behind RUN_SLOW=1 (CI
nightly) since each combo costs minutes of x64 CPU.

Two regimes, because contact-rich tumbling is CHAOTIC: measured on go2/flat,
a ~1e-7 state difference at step 200 amplifies to 1e-3 by step ~270 — error
doubles every ~5-6 steps, so NO reimplementation (including MuJoCo against
itself with different compiler flags) can hold 1e-3 for 1000 random-torque
steps. The honest long-horizon statements are therefore:
  stance — PD hold (contracting dynamics, contacts loaded): 1e-3 over 1000
    steps. This is the regime the reference's 20k-step demos live in.
  random — uniform torque tumbling: 1e-3 up to the measured chaos horizon
    (250 steps), strictly beyond the 200-step fast-suite bar.
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


@pytest.mark.parametrize('robot,scene,mode,n_steps', [
    ('go2', 'flat', 'stance', 1000),
    ('go2', 'perlin', 'stance', 1000),
    ('go2', 'flat', 'random', 250),
], ids=['go2-flat-stance-1000', 'go2-perlin-stance-1000',
        'go2-flat-random-250'])
def test_long_horizon_parity(robot, scene, mode, n_steps):
    mj, limits = build_mj_model(robot, scene)
    model = extract_model(mj, robot, scene, limits)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    if scene != 'flat':
        d.qpos[2] += 0.5
    mujoco.mj_forward(mj, d)

    rng = np.random.RandomState(2)
    q0 = d.qpos[7:].copy()
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
        if mode == 'random':
            c = ctrl_seq[t]
        else:
            c = 30.0 * (q0 - d.qpos[7:]) - 1.0 * d.qvel[6:]
        d.ctrl[:] = c
        mujoco.mj_step(mj, d)
        qpos, qvel, warm = step(qpos, qvel, jnp.asarray(c), warm)
        e = float(np.max(np.abs(np.asarray(qpos) - d.qpos)))
        if e > err:
            err, err_at = e, t
        assert e < 1e-3, (
            f'{robot}/{scene}/{mode}: qpos diverged to {e:.3e} at step {t} '
            f'(worst so far {err:.3e} @ {err_at})')
