"""Oracle check: constrained qacc + trajectory parity."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import sys

import mujoco
import numpy as np

sys.path.insert(0, '/root/repo')
import jax.numpy as jnp

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics import engine

np.set_printoptions(precision=6, suppress=True, linewidth=200)

robot = os.environ.get('ROBOT', 'mini_cheetah')
mj, limits = build_mj_model(robot, 'flat')
model = extract_model(mj, robot, 'flat', limits)
d = mujoco.MjData(mj)
rng = np.random.RandomState(0)

print(f'=== {robot}: single-state qacc parity ===')
fwd_jit = jax.jit(lambda qp, qv, c: engine.forward(model, qp, qv, c))
worst = 0
for trial in range(8):
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    feet = model.feet_geom_id
    foot_z = min(d.geom_xpos[g][2] for g in feet)
    r = mj.geom_size[feet[0], 0]
    # set base height: some trials in contact, some in flight
    d.qpos[2] -= foot_z - r + rng.uniform(-0.01, 0.003)
    d.qpos[7:] += rng.uniform(-0.3, 0.3, mj.nq - 7)
    d.qvel[:] = rng.uniform(-1, 1, mj.nv)
    d.ctrl[:] = rng.uniform(-5, 5, mj.nu)
    d.qacc_warmstart[:] = 0
    mujoco.mj_forward(mj, d)

    fwd = fwd_jit(jnp.asarray(d.qpos), jnp.asarray(d.qvel), jnp.asarray(d.ctrl))
    err = np.max(np.abs(np.asarray(fwd.qacc) - d.qacc))
    rel = err / (1 + np.max(np.abs(d.qacc)))
    worst = max(worst, rel)
    print(f'trial {trial}: ncon_mj {d.ncon:2d} qacc maxerr {err:.3e} rel {rel:.3e}')
print('worst rel', worst)

print(f'\n=== {robot}: trajectory parity (200 steps, torque ctrl) ===')
mujoco.mj_resetDataKeyframe(mj, d, 0)
mujoco.mj_forward(mj, d)
qpos = jnp.asarray(d.qpos.copy())
qvel = jnp.asarray(d.qvel.copy())
ctrl_seq = rng.uniform(-3, 3, (200, mj.nu)) * 0.5

step_jit = jax.jit(lambda qp, qv, c: engine.step(model, qp, qv, c)[:2])
for t in range(200):
    d.ctrl[:] = ctrl_seq[t]
    mujoco.mj_step(mj, d)
    qpos, qvel = step_jit(qpos, qvel, jnp.asarray(ctrl_seq[t]))
    if t % 40 == 0 or t == 199:
        err_q = np.max(np.abs(np.asarray(qpos) - d.qpos))
        err_v = np.max(np.abs(np.asarray(qvel) - d.qvel))
        print(f'step {t:3d}: qpos err {err_q:.3e} qvel err {err_v:.3e} base_z {d.qpos[2]:.3f}')
