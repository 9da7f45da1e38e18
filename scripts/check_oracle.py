"""Interactive oracle-parity checker (development tool; tests formalize this)."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import mujoco
import numpy as np

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics import dynamics, kinematics

robot = os.environ.get('ROBOT', 'mini_cheetah')
mj, limits = build_mj_model(robot, 'flat')
model = extract_model(mj, robot, 'flat', limits)
d = mujoco.MjData(mj)

rng = np.random.RandomState(0)
worst = {}


def track(name, a, b):
    if np.asarray(a).size == 0:
        return
    err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
    worst[name] = max(worst.get(name, 0), err)


for trial in range(10):
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    d.qpos[:3] += rng.uniform(-1, 1, 3)
    q = rng.randn(4)
    d.qpos[3:7] = q / np.linalg.norm(q)
    d.qpos[7:] += rng.uniform(-0.5, 0.5, mj.nq - 7)
    d.qvel[:] = rng.uniform(-1, 1, mj.nv)
    mujoco.mj_forward(mj, d)

    kin = kinematics.fk(model, jax.numpy.asarray(d.qpos))
    track('xpos', kin.xpos, d.xpos)
    track('xquat', np.abs(np.asarray(kin.xquat)), np.abs(d.xquat))
    track('xipos', kin.xipos, d.xipos)
    track('geom_xpos', kin.geom_xpos, d.geom_xpos)
    track('geom_xmat', kin.geom_xmat, d.geom_xmat.reshape(-1, 3, 3))
    track('site_xpos', kin.site_xpos, d.site_xpos)
    track('subtree_com', kin.subtree_com, d.subtree_com)
    track('xanchor', kin.xanchor, d.xanchor)
    track('xaxis', kin.xaxis, d.xaxis)

    M = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, M)
    track('M', dynamics.mass_matrix(model, kin), M)
    track('qfrc_bias', dynamics.rne_bias(model, kin, jax.numpy.asarray(d.qvel)), d.qfrc_bias)
    track('qfrc_passive', dynamics.passive_force(model, jax.numpy.asarray(d.qpos), jax.numpy.asarray(d.qvel)), d.qfrc_passive)

for k, v in worst.items():
    print(f'{k:14s} {v:.3e}')
