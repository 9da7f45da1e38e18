"""Probe mjData.efc_* internals to pin constraint-assembly semantics."""
import os

import mujoco
import numpy as np

np.set_printoptions(precision=6, suppress=True, linewidth=200)

import sys
sys.path.insert(0, '/root/repo')
from gym_quadruped_tpu.models.builder import build_mj_model

robot = os.environ.get('ROBOT', 'mini_cheetah')
mj, _ = build_mj_model(robot, 'flat')
d = mujoco.MjData(mj)
mujoco.mj_resetDataKeyframe(mj, d, 0)
# drop to the ground: set base height so feet penetrate slightly
mujoco.mj_forward(mj, d)
feet = [mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_GEOM, n) for n in ['FL', 'FR', 'RL', 'RR']]
foot_z = min(d.geom_xpos[g][2] for g in feet)
r = mj.geom_size[feet[0], 0]
d.qpos[2] -= foot_z - r + 0.0005  # ~0.5 mm penetration
d.qvel[:] = np.random.RandomState(0).uniform(-0.3, 0.3, mj.nv)
d.ctrl[:] = np.random.RandomState(1).uniform(-3, 3, mj.nu)
mujoco.mj_forward(mj, d)

print('ncon', d.ncon, 'nefc', d.nefc)
print('timeconst... solref floor', mj.geom_solref[0], 'solimp floor', mj.geom_solimp[0])
for i in range(d.ncon):
    c = d.contact[i]
    print(f'contact {i}: geoms {c.geom1},{c.geom2} dim {c.dim} dist {c.dist:.6g} '
          f'mu {c.friction} margin {c.includemargin:.6g} solref {c.solref} solimp {c.solimp}')
    print('  pos', c.pos, 'frame', c.frame)
    print('  efc_address', c.efc_address)

print('\nefc rows: type / pos / margin / vel / aref / R / D / KBIP / diagApprox / frictionloss')
for i in range(d.nefc):
    print(f'{i:2d} type {d.efc_type[i]} id {d.efc_id[i]} pos {d.efc_pos[i]: .6g} margin {d.efc_margin[i]: .6g} '
          f'vel {d.efc_vel[i]: .6g} aref {d.efc_aref[i]: .6g} R {d.efc_R[i]: .4g} D {d.efc_D[i]: .4g} '
          f'KBIP {np.array(d.efc_KBIP[i])} fl {d.efc_frictionloss[i]: .4g}')

print('\ndof_invweight0', mj.dof_invweight0)
print('body_invweight0', mj.body_invweight0)
print('\nefc_J for contact rows:')
J = d.efc_J.reshape(d.nefc, mj.nv)
start = d.contact[0].efc_address if d.ncon else None
if start is not None:
    print(J[start:start + 8])
print('\nqacc', d.qacc)
print('qfrc_constraint', d.qfrc_constraint)
print('efc_force', d.efc_force)
