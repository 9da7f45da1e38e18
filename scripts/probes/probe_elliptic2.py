"""Test: efc_force == R-metric projection of -D*jar onto elliptic cone K =
{f : sum_i (f_i/mu_i)^2 <= f_n^2, f_n >= 0}?"""
import sys

import mujoco
import numpy as np
from scipy.optimize import minimize

np.set_printoptions(precision=6, suppress=True, linewidth=200)
sys.path.insert(0, '/root/repo')
from gym_quadruped_tpu.models.builder import build_mj_model

mj, _ = build_mj_model('go2', 'flat')
d = mujoco.MjData(mj)

rng = np.random.RandomState(3)
for trial in range(3):
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    feet = [mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_GEOM, n) for n in ['FL', 'FR', 'RL', 'RR']]
    foot_z = min(d.geom_xpos[g][2] for g in feet)
    r = mj.geom_size[feet[0], 0]
    d.qpos[2] -= foot_z - r + 0.0002 * (trial + 1)
    d.qvel[:] = rng.uniform(-1.5, 1.5, mj.nv)
    d.ctrl[:] = rng.uniform(-10, 10, mj.nu)
    mujoco.mj_forward(mj, d)
    J = d.efc_J.reshape(d.nefc, mj.nv)
    jar = J @ d.qacc - d.efc_aref
    for i in range(d.ncon):
        c = d.contact[i]
        s, dim = c.efc_address, c.dim
        u = jar[s:s + dim]
        f_mj = d.efc_force[s:s + dim]
        D = d.efc_D[s:s + dim]
        R = d.efc_R[s:s + dim]
        mu = np.array(c.friction[:dim - 1])
        f0 = -D * u

        def obj(f):
            return 0.5 * np.sum(R * (f - f0) ** 2)

        cons = [
            {'type': 'ineq', 'fun': lambda f: f[0] ** 2 - np.sum((f[1:] / mu) ** 2)},
            {'type': 'ineq', 'fun': lambda f: f[0]},
        ]
        res = minimize(obj, np.maximum(f_mj, 0) + 0.1, constraints=cons,
                       method='SLSQP', options={'maxiter': 300, 'ftol': 1e-14})
        err = np.max(np.abs(res.x - f_mj))
        print(f'trial {trial} con {i}: proj err {err:.3e}  fn_mj {f_mj[0]:.4f} fn_proj {res.x[0]:.4f}')
