"""Reverse-engineer MuJoCo's elliptic-cone force law from (jar, D, mu) → force."""
import sys

import mujoco
import numpy as np

np.set_printoptions(precision=8, suppress=True, linewidth=200)
sys.path.insert(0, '/root/repo')
from gym_quadruped_tpu.models.builder import build_mj_model

mj, _ = build_mj_model('go2', 'flat')
d = mujoco.MjData(mj)

rng = np.random.RandomState(3)
for trial in range(6):
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    feet = [mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_GEOM, n) for n in ['FL', 'FR', 'RL', 'RR']]
    foot_z = min(d.geom_xpos[g][2] for g in feet)
    r = mj.geom_size[feet[0], 0]
    d.qpos[2] -= foot_z - r + 0.0002 * (trial + 1)
    d.qvel[:] = rng.uniform(-1.5, 1.5, mj.nv)   # strong sliding → middle zone
    d.ctrl[:] = rng.uniform(-10, 10, mj.nu)
    mujoco.mj_forward(mj, d)
    J = d.efc_J.reshape(d.nefc, mj.nv)
    jar = J @ d.qacc - d.efc_aref
    for i in range(d.ncon):
        c = d.contact[i]
        s, dim = c.efc_address, c.dim
        u = jar[s:s + dim]
        f = d.efc_force[s:s + dim]
        D = d.efc_D[s:s + dim]
        mu = c.friction[0]
        N, Tvec = u[0], u[1:]
        T = np.linalg.norm(Tvec)
        zone = 'top(sep)' if N >= mu * T else ('bottom' if mu * N + T <= 0 else 'mid')
        # candidate checks
        cand_bottom = -D * u
        print(f'trial {trial} con {i} zone {zone}  N {N: .5f} T {T: .5f} muT {mu*T: .5f}')
        print('   f     ', f)
        if zone == 'bottom':
            print('   -Du   ', cand_bottom)
        if zone == 'mid':
            # hypothesis: fn = Dn*(mu*T - N)*mu? / (mu^2+1); ft = -mu*fn * Tvec/T
            Dn = D[0]
            fn_h = Dn * (mu * T - N) / (mu * mu + 1)
            ft_h = -mu * fn_h * Tvec / T
            print('   hypA fn', fn_h, 'f[0]', f[0])
            print('   hypA ft', ft_h)
    if trial == 2:
        break
