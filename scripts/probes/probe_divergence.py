"""Single-step divergence probe vs the MuJoCo oracle.

Steps CPU MuJoCo along a random-torque trajectory; at EVERY step re-seeds our
engine from MuJoCo's exact (qpos, qvel, qacc_warmstart) and compares the
one-step result. Trajectory chaos is removed, so the worst step points at the
specific contact state (and collider) that diverges. At the worst step the
oracle's contact list and ours are printed side by side.

Usage: python scripts/probe_divergence.py robot scene [steps] [amp]
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(_ROOT, 'tests'))
sys.path.insert(0, _ROOT)
import conftest  # noqa: F401  (forces CPU backend + x64 + compile cache)

import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics import engine, collision
from gym_quadruped_tpu.physics.kinematics import fk


def main(robot, scene, n_steps=200, amp=2.0):
    mj, limits = build_mj_model(robot, scene)
    model = extract_model(mj, robot, scene, limits)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    if scene != 'flat':
        d.qpos[2] += 0.5
    mujoco.mj_forward(mj, d)

    rng = np.random.RandomState(2)
    stance = amp == 'stance'   # PD hold at the keyframe (test_parity_matrix)
    q0 = d.qpos[7:].copy()
    if not stance:
        ctrl_seq = rng.uniform(-amp, amp, (n_steps, mj.nu))

    @jax.jit
    def step(qp, qv, c, w):
        qp2, qv2, fwd = engine.step(model, qp, qv, c, warmstart=w)
        return qp2, qv2, fwd.qacc

    worst = []  # (err, t, qpos, qvel, warm, ctrl)
    for t in range(n_steps):
        qp = jnp.asarray(d.qpos.copy())
        qv = jnp.asarray(d.qvel.copy())
        w = jnp.asarray(d.qacc_warmstart.copy())
        ct = (30.0 * (q0 - d.qpos[7:]) - 1.0 * d.qvel[6:]) if stance \
            else ctrl_seq[t]
        c = jnp.asarray(ct)
        d.ctrl[:] = ct
        mujoco.mj_step(mj, d)
        qp2, qv2, qacc = step(qp, qv, c, w)
        e_qacc = float(np.max(np.abs(np.asarray(qacc) - d.qacc)))
        e_qpos = float(np.max(np.abs(np.asarray(qp2) - d.qpos)))
        worst.append((e_qacc, e_qpos, t,
                      np.asarray(qp), np.asarray(qv), np.asarray(w), np.asarray(c)))
        if t % 25 == 0:
            print(f't={t:4d} e_qacc={e_qacc:.3e} e_qpos={e_qpos:.3e} '
                  f'ncon_mj={d.ncon}', flush=True)

    worst.sort(key=lambda r: -r[0])
    print('\ntop-5 single-step qacc errors:')
    for e_qacc, e_qpos, t, *_ in worst[:5]:
        print(f'  t={t:4d}  e_qacc={e_qacc:.4e}  e_qpos={e_qpos:.4e}')

    # dump the contact comparison at the worst step
    e_qacc, e_qpos, t, qp, qv, w, c = worst[0]
    d2 = mujoco.MjData(mj)
    d2.qpos[:] = qp
    d2.qvel[:] = qv
    mujoco.mj_forward(mj, d2)
    tname = {0: 'plane', 1: 'hfield', 2: 'sphere', 3: 'capsule',
             4: 'ellipsoid', 5: 'cylinder', 6: 'box', 7: 'mesh'}
    print(f'\n== worst step t={t} ==  MuJoCo ncon={d2.ncon}')
    for i in range(d2.ncon):
        con = d2.contact[i]
        g1, g2 = con.geom1, con.geom2
        print(f'  mj  {tname[int(mj.geom_type[g1])]:9s}{g1:3d} '
              f'{tname[int(mj.geom_type[g2])]:9s}{g2:3d} '
              f'dist={con.dist:+.5f} pos={np.array2string(con.pos, precision=3)} '
              f'n={np.array2string(con.frame[:3], precision=3)}')
    kin = fk(model, jnp.asarray(qp))
    cons = collision.collide(model, kin)
    specs = collision.contact_layout(model)
    dist = np.asarray(cons.dist)
    pos = np.asarray(cons.pos)
    nrm = np.asarray(cons.normal)
    # map slots back to (geom1, geom2): layout order matches specs x k
    slot = 0
    print(f'\nours: active slots (dist<0.002) of {dist.shape[0]}')
    for s in specs:
        for k in range(s.ncon):
            if dist[slot] < 0.002:
                print(f'  us  {tname[int(model.geom_type[s.geom1])]:9s}{s.geom1:3d} '
                      f'{tname[int(model.geom_type[s.geom2])]:9s}{s.geom2:3d} '
                      f'dist={dist[slot]:+.5f} '
                      f'pos={np.array2string(pos[slot], precision=3)} '
                      f'n={np.array2string(nrm[slot], precision=3)}')
            slot += 1


if __name__ == '__main__':
    a = sys.argv[1:]
    _amp = a[3] if len(a) > 3 else 2.0
    main(a[0], a[1], int(a[2]) if len(a) > 2 else 200,
         _amp if _amp == 'stance' else float(_amp))
