"""Decode MuJoCo 3.10's DEFAULT mesh-mesh multi-contact rule at frozen poses.

Strategy: replay hyqreal1/flat (seed 2, amp 2) to steps with >=2-contact
mesh-mesh manifolds, extract the two hulls into a standalone 2-body model
(inline <mesh vertex=...> in the ORIGINAL mesh frame — the compiler bakes its
re-centering compensation into geom_pos/quat, so setting the body pose to the
original geom_xpos/xmat reproduces the world configuration exactly), then:
  a) mj_forward at the frozen pose -> the manifold to reproduce;
  b) mj_forward at the 4 TILTED configs of the decoded cyl-box rule
     (A by R(t, -s*eps), B by R(t, +s*eps) about geom centers, eps=1e-3)
     -> does each give a SINGLE contact, and do the 4 witnesses (+ mean,
     after dedup) reproduce (a)?
All pure-C MuJoCo; no JAX.
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

import mujoco
import numpy as np

from gym_quadruped_tpu.models.builder import build_mj_model

PAIR_XML = """
<mujoco>
  <asset>
    <mesh name="mA" vertex="{vA}"/>
    <mesh name="mB" vertex="{vB}"/>
  </asset>
  <worldbody>
    <body name="A" pos="0 0 0">
      <freejoint/>
      <geom name="gA" type="mesh" mesh="mA" mass="1" margin="0.001"
            condim="3" friction="0.8 0.02 0.01"/>
    </body>
    <body name="B" pos="0 0 2">
      <freejoint/>
      <geom name="gB" type="mesh" mesh="mB" mass="1" margin="0.001"
            condim="3" friction="0.8 0.02 0.01"/>
    </body>
  </worldbody>
</mujoco>
"""


def mesh_local_verts(mj, g):
    mid = mj.geom_dataid[g]
    a, n = mj.mesh_vertadr[mid], mj.mesh_vertnum[mid]
    return np.array(mj.mesh_vert[a:a + n], np.float64)


def quat_from_mat(R):
    q = np.empty(4)
    mujoco.mju_mat2Quat(q, np.asarray(R, np.float64).flatten())
    return q


def tangents(n):
    a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
    t1 = np.cross(n, a)
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(n, t1)
    return t1, t2


def rot(t, ang):
    q = np.empty(4)
    mujoco.mju_axisAngle2Quat(q, np.asarray(t, np.float64), ang)
    R = np.empty(9)
    mujoco.mju_quat2Mat(R, q)
    return R.reshape(3, 3)


def run_pose(pm, pd, pA, RA, pB, RB):
    pd.qpos[0:3] = pA
    pd.qpos[3:7] = quat_from_mat(RA)
    pd.qpos[7:10] = pB
    pd.qpos[10:14] = quat_from_mat(RB)
    mujoco.mj_forward(pm, pd)
    out = []
    for k in range(pd.ncon):
        c = pd.contact[k]
        out.append((float(c.dist), c.pos.copy(), c.frame[:3].copy()))
    return out


def main():
    mj, _ = build_mj_model('hyqreal1', 'flat')
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    rng = np.random.RandomState(2)
    ctrl_seq = rng.uniform(-2, 2, (200, mj.nu))
    mesh_geoms = set(int(g) for g in range(mj.ngeom)
                     if mj.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH)

    cases = []
    for t in range(200):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
        pairs = {}
        for k in range(d.ncon):
            c = d.contact[k]
            key = (int(c.geom1), int(c.geom2))
            if key[0] in mesh_geoms and key[1] in mesh_geoms:
                pairs.setdefault(key, []).append(
                    (float(c.dist), c.pos.copy(), c.frame[:3].copy()))
        for (g1, g2), rows in pairs.items():
            if len(rows) >= 2 and len(cases) < 5:
                poses = {g: (d.geom_xpos[g].copy(),
                             d.geom_xmat[g].reshape(3, 3).copy())
                         for g in (g1, g2)}
                cases.append((t, g1, g2, poses, rows))

    for t, g1, g2, poses, rows in cases:
        print(f'\n===== step {t} geoms {g1}-{g2}: mj manifold '
              f'({len(rows)} contacts)')
        for dist, pos, n in rows:
            print(f'   dist={dist:+.6e} pos={np.round(pos, 6)} '
                  f'n={np.round(n, 5)}')

        VA = mesh_local_verts(mj, g1)
        VB = mesh_local_verts(mj, g2)
        pA0, RA0 = poses[g1]
        pB0, RB0 = poses[g2]
        xml = PAIR_XML.format(
            vA=' '.join(f'{x:.9f}' for x in VA.flatten()),
            vB=' '.join(f'{x:.9f}' for x in VB.flatten()))
        pm = mujoco.MjModel.from_xml_string(xml)
        pd = mujoco.MjData(pm)

        base = run_pose(pm, pd, pA0, RA0, pB0, RB0)
        print(f'   standalone reproduction ({len(base)} contacts):')
        for dist, pos, n in base:
            print(f'   dist={dist:+.6e} pos={np.round(pos, 6)} '
                  f'n={np.round(n, 5)}')
        if not base:
            continue

        n0 = min(base, key=lambda g: g[0])[2]
        cA = pd.geom_xpos[0].copy()
        cB = pd.geom_xpos[1].copy()
        t1, t2 = tangents(n0)
        wits = []
        eps = 1e-3
        for nm, ax in (('t1', t1), ('t2', t2)):
            for s in (1.0, -1.0):
                Rp = rot(ax, -s * eps)
                Rq = rot(ax, +s * eps)
                pA = cA + Rp @ (pA0 - cA)
                pB = cB + Rq @ (pB0 - cB)
                got = run_pose(pm, pd, pA, Rp @ RA0, pB, Rq @ RB0)
                print(f'   tilt {nm}{s:+.0f}: {len(got)} contacts '
                      + ' '.join(f'{g[0]:+.2e}@{np.round(g[1], 5)}'
                                 for g in got[:3]))
                if got:
                    deepest = min(got, key=lambda g: g[0])
                    wits.append(deepest[1])
        if wits:
            wits = np.stack(wits)
            print('   perturbed witnesses:')
            print(np.round(wits, 6))
            print('   mean:', np.round(wits.mean(0), 6))


if __name__ == '__main__':
    main()
