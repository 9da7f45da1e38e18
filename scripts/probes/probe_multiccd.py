"""Decode MuJoCo's multiccd perturbation rule (cyl-box) using MuJoCo itself.

Replays b2/flat (amp=2.0, seed 2) to the worst divergence step, extracts each
cylinder-box self-collision pair into a standalone 2-geom model, then compares:
  a) multiccd DISABLED  -> the single EPA contact (dir, depth, witness pos)
  b) multiccd ENABLED   -> the 5-point manifold we must reproduce
  c) single contacts of PERTURBED configurations under candidate rules
     (rotate geom2 / geom1 / both by +-1e-3 about contact-tangent axes, about
      the contact point or the geom center) -> which rule reproduces (b)?

All pure-C MuJoCo, runs in seconds. No JAX.
"""

import sys
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

import mujoco
import numpy as np

from gym_quadruped_tpu.models.builder import build_mj_model

PAIR_XML = """
<mujoco>
  <option>
    <flag multiccd="{multiccd}"/>
  </option>
  <worldbody>
    <body name="A" pos="0 0 0">
      <freejoint/>
      <geom name="gA" type="{tA}" size="{sA}" mass="1"/>
    </body>
    <body name="B" pos="0 0 2">
      <freejoint/>
      <geom name="gB" type="{tB}" size="{sB}" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""

TNAME = {2: 'sphere', 3: 'capsule', 5: 'cylinder', 6: 'box'}


def quat_from_mat(R):
    q = np.empty(4)
    mujoco.mju_mat2Quat(q, R.flatten())
    return q


def collide_pair(tA, sA, pA, RA, tB, sB, pB, RB, multiccd):
    xml = PAIR_XML.format(
        multiccd='enable' if multiccd else 'disable',
        tA=TNAME[tA], sA=' '.join(f'{x:.17g}' for x in sA[:2] if tA != 6) or
        ' '.join(f'{x:.17g}' for x in sA),
        tB=TNAME[tB], sB=' '.join(f'{x:.17g}' for x in sB[:2] if tB != 6) or
        ' '.join(f'{x:.17g}' for x in sB))
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    d.qpos[0:3] = pA
    d.qpos[3:7] = quat_from_mat(RA)
    d.qpos[7:10] = pB
    d.qpos[10:14] = quat_from_mat(RB)
    mujoco.mj_forward(m, d)
    out = []
    for i in range(d.ncon):
        c = d.contact[i]
        out.append((c.dist, c.pos.copy(), c.frame[:3].copy()))
    return out


def rot(axis, ang):
    axis = axis / np.linalg.norm(axis)
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    R = np.empty(9)
    mujoco.mju_quat2Mat(R, q)
    return R.reshape(3, 3)


def tangents(n):
    ref = np.array([0., 0., 1.]) if abs(n[2]) < 0.99 else np.array([1., 0., 0.])
    t1 = np.cross(n, ref)
    t1 /= np.linalg.norm(t1)
    return t1, np.cross(n, t1)


def main():
    robot, scene, worst_t = 'b2', 'flat', 148
    mj, _ = build_mj_model(robot, scene)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    rng = np.random.RandomState(2)
    ctrl_seq = rng.uniform(-2.0, 2.0, (400, mj.nu))
    for t in range(worst_t):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
    mujoco.mj_forward(mj, d)

    # cylinder-box pairs in contact
    pairs = {}
    for i in range(d.ncon):
        c = d.contact[i]
        t1, t2 = int(mj.geom_type[c.geom1]), int(mj.geom_type[c.geom2])
        if {t1, t2} == {5, 6}:
            pairs.setdefault((c.geom1, c.geom2), []).append(
                (c.dist, c.pos.copy(), c.frame[:3].copy()))

    for (g1, g2), cons in pairs.items():
        t1, t2 = int(mj.geom_type[g1]), int(mj.geom_type[g2])
        s1, s2 = mj.geom_size[g1].copy(), mj.geom_size[g2].copy()
        p1, R1 = d.geom_xpos[g1].copy(), d.geom_xmat[g1].reshape(3, 3).copy()
        p2, R2 = d.geom_xpos[g2].copy(), d.geom_xmat[g2].reshape(3, 3).copy()

        print(f'\n==== pair geom{g1}({TNAME[t1]}) geom{g2}({TNAME[t2]}) ====')
        print('full-model multiccd contacts:')
        for dist, pos, n in cons:
            print(f'  dist={dist:+.6f} pos={pos} n={n}')

        iso_on = collide_pair(t1, s1, p1, R1, t2, s2, p2, R2, True)
        print('isolated multiccd=enable:')
        for dist, pos, n in iso_on:
            print(f'  dist={dist:+.6f} pos={pos} n={n}')

        iso_off = collide_pair(t1, s1, p1, R1, t2, s2, p2, R2, False)
        print('isolated multiccd=disable:')
        for dist, pos, n in iso_off:
            print(f'  dist={dist:+.6f} pos={pos} n={n}')

        if not iso_off:
            continue
        dist0, pos0, n0 = iso_off[0]
        tt1, tt2 = tangents(n0)
        eps = 1e-3
        for name, center, target in [
            ('rotB@pos', pos0, 'B'), ('rotB@Bcen', p2, 'B'),
            ('rotA@pos', pos0, 'A'), ('rotA@Acen', p1, 'A'),
            ('rotBoth@pos', pos0, 'AB'),
        ]:
            print(f'  perturb rule {name}:')
            for ax in (tt1, tt2):
                for s in (+1, -1):
                    Rp = rot(ax, s * eps)
                    pA2, RA2, pB2, RB2 = p1, R1, p2, R2
                    if 'A' in target:
                        RA2 = Rp @ R1
                        pA2 = center + Rp @ (p1 - center)
                    if 'B' in target:
                        RB2 = Rp @ R2
                        pB2 = center + Rp @ (p2 - center)
                    got = collide_pair(t1, s1, pA2, RA2, t2, s2, pB2, RB2,
                                       False)
                    if got:
                        dist, pos, n = got[0]
                        print(f'    {s:+d}{"t1" if ax is tt1 else "t2"} '
                              f'dist={dist:+.6f} pos={pos} n={n}')
                    else:
                        print(f'    {s:+d} no contact')


if __name__ == '__main__':
    main()
