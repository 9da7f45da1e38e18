"""Decode mjc_PlaneConvex on a SYNTHETIC 8-vertex box mesh: every hull vertex
is far from the others, so selection rules are unambiguous. Systematic poses:
flat face down, edge down, corner down, slightly tilted variants.
"""

import numpy as np
import mujoco

XML = """
<mujoco>
  <asset>
    <mesh name="boxmesh" vertex="-.3 -.2 -.1   .3 -.2 -.1   -.3 .2 -.1
        .3 .2 -.1   -.3 -.2 .1   .3 -.2 .1   -.3 .2 .1   .3 .2 .1"/>
  </asset>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="mesh" mesh="boxmesh" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def run(mj, d, pos, quat):
    d.qpos[:3] = pos
    d.qpos[3:7] = quat / np.linalg.norm(quat)
    mujoco.mj_forward(mj, d)
    out = []
    for ci in range(d.ncon):
        c = d.contact[ci]
        out.append((round(float(c.dist), 6), np.round(c.pos, 5).tolist()))
    return out


def quat_axis(axis, deg):
    a = np.asarray(axis, float)
    a /= np.linalg.norm(a)
    th = np.radians(deg) / 2
    return np.array([np.cos(th), *(np.sin(th) * a)])


def main():
    mj = mujoco.MjModel.from_xml_string(XML)
    d = mujoco.MjData(mj)
    mid = 0
    adr = mj.mesh_graphadr[mid]
    g = mj.mesh_graph[adr:]
    nv = g[0]
    print('hull verts:', nv)
    vadr = mj.mesh_vertadr[mid]
    print('verts:', np.round(mj.mesh_vert[vadr:vadr + nv], 3).tolist())

    cases = [
        ('face down flat, z=0.095 (5mm pen)', [0, 0, 0.095], quat_axis([1, 0, 0], 0)),
        ('face down, tilt 1deg about x', [0, 0, 0.095], quat_axis([1, 0, 0], 1)),
        ('face down, tilt 1deg about y', [0, 0, 0.095], quat_axis([0, 1, 0], 1)),
        ('face down, tilt 1deg about [1,1,0]', [0, 0, 0.095], quat_axis([1, 1, 0], 1)),
        ('face down, tilt 5deg about x', [0, 0, 0.09], quat_axis([1, 0, 0], 5)),
        ('edge down (45deg about x)', [0, 0, 0.21], quat_axis([1, 0, 0], 45)),
        ('edge down, +1deg about y', [0, 0, 0.21],
         quat_axis([0, 1, 0], 1) if True else None),
        ('corner down', [0, 0, 0.36],
         quat_axis([1, 0, 0], 45) * 0 + quat_axis([1, 1, 0], 50)),
        ('face down deep (5cm pen)', [0, 0, 0.05], quat_axis([1, 0, 0], 0)),
    ]
    # edge-down needs combined rotation: do it properly below
    for name, pos, q in cases:
        cons = run(mj, d, pos, q)
        print(f'{name}: n={len(cons)}')
        for c in cons:
            print('   ', c)


if __name__ == '__main__':
    main()
