"""Systematic mjc_PlaneConvex decode on an irregular random hull: print, per
pose, the below-plane vertex set (local index, local coords, world z) and the
emitted contacts, plus the plane normal in mesh-local coordinates. Then test
selection-rule hypotheses offline over this table.
"""

import numpy as np
import mujoco

rng = np.random.RandomState(3)
V = rng.uniform(-0.2, 0.2, (12, 3)) * np.array([1.5, 1.0, 0.7])
vtx = ' '.join(f'{x:.6f}' for x in V.ravel())
XML = f"""
<mujoco>
  <asset><mesh name="m" vertex="{vtx}"/></asset>
  <worldbody><geom type="plane" size="5 5 .1"/>
  <body pos="0 0 1"><freejoint/><geom type="mesh" mesh="m" mass="1"/></body>
  </worldbody>
</mujoco>"""


def main():
    mj = mujoco.MjModel.from_xml_string(XML)
    d = mujoco.MjData(mj)
    mid = 0
    adr = mj.mesh_graphadr[mid]
    g = mj.mesh_graph[adr:]
    nv = g[0]
    globalid = g[2 + nv:2 + 2 * nv]
    vadr = mj.mesh_vertadr[mid]
    hull = np.asarray(mj.mesh_vert[vadr + globalid], np.float64)
    print(f'hull verts: {nv}')

    rng2 = np.random.RandomState(11)
    for pose in range(14):
        q = rng2.uniform(-1, 1, 4)
        q /= np.linalg.norm(q)
        d.qpos[:3] = [0, 0, rng2.uniform(0.08, 0.2)]
        d.qpos[3:7] = q
        mujoco.mj_forward(mj, d)
        R = d.geom_xmat[1].reshape(3, 3)
        p = d.geom_xpos[1]
        world = hull @ R.T + p
        nloc = R.T @ np.array([0, 0, 1.0])
        below = np.where(world[:, 2] < 0)[0]
        cons = []
        for ci in range(d.ncon):
            c = d.contact[ci]
            v = np.array([c.pos[0], c.pos[1], c.dist])
            k = int(np.argmin(np.linalg.norm(world - v[None], axis=1)))
            cons.append((ci, k, round(float(c.dist), 5)))
        print(f'pose {pose}: nloc={np.round(nloc, 4).tolist()} '
              f'below={[(int(k), round(float(world[k, 2]), 5)) for k in below]}')
        print(f'   emitted={cons}')


if __name__ == '__main__':
    main()
