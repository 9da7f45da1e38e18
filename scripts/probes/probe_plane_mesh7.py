"""Dump raw adjacency structure for specific plane-mesh manifolds: v0's
neighbor list IN GRAPH ORDER with depths/xy-offsets, marking emitted ones.
Also dump, for each emitted secondary vertex, whether (v0, v) is a hull edge
and the depths of the 1-2 faces containing that edge.
"""

import os
import sys
from collections import defaultdict

import mujoco
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from gym_quadruped_tpu.models.builder import build_mj_model  # noqa: E402
from scripts.probe_plane_mesh3 import hull_data  # noqa: E402


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else 'hyqreal1'
    mj, _ = build_mj_model(robot, 'flat', strip_meshes=False)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(0)

    shown = 0
    for trial in range(20):
        mujoco.mj_resetDataKeyframe(mj, d, 0)
        q = rng.uniform(-1, 1, 4)
        q /= np.linalg.norm(q)
        d.qpos[3:7] = q
        d.qpos[2] = rng.uniform(0.05, 0.25)
        d.qpos[7:] += rng.uniform(-0.5, 0.5, mj.nq - 7)
        mujoco.mj_forward(mj, d)

        groups = defaultdict(list)
        for ci in range(d.ncon):
            c = d.contact[ci]
            if mj.geom_type[c.geom1] != mujoco.mjtGeom.mjGEOM_PLANE:
                continue
            if mj.geom_type[c.geom2] != mujoco.mjtGeom.mjGEOM_MESH:
                continue
            groups[c.geom2].append((c.dist, c.pos.copy()))

        for g, cons in groups.items():
            if shown >= 8:
                return
            shown += 1
            mid = mj.geom_dataid[g]
            hv, nbrs = hull_data(mj, mid)
            R = d.geom_xmat[g].reshape(3, 3)
            p = d.geom_xpos[g]
            world = hv @ R.T + p
            obs = np.array([[c[1][0], c[1][1], c[0]] for c in cons])
            v0 = int(np.argmin(world[:, 2]))

            def is_obs(k):
                return bool(np.min(np.linalg.norm(
                    obs - world[k][None], axis=1)) < 1e-9)

            print(f'--- trial {trial} geom {g}: v0={v0} z={world[v0, 2]:.5f} '
                  f'n_obs={len(obs)}')
            for j, k in enumerate(nbrs[v0]):
                mark = ' *OBS*' if is_obs(k) else ''
                print(f'   nbr[{j}] v{k}: z={world[k, 2]:+.5f} '
                      f'xy={np.linalg.norm(world[k, :2] - world[v0, :2]):.5f}'
                      f'{mark}')
            # any obs NOT in nbrs?
            for o in obs:
                dd = np.linalg.norm(world - o[None], axis=1)
                k = int(np.argmin(dd))
                if k != v0 and k not in nbrs[v0]:
                    print(f'   OBS v{k} NOT a neighbor of v0!')


if __name__ == '__main__':
    main()
