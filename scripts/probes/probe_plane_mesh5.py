"""Find mjc_PlaneConvex's dedup/selection metric: for each plane-mesh pair,
compute (a) min pairwise distance among OBSERVED contacts, (b) for every
below-plane hull vertex NOT emitted, its distance to the nearest observed
contact. If a greedy exclusion-radius rule exists, (a)'s minimum across pairs
exceeds (b)'s maximum... unless the radius is relative to geom size.
Distances measured in 3D on the full vertex (x, y, z=dist) and in xy.
"""

import os
import sys
from collections import defaultdict

import mujoco
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from gym_quadruped_tpu.models.builder import build_mj_model  # noqa: E402
from scripts.probe_plane_mesh import hull_verts  # noqa: E402


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else 'hyqreal1'
    mj, _ = build_mj_model(robot, 'flat', strip_meshes=False)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(0)

    min_obs_sep = {}     # geom -> min pairwise obs distance (xy)
    max_rej_near = {}    # geom -> max over rejected of min-dist-to-obs (xy)
    sizes = {}
    for trial in range(60):
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
            mid = mj.geom_dataid[g]
            hv = hull_verts(mj, mid)
            R = d.geom_xmat[g].reshape(3, 3)
            p = d.geom_xpos[g]
            world = hv @ R.T + p
            obs = np.array([[c[1][0], c[1][1], c[0]] for c in cons])
            sizes[g] = mj.geom_rbound[g]

            if len(obs) > 1:
                sep = min(np.linalg.norm(obs[i, :2] - obs[j, :2])
                          for i in range(len(obs))
                          for j in range(i + 1, len(obs)))
                min_obs_sep[g] = min(min_obs_sep.get(g, 1e9), sep)
            below = world[world[:, 2] < 0]
            for v in below:
                dd = np.linalg.norm(obs[:, :2] - v[None, :2], axis=1)
                if np.min(dd) < 1e-9:
                    continue  # this IS an obs vertex
                near = np.min(dd)
                max_rej_near[g] = max(max_rej_near.get(g, 0.0), near)

    for g in sorted(set(min_obs_sep) | set(max_rej_near)):
        print(f'geom {g}: rbound {sizes.get(g, 0):.4f} '
              f'min_obs_sep {min_obs_sep.get(g, float("nan")):.5f} '
              f'max_rej_near {max_rej_near.get(g, float("nan")):.5f} '
              f'ratio_sep/rbound '
              f'{min_obs_sep.get(g, float("nan")) / sizes.get(g, 1):.4f} '
              f'ratio_rej/rbound '
              f'{max_rej_near.get(g, float("nan")) / sizes.get(g, 1):.4f}')


if __name__ == '__main__':
    main()
