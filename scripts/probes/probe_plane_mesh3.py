"""Hypothesis 2 for mjc_PlaneConvex manifold: con0 = support(-n) (verified);
extra contacts are hull-graph NEIGHBORS of the support vertex that are also
below the plane (the mesh_graph ships adjacency lists for support walks).
Check subset/cap/order against observed manifolds.
"""

import os
import sys
from collections import defaultdict

import mujoco
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from gym_quadruped_tpu.models.builder import build_mj_model  # noqa: E402


def hull_data(mj, mid):
    adr = mj.mesh_graphadr[mid]
    graph = mj.mesh_graph[adr:]
    numvert, numface = graph[0], graph[1]
    vert_edgeadr = graph[2:2 + numvert]
    vert_globalid = graph[2 + numvert:2 + 2 * numvert]
    edge_localid = graph[2 + 2 * numvert:]
    vadr = mj.mesh_vertadr[mid]
    verts = np.asarray(mj.mesh_vert[vadr + vert_globalid], np.float64)
    neighbors = []
    for i in range(numvert):
        adj = []
        j = vert_edgeadr[i]
        while edge_localid[j] >= 0:
            adj.append(int(edge_localid[j]))
            j += 1
        neighbors.append(adj)
    return verts, neighbors


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else 'hyqreal1'
    mj, _ = build_mj_model(robot, 'flat', strip_meshes=False)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(0)

    n_pairs = n_exact = n_subset = 0
    mism = []
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
            hv, nbrs = hull_data(mj, mid)
            R = d.geom_xmat[g].reshape(3, 3)
            p = d.geom_xpos[g]
            world = hv @ R.T + p
            obs = np.array([[c[1][0], c[1][1], c[0]] for c in cons])

            v0 = int(np.argmin(world[:, 2]))
            cand = [v0] + [k for k in nbrs[v0] if world[k, 2] < 0]
            candv = world[cand]

            n_pairs += 1
            # order-insensitive exact match
            ok_exact = len(obs) == len(cand)
            ok_subset = True
            used = set()
            for o in obs:
                dd = np.linalg.norm(candv - o, axis=1)
                k = int(np.argmin(dd))
                if dd[k] > 1e-9 or k in used:
                    ok_subset = False
                    ok_exact = False
                    break
                used.add(k)
            n_exact += ok_exact
            n_subset += ok_subset
            if not ok_exact and len(mism) < 6:
                mism.append((trial, g, len(obs), len(cand), ok_subset,
                             np.round(sorted(obs[:, 2]), 5).tolist(),
                             np.round(sorted(world[cand][:, 2]), 5).tolist()))

    print(f'{robot}: {n_pairs} pairs; exact {n_exact}, obs⊆cand {n_subset}')
    for msg in mism:
        print('  mism:', msg)


if __name__ == '__main__':
    main()
