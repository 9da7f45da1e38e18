"""Hypothesis 3 for mjc_PlaneConvex manifold: contacts = vertices of ONE hull
triangle face containing the support vertex (the face whose outward normal is
most anti-aligned with the plane normal), filtered to below-plane vertices.
"""

import os
import sys
from collections import defaultdict

import mujoco
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from gym_quadruped_tpu.models.builder import build_mj_model  # noqa: E402


def hull_faces(mj, mid):
    adr = mj.mesh_graphadr[mid]
    graph = mj.mesh_graph[adr:]
    numvert, numface = graph[0], graph[1]
    vert_globalid = graph[2 + numvert:2 + 2 * numvert]
    rest = graph[2 + 2 * numvert:]
    edge_len = 3 * numface + numvert
    face_globalid = rest[edge_len:edge_len + 3 * numface]
    g2l = {int(g): i for i, g in enumerate(vert_globalid)}
    faces = np.array([[g2l[int(v)] for v in face_globalid[3 * f:3 * f + 3]]
                      for f in range(numface)])
    vadr = mj.mesh_vertadr[mid]
    verts = np.asarray(mj.mesh_vert[vadr + vert_globalid], np.float64)
    return verts, faces


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else 'hyqreal1'
    mj, _ = build_mj_model(robot, 'flat', strip_meshes=False)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(0)

    n_pairs = n_exact = 0
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
            hv, faces = hull_faces(mj, mid)
            R = d.geom_xmat[g].reshape(3, 3)
            p = d.geom_xpos[g]
            world = hv @ R.T + p
            obs = np.array([[c[1][0], c[1][1], c[0]] for c in cons])

            v0 = int(np.argmin(world[:, 2]))
            fmask = np.any(faces == v0, axis=1)
            cand_faces = faces[fmask]
            # face normals (outward by construction? compute and orient by
            # centroid test)
            a = world[cand_faces[:, 0]]
            b = world[cand_faces[:, 1]]
            c3 = world[cand_faces[:, 2]]
            nrm = np.cross(b - a, c3 - a)
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True) + 1e-30
            centroid = world.mean(0)
            fc = (a + b + c3) / 3
            flip = np.sum(nrm * (fc - centroid), axis=1) < 0
            nrm[flip] *= -1
            best = int(np.argmin(nrm[:, 2] * -1))  # most downward: nz most neg
            best = int(np.argmin(nrm[:, 2]))
            fsel = cand_faces[best]
            sel = [v for v in fsel if world[v, 2] < 0]
            selv = world[sel]

            n_pairs += 1
            ok = len(obs) == len(sel)
            used = set()
            if ok:
                for o in obs:
                    dd = np.linalg.norm(selv - o, axis=1)
                    k = int(np.argmin(dd))
                    if dd[k] > 1e-9 or k in used:
                        ok = False
                        break
                    used.add(k)
            n_exact += ok
            if not ok and len(mism) < 6:
                mism.append((trial, g, len(obs), len(sel),
                             np.round(sorted(obs[:, 2]), 5).tolist(),
                             np.round(sorted(selv[:, 2] if len(sel) else []),
                                      5).tolist()))

    print(f'{robot}: {n_pairs} pairs; exact {n_exact}')
    for msg in mism:
        print('  mism:', msg)


if __name__ == '__main__':
    main()
