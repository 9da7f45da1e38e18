"""Which hull features generate each contact of a mesh-mesh manifold?

For frozen hyqreal1 folded-leg cases: enumerate both hulls' triangles in
world frame, then for each mj contact (pos, n) find the best-matching
(facetA, facetB) pair: angle of n vs facet normals, point-plane distance of
pos. Tests the 'one contact per near-deepest Minkowski facet' hypothesis and
shows what affine combination of hull vertices each contact position is.
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

import mujoco
import numpy as np

from gym_quadruped_tpu.models.builder import build_mj_model


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
            if len(rows) >= 2 and len(cases) < 3:
                poses = {g: (d.geom_xpos[g].copy(),
                             d.geom_xmat[g].reshape(3, 3).copy())
                         for g in (g1, g2)}
                cases.append((t, g1, g2, poses, rows))

    for t, g1, g2, poses, rows in cases:
        print(f'\n===== step {t} geoms {g1}-{g2} ({len(rows)} contacts)')
        tris = {}
        for g in (g1, g2):
            mid = mj.geom_dataid[g]
            va, vn = mj.mesh_vertadr[mid], mj.mesh_vertnum[mid]
            fa, fn = mj.mesh_faceadr[mid], mj.mesh_facenum[mid]
            V = np.array(mj.mesh_vert[va:va + vn], np.float64)
            F = np.array(mj.mesh_face[fa:fa + fn], np.int64)
            p, R = poses[g]
            W = V @ R.T + p
            tri = W[F]                       # (F, 3, 3)
            nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
            nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True),
                              1e-30)
            tris[g] = (W, F, tri, nrm)

        for dist, pos, n in rows:
            print(f'  contact dist={dist:+.4e} pos={np.round(pos, 6)} '
                  f'n={np.round(n, 5)}')
            for g, sgn in ((g1, 1.0), (g2, -1.0)):
                W, F, tri, nrm = tris[g]
                ang = np.arccos(np.clip(nrm @ (sgn * n), -1, 1))
                # distance of contact point to each triangle plane + whether
                # its projection lies inside the tri (barycentric)
                rel = pos[None, :] - tri[:, 0]
                dplane = np.abs(np.sum(rel * nrm, axis=1))
                e1 = tri[:, 1] - tri[:, 0]
                e2 = tri[:, 2] - tri[:, 0]
                d11 = np.sum(e1 * e1, 1)
                d12 = np.sum(e1 * e2, 1)
                d22 = np.sum(e2 * e2, 1)
                r1 = np.sum(rel * e1, 1)
                r2 = np.sum(rel * e2, 1)
                det = np.maximum(d11 * d22 - d12 * d12, 1e-30)
                u = (d22 * r1 - d12 * r2) / det
                v = (d11 * r2 - d12 * r1) / det
                inside = (u > -0.05) & (v > -0.05) & (u + v < 1.05)
                score = ang + 1e2 * dplane + 1e9 * (~inside)
                best = np.argsort(score)[:2]
                for b in best:
                    print(f'    geom{g} tri{b}: ang={ang[b]:.5f} '
                          f'dplane={dplane[b]:.2e} uv=({u[b]:+.2f},{v[b]:+.2f})'
                          f' n={np.round(nrm[b], 5)}')
                    if score[b] < 1.0:
                        print(f'      verts={np.round(tri[b], 5).tolist()}')


if __name__ == '__main__':
    main()
