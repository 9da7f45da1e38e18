"""Hypothesis test for mjc_PlaneConvex's manifold selection:
  con0 = deepest hull vertex (support along -n)
  con1 = among verts below the plane, the one FARTHEST from con0
  con2 = among verts below the plane, the one maximizing distance to the
         LINE con0-con1
with some acceptance threshold for adding con1/con2.
Distances measured either in 3D or in the plane (xy) — both tested.
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

    n_pairs = 0
    n_count_match_3d = 0
    n_exact_3d = 0
    n_exact_xy = 0
    mismatches = []
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

            # observed contact vertices (reconstruct full vertex: xy from pos,
            # z = dist)
            obs = np.array([[c[1][0], c[1][1], c[0]] for c in cons])

            def predict(metric):
                below = world[world[:, 2] < 0]
                if len(below) == 0:
                    return np.zeros((0, 3))
                sel = [below[np.argmin(below[:, 2])]]
                if len(below) > 1:
                    if metric == '3d':
                        d1 = np.linalg.norm(below - sel[0], axis=1)
                    else:
                        d1 = np.linalg.norm(below[:, :2] - sel[0][:2], axis=1)
                    k1 = np.argmax(d1)
                    if d1[k1] > 1e-10:
                        sel.append(below[k1])
                if len(sel) == 2 and len(below) > 2:
                    a, b = sel[0], sel[1]
                    if metric == '3d':
                        ab = b - a
                        ab /= np.linalg.norm(ab)
                        rel = below - a
                        perp = rel - np.outer(rel @ ab, ab)
                        d2 = np.linalg.norm(perp, axis=1)
                    else:
                        ab = (b - a)[:2]
                        ab /= np.linalg.norm(ab)
                        rel = (below - a)[:, :2]
                        perp = rel - np.outer(rel @ ab, ab)
                        d2 = np.linalg.norm(perp, axis=1)
                    k2 = np.argmax(d2)
                    if d2[k2] > 1e-10:
                        sel.append(below[k2])
                return np.asarray(sel)

            n_pairs += 1
            for metric, counter in (('3d', None), ('xy', None)):
                pred = predict(metric)
                ok = (len(pred) == len(obs))
                if ok:
                    # order-insensitive match on vertices
                    used = set()
                    for o in obs:
                        dd = np.linalg.norm(pred - o, axis=1)
                        k = int(np.argmin(dd))
                        if dd[k] > 1e-9 or k in used:
                            ok = False
                            break
                        used.add(k)
                if metric == '3d':
                    n_count_match_3d += (len(pred) == len(obs))
                    n_exact_3d += ok
                else:
                    n_exact_xy += ok
                if metric == '3d' and not ok and len(mismatches) < 5:
                    mismatches.append(
                        (trial, g, len(obs), len(pred),
                         np.round(sorted(obs[:, 2]), 5).tolist(),
                         np.round(sorted(pred[:, 2]), 5).tolist()))

    print(f'{robot}: {n_pairs} plane-mesh pairs; '
          f'count-match(3d) {n_count_match_3d}, exact(3d) {n_exact_3d}, '
          f'exact(xy) {n_exact_xy}')
    for msg in mismatches:
        print('  mismatch:', msg)


if __name__ == '__main__':
    main()
