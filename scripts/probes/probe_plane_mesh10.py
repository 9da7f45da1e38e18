"""END-TO-END verification of the decoded mjc_PlaneConvex rule (from
disassembly of libmujoco 3.10, mjc_PlaneConvex @0x17b520 + addplanemesh
@0x17ba90):

  v0   = support vertex along -n (hill climb; here argmin plane-dist)
  con0 = v0 shifted to half depth; reject pair if dist0 > margin
  for v in hull-graph neighbors of v0 (adjacency-list order):
      if plane_dist(v) < margin and ||v_world - con0.pos|| >= 0.3*rbound:
          emit contact at v (dist, half-depth pos)
      stop at 3 contacts total

Validates count + per-contact dist/pos/order on random tumbling poses of the
actual robot models. Exactness target: 1e-12 (f64).
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


def predict(world, nbrs, rbound, margin=0.0):
    d = world[:, 2]
    v0 = int(np.argmin(d))
    if d[v0] > margin:
        return []
    con0_pos = world[v0].copy()
    con0_pos[2] = d[v0] / 2
    out = [(v0, d[v0], con0_pos)]
    for k in nbrs[v0]:
        if len(out) >= 3:
            break
        if d[k] >= margin:
            continue
        if np.linalg.norm(world[k] - con0_pos) < 0.3 * rbound:
            continue
        pos = world[k].copy()
        pos[2] = d[k] / 2
        out.append((k, d[k], pos))
    return out


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else 'hyqreal1'
    mj, _ = build_mj_model(robot, 'flat', strip_meshes=False)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(0)

    n_pairs = n_exact = 0
    worst = 0.0
    mism = []
    for trial in range(80):
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

        for g in range(mj.ngeom):
            if mj.geom_type[g] != mujoco.mjtGeom.mjGEOM_MESH:
                continue
            if not (mj.geom_contype[g] or mj.geom_conaffinity[g]):
                continue
            mid = mj.geom_dataid[g]
            hv, nbrs = hull_data(mj, mid)
            R = d.geom_xmat[g].reshape(3, 3)
            p = d.geom_xpos[g]
            world = hv @ R.T + p
            # pair margin: mjc colliders receive max of both geoms' margins
            plane_g = 0
            margin = float(mj.geom_margin[g] + mj.geom_margin[plane_g])
            pred = predict(world, nbrs, float(mj.geom_rbound[g]), margin)
            obs = groups.get(g, [])
            if not pred and not obs:
                continue
            n_pairs += 1
            ok = len(pred) == len(obs)
            if ok:
                for (ko, (dist_o, pos_o)), (kp, dist_p, pos_p) in zip(
                        enumerate(obs), pred):
                    e = max(abs(dist_o - dist_p),
                            float(np.max(np.abs(pos_o - pos_p))))
                    worst = max(worst, e)
                    if e > 1e-9:
                        ok = False
                        break
            n_exact += ok
            if not ok and len(mism) < 6:
                mism.append((trial, g, len(obs), len(pred),
                             [round(o[0], 5) for o in obs],
                             [round(p[1], 5) for p in pred]))

    print(f'{robot}: {n_pairs} pairs; exact {n_exact}; worst err {worst:.2e}')
    for m in mism:
        print('  mism:', m)


if __name__ == '__main__':
    main()
