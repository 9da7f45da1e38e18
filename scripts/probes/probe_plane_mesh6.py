"""Tilted-support hypothesis: secondary contacts are support points along
d = -n + c·u for some tilt direction u in the plane. For each observed
secondary contact v (vs deepest v0), compute the valid range [c_min, c_max]
of tilt coefficients that make v the support along u = xy-dir(v0→v), and the
angle of u in the contact frame. A consistent c (or a consistent set of
angles) across observations decodes the rule.
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

    rows = []
    for trial in range(25):
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
            # full frame: rows of 3x3 (normal, tan1, tan2)
            groups[c.geom2].append((c.dist, c.pos.copy(),
                                    c.frame.copy().reshape(3, 3)))

        for g, cons in groups.items():
            if len(cons) < 2:
                continue
            mid = mj.geom_dataid[g]
            hv = hull_verts(mj, mid)
            R = d.geom_xmat[g].reshape(3, 3)
            p = d.geom_xpos[g]
            world = hv @ R.T + p
            v0i = int(np.argmin(world[:, 2]))
            v0 = world[v0i]
            frame = cons[0][2]

            for ci_, (dist, pos, _) in enumerate(cons):
                v = np.array([pos[0], pos[1], dist])
                if np.linalg.norm(v - v0) < 1e-9:
                    continue
                u = v[:2] - v0[:2]
                un = np.linalg.norm(u)
                if un < 1e-12:
                    continue
                u = u / un
                # angle of u relative to contact-frame tangent 1
                t1 = frame[1][:2]
                t1 = t1 / (np.linalg.norm(t1) + 1e-30)
                ang = np.degrees(np.arctan2(np.cross(t1, u), np.dot(t1, u)))
                # c range making v the support along (-n + c*u)
                rel = world - v          # (V, 3)
                du = rel[:, 0] * u[0] + rel[:, 1] * u[1]   # (w-v)·u
                dz = rel[:, 2]                             # z_w - z_v
                c_lo, c_hi = 0.0, np.inf
                for k in range(len(world)):
                    if k == np.argmin(np.abs(rel).sum(1)):
                        pass
                    if du[k] < -1e-12:      # w behind v along u
                        c_lo = max(c_lo, dz[k] / du[k])
                    elif du[k] > 1e-12:     # w ahead of v along u
                        c_hi = min(c_hi, dz[k] / du[k])
                    else:
                        pass
                rows.append((trial, g, ci_, round(float(c_lo), 4),
                             round(float(c_hi), 4), round(float(ang), 1),
                             round(float(un), 4)))

    print('trial geom idx c_lo c_hi angle_vs_t1 xy_dist')
    for r in rows[:40]:
        print(' ', r)
    clos = [r[3] for r in rows if np.isfinite(r[4])]
    chis = [r[4] for r in rows if np.isfinite(r[4])]
    print('c_lo max:', max(clos), 'c_hi min:', min(chis))


if __name__ == '__main__':
    main()
