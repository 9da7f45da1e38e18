"""Decode MuJoCo's nativeccd (GJK+EPA) output for sphere-mesh and mesh-mesh
self-collision pairs (hyqreal1's folded-leg contacts) and validate a
support-function pattern-search reimplementation against it.

Poses: base pinned in the air, random joint configs — only self-collision
pairs fire. For each mj contact, compare depth/normal/pos against:
  depth_fn(d) = supval_1(d) + supval_2(-d), pattern-refined;
  pos = deeper-feature witness shifted to half depth.
"""

import os
import sys
from collections import defaultdict

import mujoco
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model  # noqa: E402
from gym_quadruped_tpu.physics import ccd  # noqa: E402


def solve_pair(supval1, supval2, sup1, sup2, d0s):
    """Generic 1-contact convex pair: returns (depth, n, pos)."""
    def depth_fn(d):
        return supval1(d) + supval2(-d)

    depth0, d0 = ccd.best_axis(depth_fn, d0s)
    depth, n = ccd.pattern_refine(depth_fn, d0, depth0, rounds=24)
    x1 = sup1(n)
    x2 = sup2(-n)
    pos = 0.5 * (x1 + x2)
    return depth, n, pos, x1, x2


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else 'hyqreal1'
    mj, limits = build_mj_model(robot, 'flat')
    model = extract_model(mj, robot, 'flat', limits)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(0)

    lo = mj.jnt_range[:, 0].copy()
    hi = mj.jnt_range[:, 1].copy()
    unlimited = ~mj.jnt_limited.astype(bool)
    lo[unlimited] = -np.pi
    hi[unlimited] = np.pi

    stats = defaultdict(list)
    n_seen = defaultdict(int)
    for trial in range(300):
        mujoco.mj_resetDataKeyframe(mj, d, 0)
        d.qpos[2] = 2.0  # airborne: no ground contacts
        for j in range(mj.njnt):
            if mj.jnt_type[j] == 3:
                d.qpos[mj.jnt_qposadr[j]] = rng.uniform(lo[j], hi[j])
        mujoco.mj_forward(mj, d)
        for ci in range(d.ncon):
            c = d.contact[ci]
            g1, g2 = int(c.geom1), int(c.geom2)
            t1 = int(mj.geom_type[g1])
            t2 = int(mj.geom_type[g2])
            key = (t1, t2)
            n_seen[key] += 1
            if n_seen[key] > 60:
                continue

            def hull_world(g):
                did = int(model.geom_dataid[g])
                V = int(model.mesh_vertnum[did])
                verts = model.mesh_vert[did][:V]
                R = d.geom_xmat[g].reshape(3, 3)
                return jnp.asarray(verts @ R.T + d.geom_xpos[g])

            mjt = mujoco.mjtGeom
            if (t1, t2) == (int(mjt.mjGEOM_SPHERE), int(mjt.mjGEOM_MESH)) or \
               (t1, t2) == (int(mjt.mjGEOM_MESH), int(mjt.mjGEOM_SPHERE)):
                gs = g1 if t1 == int(mjt.mjGEOM_SPHERE) else g2
                gm = g2 if gs == g1 else g1
                cen = jnp.asarray(d.geom_xpos[gs])
                r = float(mj.geom_size[gs, 0])
                W = hull_world(gm)

                def sv1(dd):
                    return jnp.sum(dd * cen, -1) + r

                def sp1(dd):
                    return cen + r * dd

                d0s = jnp.stack([cen - jnp.mean(W, 0),
                                 cen - jnp.asarray(d.geom_xpos[gm])])[None]
                depth, n, pos, x1, x2 = solve_pair(
                    sv1, lambda dd: ccd.supval_verts(dd, W),
                    sp1, lambda dd: ccd.support_verts(dd, W), d0s)
                # mj normal: frame[:3] points g1->g2
                mj_n = c.frame[:3].copy()
                if gs != g1:
                    mj_n = mj_n  # frame is g1->g2 regardless
                ours_n = -np.asarray(n)[0] if gs == g1 else np.asarray(n)[0]
                lbl = 'sphere-mesh'
            elif (t1, t2) == (int(mjt.mjGEOM_MESH), int(mjt.mjGEOM_MESH)):
                W1 = hull_world(g1)
                W2 = hull_world(g2)
                d0s = jnp.stack([
                    jnp.asarray(d.geom_xpos[g2] - d.geom_xpos[g1]),
                    jnp.mean(W2, 0) - jnp.mean(W1, 0)])[None]
                depth, n, pos, x1, x2 = solve_pair(
                    lambda dd: ccd.supval_verts(dd, W1),
                    lambda dd: ccd.supval_verts(dd, W2),
                    lambda dd: ccd.support_verts(dd, W1),
                    lambda dd: ccd.support_verts(dd, W2), d0s)
                ours_n = np.asarray(n)[0]   # sign checked below
                lbl = 'mesh-mesh'
            else:
                continue

            depth = float(np.asarray(depth)[0])
            pos = np.asarray(pos)[0]
            mj_n = c.frame[:3].copy()
            ncos = abs(float(np.dot(ours_n, mj_n)))
            stats[lbl + '_depth'].append(abs(-depth - c.dist))
            stats[lbl + '_ncos'].append(1.0 - ncos)
            stats[lbl + '_pos'].append(float(np.max(np.abs(pos - c.pos))))

    for k in sorted(stats):
        v = np.asarray(stats[k])
        print(f'{k}: n={len(v)} med={np.median(v):.2e} p90='
              f'{np.percentile(v, 90):.2e} max={v.max():.2e}')


if __name__ == '__main__':
    main()
