"""Decode MuJoCo's plane-vs-convex-mesh contact rule (mjc_PlaneConvex) by
black-box probing — the same methodology as round 2's plane-box/multiccd
decodes. An isolated mesh free body is posed over a plane at random
penetrating configurations; mjData.contact is compared against candidate
reconstruction rules computed from the mesh's convex-hull vertices.

Findings feed physics/collision.py's _plane_mesh implementation.
"""

import os
import sys

import mujoco
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from gym_quadruped_tpu.models.builder import build_mj_model  # noqa: E402


def hull_verts(mj, mid):
    adr = mj.mesh_graphadr[mid]
    graph = mj.mesh_graph[adr:]
    numvert = graph[0]
    # graph layout: numvert, numface, vert_edgeadr(nv), vert_globalid(nv), ...
    globalid = graph[2 + numvert:2 + 2 * numvert]
    vadr = mj.mesh_vertadr[mid]
    return np.asarray(mj.mesh_vert[vadr + globalid], np.float64)


def make_scene(robot, mesh_geom_name_or_idx):
    """A model containing JUST the plane and one mesh geom on a free body."""
    src, _ = build_mj_model(robot, 'flat', strip_meshes=False)
    return src


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else 'hyqreal1'
    mj, _ = build_mj_model(robot, 'flat', strip_meshes=False)
    d = mujoco.MjData(mj)

    # collidable mesh geoms
    mesh_geoms = [g for g in range(mj.ngeom)
                  if mj.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH
                  and (mj.geom_contype[g] or mj.geom_conaffinity[g])]
    print(f'{robot}: {len(mesh_geoms)} collidable mesh geoms')

    rng = np.random.RandomState(0)
    mujoco.mj_resetDataKeyframe(mj, d, 0)

    stats = []
    for trial in range(40):
        # random base pose, dropped low so meshes penetrate
        mujoco.mj_resetDataKeyframe(mj, d, 0)
        q = rng.uniform(-1, 1, 4)
        q /= np.linalg.norm(q)
        d.qpos[3:7] = q
        d.qpos[2] = rng.uniform(0.05, 0.25)
        d.qpos[7:] += rng.uniform(-0.5, 0.5, mj.nq - 7)
        mujoco.mj_forward(mj, d)

        for ci in range(d.ncon):
            c = d.contact[ci]
            g1, g2 = c.geom1, c.geom2
            if mj.geom_type[g1] != mujoco.mjtGeom.mjGEOM_PLANE:
                continue
            if mj.geom_type[g2] != mujoco.mjtGeom.mjGEOM_MESH:
                continue
            stats.append((trial, ci, g2, c.dist, c.pos.copy(),
                          c.frame[:3].copy()))

    # group by (trial, geom) to see manifold sizes
    from collections import defaultdict
    groups = defaultdict(list)
    for trial, ci, g, dist, pos, n in stats:
        groups[(trial, g)].append((dist, pos, n))
    sizes = defaultdict(int)
    for k, v in groups.items():
        sizes[len(v)] += 1
    print('manifold-size histogram (contacts per plane-mesh pair):',
          dict(sizes))

    # reconstruction check: are contact positions hull vertices (projected)?
    n_checked, max_vert_err, max_pos_err, max_dist_err = 0, 0.0, 0.0, 0.0
    for (trial, g), cons in groups.items():
        mid = mj.geom_dataid[g]
        hv = hull_verts(mj, mid)
        # re-pose
        mujoco.mj_resetDataKeyframe(mj, d, 0)
        rng2 = np.random.RandomState(0)
        for t2 in range(trial + 1):
            mujoco.mj_resetDataKeyframe(mj, d, 0)
            q = rng2.uniform(-1, 1, 4)
            q /= np.linalg.norm(q)
            d.qpos[3:7] = q
            d.qpos[2] = rng2.uniform(0.05, 0.25)
            d.qpos[7:] += rng2.uniform(-0.5, 0.5, mj.nq - 7)
        mujoco.mj_forward(mj, d)
        R = d.geom_xmat[g].reshape(3, 3)
        p = d.geom_xpos[g]
        world = hv @ R.T + p
        depth = world[:, 2]            # plane z=0, normal +z
        for dist, pos, n in cons:
            n_checked += 1
            # hypothesis: contact vertex = nearest hull vertex in xy,
            # dist = vertex z, pos = vertex with z shifted to z/2
            k = np.argmin(np.linalg.norm(world[:, :2] - pos[None, :2], axis=1))
            max_vert_err = max(max_vert_err,
                               float(np.linalg.norm(world[k, :2] - pos[:2])))
            max_dist_err = max(max_dist_err, abs(depth[k] - dist))
            max_pos_err = max(max_pos_err, abs(world[k, 2] / 2 - pos[2]))
    print(f'checked {n_checked} contacts: vert-xy err {max_vert_err:.2e}, '
          f'dist-vs-vertz err {max_dist_err:.2e}, posz-vs-halfz err '
          f'{max_pos_err:.2e}')

    # manifold-selection: which vertices get chosen when >4 are below plane?
    for (trial, g), cons in list(groups.items())[:8]:
        mid = mj.geom_dataid[g]
        hv = hull_verts(mj, mid)
        mujoco.mj_resetDataKeyframe(mj, d, 0)
        rng2 = np.random.RandomState(0)
        for t2 in range(trial + 1):
            mujoco.mj_resetDataKeyframe(mj, d, 0)
            q = rng2.uniform(-1, 1, 4)
            q /= np.linalg.norm(q)
            d.qpos[3:7] = q
            d.qpos[2] = rng2.uniform(0.05, 0.25)
            d.qpos[7:] += rng2.uniform(-0.5, 0.5, mj.nq - 7)
        mujoco.mj_forward(mj, d)
        R = d.geom_xmat[g].reshape(3, 3)
        p = d.geom_xpos[g]
        world = hv @ R.T + p
        below = np.sort(world[world[:, 2] < 0, 2])
        cdists = sorted(c[0] for c in cons)
        print(f'trial {trial} geom {g}: n_below={len(below)} '
              f'deepest5={np.round(below[:5], 5).tolist()} '
              f'contact_dists={np.round(cdists, 5).tolist()}')


if __name__ == '__main__':
    main()
