"""Decode MuJoCo 3.10 nativeccd's mesh-mesh MULTI-contact rule (VERDICT r3
item 4: hyqreal1 folded-leg hull pairs get 2-5 identical-depth contacts from
mj; we emit 1).

Runs the exact hyqreal1/flat random-torque parity trajectory (seed 2, amp 2)
in CPU MuJoCo, and at every step dumps each mesh-mesh contact pair's full
manifold: count, depths, normals, positions — plus, for interpretation, each
hull's support-face vertex set along the contact normal (vertices within tol
of the support plane), to test the hypothesis that mj's extra contacts are
the clipped contact-polygon vertices.
"""

import os
import sys
from collections import defaultdict

import mujoco
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

from gym_quadruped_tpu.models.builder import build_mj_model  # noqa: E402


def main():
    mj, _ = build_mj_model('hyqreal1', 'flat')
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    rng = np.random.RandomState(2)
    n_steps = 200
    ctrl_seq = rng.uniform(-2, 2, (n_steps, mj.nu))

    mesh_geoms = set(int(g) for g in range(mj.ngeom)
                     if mj.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH)

    multiplicity = defaultdict(int)
    examples = []
    for t in range(n_steps):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
        pairs = defaultdict(list)
        for k in range(d.ncon):
            c = d.contact[k]
            if int(c.geom1) in mesh_geoms and int(c.geom2) in mesh_geoms:
                pairs[(int(c.geom1), int(c.geom2))].append(k)
        for (g1, g2), ks in pairs.items():
            multiplicity[len(ks)] += 1
            if len(ks) >= 2 and len(examples) < 12:
                rows = []
                for k in ks:
                    c = d.contact[k]
                    rows.append((c.dist, c.pos.copy(), c.frame[:3].copy()))
                examples.append((t, g1, g2, rows))

    print('multiplicity histogram (mesh-mesh pair-steps):',
          dict(sorted(multiplicity.items())))
    for t, g1, g2, rows in examples:
        print(f'\n== step {t} geoms {g1}-{g2}: {len(rows)} contacts')
        for dist, pos, n in rows:
            print(f'   dist={dist:+.6e} pos={np.round(pos, 5)} '
                  f'n={np.round(n, 4)}')
        # support-face verts of each hull along the (shared?) normal
        n0 = rows[0][2]
        for g, sgn in ((g1, 1.0), (g2, -1.0)):
            mid = mj.geom_dataid[g]
            vadr, vnum = mj.mesh_vertadr[mid], mj.mesh_vertnum[mid]
            V = mj.mesh_vert[vadr:vadr + vnum]
            # world frame
            R = d.geom_xmat[g].reshape(3, 3)
            p = d.geom_xpos[g]
            W = V @ R.T + p
            s = W @ (sgn * n0)
            smax = s.max()
            for tol in (1e-4, 1e-3):
                idx = np.where(s > smax - tol)[0]
                if len(idx) <= 8:
                    print(f'   geom {g} support verts (tol={tol}): '
                          f'{len(idx)}')
                    for i in idx[:8]:
                        print(f'      {np.round(W[i], 5)}')
                    break
            else:
                print(f'   geom {g}: >8 support verts at 1e-3')


if __name__ == '__main__':
    main()
