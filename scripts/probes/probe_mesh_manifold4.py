"""Decode the vertex-selection rule of MuJoCo 3.10 mesh-mesh multi-contact.

Known so far (probe_mesh_manifold3): every contact of a >=2 manifold sits at
(hull vertex) + (|dist|/2) n — vertices of ONE hull (the 'vertex side'), all
sharing the EPA dist; sometimes one extra interior contact (the EPA witness)
with its own normal. This probe measures, for every multi-contact pair-step
of the hyqreal1 trajectory: each hull vertex's support gap along the contact
normal, marking which vertices were emitted — to find the selection
tolerance, the vertex-side rule, and the cap.
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

    sep_lo, sep_hi = [], []   # bracketing the selection tolerance
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
            if len(rows) < 2:
                continue
            dist0 = rows[0][0]
            n0 = rows[0][2]
            world = {}
            for g in (g1, g2):
                mid = mj.geom_dataid[g]
                va, vn = mj.mesh_vertadr[mid], mj.mesh_vertnum[mid]
                V = np.array(mj.mesh_vert[va:va + vn], np.float64)
                R = d.geom_xmat[g].reshape(3, 3)
                world[g] = V @ R.T + d.geom_xpos[g]
            # which hull's vertices do the contacts sit on? contact pos =
            # v + (|dist|/2) n (g2 verts, n toward g2->?) or v - ... (g1)
            half = 0.5 * abs(min(dist0, 0.0)) + 0.5 * max(dist0, 0.0)
            # just test both shifts against both hulls
            hits = {g1: 0, g2: 0}
            vert_ids = {g1: [], g2: []}
            for dist, pos, n in rows:
                for g in (g1, g2):
                    W = world[g]
                    for shift in (+0.5 * dist, -0.5 * dist):
                        err = np.linalg.norm(W + shift * n - pos, axis=1)
                        j = int(np.argmin(err))
                        if err[j] < 2e-5:
                            hits[g] += 1
                            vert_ids[g].append(j)
                            break
            side = g1 if hits[g1] >= hits[g2] else g2
            W = world[side]
            sgn = -1.0 if side == g1 else +1.0   # support along -n for g1?
            # support gaps along the direction pointing INTO the other geom
            sup = W @ (sgn * n0)
            gaps = sup.max() - sup
            order = np.argsort(gaps)
            emitted = set(vert_ids[side])
            lab = ['*' if j in emitted else ' ' for j in order[:8]]
            print(f't={t} {g1}-{g2} nc={len(rows)} dist={dist0:+.3e} '
                  f'side=g{side} hits={hits} gaps='
                  + ' '.join(f'{l}{gaps[j]:.2e}' for l, j in
                             zip(lab, order[:8])))
            g_em = [gaps[j] for j in emitted]
            g_no = [gaps[j] for j in order if j not in emitted]
            if g_em:
                lo = max(g_em)
                sep_lo.append(lo)
            if g_no:
                sep_hi.append(min(g_no))
    if sep_lo:
        print('\nmax emitted gap:', f'{max(sep_lo):.3e}')
    if sep_hi:
        print('min non-emitted gap:', f'{min(sep_hi):.3e}')


if __name__ == '__main__':
    main()
