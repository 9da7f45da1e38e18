"""Dump one failing validation case in detail (ours vs mj, incl. perturbed
internals). Usage: python scripts/probe_ccd_debug.py <case_index>"""

import sys
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(_ROOT, 'tests'))
sys.path.insert(0, _ROOT)
import conftest  # noqa: F401

import mujoco
import numpy as np
import jax.numpy as jnp

from gym_quadruped_tpu.physics import ccd
from gym_quadruped_tpu.physics.collision import _cyl_box_ccd
from probe_ccd_validate import collide_mj


def rot(axis, ang):
    axis = axis / np.linalg.norm(axis)
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    R = np.empty(9)
    mujoco.mju_quat2Mat(R, q)
    return R.reshape(3, 3)


def main(target):
    rng = np.random.RandomState(7)
    n_cases, attempts = 0, 0
    while n_cases < 30 and attempts < 5000:
        attempts += 1
        sA = np.array([rng.uniform(0.02, 0.06), rng.uniform(0.03, 0.12), 0.0])
        sB = rng.uniform(0.03, 0.15, 3)
        RA = rot(rng.normal(size=3), rng.uniform(0, np.pi))
        RB = rot(rng.normal(size=3), rng.uniform(0, np.pi))
        dirn = rng.normal(size=3)
        dirn /= np.linalg.norm(dirn)
        pA = np.zeros(3)
        lo, hi = 0.0, 1.0
        start = dirn * (np.linalg.norm(sA[:2]) + np.linalg.norm(sB) + 0.01)
        hit = None
        for _ in range(40):
            mid = 0.5 * (lo + hi)
            got = collide_mj(sA, pA, RA, sB, start * (1 - mid), RB)
            dmin = min((g[0] for g in got), default=1.0)
            if -8e-3 < dmin < -2e-4:
                hit = start * (1 - mid)
                break
            if dmin < 0:
                hi = mid
            else:
                lo = mid
        if hit is None:
            continue
        n_cases += 1
        if n_cases != target:
            continue

        print(f'case rand{target}: cyl r={sA[0]:.4f} h={sA[1]:.4f} '
              f'box size={sB}')
        mjc = collide_mj(sA, pA, RA, sB, hit, RB)
        for dd, pp, nn in mjc:
            print(f'  mj  dist={dd:+.6f} pos={pp} n={nn}')
        dist, pos, nrm = _cyl_box_ccd(
            jnp.asarray(pA), jnp.asarray(RA), float(sA[0]), float(sA[1]),
            jnp.asarray(hit), jnp.asarray(RB), jnp.asarray(sB))
        for i in range(5):
            print(f'  us[{i}] dist={float(dist[i]):+.6f} '
                  f'pos={np.asarray(pos[i])} n={np.asarray(nrm[i])}')

        # internals: replicate the perturbed solves
        p1, R1 = jnp.asarray(pA), jnp.asarray(RA)
        p2, R2 = jnp.asarray(hit), jnp.asarray(RB)
        size = jnp.asarray(sB)
        radius, halflen = float(sA[0]), float(sA[1])

        def depth_fn(d):
            return (ccd.supval_cyl(d, p1, R1, radius, halflen)
                    + ccd.supval_box(-d, p2, R2, size))

        a = R1[:, 2]
        t = jnp.clip((p2 - p1) @ a, -halflen, halflen)
        cands = jnp.stack([R2[:, 0], R2[:, 1], R2[:, 2], a,
                           jnp.cross(R2[:, 0], a), jnp.cross(R2[:, 1], a),
                           jnp.cross(R2[:, 2], a), (p1 + t * a) - p2])
        d0_depth, d0 = ccd.best_axis(depth_fn, cands)
        depth0, n0 = ccd.pattern_refine(depth_fn, d0, d0_depth)
        print(f'  depth0={float(depth0):.6f} n0={np.asarray(n0)}')
        Ra, Rb = ccd.perturb_rots(n0)
        R1p, R2p = Ra @ R1, Rb @ R2

        def depth_fn_p(d):
            exp = (slice(None),) + (None,) * (d.ndim - 2)
            return (ccd.supval_cyl(d, p1, R1p[exp], radius, halflen)
                    + ccd.supval_box(-d, p2, R2p[exp], size))

        n0b = jnp.broadcast_to(n0, (4, 3))
        depth_p, n_p = ccd.pattern_refine(depth_fn_p, n0b, depth_fn_p(n0b),
                                          rounds=8, r0=8e-3)
        xa = ccd.support_cyl(n_p, p1, R1p, radius, halflen)
        xb = ccd.support_box(-n_p, p2, R2p, size)
        print('  perturbed:')
        for k in range(4):
            da = float(jnp.sum(n_p[k] * R1p[k][:, 2]))
            dl = np.asarray(ccd._dotR(-n_p[k], R2p[k]))
            print(f'   k={k} depth={float(depth_p[k]):+.6f} '
                  f'n={np.asarray(n_p[k])}')
            print(f'       xa={np.asarray(xa[k])} xb={np.asarray(xb[k])} '
                  f'da={da:+.2e} dl={dl}')
        pos_p = ccd.witness(
            n_p, xa, xb,
            lambda pt: ccd.clip_face_cyl(pt, p1, R1p, radius, halflen, n_p),
            lambda pt: ccd.clip_face_box(pt, p2, R2p, size, -n_p),
            ccd.supval_cyl(n_p, p1, R1p, radius, halflen),
            ccd.supval_box(-n_p, p2, R2p, size))
        for k in range(4):
            print(f'   k={k} pos_p={np.asarray(pos_p[k])}')
        return


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 13)
