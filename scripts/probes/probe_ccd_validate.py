"""Validate the JAX multiccd pipeline (_cyl_box_ccd) against MuJoCo manifolds.

Cases: the b2 worst-step self-collision pairs + random shallow poses.
Compares contact count, dist, and greedy position matching. Small program —
compiles in seconds (no engine step involved).
"""

import sys
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(_ROOT, 'tests'))
sys.path.insert(0, _ROOT)
import conftest  # noqa: F401

import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.builder import build_mj_model
from gym_quadruped_tpu.physics.collision import _cyl_box_ccd

PAIR_XML = """
<mujoco>
  <worldbody>
    <body name="A" pos="0 0 0">
      <freejoint/>
      <geom name="gA" type="cylinder" size="{sA}" mass="1"/>
    </body>
    <body name="B" pos="0 0 2">
      <freejoint/>
      <geom name="gB" type="box" size="{sB}" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""

_cache = {}


def collide_mj(sA, pA, RA, sB, pB, RB):
    key = (tuple(np.round(sA, 12)), tuple(np.round(sB, 12)))
    if key not in _cache:
        xml = PAIR_XML.format(sA=f'{sA[0]:.17g} {sA[1]:.17g}',
                              sB=' '.join(f'{x:.17g}' for x in sB))
        m = mujoco.MjModel.from_xml_string(xml)
        _cache[key] = (m, mujoco.MjData(m))
    m, d = _cache[key]
    q = np.empty(4)
    mujoco.mju_mat2Quat(q, RA.flatten())
    d.qpos[0:3], d.qpos[3:7] = pA, q
    mujoco.mju_mat2Quat(q, RB.flatten())
    d.qpos[7:10], d.qpos[10:14] = pB, q
    mujoco.mj_forward(m, d)
    return [(d.contact[i].dist, d.contact[i].pos.copy(),
             d.contact[i].frame[:3].copy()) for i in range(d.ncon)]


jit_ccd = jax.jit(_cyl_box_ccd)


def check(sA, pA, RA, sB, pB, RB, label, rows):
    mjc = collide_mj(sA, pA, RA, sB, pB, RB)
    dist, pos, nrm = jit_ccd(jnp.asarray(pA), jnp.asarray(RA),
                             float(sA[0]), float(sA[1]),
                             jnp.asarray(pB), jnp.asarray(RB),
                             jnp.asarray(sB))
    dist, pos, nrm = np.asarray(dist), np.asarray(pos), np.asarray(nrm)
    ours = [(dist[i], pos[i], nrm[i]) for i in range(5) if dist[i] < 1e5]
    # greedy position matching mj -> ours
    used = set()
    errs_pos, errs_d, errs_n = [], [], []
    for dmj, pmj, nmj in mjc:
        best, bi = np.inf, None
        for i, (do, po, no) in enumerate(ours):
            if i in used:
                continue
            e = np.linalg.norm(pmj - po)
            if e < best:
                best, bi = e, i
        if bi is not None:
            used.add(bi)
            errs_pos.append(best)
            errs_d.append(abs(mjc[0][0] - ours[bi][0]))
            errs_n.append(np.linalg.norm(nmj - ours[bi][2]))
        else:
            errs_pos.append(np.inf)
    rows.append((label, len(mjc), len(ours), errs_pos, errs_d, errs_n))


def main():
    rows = []

    mj, _ = build_mj_model('b2', 'flat')
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    rng = np.random.RandomState(2)
    ctrl_seq = rng.uniform(-2.0, 2.0, (400, mj.nu))
    for t in range(148):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
    mujoco.mj_forward(mj, d)
    seen = set()
    for i in range(d.ncon):
        c = d.contact[i]
        if (int(mj.geom_type[c.geom1]), int(mj.geom_type[c.geom2])) != (5, 6):
            continue
        if (c.geom1, c.geom2) in seen:
            continue
        seen.add((c.geom1, c.geom2))
        check(mj.geom_size[c.geom1], d.geom_xpos[c.geom1].copy(),
              d.geom_xmat[c.geom1].reshape(3, 3).copy(),
              mj.geom_size[c.geom2], d.geom_xpos[c.geom2].copy(),
              d.geom_xmat[c.geom2].reshape(3, 3).copy(),
              f'b2 {c.geom1}-{c.geom2}', rows)

    def rot(axis, ang):
        axis = axis / np.linalg.norm(axis)
        q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
        R = np.empty(9)
        mujoco.mju_quat2Mat(R, q)
        return R.reshape(3, 3)

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
        # walk B toward A until shallow penetration
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
        check(sA, pA, RA, sB, hit, RB, f'rand{n_cases}', rows)

    npos, nd, nn = [], [], []
    bad = 0
    for label, nmj, nours, ep, ed, en in rows:
        worst = max(ep) if ep else 0.0
        if worst > 2e-3 or nours < nmj:
            bad += 1
            print(f'  WORST {label}: nmj={nmj} nours={nours} '
                  f'pos_errs={[f"{e:.1e}" for e in ep]}')
        npos.extend(ep)
        nd.extend(ed)
        nn.extend(en)
    npos = np.array(npos)
    print(f'\ncases={len(rows)} contacts={len(npos)} flagged={bad}')
    print(f'pos err: med={np.median(npos):.2e} p90={np.percentile(npos, 90):.2e}'
          f' max={np.max(npos):.2e}')
    print(f'dist err: med={np.median(nd):.2e} max={np.max(nd):.2e}')
    print(f'normal err: med={np.median(nn):.2e} max={np.max(nn):.2e}')


if __name__ == '__main__':
    main()
