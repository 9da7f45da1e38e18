"""Round 2 of multiccd decoding: use MuJoCo's own contact-frame tangents as
perturbation axes and score candidate rules (which geom rotates, about what
center) against the enabled-multiccd manifold over the b2 worst-step pairs AND
random poses. Prints per-rule match statistics."""

import sys
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

import mujoco
import numpy as np

from gym_quadruped_tpu.models.builder import build_mj_model

PAIR_XML = """
<mujoco>
  <option>
    <flag multiccd="{multiccd}"/>
  </option>
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


def quat_from_mat(R):
    q = np.empty(4)
    mujoco.mju_mat2Quat(q, R.flatten())
    return q


_model_cache = {}


def collide_pair(sA, pA, RA, sB, pB, RB, multiccd):
    key = (tuple(np.round(sA, 12)), tuple(np.round(sB, 12)), multiccd)
    if key not in _model_cache:
        xml = PAIR_XML.format(
            multiccd='enable' if multiccd else 'disable',
            sA=f'{sA[0]:.17g} {sA[1]:.17g}',
            sB=' '.join(f'{x:.17g}' for x in sB))
        m = mujoco.MjModel.from_xml_string(xml)
        _model_cache[key] = (m, mujoco.MjData(m))
    m, d = _model_cache[key]
    d.qpos[0:3] = pA
    d.qpos[3:7] = quat_from_mat(RA)
    d.qpos[7:10] = pB
    d.qpos[10:14] = quat_from_mat(RB)
    mujoco.mj_forward(m, d)
    out = []
    for i in range(d.ncon):
        c = d.contact[i]
        out.append((c.dist, c.pos.copy(), c.frame.copy()))
    return out


def rot(axis, ang):
    axis = axis / np.linalg.norm(axis)
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    R = np.empty(9)
    mujoco.mju_quat2Mat(R, q)
    return R.reshape(3, 3)


RULES = ['B@Bcen', 'A@Acen', 'B@pos', 'A@pos', 'AB@cen']


def emulate(rule, sA, pA, RA, sB, pB, RB, base):
    """Return list of 4 perturbed single-CCD contacts under `rule`."""
    dist0, pos0, fr0 = base
    t1, t2 = fr0[3:6], fr0[6:9]
    eps = 1e-3
    out = []
    for ax in (t1, t2):
        for s in (+1, -1):
            Rp = rot(ax, s * eps)
            pA2, RA2, pB2, RB2 = pA, RA, pB, RB
            if rule == 'B@Bcen':
                RB2 = Rp @ RB
            elif rule == 'A@Acen':
                RA2 = Rp @ RA
            elif rule == 'B@pos':
                RB2 = Rp @ RB
                pB2 = pos0 + Rp @ (pB - pos0)
            elif rule == 'A@pos':
                RA2 = Rp @ RA
                pA2 = pos0 + Rp @ (pA - pos0)
            elif rule == 'AB@cen':
                RA2 = rot(ax, -s * eps) @ RA
                RB2 = Rp @ RB
            got = collide_pair(sA, pA2, RA2, sB, pB2, RB2, False)
            if got:
                out.append(got[0])
    return out


def greedy_match(truth, guess):
    """Greedy nearest-position matching; returns per-truth-contact pos errs."""
    errs = []
    used = set()
    for _, tp, _ in truth:
        best, bi = np.inf, None
        for i, (_, gp, _) in enumerate(guess):
            if i in used:
                continue
            e = np.linalg.norm(tp - gp)
            if e < best:
                best, bi = e, i
        if bi is not None:
            used.add(bi)
        errs.append(best)
    return errs


def score_case(sA, pA, RA, sB, pB, RB, stats):
    on = collide_pair(sA, pA, RA, sB, pB, RB, True)
    off = collide_pair(sA, pA, RA, sB, pB, RB, False)
    if not off or not on:
        return
    # contact 0 must be the unperturbed CCD contact
    extras = [c for c in on if np.linalg.norm(c[1] - off[0][1]) > 1e-9]
    for rule in RULES:
        guess = emulate(rule, sA, pA, RA, sB, pB, RB, off[0])
        errs = greedy_match(extras, guess)
        stats.setdefault(rule, []).extend(errs)


def main():
    stats = {}

    # --- b2 worst-step pairs ---
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
        tA, tB = int(mj.geom_type[c.geom1]), int(mj.geom_type[c.geom2])
        if (tA, tB) != (5, 6) or (c.geom1, c.geom2) in seen:
            continue
        seen.add((c.geom1, c.geom2))
        g1, g2 = c.geom1, c.geom2
        score_case(mj.geom_size[g1], d.geom_xpos[g1].copy(),
                   d.geom_xmat[g1].reshape(3, 3).copy(),
                   mj.geom_size[g2], d.geom_xpos[g2].copy(),
                   d.geom_xmat[g2].reshape(3, 3).copy(), stats)

    print('b2 worst-step pairs: per-rule pos-match errors')
    for rule in RULES:
        e = np.array(stats.get(rule, [np.inf]))
        print(f'  {rule:8s} n={len(e):3d} med={np.median(e):.2e} '
              f'p90={np.percentile(e, 90):.2e} max={np.max(e):.2e}')

    # --- random shallow poses ---
    stats2 = {}
    rng = np.random.RandomState(7)
    n_cases = 0
    attempts = 0
    while n_cases < 30 and attempts < 3000:
        attempts += 1
        sA = np.array([rng.uniform(0.02, 0.06), rng.uniform(0.03, 0.12), 0.0])
        sB = rng.uniform(0.03, 0.15, 3)
        pA = np.zeros(3)
        axis = rng.normal(size=3)
        RA = rot(axis, rng.uniform(0, np.pi))
        axis = rng.normal(size=3)
        RB = rot(axis, rng.uniform(0, np.pi))
        dirn = rng.normal(size=3)
        dirn /= np.linalg.norm(dirn)
        pB = pA + dirn * rng.uniform(0.5, 1.0) * (
            min(sA[0], sA[1]) + np.min(sB))
        off = collide_pair(sA, pA, RA, sB, pB, RB, False)
        if not off or off[0][0] > -1e-4 or off[0][0] < -0.01:
            continue
        n_cases += 1
        score_case(sA, pA, RA, sB, pB, RB, stats2)

    print('random shallow poses: per-rule pos-match errors')
    for rule in RULES:
        e = np.array(stats2.get(rule, [np.inf]))
        print(f'  {rule:8s} n={len(e):3d} med={np.median(e):.2e} '
              f'p90={np.percentile(e, 90):.2e} max={np.max(e):.2e}')


if __name__ == '__main__':
    main()
