"""Validate the per-prism hfield-convex path (_hfield_box/_hfield_cylinder)
against MuJoCo on an isolated hfield + free geom model, random shallow poses.

MuJoCo semantics (verified by flag toggling): one contact per touched prism,
multiccd NOT applied, duplicates kept at shared features.
"""

import sys
import os
import types

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(_ROOT, 'tests'))
sys.path.insert(0, _ROOT)
import conftest  # noqa: F401

import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.physics import collision

XML = """
<mujoco>
  <asset>
    <hfield name="hf" nrow="17" ncol="17" size="1 1 0.3 0.1"/>
  </asset>
  <worldbody>
    <geom name="terrain" type="hfield" hfield="hf" pos="0 0 0"/>
    <body name="b" pos="0 0 2">
      <freejoint/>
      <geom name="g" type="{gtype}" size="{gsize}" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def rot(axis, ang):
    axis = axis / np.linalg.norm(axis)
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    R = np.empty(9)
    mujoco.mju_quat2Mat(R, q)
    return R.reshape(3, 3)


def main(gtype='box'):
    rng = np.random.RandomState(3)
    hdata = rng.uniform(0, 1, (17, 17))
    if gtype == 'box':
        size = np.array([0.18, 0.12, 0.08])
        gsize = ' '.join(str(x) for x in size)
    else:  # cylinder / capsule
        size = np.array([0.06, 0.12, 0.0])
        gsize = f'{size[0]} {size[1]}'
    mj = mujoco.MjModel.from_xml_string(XML.format(gtype=gtype, gsize=gsize))
    mj.hfield_data[:] = hdata.ravel()
    d = mujoco.MjData(mj)

    fake = types.SimpleNamespace(
        hfield_size=np.array([1.0, 1.0, 0.3, 0.1]),
        hfield_nrow=17, hfield_ncol=17,
        hfield_data=jnp.asarray(hdata),
        geom_size=np.array([[0.0] * 3, list(size)]))

    n_span = collision.hfield_span(fake, [1])
    eye = jnp.eye(3)
    if gtype == 'box':
        ours_fn = jax.jit(lambda bp, bm: collision._hfield_box(
            fake, jnp.zeros(3), eye, bp, bm, jnp.asarray(size), 0.0, n_span))
    elif gtype == 'cylinder':
        ours_fn = jax.jit(lambda bp, bm: collision._hfield_cylinder(
            fake, jnp.zeros(3), eye, bp, bm, float(size[0]), float(size[1]),
            0.0, n_span))
    else:
        ours_fn = jax.jit(lambda bp, bm: collision._hfield_capsule(
            fake, jnp.zeros(3), eye, bp, bm, float(size[0]), float(size[1]),
            0.0, n_span))

    errs_pos, errs_d, errs_n, count_bad = [], [], [], 0
    cases = 0
    trials = 0
    while cases < 25 and trials < 4000:
        trials += 1
        x, y = rng.uniform(-0.6, 0.6, 2)
        R = rot(rng.normal(size=3), rng.uniform(0, np.pi))
        q = np.empty(4)
        mujoco.mju_mat2Quat(q, R.flatten())
        # drop z until shallow contact
        hit = None
        for z in np.arange(0.45, 0.0, -0.004):
            d.qpos[0:3] = [x, y, z]
            d.qpos[3:7] = q
            mujoco.mj_forward(mj, d)
            if d.ncon:
                dmin = min(d.contact[i].dist for i in range(d.ncon))
                if dmin < -5e-4:
                    hit = z
                    break
        if hit is None:
            continue
        cases += 1
        mjc = [(d.contact[i].dist, d.contact[i].pos.copy(),
                d.contact[i].frame[:3].copy()) for i in range(d.ncon)]
        dist, pos, nrm = ours_fn(jnp.asarray([x, y, hit]), jnp.asarray(R))
        dist, pos, nrm = np.asarray(dist), np.asarray(pos), np.asarray(nrm)
        ours = [(dist[i], pos[i], nrm[i]) for i in range(len(dist))
                if dist[i] < 0.0]
        if len(ours) != len(mjc):
            count_bad += 1
        used = set()
        case_err = []
        for dd, pp, nn in mjc:
            best, bi = np.inf, None
            for i, (do, po, no) in enumerate(ours):
                if i in used:
                    continue
                e = np.linalg.norm(pp - po)
                if e < best:
                    best, bi = e, i
            case_err.append(best)
            if bi is None:
                continue
            used.add(bi)
            errs_pos.append(best)
            errs_d.append(abs(dd - ours[bi][0]))
            errs_n.append(np.linalg.norm(nn - ours[bi][2]))
        if max(case_err) > 2e-3 or len(ours) != len(mjc):
            print(f'  case{cases}: nmj={len(mjc)} nours={len(ours)} '
                  f'errs={[f"{e:.1e}" for e in case_err]}')

    errs_pos = np.array(errs_pos)
    print(f'\n{gtype}: cases={cases} contacts={len(errs_pos)} '
          f'count_mismatch={count_bad}')
    print(f'pos err: med={np.median(errs_pos):.2e} '
          f'p90={np.percentile(errs_pos, 90):.2e} max={np.max(errs_pos):.2e}')
    print(f'dist err: med={np.median(errs_d):.2e} max={np.max(errs_d):.2e}')
    print(f'normal err: med={np.median(errs_n):.2e} max={np.max(errs_n):.2e}')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'box')
