"""Validate the per-prism hfield-mesh path (_hfield_mesh) against MuJoCo on an
isolated hfield + free convex mesh, random shallow poses — the same protocol as
probe_hfield_validate.py (one contact per touched prism, multiccd not applied).
"""

import sys
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(_ROOT, 'tests'))
sys.path.insert(0, _ROOT)
import conftest  # noqa: F401

import types

import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.physics import collision

XML = """
<mujoco>
  <asset>
    <hfield name="hf" nrow="17" ncol="17" size="1 1 0.3 0.1"/>
    <mesh name="m" vertex="{verts}"/>
  </asset>
  <worldbody>
    <geom name="terrain" type="hfield" hfield="hf" pos="0 0 0"/>
    <body name="b" pos="0 0 2">
      <freejoint/>
      <geom name="g" type="mesh" mesh="m" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def hull_verts(m, mid=0):
    """Decode the compiled convex-hull vertex list (same walk as the builder)."""
    adr = int(m.mesh_graphadr[mid])
    graph = m.mesh_graph[adr:]
    numvert = int(graph[0])
    vert_globalid = graph[2 + numvert:2 + 2 * numvert]
    vadr = int(m.mesh_vertadr[mid])
    return np.asarray(m.mesh_vert[vadr + vert_globalid], np.float64)


def rot(axis, ang):
    axis = axis / np.linalg.norm(axis)
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    R = np.empty(9)
    mujoco.mju_quat2Mat(R, q)
    return R.reshape(3, 3)


def main():
    rng = np.random.RandomState(3)
    hdata = rng.uniform(0, 1, (17, 17))
    # random convex body ~ robot-shin scale
    pts = rng.normal(size=(40, 3)) * np.array([0.10, 0.05, 0.14])
    vstr = ' '.join(f'{x:.6f}' for x in pts.ravel())
    mj = mujoco.MjModel.from_xml_string(XML.format(verts=vstr))
    mj.hfield_data[:] = hdata.ravel()
    d = mujoco.MjData(mj)

    V = hull_verts(mj)
    rbound = float(mj.geom_rbound[1])
    fake = types.SimpleNamespace(
        hfield_size=np.array([1.0, 1.0, 0.3, 0.1]),
        hfield_nrow=17, hfield_ncol=17,
        hfield_data=jnp.asarray(hdata),
        geom_rbound=np.array([0.0, rbound]))

    n_span = collision.hfield_span_rbound(fake, [1])
    print(f'hull verts={len(V)} rbound={rbound:.3f} n_span={n_span}')
    eye = jnp.eye(3)
    Vj = jnp.asarray(V)
    ours_fn = jax.jit(lambda gp, gm: collision._hfield_mesh(
        fake, jnp.zeros(3), eye, gp, gm, Vj, len(V), rbound, 0.0, n_span))

    errs_pos, errs_d, errs_n, count_bad = [], [], [], 0
    cases = 0
    trials = 0
    while cases < 25 and trials < 4000:
        trials += 1
        x, y = rng.uniform(-0.6, 0.6, 2)
        R = rot(rng.normal(size=3), rng.uniform(0, np.pi))
        q = np.empty(4)
        mujoco.mju_mat2Quat(q, R.flatten())
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
        # the compiled GEOM frame, not the body frame: MuJoCo recenters mesh
        # assets (geom_pos/geom_quat absorb the CoM/principal-axis transform)
        gxp = d.geom_xpos[1].copy()
        gxm = d.geom_xmat[1].reshape(3, 3).copy()
        dist, pos, nrm = ours_fn(jnp.asarray(gxp), jnp.asarray(gxm))
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
    print(f'\nmesh: cases={cases} contacts={len(errs_pos)} '
          f'count_mismatch={count_bad}')
    print(f'pos err: med={np.median(errs_pos):.2e} '
          f'p90={np.percentile(errs_pos, 90):.2e} max={np.max(errs_pos):.2e}')
    print(f'dist err: med={np.median(errs_d):.2e} max={np.max(errs_d):.2e}')
    print(f'normal err: med={np.median(errs_n):.2e} max={np.max(errs_n):.2e}')


if __name__ == '__main__':
    main()
