"""Narrow-phase oracle tests: isolated geom pairs vs MuJoCo on random shallow
poses. Locks each collider at the contact level without the (hours-long on
x64 CPU) full-scene engine compiles — this is the per-pair counterpart of the
trajectory matrix in test_parity_matrix.py.

Tolerances are the measured fidelity of each pipeline (docs/PERF_NOTES.md):
machine-level for primitive pairs, ~1e-4 median for the decoded multiccd
cyl-box manifold, and median-based bounds for hfield pairs (MuJoCo's hfield
pipeline emits non-reproducible satellite contacts during tilted grinding, so
these assert the median/primary contact, not the worst case).
"""

import types

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_quadruped_tpu.physics import collision

PAIR_XML = """
<mujoco>
  <worldbody>
    <body name="A" pos="0 0 0">
      <freejoint/>
      <geom name="gA" type="{tA}" size="{sA}" mass="1"/>
    </body>
    <body name="B" pos="0 0 2">
      <freejoint/>
      <geom name="gB" type="{tB}" size="{sB}" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def _rot(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = rng.uniform(0, np.pi)
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    R = np.empty(9)
    mujoco.mju_quat2Mat(R, q)
    return R.reshape(3, 3)


def _mj_pair(tA, sA, tB, sB):
    m = mujoco.MjModel.from_xml_string(PAIR_XML.format(
        tA=tA, sA=' '.join(f'{x:g}' for x in sA if x > 0),
        tB=tB, sB=' '.join(f'{x:g}' for x in sB if x > 0)))
    return m, mujoco.MjData(m)


def _collide_mj(m, d, pA, RA, pB, RB):
    q = np.empty(4)
    mujoco.mju_mat2Quat(q, RA.flatten())
    d.qpos[0:3], d.qpos[3:7] = pA, q
    mujoco.mju_mat2Quat(q, RB.flatten())
    d.qpos[7:10], d.qpos[10:14] = pB, q
    mujoco.mj_forward(m, d)
    return [(d.contact[i].dist, d.contact[i].pos.copy(),
             d.contact[i].frame[:3].copy()) for i in range(d.ncon)]


def _shallow_pose(m, d, rng, sA, sB):
    """Binary-search B toward A until shallow penetration; None if missed."""
    RA, RB = _rot(rng), _rot(rng)
    dirn = rng.normal(size=3)
    dirn /= np.linalg.norm(dirn)
    start = dirn * (np.linalg.norm(sA) + np.linalg.norm(sB) + 0.01)
    lo, hi = 0.0, 1.0
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        got = _collide_mj(m, d, np.zeros(3), RA, start * (1 - mid), RB)
        dmin = min((g[0] for g in got), default=1.0)
        if -6e-3 < dmin < -3e-4:
            return RA, start * (1 - mid), RB
        if dmin < 0:
            hi = mid
        else:
            lo = mid
    return None


def _match_stats(mjc, ours):
    """Greedy position matching; returns per-mj-contact pos errors (inf if
    unmatched) and |dist| errors for matched pairs."""
    used, pe, de = set(), [], []
    for dmj, pmj, _ in mjc:
        best, bi = np.inf, None
        for i, (do, po, no) in enumerate(ours):
            if i in used:
                continue
            e = np.linalg.norm(pmj - po)
            if e < best:
                best, bi = e, i
        pe.append(best)
        if bi is not None:
            used.add(bi)
            de.append(abs(dmj - ours[bi][0]))
    return pe, de


CASES = [
    # tA, sA, tB, sB, ours_fn_name, pos_med, pos_p80, dist_med, match_frac
    ('sphere', [0.05, 0, 0], 'box', [0.1, 0.08, 0.06], 'sphere_box',
     1e-7, 1e-6, 1e-9, 0.7),
    ('capsule', [0.04, 0.1, 0], 'box', [0.1, 0.08, 0.06], 'box_capsule',
     5e-3, 2e-2, 1e-3, 0.7),
    ('cylinder', [0.04, 0.1, 0], 'box', [0.12, 0.09, 0.07], 'cyl_box',
     5e-4, 5e-3, 5e-4, 0.7),
    # box-box: corner + deepest-edge candidates; MuJoCo's mjc_BoxBox clips the
    # incident face POLYGON (up to 8 points incl. edge-crossing vertices we
    # don't generate), so ~45% of its shallow manifold points go unmatched —
    # the matched ones (the load-bearing deepest) agree to machine precision
    ('box', [0.09, 0.07, 0.05], 'box', [0.12, 0.09, 0.07], 'box_box',
     5e-3, 1.5e-1, 2e-3, 0.55),
]


def _ours(name, pA, RA, sA, pB, RB, sB):
    pA, RA, pB, RB = map(jnp.asarray, (pA, RA, pB, RB))
    if name == 'sphere_box':
        d, p, n = collision._box_sphere(pB, RB, jnp.asarray(sB), pA,
                                        float(sA[0]))
        n = -n
        d, p, n = d[None], p[None], n[None]
    elif name == 'box_capsule':
        d, p, n = collision._cap_box_ccd(pA, RA, float(sA[0]), float(sA[1]),
                                         pB, RB, jnp.asarray(sB))
    elif name == 'cyl_box':
        d, p, n = collision._cyl_box_ccd(pA, RA, float(sA[0]), float(sA[1]),
                                         pB, RB, jnp.asarray(sB))
    elif name == 'box_box':
        d, p, n = collision._box_box_group(
            pA[None], RA[None], jnp.asarray(sA, jnp.float64)[None],
            pB[None], RB[None], jnp.asarray(sB, jnp.float64)[None])
        d, p, n = d[0], p[0], n[0]
    return d, p, n


@pytest.mark.parametrize('tA,sA,tB,sB,fn,pos_med,pos_p80,dist_med,match_frac',
                         CASES, ids=[c[4] for c in CASES])
def test_pair_oracle(tA, sA, tB, sB, fn, pos_med, pos_p80, dist_med,
                     match_frac):
    rng = np.random.RandomState(11)
    m, d = _mj_pair(tA, sA, tB, sB)
    jit_fn = jax.jit(lambda pA, RA, pB, RB: _ours(fn, pA, RA, sA, pB, RB, sB))
    pos_errs, dist_errs, n_cases = [], [], 0
    trials = 0
    while n_cases < 12 and trials < 600:
        trials += 1
        pose = _shallow_pose(m, d, rng, np.asarray(sA), np.asarray(sB))
        if pose is None:
            continue
        RA, pB, RB = pose
        n_cases += 1
        mjc = _collide_mj(m, d, np.zeros(3), RA, pB, RB)
        dd, pp, nn = jit_fn(np.zeros(3), RA, pB, RB)
        dd, pp, nn = np.asarray(dd), np.asarray(pp), np.asarray(nn)
        ours = [(dd[i], pp[i], nn[i]) for i in range(len(dd)) if dd[i] < 0]
        pe, de = _match_stats(mjc, ours)
        pos_errs.extend(pe)
        dist_errs.extend(de)
    assert n_cases >= 8, f'only {n_cases} contact poses found'
    pos_errs = np.asarray(pos_errs)
    matched = pos_errs[np.isfinite(pos_errs)]
    assert len(matched) >= match_frac * len(pos_errs), \
        f'unmatched contacts: {np.sum(~np.isfinite(pos_errs))}/{len(pos_errs)}'
    assert np.median(matched) < pos_med, \
        f'pos med {np.median(matched):.2e} > {pos_med:.0e}'
    assert np.percentile(matched, 80) < pos_p80, \
        f'pos p80 {np.percentile(matched, 80):.2e} > {pos_p80:.0e}'
    assert np.median(dist_errs) < dist_med, \
        f'dist med {np.median(dist_errs):.2e} > {dist_med:.0e}'


def test_hfield_box_oracle():
    """Primary hfield-box contacts match MuJoCo to ~1e-6 on shallow poses
    (the satellite/non-MTV quirk cases are excluded by the median bound)."""
    rng = np.random.RandomState(3)
    hdata = rng.uniform(0, 1, (17, 17))
    size = np.array([0.18, 0.12, 0.08])
    mj = mujoco.MjModel.from_xml_string("""
<mujoco>
  <asset><hfield name="hf" nrow="17" ncol="17" size="1 1 0.3 0.1"/></asset>
  <worldbody>
    <geom name="terrain" type="hfield" hfield="hf" pos="0 0 0"/>
    <body name="b" pos="0 0 2"><freejoint/>
      <geom name="g" type="box" size="0.18 0.12 0.08" mass="1"/></body>
  </worldbody>
</mujoco>""")
    mj.hfield_data[:] = hdata.ravel()
    d = mujoco.MjData(mj)
    fake = types.SimpleNamespace(
        hfield_size=np.array([1.0, 1.0, 0.3, 0.1]),
        hfield_nrow=17, hfield_ncol=17,
        hfield_data=jnp.asarray(hdata),
        geom_size=np.array([[0.0] * 3, list(size)]))
    n_span = collision.hfield_span(fake, [1])
    eye = jnp.eye(3)
    ours_fn = jax.jit(lambda bp, bm: collision._hfield_box(
        fake, jnp.zeros(3), eye, bp, bm, jnp.asarray(size), 0.0, n_span))
    pos_errs, cases = [], 0
    while cases < 12:
        x, y = rng.uniform(-0.6, 0.6, 2)
        R = _rot(rng)
        q = np.empty(4)
        mujoco.mju_mat2Quat(q, R.flatten())
        hit = None
        for z in np.arange(0.45, 0.0, -0.004):
            d.qpos[0:3] = [x, y, z]
            d.qpos[3:7] = q
            mujoco.mj_forward(mj, d)
            if d.ncon and min(d.contact[i].dist
                              for i in range(d.ncon)) < -5e-4:
                hit = z
                break
        if hit is None:
            continue
        cases += 1
        mjc = [(d.contact[i].dist, d.contact[i].pos.copy(),
                d.contact[i].frame[:3].copy()) for i in range(d.ncon)]
        dd, pp, nn = ours_fn(jnp.asarray([x, y, hit]), jnp.asarray(R))
        dd, pp, nn = np.asarray(dd), np.asarray(pp), np.asarray(nn)
        ours = [(dd[i], pp[i], nn[i]) for i in range(len(dd)) if dd[i] < 0]
        pe, _ = _match_stats(mjc, ours)
        pos_errs.extend(pe)
    pos_errs = np.asarray(pos_errs)
    matched = pos_errs[np.isfinite(pos_errs)]
    assert np.median(matched) < 1e-5, f'med {np.median(matched):.2e}'


def test_plane_mesh_oracle():
    """Plane vs convex mesh hull: the decoded mjc_PlaneConvex manifold rule
    (support vertex + graph-neighbor walk, 0.3*rbound dedup vs con0's shifted
    pos, margin = SUM of geom margins, cap 3) must match MuJoCo exactly —
    count, order, dist and pos — on random tumbling poses of the real robots.
    Decode evidence: scripts/probe_plane_mesh10.py (658/658 poses at 1e-16)."""
    import jax

    from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
    from gym_quadruped_tpu.models.model import GEOM_MESH, GEOM_PLANE
    from gym_quadruped_tpu.physics.collision import _plane_mesh

    for robot in ('mini_cheetah', 'hyqreal1'):
        mj, limits = build_mj_model(robot, 'flat')
        model = extract_model(mj, robot, 'flat', limits)
        d = mujoco.MjData(mj)
        rng = np.random.RandomState(7)
        fn = jax.jit(_plane_mesh)
        n_pairs = 0
        for trial in range(15):
            mujoco.mj_resetDataKeyframe(mj, d, 0)
            q = rng.uniform(-1, 1, 4)
            q /= np.linalg.norm(q)
            d.qpos[3:7] = q
            d.qpos[2] = rng.uniform(0.05, 0.25)
            d.qpos[7:] += rng.uniform(-0.5, 0.5, mj.nq - 7)
            mujoco.mj_forward(mj, d)
            from collections import defaultdict
            obs = defaultdict(list)
            for ci in range(d.ncon):
                c = d.contact[ci]
                if mj.geom_type[c.geom1] != GEOM_PLANE:
                    continue
                if mj.geom_type[c.geom2] != GEOM_MESH:
                    continue
                obs[int(c.geom2)].append((c.dist, c.pos.copy()))
            mesh_pair_geoms = [int(g2) for g1, g2 in model.contact_pairs
                               if mj.geom_type[g1] == GEOM_PLANE
                               and mj.geom_type[g2] == GEOM_MESH]
            for g in mesh_pair_geoms:
                did = int(model.geom_dataid[g])
                margin = float(mj.geom_margin[g] + mj.geom_margin[0])
                dd, pp, _ = fn(
                    jnp.zeros(3), jnp.eye(3),
                    jnp.asarray(d.geom_xpos[g]),
                    jnp.asarray(d.geom_xmat[g].reshape(3, 3)),
                    jnp.asarray(model.mesh_vert[did]),
                    jnp.asarray(model.mesh_nbr[did]),
                    int(model.mesh_vertnum[did]),
                    float(model.geom_rbound[g]), margin)
                dd, pp = np.asarray(dd), np.asarray(pp)
                ours = [(dd[k], pp[k]) for k in range(3) if dd[k] < margin]
                ref = obs.get(g, [])
                assert len(ours) == len(ref), (robot, trial, g, dd, ref)
                for (do, po), (dr, pr) in zip(ours, ref):
                    n_pairs += 1
                    assert abs(do - dr) < 1e-10, (robot, trial, g, do, dr)
                    assert np.max(np.abs(po - pr)) < 1e-10, (robot, trial, g)
        assert n_pairs > 20, f'{robot}: too few oracle contacts ({n_pairs})'
