"""Validate the new _mesh_mesh multiccd manifold against MuJoCo's manifolds
over the hyqreal1/flat folded-leg trajectory (seed 2, amp 2, 200 steps).

Scores per pair-step: contact count match, set-wise position error (greedy
match), dist error. The bar for promoting the hyqreal1 xfail is count
agreement on the dominant cases and positions at the few-1e-5 level."""

import os
import sys
from collections import Counter

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')

import jax.numpy as jnp  # noqa: E402
import mujoco  # noqa: E402
import numpy as np  # noqa: E402

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model  # noqa: E402
from gym_quadruped_tpu.physics.collision import _mesh_mesh  # noqa: E402


def main():
    mj, limits = build_mj_model('hyqreal1', 'flat')
    model = extract_model(mj, 'hyqreal1', 'flat', limits)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    rng = np.random.RandomState(2)
    ctrl_seq = rng.uniform(-2, 2, (200, mj.nu))
    mesh_geoms = set(int(g) for g in range(mj.ngeom)
                     if mj.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH)

    fn = jax.jit(_mesh_mesh)
    count_diff = Counter()
    pos_errs = []
    worst = []
    n_checked = 0
    for t in range(200):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
        pairs = {}
        for k in range(d.ncon):
            c = d.contact[k]
            key = (int(c.geom1), int(c.geom2))
            if key[0] in mesh_geoms and key[1] in mesh_geoms:
                pairs.setdefault(key, []).append(
                    (float(c.dist), c.pos.copy()))
        for (g1, g2), ref in pairs.items():
            did1, did2 = int(model.geom_dataid[g1]), int(model.geom_dataid[g2])
            margin = float(mj.geom_margin[g1] + mj.geom_margin[g2])
            dd, pp, nn = fn(
                jnp.asarray(d.geom_xpos[g1]),
                jnp.asarray(d.geom_xmat[g1].reshape(3, 3)),
                jnp.asarray(model.mesh_vert[did1]),
                int(model.mesh_vertnum[did1]),
                jnp.asarray(d.geom_xpos[g2]),
                jnp.asarray(d.geom_xmat[g2].reshape(3, 3)),
                jnp.asarray(model.mesh_vert[did2]),
                int(model.mesh_vertnum[did2]), margin)
            dd, pp = np.asarray(dd), np.asarray(pp)
            ours = [(dd[k], pp[k]) for k in range(5) if dd[k] < margin]
            n_checked += 1
            count_diff[(len(ref), len(ours))] += 1
            # greedy set-wise position match
            errs = []
            used = set()
            for dr, pr in ref:
                best, bi = 1e9, -1
                for i, (do, po) in enumerate(ours):
                    if i in used:
                        continue
                    e = np.linalg.norm(po - pr)
                    if e < best:
                        best, bi = e, i
                if bi >= 0:
                    used.add(bi)
                    errs.append(best)
            if errs:
                pos_errs.extend(errs)
                if max(errs) > 3e-4 or len(ref) != len(ours):
                    worst.append((t, g1, g2, len(ref), len(ours),
                                  float(max(errs)),
                                  float(ref[0][0]), float(dd.min())))

    print('pair-steps checked:', n_checked)
    print('count (mj, ours) histogram:', dict(sorted(count_diff.items())))
    pe = np.array(pos_errs)
    print(f'pos err: med={np.median(pe):.2e} p90={np.percentile(pe, 90):.2e} '
          f'max={pe.max():.2e}')
    print('worst cases (t, g1, g2, nmj, nours, maxerr, dist_mj, dist_ours):')
    for w in worst[:15]:
        print('  ', w)


if __name__ == '__main__':
    main()
