"""Witness refinement for hull-hull contacts: EPA reports the witness pair
realizing the MTV — for vertex-face contacts that is THE vertex shifted to
half depth. Recover it from support FEATURES: the top-3 support vertices of
each hull along +/-n (validity-masked at a tie tolerance), brought into the
contact tangent plane, then alternating projections (POCS) between the two
feature triangles; pos = the tangential witness lifted midway between the two
support planes.
"""

import os
import sys
from collections import defaultdict

import mujoco
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model  # noqa: E402
from gym_quadruped_tpu.physics import ccd  # noqa: E402


def _top3_feature(W, d, tol):
    """Top-3 support verts of hull W (V, 3) along d; invalid slots replicate
    the best vertex. Returns (3, 3)."""
    vals = W @ d
    out = []
    v = vals
    best_val = jnp.max(vals)
    for _ in range(3):
        i = jnp.argmax(v)
        out.append((W[i], v[i]))
        v = v.at[i].set(-jnp.inf)
    pts = jnp.stack([p for p, _ in out])
    ok = jnp.stack([val >= best_val - tol for _, val in out])
    return jnp.where(ok[:, None], pts, pts[0][None])


def hull_witness(W1, W2, n, depth, tol=1e-6, rounds=8):
    """Witness midpoint for hull-hull contact along unit n (dir of max
    overlap, depth_fn = sup1(n) + sup2(-n))."""
    f1 = _top3_feature(W1, n, tol)       # (3, 3)
    f2 = _top3_feature(W2, -n, tol)
    s1 = jnp.max(W1 @ n)                 # A's support plane: n.x = s1
    s2 = -jnp.max(W2 @ (-n))             # B's support plane: n.x = s2
    w = f1[0]
    for _ in range(rounds):
        w = ccd.clip_onto_triangle(w, f1[0], f1[1], f1[2])
        w = ccd.clip_onto_triangle(w, f2[0], f2[1], f2[2])
        # remove normal drift: keep only tangent motion
    mid = 0.5 * (s1 + s2)
    w = w + (mid - jnp.dot(w, n)) * n
    return w


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else 'hyqreal1'
    mj, limits = build_mj_model(robot, 'flat')
    model = extract_model(mj, robot, 'flat', limits)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(0)

    lo = mj.jnt_range[:, 0].copy()
    hi = mj.jnt_range[:, 1].copy()
    unlimited = ~mj.jnt_limited.astype(bool)
    lo[unlimited] = -np.pi
    hi[unlimited] = np.pi

    stats = defaultdict(list)
    seen = 0
    for trial in range(400):
        if seen >= 70:
            break
        mujoco.mj_resetDataKeyframe(mj, d, 0)
        d.qpos[2] = 2.0
        for j in range(mj.njnt):
            if mj.jnt_type[j] == 3:
                d.qpos[mj.jnt_qposadr[j]] = rng.uniform(lo[j], hi[j])
        mujoco.mj_forward(mj, d)
        for ci in range(d.ncon):
            c = d.contact[ci]
            g1, g2 = int(c.geom1), int(c.geom2)
            if int(mj.geom_type[g1]) != 7 or int(mj.geom_type[g2]) != 7:
                continue
            seen += 1

            def hull_world(g):
                did = int(model.geom_dataid[g])
                V = int(model.mesh_vertnum[did])
                verts = model.mesh_vert[did][:V]
                R = d.geom_xmat[g].reshape(3, 3)
                return jnp.asarray(verts @ R.T + d.geom_xpos[g])

            W1, W2 = hull_world(g1), hull_world(g2)

            def depth_fn(dd):
                return ccd.supval_verts(dd, W1) + ccd.supval_verts(dd * -1.0, W2)

            d0s = jnp.stack([
                jnp.asarray(d.geom_xpos[g2] - d.geom_xpos[g1]),
                jnp.mean(W2, 0) - jnp.mean(W1, 0)])[None]
            depth0, d0 = ccd.best_axis(depth_fn, d0s)
            depth, n = ccd.pattern_refine(depth_fn, d0, depth0, rounds=24)
            depth = depth[0]
            n = n[0]
            # our n: overlap direction; mj frame normal g1->g2. compare both
            mj_n = c.frame[:3].copy()
            sgn = np.sign(float(np.dot(np.asarray(n), mj_n))) or 1.0
            for tol in (1e-7, 1e-6, 1e-5, 1e-4):
                w = hull_witness(W1, W2, n, depth, tol=tol)
                stats[f'pos_tol{tol:g}'].append(
                    float(np.max(np.abs(np.asarray(w) - c.pos))))
            stats['depth'].append(abs(float(-depth) - c.dist))
            stats['ncos'].append(1.0 - abs(float(np.dot(np.asarray(n), mj_n))))
            stats['nsign'].append(sgn)

    for k in sorted(stats):
        v = np.asarray(stats[k])
        print(f'{k}: n={len(v)} med={np.median(v):.2e} '
              f'p90={np.percentile(v, 90):.2e} max={v.max():.2e}')


if __name__ == '__main__':
    main()
