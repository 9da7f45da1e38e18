"""Step-by-step internals of _mesh_mesh at the t=148 geoms 2-4 frozen pose."""

import os
import sys

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
from gym_quadruped_tpu.physics import ccd  # noqa: E402
from gym_quadruped_tpu.physics.collision import _hull_hull_witness  # noqa: E402


def main():
    mj, limits = build_mj_model('hyqreal1', 'flat')
    model = extract_model(mj, 'hyqreal1', 'flat', limits)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    rng = np.random.RandomState(2)
    ctrl_seq = rng.uniform(-2, 2, (200, mj.nu))
    for t in range(149):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
        if t == 148:
            break

    print('mj contacts (2-4):')
    for k in range(d.ncon):
        c = d.contact[k]
        if int(c.geom1) == 2 and int(c.geom2) == 4:
            print(f'  dist={c.dist:+.6e} pos={np.round(c.pos, 6)} '
                  f'n={np.round(c.frame[:3], 5)}')

    g1, g2 = 2, 4
    did1, did2 = int(model.geom_dataid[g1]), int(model.geom_dataid[g2])
    p1 = jnp.asarray(d.geom_xpos[g1])
    R1 = jnp.asarray(d.geom_xmat[g1].reshape(3, 3))
    p2 = jnp.asarray(d.geom_xpos[g2])
    R2 = jnp.asarray(d.geom_xmat[g2].reshape(3, 3))
    W1l = jnp.asarray(model.mesh_vert[did1])
    W2l = jnp.asarray(model.mesh_vert[did2])

    W1 = W1l @ R1.T + p1[None]
    W2 = W2l @ R2.T + p2[None]

    def depth_fn(dd):
        return ccd.supval_verts(dd, W1) + ccd.supval_verts(-dd, W2)

    d0s = jnp.stack([p2 - p1, jnp.mean(W2, 0) - jnp.mean(W1, 0)])
    d0_depth, d0 = ccd.best_axis(depth_fn, d0s)
    depth0, n0 = ccd.pattern_refine(depth_fn, d0, d0_depth, rounds=20)
    w0 = _hull_hull_witness(W1, W2, n0, tol=1e-5)
    print(f'\ndepth0={float(depth0):+.6e} n0={np.round(np.asarray(n0), 5)}')
    print(f'w0={np.round(np.asarray(w0), 6)}')

    Ra, Rb = ccd.perturb_rots(n0)
    W1p = jnp.einsum('kij,vj->kvi', Ra, W1 - p1) + p1
    W2p = jnp.einsum('kij,vj->kvi', Rb, W2 - p2) + p2

    def depth_fn_p(dd):
        exp = (slice(None),) + (None,) * (dd.ndim - 2)
        return (ccd.supval_verts(dd, W1p[exp])
                + ccd.supval_verts(-dd, W2p[exp]))

    n0b = jnp.broadcast_to(n0, (4, 3))
    depth_p, n_p = ccd.pattern_refine(depth_fn_p, n0b, depth_fn_p(n0b),
                                      rounds=8, r0=8e-3)
    xa = ccd.support_verts(n_p, W1p)
    xb = ccd.support_verts(-n_p, W2p)
    print('\nper-config:')
    for k in range(4):
        print(f'  cfg{k}: depth={float(depth_p[k]):+.6e} '
              f'n={np.round(np.asarray(n_p[k]), 5)}')
        print(f'    xa={np.round(np.asarray(xa[k]), 5)} '
              f'xb={np.round(np.asarray(xb[k]), 5)}')

    pos_p = ccd.hull_witness(
        n_p, depth_p,
        [xa, xb + depth_p[..., None] * n_p, w0 + 0.5 * depth0 * n0],
        W1p, W2p)
    print('\nwitness midpoints:')
    print(np.round(np.asarray(pos_p), 6))
    # expected mj vertex contacts:
    print('\nexpected: [0.12193 0.155388 0.060996], [0.106355 0.155435 '
          '0.061268]')
    # candidate check: B support verts along -n0 (unperturbed)
    sup = np.asarray(W2) @ np.asarray(-n0)
    order = np.argsort(-sup)
    print('\ntop B verts along -n0 (gap, pos):')
    for j in order[:5]:
        print(f'  {sup.max() - sup[j]:.2e} {np.round(np.asarray(W2)[j], 5)}')


if __name__ == '__main__':
    main()
