"""Replay aliengo/perlin to the worst divergence step and isolate the trunk
box vs hfield narrow phase: mj per-prism contacts vs our _hfield_box, on the
REAL terrain and poses. Usage: probe_hfield_real.py [t_step] [geom_id]"""

import sys
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(_ROOT, 'tests'))
sys.path.insert(0, _ROOT)
import conftest  # noqa: F401

import mujoco
import numpy as np
import jax.numpy as jnp

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics import collision
from gym_quadruped_tpu.physics.kinematics import fk


def main(t_worst=139, gid=None):
    mj, limits = build_mj_model('aliengo', 'perlin')
    model = extract_model(mj, 'aliengo', 'perlin', limits)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    d.qpos[2] += 0.5
    mujoco.mj_forward(mj, d)
    rng = np.random.RandomState(2)
    ctrl_seq = rng.uniform(-2.0, 2.0, (400, mj.nu))
    for t in range(t_worst):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
    mujoco.mj_forward(mj, d)

    hf_gid = int(np.where(mj.geom_type == 1)[0][0])
    hpos = d.geom_xpos[hf_gid].copy()
    hmat = d.geom_xmat[hf_gid].reshape(3, 3).copy()

    tname = {0: 'plane', 1: 'hfield', 2: 'sphere', 3: 'capsule',
             5: 'cylinder', 6: 'box'}
    box_geoms = sorted({c.geom2 for c in [d.contact[i] for i in range(d.ncon)]
                        if c.geom1 == hf_gid
                        and mj.geom_type[c.geom2] in (5, 6)})
    if gid is not None:
        box_geoms = [gid]
    for g in box_geoms:
        gt = int(mj.geom_type[g])
        print(f'\n==== hfield vs geom {g} ({tname[gt]}) '
              f'margin={mj.geom_margin[g]:.4f} ====')
        print('mj contacts:')
        for i in range(d.ncon):
            c = d.contact[i]
            if c.geom1 == hf_gid and c.geom2 == g:
                print(f'  dist={c.dist:+.6f} pos={np.round(c.pos, 5)} '
                      f'n={np.round(c.frame[:3], 4)}')
        gpos = jnp.asarray(d.geom_xpos[g])
        gmat = jnp.asarray(d.geom_xmat[g].reshape(3, 3))
        size = jnp.asarray(mj.geom_size[g])
        margin = float(max(mj.geom_margin[g], mj.geom_margin[hf_gid]))
        n_span = collision.hfield_span(model, [g])
        if gt == 6:
            dist, pos, nrm = collision._hfield_box(
                model, jnp.asarray(hpos), jnp.asarray(hmat), gpos, gmat,
                size, margin, n_span)
        else:
            dist, pos, nrm = collision._hfield_cylinder(
                model, jnp.asarray(hpos), jnp.asarray(hmat), gpos, gmat,
                float(size[0]), float(size[1]), margin, n_span)
        print('ours:')
        for i in range(len(dist)):
            if float(dist[i]) < margin + 1e-4:
                print(f'  dist={float(dist[i]):+.6f} '
                      f'pos={np.round(np.asarray(pos[i]), 5)} '
                      f'n={np.round(np.asarray(nrm[i]), 4)}')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 139,
         int(sys.argv[2]) if len(sys.argv) > 2 else None)
