"""Trajectory-parity probe over the robots × terrains matrix.

For each (robot, scene) combo: step CPU MuJoCo and our engine from the same
keyframe state with the same random-torque sequence and report the worst qpos
divergence over the horizon. Used to validate the collision approximations
(_hfield_sphere, _box_capsule, _plane_cylinder) against the oracle before the
combos are promoted into tests/test_obs_parity.py.

Usage: python scripts/parity_matrix.py [steps] [combo ...]
  combo: robot/scene (default: the full matrix below)
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, 'tests'))
sys.path.insert(0, _ROOT)
import conftest  # noqa: F401  (forces CPU backend + x64 + compile cache)

import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics import engine

ROBOTS = ['mini_cheetah', 'go2', 'aliengo', 'b2', 'go1', 'hyqreal2']
SCENES = ['flat', 'perlin', 'random_boxes']


def run_combo(robot, scene, n_steps=200, amp=2.0):
    mj, limits = build_mj_model(robot, scene)
    model = extract_model(mj, robot, scene, limits)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    # spawn above local terrain height so hfield/boxes scenes start airborne
    if scene != 'flat':
        d.qpos[2] += 0.5
    mujoco.mj_forward(mj, d)

    rng = np.random.RandomState(2)
    ctrl_seq = rng.uniform(-amp, amp, (n_steps, mj.nu))
    qpos = jnp.asarray(d.qpos.copy())
    qvel = jnp.asarray(d.qvel.copy())
    # thread qacc warmstart across steps exactly like MuJoCo's qacc_warmstart
    warm = jnp.asarray(d.qacc_warmstart.copy())
    iters = int(os.environ.get('PARITY_ITERS', 10))

    @jax.jit
    def step(qp, qv, c, w):
        qp2, qv2, fwd = engine.step(model, qp, qv, c, warmstart=w,
                                    solver_iterations=iters)
        return qp2, qv2, fwd.qacc

    err, err_at = 0.0, -1
    for t in range(n_steps):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
        qpos, qvel, warm = step(qpos, qvel, jnp.asarray(ctrl_seq[t]), warm)
        e = float(np.max(np.abs(np.asarray(qpos) - d.qpos)))
        if e > err:
            err, err_at = e, t
        if err > 1.0:
            break
    return err, err_at


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    combos = [a.split('/') for a in sys.argv[2:]] or \
        [(r, s) for r in ROBOTS for s in SCENES]
    if len(combos) > 1:
        # one subprocess per combo: LLVM's CPU JIT exhausts code memory when a
        # single process accumulates all 18 big x64 programs
        import subprocess
        for robot, scene in combos:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(n_steps),
                 f'{robot}/{scene}'], capture_output=True, text=True)
            out = (r.stdout or '').strip()
            print(out if out else
                  f'ERR  {robot:14s} {scene:14s} rc={r.returncode} '
                  f'{(r.stderr or "").strip()[-200:]}', flush=True)
        return
    for robot, scene in combos:
        try:
            err, at = run_combo(robot, scene, n_steps)
            flag = 'OK  ' if err < 1e-3 else 'FAIL'
            print(f'{flag} {robot:14s} {scene:14s} maxerr {err:.3e} @step {at}',
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'ERR  {robot:14s} {scene:14s} {type(e).__name__}: {e}',
                  flush=True)


if __name__ == '__main__':
    main()
