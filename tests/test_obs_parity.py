"""Observable-pipeline parity vs CPU MuJoCo ground truth.

Oracle strategy per SURVEY.md §4: MuJoCo itself is the correctness oracle. We step
the real engine and our engine from the same state with the same torque sequence and
compare (a) the state trajectory and (b) every observable, computed on the MuJoCo
side exactly the way the reference computes it (quadruped_env.py:1146-1226 and the
accessors it calls) — including the mjData staleness semantics (kinematic registers
at the pre-step state, qpos/qvel post-step).
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_quadruped_tpu.env import observables as obslib
from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics import engine


@pytest.fixture(scope='module', params=['mini_cheetah', 'go2'])
def setup(request):
    robot = request.param
    mj, limits = build_mj_model(robot, 'flat')
    model = extract_model(mj, robot, 'flat', limits)
    return robot, mj, model


def _mj_obs(mj, d, model, ref_lin_H, ref_yaw_dot):
    """Reference-side observable computation on raw mjData (post-mj_step)."""
    from scipy.spatial.transform import Rotation

    quat_wxyz = d.qpos[3:7]
    R = Rotation.from_quat(np.roll(quat_wxyz, -1)).as_matrix()
    base_pos = d.qpos[0:3]
    euler = Rotation.from_matrix(R).as_euler('xyz')
    Rh = Rotation.from_euler('xyz', euler * [0, 0, 1]).as_matrix()
    ref_lin_w = Rh @ ref_lin_H
    ref_ang_w = np.array([0, 0, ref_yaw_dot])

    feet_pos_w = d.geom_xpos[np.asarray(model.feet_geom_id)]
    jac = []
    for k in range(4):
        jacp = np.zeros((3, mj.nv))
        mujoco.mj_jac(mj, d, jacp, None, feet_pos_w[k],
                      int(model.feet_body_id[k]))
        jac.append(jacp)
    feet_vel_w = np.stack([j @ d.qvel for j in jac])

    M = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, M)

    # per-foot GRF via mj_contactForce (quadruped_env.py:836-868)
    grf = np.zeros((4, 3))
    contact_state = np.zeros(4)
    for ci, con in enumerate(d.contact):
        b1, b2 = mj.geom_bodyid[con.geom1], mj.geom_bodyid[con.geom2]
        if 0 in (b1, b2):
            other = b2 if b1 == 0 else b1
            for k in range(4):
                if other == int(model.feet_body_id[k]):
                    contact_state[k] = 1.0
                    f6 = np.zeros(6)
                    mujoco.mj_contactForce(mj, d, ci, f6)
                    Rc = con.frame.reshape(3, 3)
                    grf[k] += Rc.T @ f6[:3]

    return {
        'qpos': d.qpos.copy(), 'qvel': d.qvel.copy(),
        'base_pos': base_pos.copy(),
        'base_lin_vel': d.qvel[0:3].copy(),
        'base_lin_vel:base': R.T @ d.qvel[0:3],
        'base_lin_vel_err': ref_lin_w - d.qvel[0:3],
        'base_ang_vel': R @ d.qvel[3:6],
        'base_ang_vel:base': d.qvel[3:6].copy(),
        'base_ang_vel_err:base': R.T @ ref_ang_w - d.qvel[3:6],
        'base_lin_acc': d.qacc[0:3].copy(),
        'base_ori_euler_xyz': euler,
        'base_ori_quat_wxyz': quat_wxyz.copy(),
        'base_ori_SO3': R.reshape(-1),
        'gravity_vector:base': R.T @ np.array([0, 0, -1.0]),
        'qpos_js': d.qpos[7:].copy(), 'qvel_js': d.qvel[6:].copy(),
        'tau_ctrl_setpoint': d.ctrl.copy(),
        'feet_pos': feet_pos_w.reshape(-1),
        'feet_pos:base': ((feet_pos_w - base_pos) @ R).reshape(-1),
        'feet_vel': feet_vel_w.reshape(-1),
        'kinetic_energy': np.array([0.5 * d.qvel @ M @ d.qvel]),
        'work': np.array([(M @ d.qacc) @ d.qvel]),
        'contact_state': contact_state,
        'contact_forces': grf.reshape(-1),
    }


def test_trajectory_and_obs_parity(setup):
    robot, mj, model = setup
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)

    rng = np.random.RandomState(1)
    n_steps = 50
    ctrl_seq = rng.uniform(-2, 2, (n_steps, mj.nu))

    qpos = jnp.asarray(d.qpos.copy())
    qvel = jnp.asarray(d.qvel.copy())
    ref_lin_H = np.array([0.3, 0.0, 0.0])
    ref_yaw_dot = 0.1

    names = list(_mj_obs(mj, d, model, ref_lin_H, ref_yaw_dot).keys())

    @jax.jit
    def step_obs(qp, qv, ctrl):
        qp2, qv2, fwd = engine.step(model, qp, qv, ctrl)
        obs = obslib.compute_obs(model, names, qp2, qv2, ctrl, fwd,
                                 jnp.asarray(ref_lin_H),
                                 jnp.asarray(ref_yaw_dot))
        return qp2, qv2, obs

    worst = {}
    for t in range(n_steps):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
        qpos, qvel, obs = step_obs(qpos, qvel, jnp.asarray(ctrl_seq[t]))
        mj_obs = _mj_obs(mj, d, model, ref_lin_H, ref_yaw_dot)
        for name in names:
            err = np.max(np.abs(np.asarray(obs[name]) - mj_obs[name]))
            scale = 1.0 + np.max(np.abs(mj_obs[name]))
            worst[name] = max(worst.get(name, 0.0), err / scale)

    err_q = np.max(np.abs(np.asarray(qpos) - d.qpos))
    assert err_q < 1e-4, f'trajectory diverged: {err_q}'
    for name, e in worst.items():
        assert e < 1e-4, f'obs {name} rel err {e:.2e}'


def test_long_horizon_tumble_parity():
    """100-step random-torque tumble (contact-rich, up to ~20 simultaneous
    contacts): trajectory must track CPU MuJoCo within the BASELINE 1e-3 bar.
    Guards the contact-culling cap (engine.MAX_CONE_CONTACTS) and solver
    convergence against regressions."""
    mj, limits = build_mj_model('go2', 'flat')
    model = extract_model(mj, 'go2', 'flat', limits)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)
    rng = np.random.RandomState(0)
    ctrl_seq = rng.uniform(-3, 3, (100, mj.nu)) * 0.5
    qpos = jnp.asarray(d.qpos.copy())
    qvel = jnp.asarray(d.qvel.copy())
    step = jax.jit(lambda qp, qv, c: engine.step(model, qp, qv, c)[:2])
    err = 0.0
    for t in range(100):
        d.ctrl[:] = ctrl_seq[t]
        mujoco.mj_step(mj, d)
        qpos, qvel = step(qpos, qvel, jnp.asarray(ctrl_seq[t]))
        err = max(err, float(np.max(np.abs(np.asarray(qpos) - d.qpos))))
    assert err < 1e-3, f'tumble trajectory error {err:.2e}'
