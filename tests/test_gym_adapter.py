"""Gym adapter: reference API surface (spaces, reset/step, LegsAttr accessors)."""

import numpy as np
import mujoco
import jax.numpy as jnp
import pytest

from gym_quadruped_tpu.env.gym_adapter import QuadrupedGymEnv
from gym_quadruped_tpu.models.builder import build_mj_model


@pytest.fixture(scope='module')
def env():
    return QuadrupedGymEnv(robot='go2', scene='flat',
                           state_obs_names=('qpos', 'qvel', 'feet_pos:base',
                                            'contact_state'))


def test_gym_surface(env):
    obs = env.reset(seed=3)
    assert set(obs) == {'qpos', 'qvel', 'feet_pos:base', 'contact_state'}
    a = env.action_space.sample()
    obs, reward, terminated, truncated, info = env.step(a)
    assert isinstance(reward, float) and isinstance(terminated, bool)
    assert obs['qpos'].shape == (env.core.model.nq,)
    assert env.observation_space['qvel'].shape == (env.core.model.nv,)


def test_accessors_match_mujoco(env):
    """LegsAttr accessor surface vs CPU MuJoCo at the same state."""
    m = env.core.model
    env.reset(qpos=m.key_qpos[0], qvel=np.zeros(m.nv), random=False)
    # note: reset runs one zero-ctrl engine step AND applies the ground-friction
    # override (reference _set_ground_friction runs on every reset with
    # tangential=1.0 by default) — mirror both on the mujoco side
    mj, _ = build_mj_model('go2', 'flat')
    for gid in np.concatenate([[mj.geom('floor').id],
                               np.asarray(m.feet_geom_id)]):
        mj.geom_friction[gid] = [1.0, 0.005, 0.0]
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    d.qacc_warmstart[:] = 0
    mujoco.mj_step(mj, d)
    np.testing.assert_allclose(np.asarray(env.mj_state.qpos), d.qpos, atol=1e-8)
    mujoco.mj_forward(mj, d)

    feet = env.feet_pos('world')
    for i, leg in enumerate(('FL', 'FR', 'RL', 'RR')):
        gid = int(m.feet_geom_id[i])
        np.testing.assert_allclose(feet[leg], d.geom_xpos[gid], atol=1e-9)

    jac = env.feet_jacobians('world')
    jdot = env.feet_jacobians_dot('world')
    for i, leg in enumerate(('FL', 'FR', 'RL', 'RR')):
        jp = np.zeros((3, mj.nv))
        jd = np.zeros((3, mj.nv))
        pt = d.geom_xpos[int(m.feet_geom_id[i])]
        mujoco.mj_jac(mj, d, jp, None, pt, int(m.feet_body_id[i]))
        mujoco.mj_jacDot(mj, d, jd, None, pt, int(m.feet_body_id[i]))
        np.testing.assert_allclose(jac[leg], jp, atol=1e-9)
        np.testing.assert_allclose(jdot[leg], jd, atol=1e-6)

    M = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, M)
    np.testing.assert_allclose(env.get_base_inertia(), M[3:6, 3:6], atol=1e-9)
    Ml = env.legs_mass_matrix
    idx = np.asarray(m.legs_qvel_idx[0])
    np.testing.assert_allclose(Ml.FL, M[np.ix_(idx, idx)], atol=1e-9)
    bias = env.legs_qfrc_bias
    np.testing.assert_allclose(bias.FL, d.qfrc_bias[idx], atol=1e-7)
    np.testing.assert_allclose(env.com, d.subtree_com[0], atol=1e-9)
    assert abs(env.kinetic_energy - 0.5 * d.qvel @ M @ d.qvel) < 1e-7


def test_velocity_command_accessors_and_camera_export(tmp_path):
    """target_base_vel / *_err / base_lin_acc / torque_ctrl_setpoint
    (reference quadruped_env.py:488-541,999) + camera save()."""
    import jax.numpy as jnp

    from gym_quadruped_tpu.env.gym_adapter import QuadrupedGymEnv
    from gym_quadruped_tpu.sensors.rgbd_camera import Camera

    env = QuadrupedGymEnv(robot='aliengo', scene='flat', sim_dt=0.002,
                          base_vel_command_type='forward',
                          ref_base_lin_vel=0.7)
    env.reset(seed=1)
    env.step(np.full(12, 0.5))

    lin_w, ang_w = env.target_base_vel('world')
    # forward command: |v| = 0.7, purely horizontal, heading-aligned
    np.testing.assert_allclose(np.linalg.norm(lin_w), 0.7, atol=1e-6)
    assert abs(lin_w[2]) < 1e-9 and np.allclose(ang_w, 0.0)
    lin_b, _ = env.target_base_vel('base')
    np.testing.assert_allclose(np.linalg.norm(lin_b), 0.7, atol=1e-6)

    np.testing.assert_allclose(env.base_lin_vel_err('world'),
                               lin_w - env.base_lin_vel('world'), atol=1e-9)
    np.testing.assert_allclose(env.base_ang_vel_err('world'),
                               ang_w - env.base_ang_vel('world'), atol=1e-9)
    assert env.base_lin_acc('world').shape == (3,)
    np.testing.assert_allclose(env.torque_ctrl_setpoint, np.full(12, 0.5),
                               atol=1e-9)
    assert env.robot_model is env.core.model
    assert env.qpos.shape == (env.core.model.nq,)
    assert env.qvel.shape == (env.core.model.nv,)

    cam = Camera(env.robot_model, width=16, height=16, cam_name='robotcam')
    out = cam.save(tmp_path, jnp.asarray(env.qpos))
    names = sorted(p.name for p in out.iterdir())
    assert names == ['depth.npy', 'depth.png', 'points.npy', 'seg.npy']
    assert np.load(out / 'depth.npy').shape == (16, 16)


def test_observation_space_limits(env):
    """Per-obs bounds match the reference configure_observation_space
    (quadruped_utils.py:235-325): qpos bounded by joint ranges after the free
    joint, contact_state in [0, 1], qvel unbounded."""
    m = env.core.model
    sp = env.observation_space
    qpos_box = sp['qpos']
    assert np.all(np.isinf(qpos_box.low[:7])) and np.all(np.isinf(qpos_box.high[:7]))
    np.testing.assert_allclose(qpos_box.low[7:], np.asarray(m.jnt_range)[1:, 0],
                               rtol=1e-6)
    np.testing.assert_allclose(qpos_box.high[7:], np.asarray(m.jnt_range)[1:, 1],
                               rtol=1e-6)
    assert np.all(sp['contact_state'].low == 0.0)
    assert np.all(sp['contact_state'].high == 1.0)
    assert np.all(np.isinf(sp['qvel'].low))
