"""Sensor parity vs CPU MuJoCo: IMU ground truth vs <accelerometer>/<gyro>
sensordata, heightmap raycasts vs mj_ray, camera depth vs analytic geometry."""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics import engine
from gym_quadruped_tpu.physics.raycast import raycast, raycast_down
from gym_quadruped_tpu.sensors import IMU, Camera, HeightMap


@pytest.fixture(scope='module')
def go2():
    mj, limits = build_mj_model('go2', 'flat')
    model = extract_model(mj, 'go2', 'flat', limits)
    return mj, model


def test_imu_truth_matches_mujoco_sensordata(go2):
    """IMU ground-truth accel/gyro (before noise) vs MuJoCo's site sensors.

    go2.xml declares <accelerometer site=imu> and <gyro site=imu>; after
    mj_step, sensordata holds the pre-step-state readings — the same convention
    the functional IMU uses (fwd at the pre-step state)."""
    mj, model = go2
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    rng = np.random.RandomState(0)
    d.qpos[7:] += rng.uniform(-0.2, 0.2, mj.nq - 7)
    d.qvel[:] = rng.uniform(-1, 1, mj.nv)
    d.ctrl[:] = rng.uniform(-3, 3, mj.nu)
    qpos0 = jnp.asarray(d.qpos.copy())
    qvel0 = jnp.asarray(d.qvel.copy())
    mujoco.mj_step(mj, d)

    imu = IMU(model, accel_noise=0.0, gyro_noise=0.0, accel_bias_rate=0.0,
              gyro_bias_rate=0.0)
    fwd = engine.forward(model, qpos0, qvel0, jnp.asarray(d.ctrl.copy()))
    ss = imu.init(jax.random.PRNGKey(0), qpos0.dtype)
    ss = imu.step(ss, qpos0, qvel0, fwd)

    acc_id = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SENSOR, 'imu_acc')
    gyro_id = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SENSOR, 'imu_gyro')
    acc_adr = mj.sensor_adr[acc_id]
    gyro_adr = mj.sensor_adr[gyro_id]
    acc_mj = d.sensordata[acc_adr:acc_adr + 3]
    gyro_mj = d.sensordata[gyro_adr:gyro_adr + 3]

    np.testing.assert_allclose(np.asarray(ss.gyro), gyro_mj, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ss.acc), acc_mj, atol=2e-4)


def test_raycast_down_matches_mj_ray(go2):
    """Vertical raycasts against the static world vs mj_ray (heightmap.py:90)."""
    mj, model = go2
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)

    rng = np.random.RandomState(1)
    pts = np.stack([rng.uniform(-2, 2, 20), rng.uniform(-2, 2, 20),
                    np.full(20, 0.53)], axis=1)
    t_ours = np.asarray(raycast_down(model, jnp.asarray(pts)))
    geomgroup = np.array([1, 0, 0, 0, 1, 1], np.uint8)
    for k in range(20):
        gid = np.zeros(1, np.int32)
        t_mj = mujoco.mj_ray(mj, d, pts[k], np.array([0.0, 0, -1]),
                             geomgroup, 1, -1, gid)
        assert abs(t_ours[k] - t_mj) < 1e-6, (k, t_ours[k], t_mj)


def test_raycast_stairs_boxes():
    """Oblique/vertical rays against box terrain vs mj_ray (stairs scene)."""
    mj, limits = build_mj_model('go2', 'stairs')
    model = extract_model(mj, 'go2', 'stairs', limits)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)

    rng = np.random.RandomState(2)
    origins = np.stack([rng.uniform(0.5, 5.0, 15), rng.uniform(-1, 1, 15),
                        np.full(15, 3.0)], axis=1)
    dirs = np.tile(np.array([0.3, 0.1, -1.0]), (15, 1))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t_ours, _ = raycast(model, jnp.asarray(origins), jnp.asarray(dirs))
    t_ours = np.asarray(t_ours)
    geomgroup = np.array([1, 0, 0, 0, 1, 1], np.uint8)
    for k in range(15):
        gid = np.zeros(1, np.int32)
        t_mj = mujoco.mj_ray(mj, d, origins[k], dirs[k], geomgroup, 1, -1, gid)
        assert abs(t_ours[k] - t_mj) < 1e-6, (k, t_ours[k], t_mj)


def test_heightmap_grid_heights(go2):
    """Heightmap sensor: flat ground reads z=0 everywhere; grid is centered on
    the base and yaw-aligned (heightmap.py:106-168 semantics)."""
    _, model = go2
    hm = HeightMap(model, num_rows=5, num_cols=5, dist_x=0.2, dist_y=0.2)
    qpos = jnp.asarray(model.key_qpos[0])
    ss = hm.init(jax.random.PRNGKey(0), qpos.dtype)
    ss = hm.update(ss, qpos)
    pts = np.asarray(ss.points)
    np.testing.assert_allclose(pts[..., 2], 0.0, atol=1e-6)
    # center cell sits under the base
    np.testing.assert_allclose(pts[2, 2, :2], np.asarray(qpos[:2]), atol=1e-6)
    # nearest-cell height lookup (+0.02 offset, heightmap.py:209-220)
    h = hm.get_height(ss, jnp.asarray(model.key_qpos[0][:3]))
    assert abs(float(h) - 0.02) < 1e-6


def test_camera_depth_plane():
    """Depth camera on aliengo's robotcam: rays that hit the floor/robot report
    positive finite depth with valid geom ids."""
    mj, limits = build_mj_model('aliengo', 'flat')
    model = extract_model(mj, 'aliengo', 'flat', limits)
    if model.cam_fovy.shape[0] == 0:
        pytest.skip('aliengo has no camera')
    cam = Camera(model, width=16, height=12, cam_name='robotcam')
    qpos = jnp.asarray(model.key_qpos[0])
    depth, depth_plane, seg, pc = cam.shoot(qpos)
    depth = np.asarray(depth)
    seg = np.asarray(seg)
    assert depth.shape == (12, 16)
    assert np.isfinite(depth).all()
    # rays that hit something report positive depth and a valid geom id
    hit = seg >= 0
    assert hit.any()
    assert (depth[hit] > 0).all()


def test_camera_fps_gating():
    """auto_render honors the fps interval (reference rgbd_camera.py:32-33):
    with interval = 3*dt the depth buffer only refreshes every 3rd step."""
    mj, limits = build_mj_model('aliengo', 'flat')
    model = extract_model(mj, 'aliengo', 'flat', limits)
    if model.cam_fovy.shape[0] == 0:
        pytest.skip('aliengo has no camera')
    dt = model.timestep
    cam = Camera(model, width=8, height=6, cam_name='robotcam',
                 fps=1.0 / (3 * dt), auto_render=True)
    qpos = jnp.asarray(model.key_qpos[0])
    from gym_quadruped_tpu.physics import engine as _engine
    fwd = _engine.forward(model, qpos, jnp.zeros(model.nv, qpos.dtype),
                          jnp.zeros(model.nu, qpos.dtype))
    ss = cam.init(jax.random.PRNGKey(0), qpos.dtype)
    renders = []
    for _ in range(6):
        prev = ss.last_time
        ss = cam.step(ss, qpos, None, fwd)
        renders.append(bool(ss.last_time != prev))
    # first step renders (stale init), then every 3rd
    assert renders == [True, False, False, True, False, False], renders
