"""IMU + heightmap + depth camera on aliengo, fully on-device.

Port of the reference examples/aliengo_with_{imu,heightmap,camera}.py rolled into
one: all three sensors implement the uniform Sensor protocol here (the reference
drives HeightMap/Camera by hand — SURVEY.md §8.6), and everything batches.

Run: python examples/aliengo_with_sensors.py
"""

import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:  # examples run without the package installed
    _sys.path.insert(0, _repo)

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.env import QuadrupedEnv
from gym_quadruped_tpu.sensors import IMU, HeightMap, Camera

env = QuadrupedEnv(
    'aliengo',
    state_obs_names=('qpos', 'qvel', 'imu_acc', 'imu_gyro', 'imu_acc_bias',
                     'height_map_z'),
    scene='perlin',
    sensors=(IMU, HeightMap),
    sensors_kwargs=({'accel_noise': 0.01, 'gyro_noise': 0.01},
                    {'num_rows': 10, 'num_cols': 10,
                     'dist_x': 0.1, 'dist_y': 0.1}),
)

state, obs = jax.jit(lambda k: env.reset(k))(jax.random.PRNGKey(0))
step = jax.jit(env.step)
for i in range(20):
    tau = jnp.zeros(env.model.nu)
    state, obs, reward, term, trunc, info = step(state, tau)

print('imu_acc      ', np.asarray(obs['imu_acc']).round(3))
print('imu_gyro     ', np.asarray(obs['imu_gyro']).round(3))
print('height_map_z ', np.asarray(obs['height_map_z']).reshape(10, 10)[::3, ::3])

# depth camera, manually driven (aliengo ships a 'robotcam' camera)
cam = Camera(env.model, width=64, height=48, cam_name='robotcam')
depth, depth_plane, seg, cloud = jax.jit(cam.shoot)(state.qpos)
print('depth image  ', np.asarray(depth).shape,
      'range [%.2f, %.2f]' % (float(depth.min()), float(depth.max())))
print('seg ids      ', np.unique(np.asarray(seg))[:10])
