"""IMU sensor: site-frame accelerometer + gyroscope with noise and bias drift.

Reproduces the reference IMU (sensors/imu.py:20-254), which wraps the MJCF
<accelerometer>/<gyro> sensordata and adds Gaussian noise plus Brownian bias drift
(imu.py:110-139). Here the ground-truth readings are computed directly from the
engine's Forward (no sensordata array): the accelerometer is the classical linear
acceleration of the IMU site expressed in the site frame with gravity offset
(MuJoCo mj_sensorAcc semantics — reads +9.81 z at rest), the gyro is the body
angular velocity in the site frame.

Noise streams live in the sensor state and are per-env jax PRNG streams — fixing
the reference's acknowledged non-reproducibility (imu.py:21 TODO).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics import dynamics
from gym_quadruped_tpu.sensors.base import Sensor

LIN_ACC_OBS = ('imu_acc', 'imu_acc_noise', 'imu_acc_bias')
GYRO_OBS = ('imu_gyro', 'imu_gyro_noise', 'imu_gyro_bias')


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IMUState:
    rng: Any
    acc: Any         # (3,) last accelerometer measurement
    acc_noise: Any   # (3,)
    acc_bias: Any    # (3,) Brownian bias
    gyro: Any        # (3,)
    gyro_noise: Any  # (3,)
    gyro_bias: Any   # (3,)


class IMU(Sensor):
    """See module docstring. Constructor mirrors reference imu.py:25-48."""

    ALL_OBS = LIN_ACC_OBS + GYRO_OBS

    def __init__(self, model: Model, imu_site_name: str | None = None,
                 accel_name: str = 'imu_acc', gyro_name: str = 'imu_gyro',
                 accel_noise: float = 0.01, gyro_noise: float = 0.01,
                 accel_bias_rate: float = 0.01, gyro_bias_rate: float = 0.01):
        self.model = model
        del accel_name, gyro_name  # readings come from dynamics, not sensordata
        if imu_site_name is not None:
            self.site_id = model.name2id('site', imu_site_name)
        else:
            self.site_id = int(model.imu_site_id)
        if self.site_id < 0:
            raise ValueError('model has no IMU site')
        self.body_id = int(model.site_bodyid[self.site_id])
        self.acc_noise = accel_noise
        self.gyro_noise = gyro_noise
        self.acc_bias_rate = accel_bias_rate
        self.gyro_bias_rate = gyro_bias_rate

    def available_observations(self):
        return IMU.ALL_OBS

    def observation_dim(self, name):
        return 3

    def init(self, rng, dtype):
        z = jnp.zeros(3, dtype)
        nan = jnp.full(3, jnp.nan, dtype)
        return IMUState(rng=rng, acc=nan, acc_noise=z, acc_bias=z,
                        gyro=nan, gyro_noise=z, gyro_bias=z)

    def step(self, ss: IMUState, qpos, qvel, fwd) -> IMUState:
        dtype = qpos.dtype
        m = self.model
        k1, k2, k3, k4, k_next = jax.random.split(ss.rng, 5)

        # ground truth at the site (pre-step state, matching sensordata)
        from gym_quadruped_tpu.physics.kinematics import spatial_origin

        R_site = fwd.kin.site_xmat[self.site_id]      # (3, 3)
        p_site = fwd.kin.site_xpos[self.site_id] - spatial_origin(fwd.kin)
        V = dynamics.body_velocities(m, fwd.kin, qvel, fwd.cdof)[self.body_id]
        A = dynamics.body_accelerations(m, fwd.kin, qvel, fwd.qacc,
                                        fwd.cdof)[self.body_id]
        omega, v0 = V[:3], V[3:]
        alpha, a0 = A[:3], A[3:]
        v_p = v0 + jnp.cross(omega, p_site)
        a_p = a0 + jnp.cross(alpha, p_site) + jnp.cross(omega, v_p)
        acc_true = R_site.T @ a_p
        gyro_true = R_site.T @ omega

        # additive noise + Brownian bias drift (imu.py:110-139; dt=1 as upstream)
        acc_noise = self.acc_noise * jax.random.normal(k1, (3,), dtype)
        acc_bias = ss.acc_bias + self.acc_bias_rate * jax.random.normal(k2, (3,), dtype)
        gyro_noise = self.gyro_noise * jax.random.normal(k3, (3,), dtype)
        gyro_bias = ss.gyro_bias + self.gyro_bias_rate * jax.random.normal(
            k4, (3,), dtype)

        return IMUState(
            rng=k_next,
            acc=acc_true + acc_bias + acc_noise, acc_noise=acc_noise,
            acc_bias=acc_bias,
            gyro=gyro_true + gyro_bias + gyro_noise, gyro_noise=gyro_noise,
            gyro_bias=gyro_bias)

    def get_observation(self, name, ss: IMUState):
        return {'imu_acc': ss.acc, 'imu_acc_noise': ss.acc_noise,
                'imu_acc_bias': ss.acc_bias, 'imu_gyro': ss.gyro,
                'imu_gyro_noise': ss.gyro_noise,
                'imu_gyro_bias': ss.gyro_bias}[name]
