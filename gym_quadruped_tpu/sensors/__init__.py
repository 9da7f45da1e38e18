"""Sensor plug-ins (IMU, heightmap, RGB-D camera) on the functional protocol."""

from gym_quadruped_tpu.sensors.base import Sensor
from gym_quadruped_tpu.sensors.heightmap import HeightMap, HeightMapState
from gym_quadruped_tpu.sensors.imu import IMU, IMUState
from gym_quadruped_tpu.sensors.rgbd_camera import Camera, CameraState

__all__ = ['Sensor', 'IMU', 'IMUState', 'HeightMap', 'HeightMapState',
           'Camera', 'CameraState']
