"""Robot registry.

Mirrors the reference registry semantics (reference: gym_quadruped/robot_cfgs.py:7-60):
per-robot MJCF filename, nominal hip height, optional joint-space zero configuration,
foot geom names and per-leg joint names, IMU sensor names.

Robot MJCF assets (XML + meshes) are third-party robot descriptions; they are
discovered at model-build time (see `find_assets_dir`) rather than vendored here.
At runtime the framework consumes precompiled array archives (models/compiled/*.npz),
so neither MuJoCo nor the MJCF files are needed on the TPU host.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import numpy as np

LEG_ORDER = ('FL', 'FR', 'RL', 'RR')  # canonical leg order (reference quadruped_utils.py:54)


@dataclasses.dataclass(frozen=True)
class RobotConfig:
    name: str
    mjcf_filename: str
    hip_height: float
    qpos0_js: tuple | None = None
    feet_geom_names: tuple[str, str, str, str] = ('FL', 'FR', 'RL', 'RR')  # FL FR RL RR
    leg_joints: tuple[tuple[str, ...], ...] | None = None  # per leg, FL FR RL RR
    accel_name: str | None = 'imu_acc'
    gyro_name: str | None = 'imu_gyro'
    imu_site_name: str | None = 'imu'

    def leg_joint_names(self) -> tuple[tuple[str, ...], ...]:
        if self.leg_joints is not None:
            return self.leg_joints
        return tuple(
            tuple(f'{leg}_{part}_joint' for part in ('hip', 'thigh', 'calf'))
            for leg in LEG_ORDER
        )


_REGISTRY: dict[str, RobotConfig] = {}


def _register(cfg: RobotConfig):
    _REGISTRY[cfg.name] = cfg
    return cfg


_register(RobotConfig(
    name='mini_cheetah',
    mjcf_filename='mini_cheetah/mini_cheetah.xml',
    hip_height=0.225,
    qpos0_js=tuple([0, -np.pi / 2, 0] * 2 + [0, np.pi / 2, 0] * 2),
))
_register(RobotConfig(name='go1', mjcf_filename='go1/go1.xml', hip_height=0.3))
_register(RobotConfig(name='go2', mjcf_filename='go2/go2.xml', hip_height=0.28))
_register(RobotConfig(name='aliengo', mjcf_filename='aliengo/aliengo.xml', hip_height=0.35))
_register(RobotConfig(name='b2', mjcf_filename='b2/b2.xml', hip_height=0.485))
_register(RobotConfig(name='hyqreal1', mjcf_filename='hyqreal1/hyqreal1.xml', hip_height=0.498))
_register(RobotConfig(name='hyqreal2', mjcf_filename='hyqreal2/hyqreal2.xml', hip_height=0.498))
_register(RobotConfig(name='spot', mjcf_filename='spot/spot.xml', hip_height=0.46))
_register(RobotConfig(name='pegasus', mjcf_filename='pegasus/pegasus.xml', hip_height=0.5))


def get_robot_config(robot_name: str) -> RobotConfig:
    """Name lookup with the reference's fuzzy-matching semantics (robot_cfgs.py:31-60)."""
    name = robot_name.lower()
    if name in _REGISTRY:
        return _REGISTRY[name]
    for key in ('mini_cheetah', 'hyqreal1', 'hyqreal2', 'spot'):
        if key in name:
            return _REGISTRY[key]
    raise ValueError(f'Unknown robot name: {robot_name}. Available: {sorted(_REGISTRY)}')


def available_robots() -> tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


def find_assets_dir() -> Path | None:
    """Locate a directory containing the robot MJCF assets (robot_model layout).

    Search order: $GYM_QUADRUPED_ASSETS, vendored in-package assets
    (gym_quadruped_tpu/assets/robot_model — populated by
    scripts/vendor_assets.py before building a release wheel), an installed
    `gym_quadruped` package, a reference checkout at /root/reference
    (development convenience).
    Returns None when MJCF assets are unavailable (precompiled archives still work).
    """
    env = os.environ.get('GYM_QUADRUPED_ASSETS')
    if env and Path(env).exists():
        return Path(env)
    vendored = Path(__file__).parent.parent / 'assets' / 'robot_model'
    if vendored.exists():
        return vendored
    try:
        import gym_quadruped  # type: ignore

        cand = Path(gym_quadruped.__file__).parent / 'robot_model'
        if cand.exists():
            return cand
    except ImportError:
        pass
    cand = Path('/root/reference/gym_quadruped/robot_model')
    if cand.exists():
        return cand
    return None
