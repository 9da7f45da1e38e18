"""HeightMap sensor: robot-centric elevation grid via batched analytic raycasts.

Reproduces the reference HeightMap (sensors/heightmap.py:17-220): a rows×cols grid
of points in the yaw-aligned ("horizontal") frame centered above the robot, each
cell ray-cast straight down against static world geometry from z + 0.6. The
reference fires one mj_ray C call per cell per update (:150-168); here the whole
grid is one batched raycast_down — and unlike the reference's standalone class, this
one implements the uniform Sensor protocol (SURVEY.md §8.6) while remaining
manually drivable via `grid_points` + `physics.raycast.raycast_down`.

Observables:
  height_map        (rows*cols*3,) world-frame hit points, row-major like the
                    reference's sensor_data_matrix (rows × cols × 1 × 3)
  height_map_z      (rows*cols,) hit heights only
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics.raycast import raycast_down
from gym_quadruped_tpu.sensors.base import Sensor
from gym_quadruped_tpu.utils.maths import quat_to_euler_xyz


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HeightMapState:
    points: Any  # (rows, cols, 3) world hit points


class HeightMap(Sensor):
    """See module docstring. Constructor mirrors reference heightmap.py:20-46."""

    def __init__(self, model: Model, num_rows: int = 10, num_cols: int = 10,
                 dist_x: float = 0.1, dist_y: float = 0.1):
        self.model = model
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.dist_x = dist_x
        self.dist_y = dist_y
        # grid offsets in the horizontal frame (reference create_sensor_matrix
        # centering rules for even/odd sizes, heightmap.py:115-127)
        r, c = num_rows, num_cols
        c_rows = r / 2.0 if r % 2 == 0 else (r - 1) / 2.0
        off_r = -dist_x / 2.0 if r % 2 == 0 else 0.0
        c_cols = c / 2.0 if c % 2 == 0 else (c - 1) / 2.0
        off_c = -dist_y / 2.0 if c % 2 == 0 else 0.0
        i = np.arange(r)[:, None]
        j = np.arange(c)[None, :]
        self._offsets = np.stack(
            [np.broadcast_to(dist_x * (c_rows - i) + off_r, (r, c)),
             np.broadcast_to(dist_y * (c_cols - j) + off_c, (r, c))],
            axis=-1)  # (rows, cols, 2)

    def available_observations(self):
        return ('height_map', 'height_map_z')

    def observation_dim(self, name):
        n = self.num_rows * self.num_cols
        return n * 3 if name == 'height_map' else n

    def init(self, rng, dtype):
        return HeightMapState(
            points=jnp.zeros((self.num_rows, self.num_cols, 3), dtype))

    def grid_points(self, qpos) -> jnp.ndarray:
        """(rows, cols, 3) ray origins for the current base pose
        (center z + 0.6 − 0.07 start offset: heightmap.py:79,111,161)."""
        dtype = qpos.dtype
        yaw = quat_to_euler_xyz(qpos[3:7])[2]
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        # reference builds R_W2H row-major [cos, sin; -sin, cos] then applies R.T
        RT = jnp.stack([jnp.stack([cy, -sy]), jnp.stack([sy, cy])])
        off = jnp.einsum('ij,rcj->rci', RT, jnp.asarray(self._offsets, dtype))
        center = qpos[0:3]
        x = center[0] + off[..., 0]
        y = center[1] + off[..., 1]
        z = jnp.full_like(x, center[2] + 0.6 - 0.07)
        return jnp.stack([x, y, z], axis=-1)

    def update(self, ss: HeightMapState, qpos) -> HeightMapState:
        origins = self.grid_points(qpos)
        flat = origins.reshape(-1, 3)
        t = raycast_down(self.model, flat)
        hits = flat + t[:, None] * jnp.asarray(
            np.array([0.0, 0.0, -1.0]), qpos.dtype)
        # stale-cell fallback on miss (heightmap.py:165-167)
        hits = jnp.where((t < 0)[:, None], ss.points.reshape(-1, 3), hits)
        return HeightMapState(points=hits.reshape(origins.shape))

    def step(self, ss: HeightMapState, qpos, qvel, fwd) -> HeightMapState:
        return self.update(ss, qpos)

    def get_observation(self, name, ss: HeightMapState):
        if name == 'height_map':
            return ss.points.reshape(-1)
        return ss.points[..., 2].reshape(-1)

    def get_height(self, ss: HeightMapState, target) -> jnp.ndarray:
        """Nearest-cell height lookup + 0.02 offset (heightmap.py:209-220)."""
        pts = ss.points.reshape(-1, 3)
        d2 = jnp.sum((pts[:, :2] - target[:2]) ** 2, axis=1)
        return pts[jnp.argmin(d2), 2] + 0.02
