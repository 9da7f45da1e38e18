"""Depth / segmentation / point-cloud camera via the TPU analytic ray tracer.

Reproduces the reference Camera (sensors/rgbd_camera.py:12-334) with the *intended*
semantics (its frame_config assigns a Rotation object into a matrix and its
constructor swaps model/data names — SURVEY.md §8.2):

  * intrinsic_mat: pinhole K from fovy (rgbd_camera.py:117-145, same formula)
  * depth: per-pixel rays against analytic geoms (world + robot primitives) in one
    batched raycast — replaces the mujoco.Renderer OpenGL offscreen path (:39,184)
  * plane depth and euclidean depth both available (:184-196's conversion intent)
  * seg_image: geom id of the nearest hit per pixel (:197-206)
  * point_cloud: K⁻¹ back-projection in camera coordinates (:230-273)

RGB mesh rendering is host-side replay tooling by design (utils/replay.py renders
recorded trajectories in CPU MuJoCo) — matching the reference's offline usage
pattern (SURVEY.md §7.6). The reference's fps gating (interval/last_sim_time,
:32-33) is honored by step() when auto_render=True; manual render() calls are
un-gated by design (caller picks the cadence).

MuJoCo camera convention: looks along −z, +y up in the image.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics.kinematics import Kin, fk
from gym_quadruped_tpu.physics.raycast import raycast
from gym_quadruped_tpu.sensors.base import Sensor
from gym_quadruped_tpu.utils.maths import quat_to_mat


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraState:
    depth: Any      # (H, W) euclidean depth of the last render
    seg: Any        # (H, W) int32 geom ids
    last_time: Any  # () time of the last render
    time: Any       # () current sim time (advanced every step)


class Camera(Sensor):
    """See module docstring. Constructor mirrors reference rgbd_camera.py:15-55."""

    def __init__(self, model: Model, width: int = 64, height: int = 64,
                 fps: float = 30.0, cam_name: str = '', auto_render: bool = False):
        self.model = model
        self._width = width
        self._height = height
        self.interval = float(1.0 / fps)
        self.auto_render = auto_render
        self._cam_id = model.name2id('camera', cam_name) if cam_name else 0
        if model.cam_fovy.shape[0] == 0:
            raise ValueError(f'model {model.robot} has no cameras')
        self._body_id = int(model.cam_bodyid[self._cam_id])

    # ------------------------------------------------------------- geometry

    @property
    def width(self):
        return self._width

    @property
    def height(self):
        return self._height

    @property
    def fov(self) -> float:
        return float(self.model.cam_fovy[self._cam_id])

    @property
    def id(self) -> int:
        return self._cam_id

    @property
    def intrinsic_mat(self) -> np.ndarray:
        theta = np.deg2rad(self.fov)
        f_x = (self._width / 2) / np.tan(theta / 2)
        f_y = (self._height / 2) / np.tan(theta / 2)
        u_0 = (self._width - 1) / 2.0
        v_0 = (self._height - 1) / 2.0
        return np.array([[f_x, 0, u_0], [0, f_y, v_0], [0, 0, 1]])

    def frame_config(self, kin: Kin):
        """Camera pose (R, p) in world coordinates (intended semantics of
        rgbd_camera.py:146-161)."""
        m = self.model
        b = self._body_id
        Rb = quat_to_mat(kin.xquat[b])
        p = kin.xpos[b] + Rb @ jnp.asarray(m.cam_pos[self._cam_id], kin.xpos.dtype)
        R = Rb @ jnp.asarray(_quat_mat_np(m.cam_quat[self._cam_id]), kin.xpos.dtype)
        return R, p

    def _pixel_dirs(self, dtype) -> np.ndarray:
        """(H*W, 3) unit ray directions in the camera frame (−z forward, +y up)."""
        K = self.intrinsic_mat
        v, u = np.meshgrid(np.arange(self._height), np.arange(self._width),
                           indexing='ij')
        x = (u - K[0, 2]) / K[0, 0]
        y = -(v - K[1, 2]) / K[1, 1]
        d = np.stack([x, y, -np.ones_like(x)], axis=-1).reshape(-1, 3)
        return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float64)

    # -------------------------------------------------------------- render

    def render(self, kin: Kin):
        """(depth_euclid (H,W), depth_plane (H,W), seg (H,W) int32,
        point_cloud (H*W, 3) camera coords). Pure; jit/vmap-able."""
        dtype = kin.xpos.dtype
        R, p = self.frame_config(kin)
        dirs_cam = jnp.asarray(self._pixel_dirs(dtype), dtype)
        dirs = dirs_cam @ R.T                     # world-frame ray directions
        origins = jnp.broadcast_to(p, dirs.shape)
        t, gid = raycast(self.model, origins, dirs, kin=kin)
        miss = t < 0
        t = jnp.where(miss, 0.0, t)
        depth_e = t.reshape(self._height, self._width)
        # plane depth: distance along the camera's −z axis
        depth_p = (t * (-dirs_cam[:, 2])).reshape(self._height, self._width)
        seg = jnp.where(miss, -1, gid).reshape(self._height, self._width)
        pc = dirs_cam * t[:, None]                # camera-frame points
        return depth_e, depth_p, seg, pc

    def depth_image(self, kin: Kin):
        return self.render(kin)[0]

    def seg_image(self, kin: Kin):
        return self.render(kin)[2]

    def point_cloud(self, kin: Kin):
        return self.render(kin)[3]

    def shoot(self, qpos):
        """Convenience: FK + render from a bare qpos (manual driving)."""
        return self.render(fk(self.model, qpos))

    # ----------------------------------------------- host-side RGB + export

    def image(self, qpos) -> np.ndarray:
        """RGB render (reference rgbd_camera.py:176). Depth/seg/point-cloud are
        the on-device ray-cast path above; full-visual RGB goes through a
        host-side CPU-MuJoCo offscreen renderer mirroring the device state
        (display-only, same design as QuadrupedGymEnv.render). Requires a GL
        backend (EGL/OSMesa) — raises RuntimeError with guidance if absent."""
        import mujoco

        from gym_quadruped_tpu.models.builder import build_display_mj_model

        if not hasattr(self, '_vis'):
            mj, _ = build_display_mj_model(self.model.robot, self.model.scene,
                                           float(self.model.timestep))
            try:
                renderer = mujoco.Renderer(mj, height=self._height,
                                           width=self._width)
            except Exception as e:  # headless box without EGL/OSMesa
                raise RuntimeError(
                    'RGB rendering needs an OpenGL backend; set MUJOCO_GL=egl '
                    'or MUJOCO_GL=osmesa (depth/seg/point_cloud do not — they '
                    f'ray-cast on device). Underlying error: {e}') from e
            self._vis = (mj, mujoco.MjData(mj), renderer)
        mj, d, renderer = self._vis
        d.qpos[:] = np.asarray(qpos)
        mujoco.mj_forward(mj, d)
        renderer.update_scene(d, camera=self.model.cam_names[self._cam_id])
        return renderer.render()

    def save(self, out_dir, qpos, rgb: bool = False):
        """Dump depth (.npy + .png), seg (.npy), point cloud (.npy) and
        optionally RGB (.png) to a timestamped directory (reference
        rgbd_camera.py:290)."""
        import time as _time
        from pathlib import Path

        from PIL import Image

        out = Path(out_dir) / _time.strftime('%Y%m%d_%H%M%S')
        out.mkdir(parents=True, exist_ok=True)
        depth_e, _, seg, pc = (np.asarray(x) for x in self.shoot(qpos))
        np.save(out / 'depth.npy', depth_e)
        np.save(out / 'seg.npy', seg)
        np.save(out / 'points.npy', pc)
        lo, hi = float(depth_e.min()), float(depth_e.max())
        norm = (depth_e - lo) / (hi - lo) if hi > lo else depth_e * 0
        Image.fromarray((255 * (1 - norm)).astype(np.uint8)).save(
            out / 'depth.png')
        if rgb:
            Image.fromarray(self.image(qpos)).save(out / 'rgb.png')
        return out

    # ------------------------------------------------------ sensor protocol

    def available_observations(self):
        return ('depth_image', 'seg_image')

    def observation_dim(self, name):
        return self._height * self._width

    def init(self, rng, dtype):
        z = jnp.zeros((self._height, self._width), dtype)
        return CameraState(depth=z, seg=jnp.zeros_like(z, dtype=jnp.int32),
                           last_time=jnp.asarray(-1e9, dtype),
                           time=jnp.zeros((), dtype))

    def step(self, ss: CameraState, qpos, qvel, fwd) -> CameraState:
        """fps-gated auto render (reference rgbd_camera.py:32-33 semantics:
        re-render only when sim time has advanced past 1/fps since the last
        render). Under a plain jit the skipped branch costs nothing; under vmap
        XLA executes both cond branches, so for large batches prefer driving
        render() manually at the camera cadence."""
        if not self.auto_render:
            return ss
        t = ss.time + jnp.asarray(self.model.timestep, ss.time.dtype)
        due = (t - ss.last_time) >= self.interval - 1e-9

        def do_render(_):
            depth, _p, seg, _pc = self.render(fwd.kin)
            return CameraState(depth=depth, seg=seg, last_time=t, time=t)

        def skip(_):
            return CameraState(depth=ss.depth, seg=ss.seg,
                               last_time=ss.last_time, time=t)

        return jax.lax.cond(due, do_render, skip, None)

    def get_observation(self, name, ss: CameraState):
        if name == 'depth_image':
            return ss.depth.reshape(-1)
        return ss.seg.reshape(-1).astype(ss.depth.dtype)


def _quat_mat_np(q) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
