"""Frozen physics model: compile-time constants for the TPU engine.

Design stance: the Model is NOT a pytree. It is a static bundle of numpy arrays that
jitted physics functions close over, so every model parameter becomes an XLA-compiled
constant (folded into the program; zero per-step HBM traffic for model data). Per-env
randomized quantities (ground friction, disturbances, commands) live in EnvState
instead, so they stay traced.

The arrays mirror mjModel's naming (reference physics engine is the external MuJoCo C
library — see SURVEY.md §0/L0). All float masters are stored float64; under jit they
are materialized at the ambient precision (f32 on TPU, f64 in x64 parity tests).
"""

from __future__ import annotations

import dataclasses
import io
import json
from pathlib import Path

import numpy as np

# mjtJoint
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3
# mjtGeom (subset)
GEOM_PLANE, GEOM_HFIELD, GEOM_SPHERE, GEOM_CAPSULE, GEOM_ELLIPSOID, GEOM_CYLINDER, GEOM_BOX, GEOM_MESH = (
    0, 1, 2, 3, 4, 5, 6, 7)
# mjtCone
CONE_PYRAMIDAL, CONE_ELLIPTIC = 0, 1


@dataclasses.dataclass(frozen=True)
class Model:
    """Static model arrays (numpy). See builder.py for construction."""

    # --- metadata -------------------------------------------------------------
    robot: str
    scene: str
    hip_height: float
    terrain_limits: tuple  # (x_max, x_min, y_max, y_min)

    # --- sizes ----------------------------------------------------------------
    nq: int
    nv: int
    nu: int
    nbody: int
    njnt: int
    ngeom: int
    nsite: int

    # --- options --------------------------------------------------------------
    timestep: float
    gravity: np.ndarray          # (3,)
    cone: int                    # 0 pyramidal, 1 elliptic
    impratio: float

    # --- bodies ---------------------------------------------------------------
    body_parentid: np.ndarray    # (nbody,) int
    body_jntadr: np.ndarray      # (nbody,) int
    body_jntnum: np.ndarray      # (nbody,) int
    body_dofadr: np.ndarray      # (nbody,) int
    body_dofnum: np.ndarray      # (nbody,) int
    body_geomadr: np.ndarray     # (nbody,) int
    body_geomnum: np.ndarray     # (nbody,) int
    body_pos: np.ndarray         # (nbody, 3)
    body_quat: np.ndarray        # (nbody, 4)
    body_ipos: np.ndarray        # (nbody, 3)
    body_iquat: np.ndarray       # (nbody, 4)
    body_mass: np.ndarray        # (nbody,)
    body_inertia: np.ndarray     # (nbody, 3)
    body_invweight0: np.ndarray  # (nbody, 2)

    # --- joints ---------------------------------------------------------------
    jnt_type: np.ndarray         # (njnt,) int
    jnt_qposadr: np.ndarray      # (njnt,) int
    jnt_dofadr: np.ndarray       # (njnt,) int
    jnt_bodyid: np.ndarray       # (njnt,) int
    jnt_limited: np.ndarray      # (njnt,) bool
    jnt_pos: np.ndarray          # (njnt, 3)
    jnt_axis: np.ndarray         # (njnt, 3)
    jnt_range: np.ndarray        # (njnt, 2)
    jnt_stiffness: np.ndarray    # (njnt,)
    jnt_solref: np.ndarray       # (njnt, 2)
    jnt_solimp: np.ndarray       # (njnt, 5)
    jnt_margin: np.ndarray       # (njnt,)

    # --- dofs -----------------------------------------------------------------
    dof_bodyid: np.ndarray       # (nv,) int
    dof_jntid: np.ndarray        # (nv,) int
    dof_parentid: np.ndarray     # (nv,) int (-1 root)
    dof_armature: np.ndarray     # (nv,)
    dof_damping: np.ndarray      # (nv,)
    dof_frictionloss: np.ndarray # (nv,)
    dof_invweight0: np.ndarray   # (nv,)
    dof_solref: np.ndarray       # (nv, 2)
    dof_solimp: np.ndarray       # (nv, 5)

    # --- geoms ------------------------------------------------------------------
    geom_type: np.ndarray        # (ngeom,) int
    geom_bodyid: np.ndarray      # (ngeom,) int
    geom_contype: np.ndarray     # (ngeom,) int
    geom_conaffinity: np.ndarray # (ngeom,) int
    geom_condim: np.ndarray      # (ngeom,) int
    geom_priority: np.ndarray    # (ngeom,) int
    geom_pos: np.ndarray         # (ngeom, 3)
    geom_quat: np.ndarray        # (ngeom, 4)
    geom_size: np.ndarray        # (ngeom, 3)
    geom_friction: np.ndarray    # (ngeom, 3)
    geom_solmix: np.ndarray      # (ngeom,)
    geom_solref: np.ndarray      # (ngeom, 2)
    geom_solimp: np.ndarray      # (ngeom, 5)
    geom_margin: np.ndarray      # (ngeom,)
    geom_gap: np.ndarray         # (ngeom,)

    # --- sites ------------------------------------------------------------------
    site_bodyid: np.ndarray      # (nsite,) int
    site_pos: np.ndarray         # (nsite, 3)
    site_quat: np.ndarray        # (nsite, 4)

    # --- cameras ------------------------------------------------------------------
    cam_bodyid: np.ndarray       # (ncam,) int
    cam_pos: np.ndarray          # (ncam, 3)
    cam_quat: np.ndarray         # (ncam, 4)
    cam_fovy: np.ndarray         # (ncam,)

    # --- actuators ----------------------------------------------------------------
    actuator_trnid: np.ndarray      # (nu,) joint id
    actuator_gear: np.ndarray       # (nu,) gear[0]
    actuator_ctrlrange: np.ndarray  # (nu, 2)
    actuator_ctrllimited: np.ndarray  # (nu,) bool
    actuator_forcerange: np.ndarray   # (nu, 2)
    actuator_forcelimited: np.ndarray  # (nu,) bool

    # --- reference pose / keyframes -------------------------------------------
    qpos0: np.ndarray            # (nq,)
    qpos_spring: np.ndarray      # (nq,)
    key_qpos: np.ndarray         # (nkey, nq)
    key_qvel: np.ndarray         # (nkey, nv)
    key_ctrl: np.ndarray         # (nkey, nu)

    # --- heightfield (optional; zero-size when absent) --------------------------
    hfield_size: np.ndarray      # (4,) x_half, y_half, z_top, z_bottom
    hfield_nrow: int
    hfield_ncol: int
    hfield_data: np.ndarray      # (nrow, ncol) in [0, 1]

    # --- name tables (static metadata) ------------------------------------------
    body_names: tuple
    jnt_names: tuple
    geom_names: tuple
    site_names: tuple
    cam_names: tuple

    # --- quadruped conveniences (FL, FR, RL, RR order) ---------------------------
    feet_geom_id: np.ndarray     # (4,) int
    feet_body_id: np.ndarray     # (4,) int
    legs_qpos_idx: np.ndarray    # (4, 3) int
    legs_qvel_idx: np.ndarray    # (4, 3) int
    legs_tau_idx: np.ndarray     # (4, 3) int
    hip_body_id: np.ndarray      # (4,) int
    imu_site_id: int             # -1 when absent

    # --- precomputed collision candidate pairs (robot geom × world geom) ---------
    # columns: geom_world, geom_robot (world geoms are on body 0)
    contact_pairs: np.ndarray    # (npair, 2) int

    # --- convex hulls of collidable mesh geoms (optional; zero-size when absent) -
    # Hull vertices live in the geom frame (MuJoCo bakes the mesh principal
    # rotation into geom_quat at compile: world = R_geom @ vert + geom_xpos).
    # mesh_nbr holds each hull vertex's neighbor list in the mesh_graph's
    # adjacency ORDER (-1 padded) — mjc_PlaneConvex walks it in that order and
    # the manifold is order-dependent (decoded in scripts/probe_plane_mesh*.py).
    geom_dataid: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32))   # (ngeom,) -1 if not mesh
    geom_rbound: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0))             # (ngeom,)
    mesh_vert: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 0, 3)))     # (nmesh, Vmax, 3)
    mesh_vertnum: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32))   # (nmesh,)
    mesh_nbr: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 0, 0), np.int32))  # (nmesh, Vmax, D)

    # --------------------------------------------------------------------------
    def name2id(self, kind: str, name: str) -> int:
        table = {'body': self.body_names, 'joint': self.jnt_names,
                 'geom': self.geom_names, 'site': self.site_names,
                 'camera': self.cam_names}[kind]
        return table.index(name)

    @property
    def base_body_id(self) -> int:
        """The floating-base body (child of world holding the free joint)."""
        return int(self.jnt_bodyid[np.where(self.jnt_type == FREE)[0][0]])

    def save(self, path: str | Path):
        """Serialize to a standalone .npz archive (runtime needs no MJCF/MuJoCo)."""
        arrays, meta = {}, {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray):
                arrays[f.name] = v
            else:
                meta[f.name] = v
        buf = io.BytesIO()
        np.savez_compressed(buf, __meta__=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8), **arrays)
        Path(path).write_bytes(buf.getvalue())

    @classmethod
    def load(cls, path: str | Path) -> 'Model':
        with np.load(Path(path), allow_pickle=False) as z:
            meta = json.loads(bytes(z['__meta__'].tobytes()).decode())
            kwargs = dict(meta)
            for f in dataclasses.fields(cls):
                if f.name in z.files and f.name != '__meta__':
                    kwargs[f.name] = z[f.name]
            for k in ('terrain_limits', 'body_names', 'jnt_names', 'geom_names',
                      'site_names', 'cam_names'):
                kwargs[k] = tuple(kwargs[k])
        return cls(**kwargs)
