"""Offline model compiler: robot MJCF + synthesized scene → frozen Model arrays.

MuJoCo's CPU bindings are used here *only at model-build time* as an MJCF compiler
(mirroring how the reference composes scenes: quadruped_env.py:149-183). The resulting
Model is a pure-array artifact; the TPU runtime never touches MuJoCo. Precompiled
archives under models/compiled/ let `load_model` work without MJCF assets installed.
"""

from __future__ import annotations

import functools
import tempfile
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np

from gym_quadruped_tpu.models import scenes as _scenes
from gym_quadruped_tpu.models.model import GEOM_MESH, Model
from gym_quadruped_tpu.models.robots import LEG_ORDER, get_robot_config

COMPILED_DIR = Path(__file__).parent / 'compiled'


def _patch_robot_xml(robot_xml: Path, out_dir: Path) -> Path:
    """Produce a physics-equivalent robot MJCF with mesh geoms stripped.

    Every shipped robot declares explicit <inertial> blocks, so mesh geoms carry no
    mass properties — visual meshes are physics-irrelevant. Robots whose reference
    models collide THROUGH meshes (hyqreal1, mini_cheetah) are never stripped
    (build_mj_model's auto mode keeps their full models and the engine collides
    their convex hulls); stripping applies to robots whose collidable geoms are all
    primitives. It also sidesteps missing .obj assets in some checkouts (e.g. go2
    base_4.obj) and makes compiles ~100x faster (no convex-hull computation).

    Remaining relative asset references (none, after stripping) would break when the
    file moves, so the patched file keeps the original's directory via meshdir.
    """
    tree = ET.parse(robot_xml)
    root = tree.getroot()

    for parent in root.iter():
        for geom in list(parent.findall('geom')):
            if geom.get('mesh') is not None or geom.get('type') == 'mesh':
                parent.remove(geom)
    asset = root.find('asset')
    if asset is not None:
        for mesh in list(asset.findall('mesh')):
            asset.remove(mesh)
        for tex in list(asset.findall('texture')):
            f = tex.get('file')
            if f and not (robot_xml.parent / f).exists():
                asset.remove(tex)

    out_path = out_dir / robot_xml.name
    tree.write(out_path)
    return out_path


def compose_scene_xml(robot: str, scene: str = 'flat', seed: int = 10,
                      out_dir: str | None = None,
                      hfield: np.ndarray | None = None,
                      strip_meshes: bool = True) -> tuple[str, tuple]:
    """Write the merged scene+robot MJCF and return (path, terrain_limits).

    Mirrors the reference's scene assembly (quadruped_env.py:149-168): generate the
    terrain document, insert an <include> of the robot MJCF, write to disk.
    strip_meshes=False keeps the robot's mesh geoms (display models, and the
    physics models of mesh-colliding robots — see build_mj_model).
    """
    from gym_quadruped_tpu.models.robots import find_assets_dir

    cfg = get_robot_config(robot)
    assets = find_assets_dir()
    if assets is None:
        raise FileNotFoundError(
            'Robot MJCF assets not found. Set $GYM_QUADRUPED_ASSETS or install '
            'gym-quadruped; alternatively use a precompiled model via load_model().')
    robot_xml = (assets / cfg.mjcf_filename).resolve()
    if not robot_xml.exists():
        raise FileNotFoundError(f'Robot model file not found: {robot_xml}')

    if scene == 'perlin':
        # hfield data is assigned post-compile; declare an empty asset here.
        tree, limits = _scenes.generate_scene('flat', cfg.hip_height, seed)
        tree, limits = _attach_hfield_asset(tree, cfg.hip_height)
    elif scene not in _scenes.STATIC_SCENES + _scenes.PROCEDURAL_SCENES:
        # per-robot extra scenes shipped under robot_model/<robot>/scene_*.xml
        # (aliengo rough/stairs, mini_cheetah slope/suspend_stairs, hyqreal1
        # rough) — unreachable in the reference (quadruped_env.py:153 only
        # resolves robot_model/scene_<name>.xml), reachable here by name
        robot_scene = robot_xml.parent / f'scene_{scene}.xml'
        if not robot_scene.exists():
            raise ValueError(
                f'Invalid scene {scene!r} for {robot}: not a built-in scene '
                f'({_scenes.STATIC_SCENES + _scenes.PROCEDURAL_SCENES}) and '
                f'{robot_scene} does not exist')
        tree, limits = _scenes.make_from_reference_xml(robot_scene)
    else:
        tree, limits = _scenes.generate_scene(scene, cfg.hip_height, seed)

    out_dir = Path(out_dir or tempfile.mkdtemp(prefix='gqtpu_scene_'))
    if strip_meshes:
        include_xml = _patch_robot_xml(robot_xml, out_dir)
    else:
        # display model: include the ORIGINAL robot MJCF (absolute path, like
        # the reference — quadruped_env.py:163-166) so its meshdir resolves
        include_xml = robot_xml

    root = tree.getroot()
    include = ET.Element('include')
    include.attrib['file'] = str(include_xml)
    root.insert(0, include)

    out_path = Path(out_dir) / f'{cfg.name}-{scene}.xml'
    tree.write(out_path)
    return str(out_path), limits


def _attach_hfield_asset(tree, hip_height: float, nrow: int = 128, ncol: int = 128):
    """Declare a size-only hfield (data assigned after compile) per terrain.py:90-102."""
    root = tree.getroot()
    asset = root.find('asset')
    size = (hip_height * 100, hip_height * 100)
    max_height, min_height = 2 * hip_height, 0.005
    ET.SubElement(asset, 'hfield', {
        'name': 'perlin_hfield', 'nrow': str(nrow), 'ncol': str(ncol),
        'size': f'{size[0] / 2.0} {size[1] / 2.0} {max_height} {min_height}',
    })
    wb = root.find('worldbody')
    ET.SubElement(wb, 'geom', {'type': 'hfield', 'hfield': 'perlin_hfield',
                               'pos': '0 0 0', 'quat': '1 0 0 0'})
    radius = 0.8 * (size[0] / 2.0)
    limits = (radius, -radius, radius, -radius)
    return tree, limits


@functools.lru_cache(maxsize=16)
def _has_collidable_meshes(robot: str) -> bool:
    """True when the robot's FULL model compiles AND has collidable mesh geoms.

    hyqreal1 (9 of 13 collidable geoms) and mini_cheetah (11 of 15) collide
    mostly through meshes in the reference (robot_model/hyqreal1/hyqreal1.xml,
    robot_model/mini_cheetah/mini_cheetah.xml); their physics models must keep
    them. Robots whose collidable geoms are all primitives — or whose mesh
    assets are incomplete in this checkout (go2/go1/b2/spot .obj missing) —
    keep the fast stripped build.
    """
    import mujoco

    try:
        xml_path, _ = compose_scene_xml(robot, 'flat', strip_meshes=False)
        m = mujoco.MjModel.from_xml_path(xml_path)
    except Exception:
        return False
    return any(
        int(m.geom_type[g]) == GEOM_MESH
        and (m.geom_contype[g] or m.geom_conaffinity[g])
        for g in range(m.ngeom))


def build_mj_model(robot: str, scene: str = 'flat', sim_dt: float = 0.002,
                   seed: int = 10, hfield: np.ndarray | None = None,
                   strip_meshes: bool | None = None):
    """Compile with MuJoCo and apply the reference's post-compile mutations.

    Returns (mjModel, terrain_limits). Used by build_model and by parity tests
    (both sides must see the *same* compiled model). strip_meshes=None (auto)
    keeps meshes for robots whose reference models collide through them
    (hyqreal1, mini_cheetah) and strips them otherwise.
    """
    import mujoco

    if strip_meshes is None:
        strip_meshes = not _has_collidable_meshes(robot)
    cfg = get_robot_config(robot)
    xml_path, limits = compose_scene_xml(robot, scene, seed,
                                         strip_meshes=strip_meshes)
    m = mujoco.MjModel.from_xml_path(xml_path)
    if cfg.qpos0_js is not None:  # reference quadruped_env.py:171-173
        m.qpos0[7:] = np.array(cfg.qpos0_js)
    m.opt.timestep = sim_dt
    if scene == 'perlin':
        if hfield is None:
            from gym_quadruped_tpu.terrain.perlin import reference_perlin_hfield
            hfield = reference_perlin_hfield()
        m.hfield_data[:] = hfield.ravel()
    return m, limits


@functools.lru_cache(maxsize=32)
def _build_model_cached(robot: str, scene: str, sim_dt: float, seed: int) -> Model:
    m, limits = build_mj_model(robot, scene, sim_dt, seed, None)
    return extract_model(m, robot, scene, limits)


def build_model(robot: str, scene: str = 'flat', sim_dt: float = 0.002,
                seed: int = 10, hfield: np.ndarray | None = None) -> Model:
    """Compile robot+scene into a frozen Model (cached: Models are immutable)."""
    if hfield is not None:
        m, limits = build_mj_model(robot, scene, sim_dt, seed, hfield)
        return extract_model(m, robot, scene, limits)
    return _build_model_cached(robot, scene, sim_dt, seed)


def build_display_mj_model(robot: str, scene: str = 'flat',
                           sim_dt: float = 0.002, seed: int = 10):
    """Full-visual mjModel for host-side rendering (viewer / Camera.image):
    the reference viewer and offscreen RGB show robot meshes
    (quadruped_env.py:408-486, rgbd_camera.py:39), so the display model keeps
    them. Falls back to the stripped physics model when mesh assets are
    incomplete in this checkout (e.g. a missing .obj)."""
    try:
        return build_mj_model(robot, scene, sim_dt, seed, strip_meshes=False)
    except Exception:  # missing mesh assets — render collision primitives
        return build_mj_model(robot, scene, sim_dt, seed)


def load_model(robot: str, scene: str = 'flat', sim_dt: float = 0.002) -> Model:
    """Load a precompiled Model archive; fall back to building from MJCF."""
    path = COMPILED_DIR / f'{robot}-{scene}.npz'
    if path.exists():
        model = Model.load(path)
        if model.timestep != sim_dt:
            model = type(model)(**{**model.__dict__, 'timestep': sim_dt})
        return model
    return build_model(robot, scene, sim_dt)


def _reachable_pairs(m, candidates, n_samples: int = 4000,
                     safety: float = 0.05, seed: int = 0):
    """Self-collision pairs whose bounding spheres can come within `safety`
    over sampled joint configurations (build-time static broadphase).

    Joint positions are sampled uniformly over the joint ranges (full ±π for
    unlimited hinges) with the free joint pinned — self-distances are
    base-pose invariant. Conservative in two ways: geom bounding radii
    (geom_rbound) instead of exact shapes, plus the 5 cm safety margin."""
    import mujoco

    d = mujoco.MjData(m)
    rng = np.random.RandomState(seed)
    g1 = np.array([c[0] for c in candidates])
    g2 = np.array([c[1] for c in candidates])
    rsum = m.geom_rbound[g1] + m.geom_rbound[g2] + safety
    min_gap = np.full(len(candidates), np.inf)

    lo = m.jnt_range[:, 0].copy()
    hi = m.jnt_range[:, 1].copy()
    unlimited = ~m.jnt_limited.astype(bool)
    lo[unlimited] = -np.pi
    hi[unlimited] = np.pi
    for _ in range(n_samples):
        d.qpos[:] = m.qpos0
        for j in range(m.njnt):
            if m.jnt_type[j] == 3:  # hinge
                d.qpos[m.jnt_qposadr[j]] = rng.uniform(lo[j], hi[j])
        mujoco.mj_kinematics(m, d)
        gap = np.linalg.norm(d.geom_xpos[g1] - d.geom_xpos[g2], axis=1) - rsum
        np.minimum(min_gap, gap, out=min_gap)
    keep = [c for c, gp in zip(candidates, min_gap) if gp < 0]
    return keep


def extract_model(m, robot: str, scene: str, terrain_limits) -> Model:
    """Copy every field the engine needs out of a compiled mjModel."""
    import mujoco

    cfg = get_robot_config(robot)

    def names(kind, n):
        return tuple(
            mujoco.mj_id2name(m, kind, i) or '' for i in range(n))

    body_names = names(mujoco.mjtObj.mjOBJ_BODY, m.nbody)
    jnt_names = names(mujoco.mjtObj.mjOBJ_JOINT, m.njnt)
    geom_names = names(mujoco.mjtObj.mjOBJ_GEOM, m.ngeom)
    site_names = names(mujoco.mjtObj.mjOBJ_SITE, m.nsite)
    cam_names = names(mujoco.mjtObj.mjOBJ_CAMERA, m.ncam)

    # Per-leg index tables (reference quadruped_env.py:189-204 via extract_mj_joint_info)
    legs_qpos, legs_qvel, legs_tau = [], [], []
    for li, leg in enumerate(LEG_ORDER):
        qpos_idx, qvel_idx, tau_idx = [], [], []
        for jname in cfg.leg_joint_names()[li]:
            jid = jnt_names.index(jname)
            qpos_idx.append(int(m.jnt_qposadr[jid]))
            qvel_idx.append(int(m.jnt_dofadr[jid]))
            # actuator acting on this joint
            act = [a for a in range(m.nu)
                   if m.actuator_trntype[a] == mujoco.mjtTrn.mjTRN_JOINT
                   and m.actuator_trnid[a, 0] == jid]
            tau_idx.append(int(act[0]) if act else -1)
        legs_qpos.append(qpos_idx)
        legs_qvel.append(qvel_idx)
        legs_tau.append(tau_idx)

    feet_geom_id = np.array([geom_names.index(g) for g in cfg.feet_geom_names], np.int32)
    feet_body_id = m.geom_bodyid[feet_geom_id].astype(np.int32)
    hip_body_id = np.array(
        [body_names.index(f'{leg}_hip') if f'{leg}_hip' in body_names else -1
         for leg in LEG_ORDER], np.int32)
    imu_site_id = site_names.index(cfg.imu_site_name) if (
        cfg.imu_site_name in site_names) else -1

    # Static candidate contact pairs — including collidable MESH geoms (the
    # narrow phase dispatches per type pair; contact_layout skips any pair
    # type without a collider, e.g. hfield-mesh, with a build-time note).
    # (a) world geoms × robot geoms (stored world-first), MuJoCo's
    #     contype/conaffinity compatibility test.
    pairs = []
    for gw in range(m.ngeom):
        if m.geom_bodyid[gw] != 0:
            continue
        for gr in range(m.ngeom):
            if m.geom_bodyid[gr] == 0:
                continue
            compat = (m.geom_contype[gw] & m.geom_conaffinity[gr]) or \
                     (m.geom_contype[gr] & m.geom_conaffinity[gw])
            if compat:
                pairs.append((gw, gr))
    # (b) robot-robot (self-collision) pairs, MuJoCo's mj_collision filter:
    #     skip same body and parent-child bodies (filterparent default),
    #     contype/conaffinity mask. Stored with geom_type[g1] <= geom_type[g2]
    #     so the narrow phase dispatches on a canonical type order.
    #     Statically unreachable pairs are pruned (shapes must stay static, so
    #     MuJoCo's dynamic broadphase becomes a build-time reachability test):
    #     sample joint configurations over the joint ranges and drop pairs
    #     whose bounding spheres never come within 5 cm across all samples.
    self_candidates = []
    for ga in range(m.ngeom):
        ba = int(m.geom_bodyid[ga])
        if ba == 0:
            continue
        for gb in range(ga + 1, m.ngeom):
            bb = int(m.geom_bodyid[gb])
            if bb == 0 or ba == bb:
                continue
            if int(m.body_parentid[ba]) == bb or int(m.body_parentid[bb]) == ba:
                continue
            compat = (m.geom_contype[ga] & m.geom_conaffinity[gb]) or \
                     (m.geom_contype[gb] & m.geom_conaffinity[ga])
            if not compat:
                continue
            if int(m.geom_type[ga]) <= int(m.geom_type[gb]):
                self_candidates.append((ga, gb))
            else:
                self_candidates.append((gb, ga))
    if self_candidates:
        reachable = _reachable_pairs(m, self_candidates)
        pairs.extend(reachable)
    contact_pairs = np.array(pairs, np.int32).reshape(-1, 2)

    # Convex-hull data for collidable mesh geoms (plane-mesh collider;
    # mjc_PlaneConvex decode in scripts/probe_plane_mesh*.py). Hull vertices
    # and the mesh_graph adjacency lists, padded to (nmesh, Vmax, *).
    used_meshes = sorted({int(m.geom_dataid[g]) for g in range(m.ngeom)
                          if m.geom_type[g] == GEOM_MESH
                          and (m.geom_contype[g] or m.geom_conaffinity[g])})
    mesh_id_map = {mid: k for k, mid in enumerate(used_meshes)}
    hulls = []
    for mid in used_meshes:
        adr = int(m.mesh_graphadr[mid])
        if adr < 0:
            raise ValueError(f'mesh {mid} has no convex-hull graph')
        graph = m.mesh_graph[adr:]
        numvert = int(graph[0])
        vert_edgeadr = graph[2:2 + numvert]
        vert_globalid = graph[2 + numvert:2 + 2 * numvert]
        edge_localid = graph[2 + 2 * numvert:]
        vadr = int(m.mesh_vertadr[mid])
        verts = np.asarray(m.mesh_vert[vadr + vert_globalid], np.float64)
        nbrs = []
        for i in range(numvert):
            adj = []
            j = int(vert_edgeadr[i])
            while edge_localid[j] >= 0:
                adj.append(int(edge_localid[j]))
                j += 1
            nbrs.append(adj)
        hulls.append((verts, nbrs))
    if hulls:
        vmax = max(len(v) for v, _ in hulls)
        dmax = max((len(a) for _, ns in hulls for a in ns), default=1)
        mesh_vert = np.zeros((len(hulls), vmax, 3))
        mesh_vertnum = np.zeros(len(hulls), np.int32)
        mesh_nbr = np.full((len(hulls), vmax, dmax), -1, np.int32)
        for k, (verts, nbrs) in enumerate(hulls):
            mesh_vert[k, :len(verts)] = verts
            mesh_vertnum[k] = len(verts)
            for i, adj in enumerate(nbrs):
                mesh_nbr[k, i, :len(adj)] = adj
    else:
        mesh_vert = np.zeros((0, 0, 3))
        mesh_vertnum = np.zeros(0, np.int32)
        mesh_nbr = np.zeros((0, 0, 0), np.int32)
    # geom_dataid remapped into the compact hull table (-1 = no hull)
    geom_dataid = np.full(m.ngeom, -1, np.int32)
    for g in range(m.ngeom):
        if m.geom_type[g] == GEOM_MESH:
            geom_dataid[g] = mesh_id_map.get(int(m.geom_dataid[g]), -1)

    nkey = max(m.nkey, 0)
    if m.nhfield > 0:
        hf_size = m.hfield_size[0].copy()
        hf_nrow, hf_ncol = int(m.hfield_nrow[0]), int(m.hfield_ncol[0])
        hf_data = m.hfield_data.reshape(hf_nrow, hf_ncol).copy()
    else:
        hf_size = np.zeros(4)
        hf_nrow = hf_ncol = 0
        hf_data = np.zeros((0, 0))

    return Model(
        robot=robot, scene=scene, hip_height=float(cfg.hip_height),
        terrain_limits=tuple(float(x) for x in terrain_limits),
        nq=int(m.nq), nv=int(m.nv), nu=int(m.nu), nbody=int(m.nbody),
        njnt=int(m.njnt), ngeom=int(m.ngeom), nsite=int(m.nsite),
        timestep=float(m.opt.timestep), gravity=m.opt.gravity.copy(),
        cone=int(m.opt.cone), impratio=float(m.opt.impratio),
        body_parentid=m.body_parentid.astype(np.int32),
        body_jntadr=m.body_jntadr.astype(np.int32),
        body_jntnum=m.body_jntnum.astype(np.int32),
        body_dofadr=m.body_dofadr.astype(np.int32),
        body_dofnum=m.body_dofnum.astype(np.int32),
        body_geomadr=m.body_geomadr.astype(np.int32),
        body_geomnum=m.body_geomnum.astype(np.int32),
        body_pos=m.body_pos.copy(), body_quat=m.body_quat.copy(),
        body_ipos=m.body_ipos.copy(), body_iquat=m.body_iquat.copy(),
        body_mass=m.body_mass.copy(), body_inertia=m.body_inertia.copy(),
        body_invweight0=m.body_invweight0.copy(),
        jnt_type=m.jnt_type.astype(np.int32),
        jnt_qposadr=m.jnt_qposadr.astype(np.int32),
        jnt_dofadr=m.jnt_dofadr.astype(np.int32),
        jnt_bodyid=m.jnt_bodyid.astype(np.int32),
        jnt_limited=m.jnt_limited.astype(bool),
        jnt_pos=m.jnt_pos.copy(), jnt_axis=m.jnt_axis.copy(),
        jnt_range=m.jnt_range.copy(), jnt_stiffness=m.jnt_stiffness.copy(),
        jnt_solref=m.jnt_solref.copy(), jnt_solimp=m.jnt_solimp.copy(),
        jnt_margin=m.jnt_margin.copy(),
        dof_bodyid=m.dof_bodyid.astype(np.int32),
        dof_jntid=m.dof_jntid.astype(np.int32),
        dof_parentid=m.dof_parentid.astype(np.int32),
        dof_armature=m.dof_armature.copy(), dof_damping=m.dof_damping.copy(),
        dof_frictionloss=m.dof_frictionloss.copy(),
        dof_invweight0=m.dof_invweight0.copy(),
        dof_solref=m.dof_solref.copy(), dof_solimp=m.dof_solimp.copy(),
        geom_type=m.geom_type.astype(np.int32),
        geom_bodyid=m.geom_bodyid.astype(np.int32),
        geom_contype=m.geom_contype.astype(np.int32),
        geom_conaffinity=m.geom_conaffinity.astype(np.int32),
        geom_condim=m.geom_condim.astype(np.int32),
        geom_priority=m.geom_priority.astype(np.int32),
        geom_pos=m.geom_pos.copy(), geom_quat=m.geom_quat.copy(),
        geom_size=m.geom_size.copy(), geom_friction=m.geom_friction.copy(),
        geom_solmix=m.geom_solmix.copy(), geom_solref=m.geom_solref.copy(),
        geom_solimp=m.geom_solimp.copy(), geom_margin=m.geom_margin.copy(),
        geom_gap=m.geom_gap.copy(),
        site_bodyid=m.site_bodyid.astype(np.int32),
        site_pos=m.site_pos.copy(), site_quat=m.site_quat.copy(),
        cam_bodyid=m.cam_bodyid.astype(np.int32),
        cam_pos=m.cam_pos.copy(), cam_quat=m.cam_quat.copy(),
        cam_fovy=m.cam_fovy.copy(),
        actuator_trnid=m.actuator_trnid[:, 0].astype(np.int32),
        actuator_gear=m.actuator_gear[:, 0].copy(),
        actuator_ctrlrange=m.actuator_ctrlrange.copy(),
        actuator_ctrllimited=m.actuator_ctrllimited.astype(bool),
        actuator_forcerange=m.actuator_forcerange.copy(),
        actuator_forcelimited=m.actuator_forcelimited.astype(bool),
        qpos0=m.qpos0.copy(), qpos_spring=m.qpos_spring.copy(),
        key_qpos=m.key_qpos.reshape(nkey, m.nq).copy(),
        key_qvel=m.key_qvel.reshape(nkey, m.nv).copy(),
        key_ctrl=m.key_ctrl.reshape(nkey, m.nu).copy(),
        hfield_size=hf_size, hfield_nrow=hf_nrow, hfield_ncol=hf_ncol,
        hfield_data=hf_data,
        body_names=body_names, jnt_names=jnt_names,
        geom_names=geom_names, site_names=site_names, cam_names=cam_names,
        feet_geom_id=feet_geom_id, feet_body_id=feet_body_id,
        legs_qpos_idx=np.array(legs_qpos, np.int32),
        legs_qvel_idx=np.array(legs_qvel, np.int32),
        legs_tau_idx=np.array(legs_tau, np.int32),
        hip_body_id=hip_body_id, imu_site_id=int(imu_site_id),
        contact_pairs=contact_pairs,
        geom_dataid=geom_dataid, geom_rbound=m.geom_rbound.copy(),
        mesh_vert=mesh_vert, mesh_vertnum=mesh_vertnum, mesh_nbr=mesh_nbr,
    )
