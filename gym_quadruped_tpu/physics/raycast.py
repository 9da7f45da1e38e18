"""Analytic ray casting (mj_ray replacement), batched over rays.

The reference fires one mj_ray C call per heightmap cell per update
(sensors/heightmap.py:66-104, geomgroup [1,0,0,0,1,1], flg_static=1) and renders
depth through OpenGL (sensors/rgbd_camera.py:39). Here rays are batched: one
vectorized (rays × geoms) intersection program + a min-reduction, jit/vmap-able —
no per-ray host calls, no GL. Used by the heightmap sensor (static world only) and
the depth/segmentation camera (world + robot primitives).

Primitives: plane, box, sphere, capsule, cylinder(as capsule), hfield (vertical
rays exactly via the bilinear surface; oblique rays via fixed-step sphere-tracing
of the height function). Covers every shipped scene + stripped-mesh robots.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_HFIELD,
    GEOM_PLANE,
    GEOM_SPHERE,
    Model,
)
from gym_quadruped_tpu.physics.collision import hfield_height

_BIG = 1e9


# ---------------------------------------------------------------------------------
# per-primitive tests: (geom pose/size, o, d) -> t ≥ 0 or _BIG
# ---------------------------------------------------------------------------------

def ray_plane(gpos, gmat, size, o, d):
    n = gmat[:, 2]
    denom = d @ n
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = -((o - gpos) @ n) / safe
    return jnp.where((t >= 0) & (jnp.abs(denom) > 1e-12), t, _BIG)


def ray_box(gpos, gmat, size, o, d):
    ol = gmat.T @ (o - gpos)
    dl = gmat.T @ d
    dl = jnp.where(jnp.abs(dl) < 1e-12, 1e-12, dl)
    t1 = (-size - ol) / dl
    t2 = (size - ol) / dl
    tmin = jnp.max(jnp.minimum(t1, t2))
    tmax = jnp.min(jnp.maximum(t1, t2))
    hit = tmax >= jnp.maximum(tmin, 0.0)
    t = jnp.where(tmin >= 0, tmin, tmax)
    return jnp.where(hit & (t >= 0), t, _BIG)


def ray_sphere(gpos, gmat, size, o, d):
    r = size[0]
    oc = o - gpos
    b = oc @ d
    c = oc @ oc - r * r
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(-b - sq >= 0, -b - sq, -b + sq)
    return jnp.where((disc >= 0) & (t >= 0), t, _BIG)


def ray_capsule(gpos, gmat, size, o, d):
    """Capsule along local z: infinite-cylinder solve clamped + end caps."""
    r, h = size[0], size[1]
    axis = gmat[:, 2]
    oc = o - gpos
    # cylinder: |(oc + t d) − ((oc + t d)·a)a| = r
    d_perp = d - (d @ axis) * axis
    o_perp = oc - (oc @ axis) * axis
    a = d_perp @ d_perp
    b = o_perp @ d_perp
    c = o_perp @ o_perp - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a < 1e-12, 1e-12, a)
    t_cyl = (-b - sq) / a_safe
    z_hit = (oc + t_cyl * d) @ axis
    cyl_ok = (disc >= 0) & (a >= 1e-12) & (t_cyl >= 0) & (jnp.abs(z_hit) <= h)
    t_cyl = jnp.where(cyl_ok, t_cyl, _BIG)
    t_cap1 = ray_sphere(gpos + axis * h, gmat, size, o, d)
    t_cap2 = ray_sphere(gpos - axis * h, gmat, size, o, d)
    return jnp.minimum(t_cyl, jnp.minimum(t_cap1, t_cap2))


def ray_hfield(m: Model, gpos, gmat, o, d):
    """Heightfield intersection. Vertical rays solve the bilinear surface exactly;
    oblique rays fixed-step march the height function (64 steps + refinement)."""
    dtype = o.dtype
    sz = jnp.asarray(m.hfield_size, dtype)
    local_o = gmat.T @ (o - gpos)
    local_d = gmat.T @ d

    vertical = (jnp.abs(local_d[0]) < 1e-9) & (jnp.abs(local_d[1]) < 1e-9)

    # vertical solution
    h0 = hfield_height(m, local_o[0], local_o[1], dtype)
    inside0 = (jnp.abs(local_o[0]) <= sz[0]) & (jnp.abs(local_o[1]) <= sz[1])
    dz = jnp.where(jnp.abs(local_d[2]) < 1e-12, -1e-12, local_d[2])
    t_vert = (h0 - local_o[2]) / dz
    t_vert = jnp.where(inside0 & (t_vert >= 0), t_vert, _BIG)

    # marching solution: sample along the ray, find first below-surface
    # sample. The sample window is the ray's overlap with the hfield's AABB
    # (x/y half-sizes, z in [-base, max_height]) rather than the full field
    # diameter: camera rays from a standing robot overlap the AABB for a few
    # meters, so 64 samples give ~cm strides instead of ~0.5 m (which could
    # step over a whole bump silently; bound pinned by
    # tests/test_raycast_oracle.py against mj_ray)
    T = 64
    lo_box = jnp.stack([-sz[0], -sz[1], -sz[3]])
    hi_box = jnp.stack([sz[0], sz[1], sz[2]])
    dl_safe = jnp.where(jnp.abs(local_d) < 1e-12, 1e-12, local_d)
    tb1 = (lo_box - local_o) / dl_safe
    tb2 = (hi_box - local_o) / dl_safe
    t_enter = jnp.maximum(jnp.max(jnp.minimum(tb1, tb2)), 0.0)
    t_exit = jnp.min(jnp.maximum(tb1, tb2))
    overlaps = t_exit > t_enter
    span = jnp.where(overlaps, t_exit - t_enter, 0.0)
    ts = t_enter + jnp.linspace(0.0, 1.0, T).astype(dtype) * span
    pts = local_o[None, :] + ts[:, None] * local_d[None, :]
    hs = jax.vmap(lambda p: hfield_height(m, p[0], p[1], dtype))(pts)
    inside = (jnp.abs(pts[:, 0]) <= sz[0]) & (jnp.abs(pts[:, 1]) <= sz[1])
    below = inside & (pts[:, 2] <= hs)
    idx = jnp.argmax(below)
    any_hit = jnp.any(below)
    t_lo = ts[jnp.maximum(idx - 1, 0)]
    t_hi = ts[idx]

    def refine(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        p = local_o + mid * local_d
        under = p[2] <= hfield_height(m, p[0], p[1], dtype)
        return jnp.where(under, lo, mid), jnp.where(under, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 12, refine, (t_lo, t_hi))
    t_march = jnp.where(any_hit, 0.5 * (lo + hi), _BIG)

    return jnp.where(vertical, t_vert, t_march)


_PRIM = {
    GEOM_PLANE: ray_plane,
    GEOM_BOX: ray_box,
    GEOM_SPHERE: ray_sphere,
    GEOM_CAPSULE: ray_capsule,
    GEOM_CYLINDER: ray_capsule,  # endpoint approximation (matches collision.py)
}


# ---------------------------------------------------------------------------------
# scene casting
# ---------------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _world_geoms_cached(key) -> tuple:
    m: Model = _MODEL_CACHE[key]
    return tuple(g for g in range(m.ngeom)
                 if int(m.geom_bodyid[g]) == 0 and
                 int(m.geom_type[g]) in (GEOM_PLANE, GEOM_HFIELD, GEOM_BOX))


@functools.lru_cache(maxsize=64)
def _robot_geoms_cached(key) -> tuple:
    m: Model = _MODEL_CACHE[key]
    return tuple(g for g in range(m.ngeom)
                 if int(m.geom_bodyid[g]) != 0 and int(m.geom_type[g]) in _PRIM)


_MODEL_CACHE: dict = {}


def world_geoms(m: Model) -> tuple:
    _MODEL_CACHE[id(m)] = m
    return _world_geoms_cached(id(m))


def robot_geoms(m: Model) -> tuple:
    _MODEL_CACHE[id(m)] = m
    return _robot_geoms_cached(id(m))


def _quat_mat_np(q) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def raycast(m: Model, origins: jnp.ndarray, dirs: jnp.ndarray,
            kin=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cast (N, 3) rays; returns (t (N,), geom_id (N,) int32). Miss → t = -1,
    geom_id = -1. Static world geoms always participate; robot geoms participate
    when `kin` (FK result posing them) is given."""
    dtype = origins.dtype
    N = origins.shape[0]
    t_all, id_all = [jnp.full((N,), _BIG, dtype)], [jnp.full((N,), -1, jnp.int32)]

    def cast_geom(g, gpos, gmat):
        typ = int(m.geom_type[g])
        if typ == GEOM_HFIELD:
            fn = lambda o, d: ray_hfield(m, gpos, gmat, o, d)
        else:
            size = jnp.asarray(m.geom_size[g], dtype)
            prim = _PRIM[typ]
            fn = lambda o, d: prim(gpos, gmat, size, o, d)
        return jax.vmap(fn)(origins, dirs)

    for g in world_geoms(m):
        gpos = jnp.asarray(m.geom_pos[g], dtype)
        gmat = jnp.asarray(_quat_mat_np(m.geom_quat[g]), dtype)
        t = cast_geom(g, gpos, gmat)
        t_all.append(t)
        id_all.append(jnp.full((N,), g, jnp.int32))
    if kin is not None:
        for g in robot_geoms(m):
            t = cast_geom(g, kin.geom_xpos[g], kin.geom_xmat[g])
            t_all.append(t)
            id_all.append(jnp.full((N,), g, jnp.int32))

    T = jnp.stack(t_all)        # (G+1, N)
    I = jnp.stack(id_all)
    best = jnp.argmin(T, axis=0)
    t = jnp.take_along_axis(T, best[None], axis=0)[0]
    gid = jnp.take_along_axis(I, best[None], axis=0)[0]
    miss = t >= _BIG
    return jnp.where(miss, -1.0, t), jnp.where(miss, -1, gid)


def raycast_down(m: Model, origins: jnp.ndarray) -> jnp.ndarray:
    """(N,) distances for straight-down rays (static world only); -1 on miss."""
    d = jnp.broadcast_to(jnp.asarray(np.array([0.0, 0.0, -1.0]), origins.dtype),
                         origins.shape)
    t, _ = raycast(m, origins, d, kin=None)
    return t
