"""Narrow-phase collision: robot primitives vs world geoms, fixed contact slots.

Replaces MuJoCo's mj_collision stage. The candidate pair list is static
(Model.contact_pairs, computed at build time from contype/conaffinity — SURVEY.md §7
hard part (b)): every pair owns a fixed number of contact slots, each always computed
and masked by `dist < margin`, so shapes are static under jit/vmap.

Conventions match MuJoCo: contact normal points from geom1 (world) to geom2 (robot);
`dist` is the signed surface separation (negative = penetration); `pos` is the
midpoint; `frame` rows are (normal, tangent1, tangent2) with MuJoCo's mju_makeNormal
tangent construction (pyramidal-cone parity requires the exact tangent basis).

Supported pairs: {sphere, capsule} × {plane, box, hfield} and box×plane,
cylinder×plane (endpoint approximation) — covers the ground contacts of all shipped
robots after mesh stripping (feet are spheres: go2.xml:113, mini_cheetah.xml:78).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gym_quadruped_tpu.models.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_HFIELD,
    GEOM_PLANE,
    GEOM_SPHERE,
    Model,
)


# ---------------------------------------------------------------------------------
# static contact layout
# ---------------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PairSpec:
    """Static description of one candidate pair's contact slots + combined params."""

    geom1: int           # world geom
    geom2: int           # robot geom
    ncon: int            # number of contact slots
    condim: int
    friction: tuple      # length 5: (t, t, torsion, roll, roll)
    solref: tuple        # (2,)
    solimp: tuple        # (5,)
    margin: float
    gap: float


def _combine_params(m: Model, g1: int, g2: int) -> tuple:
    """MuJoCo's contact parameter combination (priority / solmix / max rules)."""
    p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
    margin = max(float(m.geom_margin[g1]), float(m.geom_margin[g2]))
    gap = max(float(m.geom_gap[g1]), float(m.geom_gap[g2]))
    if p1 != p2:
        g = g1 if p1 > p2 else g2
        condim = int(m.geom_condim[g])
        fri3 = m.geom_friction[g]
        solref = m.geom_solref[g]
        solimp = m.geom_solimp[g]
    else:
        condim = int(max(m.geom_condim[g1], m.geom_condim[g2]))
        fri3 = np.maximum(m.geom_friction[g1], m.geom_friction[g2])
        s1, s2 = float(m.geom_solmix[g1]), float(m.geom_solmix[g2])
        if s1 > 0 and s2 > 0:
            mix = s1 / (s1 + s2)
        elif s1 == 0 and s2 == 0:
            mix = 0.5
        else:
            mix = 1.0 if s1 > 0 else 0.0
        r1, r2 = m.geom_solref[g1], m.geom_solref[g2]
        if r1[0] > 0 and r2[0] > 0:
            solref = mix * r1 + (1 - mix) * r2
        else:
            solref = np.minimum(r1, r2)
        solimp = mix * m.geom_solimp[g1] + (1 - mix) * m.geom_solimp[g2]
    friction = (float(fri3[0]), float(fri3[0]), float(fri3[1]),
                float(fri3[2]), float(fri3[2]))
    return condim, friction, tuple(float(x) for x in solref), \
        tuple(float(x) for x in solimp), margin, gap


_NCON_TABLE = {
    (GEOM_PLANE, GEOM_SPHERE): 1,
    (GEOM_PLANE, GEOM_CAPSULE): 2,
    (GEOM_PLANE, GEOM_BOX): 4,
    (GEOM_PLANE, GEOM_CYLINDER): 3,
    (GEOM_BOX, GEOM_SPHERE): 1,
    (GEOM_BOX, GEOM_CAPSULE): 2,
    (GEOM_HFIELD, GEOM_SPHERE): 8,
    (GEOM_HFIELD, GEOM_CAPSULE): 16,
}


@functools.lru_cache(maxsize=64)
def _layout_cached(key) -> tuple:
    m: Model = _MODEL_CACHE[key]
    specs = []
    for g1, g2 in np.asarray(m.contact_pairs):
        t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
        ncon = _NCON_TABLE.get((t1, t2))
        if ncon is None:
            continue  # unsupported pair (logged at build; none for shipped robots)
        condim, friction, solref, solimp, margin, gap = _combine_params(m, g1, g2)
        specs.append(PairSpec(int(g1), int(g2), ncon, condim, friction,
                              solref, solimp, margin, gap))
    # group pairs by type so the narrow phase runs ≤ one vectorized primitive
    # per (t1, t2) type instead of one op-chain per pair (stable within groups)
    specs.sort(key=lambda s: (int(m.geom_type[s.geom1]),
                              int(m.geom_type[s.geom2])))
    return tuple(specs)


_MODEL_CACHE: dict = {}


def contact_layout(m: Model) -> tuple:
    key = id(m)
    _MODEL_CACHE[key] = m
    return _layout_cached(key)


def total_contact_slots(m: Model) -> int:
    return sum(s.ncon for s in contact_layout(m))


# ---------------------------------------------------------------------------------
# primitive tests — each returns (dist (k,), pos (k,3), normal (3,) or (k,3))
# ---------------------------------------------------------------------------------

def _plane_sphere(ppos, pmat, center, radius):
    n = pmat[:, 2]
    d = jnp.dot(n, center - ppos) - radius
    pos = center - n * (radius + 0.5 * d)
    return d[None], pos[None], jnp.broadcast_to(n, (1, 3))


def _plane_capsule(ppos, pmat, cpos, cmat, radius, halflen):
    n = pmat[:, 2]
    axis = cmat[:, 2]
    e1 = cpos + axis * halflen
    e2 = cpos - axis * halflen
    d1 = jnp.dot(n, e1 - ppos) - radius
    d2 = jnp.dot(n, e2 - ppos) - radius
    p1 = e1 - n * (radius + 0.5 * d1)
    p2 = e2 - n * (radius + 0.5 * d2)
    return jnp.stack([d1, d2]), jnp.stack([p1, p2]), jnp.broadcast_to(n, (2, 3))


_BOX_CORNER_SIGNS = np.array(
    [[-1, -1, -1], [1, -1, -1], [-1, 1, -1], [1, 1, -1],
     [-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1]], np.float64)


def _plane_box(ppos, pmat, bpos, bmat, size):
    """4 deepest corners of the box vs the plane (MuJoCo keeps ≤4 corner contacts).

    All 8 corner depths are evaluated and the 4 deepest selected with top_k
    (8 elements — negligible on the VPU). An earlier analytic shortcut (deepest
    corner + its 3 single-axis flips) was wrong for near-flat boxes, where the
    true 4th-deepest corner is a double-axis flip: a box resting flat on the
    plane would get 3 bottom corners + 1 top corner, i.e. unphysical 3-point
    support."""
    n = pmat[:, 2]
    d_axis = bmat.T @ n * size          # (3,) per-axis depth contribution
    center_d = jnp.dot(n, bpos - ppos)
    signs = jnp.asarray(_BOX_CORNER_SIGNS, n.dtype)       # (8, 3)
    depths = center_d + signs @ d_axis                    # (8,)
    corners = bpos[None, :] + (signs * size[None, :]) @ bmat.T  # (8, 3)
    neg_top, idx = jax.lax.top_k(-depths, 4)
    d4 = -neg_top
    pos = corners[idx] - 0.5 * d4[:, None] * n[None, :]
    return d4, pos, jnp.broadcast_to(n, (4, 3))


def _plane_cylinder(ppos, pmat, cpos, cmat, radius, halflen):
    """3 support points on each rim edge nearest the plane (approximation of
    MuJoCo's plane-cylinder: exact when resting flat or on rim edge)."""
    n = pmat[:, 2]
    axis = cmat[:, 2]
    # rim direction: component of -n orthogonal to axis
    proj = -n + axis * jnp.dot(axis, n)
    norm = jnp.linalg.norm(proj)
    safe = jnp.where(norm > 1e-10, proj / jnp.maximum(norm, 1e-10), pmat[:, 0])
    ds, ps = [], []
    for s in (1.0, -1.0):
        e = cpos + axis * (halflen * s)
        rim = e + safe * radius
        d = jnp.dot(n, rim - ppos)
        ds.append(d)
        ps.append(rim - 0.5 * d * n)
    # center point for flat resting
    dc = jnp.dot(n, cpos - ppos) - jnp.abs(jnp.dot(n, axis)) * halflen - \
        jnp.linalg.norm(proj) * 0.0
    ds.append(dc)
    ps.append(cpos - 0.5 * dc * n)
    return jnp.stack(ds), jnp.stack(ps), jnp.broadcast_to(n, (3, 3))


def _box_sphere(bpos, bmat, size, center, radius):
    """Sphere vs box: closest-point; handles center-inside-box."""
    local = bmat.T @ (center - bpos)
    clamped = jnp.clip(local, -size, size)
    delta = local - clamped
    dist_out = jnp.linalg.norm(delta)
    inside = dist_out < 1e-12
    # inside: push out along the axis of least penetration
    depth = size - jnp.abs(local)
    ax = jnp.argmin(depth)
    sign = jnp.where(local[ax] >= 0, 1.0, -1.0)
    n_in = jnp.zeros(3, local.dtype).at[ax].set(sign)
    surf_in = local.at[ax].set(sign * size[ax])
    n_out = delta / jnp.maximum(dist_out, 1e-12)
    n_local = jnp.where(inside, n_in, n_out)
    surface_local = jnp.where(inside, surf_in, clamped)
    d = jnp.where(inside, -(depth[ax] + radius), dist_out - radius)
    n = bmat @ n_local
    surface = bmat @ surface_local + bpos
    pos = surface + 0.5 * d * n
    return d[None], pos[None], n[None]


def _box_capsule(bpos, bmat, size, cpos, cmat, radius, halflen):
    """Capsule vs box via two endpoint spheres (covers feet/calf-on-step cases)."""
    axis = cmat[:, 2]
    outs = [_box_sphere(bpos, bmat, size, cpos + axis * (s * halflen), radius)
            for s in (1.0, -1.0)]
    d = jnp.concatenate([o[0] for o in outs])
    p = jnp.concatenate([o[1] for o in outs])
    n = jnp.concatenate([o[2] for o in outs])
    return d, p, n


def hfield_height(m: Model, x, y, dtype):
    """Bilinear surface height of the heightfield at world (x, y)."""
    sz = jnp.asarray(m.hfield_size, dtype)
    nr, nc = m.hfield_nrow, m.hfield_ncol
    data = jnp.asarray(m.hfield_data, dtype)  # (nrow, ncol) in [0,1]
    # grid coords: x in [-sx, sx] → col in [0, ncol-1]; y → row
    fx = (x / sz[0] + 1.0) * 0.5 * (nc - 1)
    fy = (y / sz[1] + 1.0) * 0.5 * (nr - 1)
    fx = jnp.clip(fx, 0.0, nc - 1.001)
    fy = jnp.clip(fy, 0.0, nr - 1.001)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx, ty = fx - x0, fy - y0
    h00 = data[y0, x0]
    h01 = data[y0, x0 + 1]
    h10 = data[y0 + 1, x0]
    h11 = data[y0 + 1, x0 + 1]
    h = (h00 * (1 - tx) * (1 - ty) + h01 * tx * (1 - ty) +
         h10 * (1 - tx) * ty + h11 * tx * ty)
    return h * sz[2]  # elevation above hfield base


def _closest_point_triangle(p, a, b, c):
    """Closest point on triangle (a, b, c) to point p (Ericson RTCD §5.1.5),
    branch-free with jnp.where selections."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.dot(ab, ap)
    d2 = jnp.dot(ac, ap)
    bp = p - b
    d3 = jnp.dot(ab, bp)
    d4 = jnp.dot(ac, bp)
    cp = p - c
    d5 = jnp.dot(ab, cp)
    d6 = jnp.dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom_in = jnp.maximum(va + vb + vc, 1e-30)
    v_in = vb / denom_in
    w_in = vc / denom_in
    q_face = a + ab * v_in + ac * w_in

    v_ab = jnp.clip(d1 / jnp.where(d1 - d3 == 0, 1.0, d1 - d3), 0.0, 1.0)
    q_ab = a + v_ab * ab
    w_ac = jnp.clip(d2 / jnp.where(d2 - d6 == 0, 1.0, d2 - d6), 0.0, 1.0)
    q_ac = a + w_ac * ac
    t_bc = jnp.clip((d4 - d3) / jnp.where((d4 - d3) + (d5 - d6) == 0, 1.0,
                                          (d4 - d3) + (d5 - d6)), 0.0, 1.0)
    q_bc = b + t_bc * (c - b)

    # region tests, applied in Ericson's order via nested where (later branches
    # only apply when earlier conditions fail)
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    q = q_face
    q = jnp.where(on_bc, q_bc, q)
    q = jnp.where(on_ac, q_ac, q)
    q = jnp.where(on_ab, q_ab, q)
    q = jnp.where(in_c, c, q)
    q = jnp.where(in_b, b, q)
    q = jnp.where(in_a, a, q)
    in_face = ~(in_a | in_b | in_c | on_ab | on_ac | on_bc)
    return q, in_face


def _sphere_triangle(center, radius, a, b, c):
    """(dist, pos, n) of a sphere against one triangle, MuJoCo conventions:
    n points from the triangle toward the sphere.

    Sign rule (matches the prism solid the triangle caps): when the closest
    point lies in the FACE region the distance is signed by the (upward)
    triangle normal — a center below the face is inside the prism and reports
    penetration; when the closest point is an edge/vertex the distance is
    unsigned — a center below the plane but outside the footprint is NOT
    inside this prism (verified against MuJoCo: an off-footprint sphere under
    a neighboring cell's plane must not collide)."""
    q, in_face = _closest_point_triangle(center, a, b, c)
    n_tri = jnp.cross(b - a, c - a)
    n_tri = n_tri / jnp.maximum(jnp.linalg.norm(n_tri), 1e-30)
    dvec = center - q
    dlen = jnp.linalg.norm(dvec)
    side = jnp.sign(jnp.dot(dvec, n_tri))
    side = jnp.where((side == 0) | ~in_face, 1.0, side)
    n = jnp.where(dlen > 1e-12, side * dvec / jnp.maximum(dlen, 1e-12), n_tri)
    dist = side * dlen - radius
    pos = center - n * (radius + 0.5 * dist)
    return dist, pos, n


def _hfield_sphere(m: Model, hpos, hmat, center, radius, margin=0.0):
    """Sphere vs heightfield: exact sphere-vs-triangle contacts against the
    2×2 cell neighborhood under the center (8 slots = 4 cells × 2 triangles).

    MuJoCo splits each cell into two triangular prisms along the main diagonal
    (c, r) → (c+1, r+1) and collides the sphere with EVERY overlapped prism
    separately, so the contact multiplicity varies with position — 1 mid-face,
    2 on a cell diagonal, up to 6 on a grid vertex (probed empirically; the
    multiplicity changes the effective contact stiffness and is parity-
    relevant). The 2×2 neighborhood chosen from the sphere's AABB reproduces
    that exactly while r ≤ half a cell. Not reproduced: the horizontal
    side-wall normals MuJoCo reports for deeply-embedded centers (transient
    tumble states only).

    Margin bias: MuJoCo's convex hfield pipeline reports dist DEEPER than the
    geometric value by margin·(0.5 + n_z) and shifts pos accordingly when the
    pair margin is nonzero (empirically fitted to ≲2e-6 over face and edge
    contacts at margins 0.001/0.002 — the prism tops are raised by the margin
    and the sphere inflated by margin/2, with no compensation of the reported
    dist). The robots' foot geoms ship margin=0.001, so parity on hfield
    scenes requires reproducing the bias."""
    dtype = center.dtype
    local = hmat.T @ (center - hpos)
    sz = jnp.asarray(m.hfield_size, dtype)
    nr, nc = m.hfield_nrow, m.hfield_ncol
    data = jnp.asarray(m.hfield_data, dtype)  # (nrow, ncol) in [0, 1]

    fx = (local[0] / sz[0] + 1.0) * 0.5 * (nc - 1)
    fy = (local[1] / sz[1] + 1.0) * 0.5 * (nr - 1)
    # cells per unit local length
    rx = radius / sz[0] * 0.5 * (nc - 1)
    ry = radius / sz[1] * 0.5 * (nr - 1)
    i0 = jnp.clip(jnp.floor(fx - rx).astype(jnp.int32), 0, nc - 2)
    j0 = jnp.clip(jnp.floor(fy - ry).astype(jnp.int32), 0, nr - 2)
    # second cell of the AABB span; == first at grid borders → masked dup
    i1 = jnp.clip(jnp.floor(fx + rx).astype(jnp.int32), 0, nc - 2)
    j1 = jnp.clip(jnp.floor(fy + ry).astype(jnp.int32), 0, nr - 2)

    def corner(jj, ii):
        x = (ii.astype(dtype) / (nc - 1) * 2.0 - 1.0) * sz[0]
        y = (jj.astype(dtype) / (nr - 1) * 2.0 - 1.0) * sz[1]
        return jnp.stack([x, y, data[jj, ii] * sz[2]])

    ds, ps, ns = [], [], []
    far = jnp.asarray(1e6, dtype)
    for jj, j_dup in ((j0, None), (j1, j0)):
        for ii, i_dup in ((i0, None), (i1, i0)):
            # a duplicated cell (clamped AABB at grid borders) must not
            # double-count
            is_dup = jnp.zeros((), bool)
            if i_dup is not None and j_dup is not None:
                # (i1, j1) already covered by (i0, j1) when i1==i0 and by
                # (i1, j0) when j1==j0 — either collapse makes it a duplicate
                is_dup = (ii == i_dup) | (jj == j_dup)
            elif i_dup is not None:
                is_dup = ii == i_dup
            elif j_dup is not None:
                is_dup = jj == j_dup
            v00 = corner(jj, ii)
            v10 = corner(jj, ii + 1)
            v01 = corner(jj + 1, ii)
            v11 = corner(jj + 1, ii + 1)
            # main-diagonal split, wound CCW from +z so n_tri points up
            for tri in ((v00, v10, v11), (v00, v11, v01)):
                d_t, p_t, n_t = _sphere_triangle(local, radius, *tri)
                d_t = d_t - margin * (0.5 + n_t[2])
                p_t = local - n_t * (radius + 0.5 * margin + 0.5 * d_t)
                ds.append(jnp.where(is_dup, far, d_t))
                ps.append(p_t)
                ns.append(n_t)

    d = jnp.stack(ds)
    pos_local = jnp.stack(ps)
    n_local = jnp.stack(ns)
    pos = pos_local @ hmat.T + hpos[None, :]
    n = n_local @ hmat.T
    return d, pos, n


def _hfield_capsule(m, hpos, hmat, cpos, cmat, radius, halflen, margin=0.0):
    axis = cmat[:, 2]
    outs = [_hfield_sphere(m, hpos, hmat, cpos + axis * (s * halflen), radius,
                           margin)
            for s in (1.0, -1.0)]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
            jnp.concatenate([o[2] for o in outs]))


# ---------------------------------------------------------------------------------
# contact frame (MuJoCo mju_makeFrame tangents)
# ---------------------------------------------------------------------------------

def make_frame(n: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) normal → (..., 3, 3) frame rows (n, t1, t2), MuJoCo mju_makeFrame:
    pick the world axis least aligned with n (strict-< comparisons, so ties pick the
    later axis), Gram-Schmidt it against n for t1, then t2 = n × t1."""
    ax, ay, az = jnp.abs(n[..., 0]), jnp.abs(n[..., 1]), jnp.abs(n[..., 2])
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape)
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape)
    pick_x = (ax < ay) & (ax < az)
    pick_y = (~pick_x) & (ay < az)
    helper = jnp.where(pick_x[..., None], ex, jnp.where(pick_y[..., None], ey, ez))
    t1 = helper - n * jnp.sum(n * helper, axis=-1, keepdims=True)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True),
                          jnp.asarray(1e-12, n.dtype))
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


# ---------------------------------------------------------------------------------
# full narrow phase
# ---------------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Contacts:
    """Fixed-slot contact set (one env). Slot order is static per model."""

    dist: Any    # (ncon,)
    pos: Any     # (ncon, 3)
    frame: Any   # (ncon, 3, 3) rows (n, t1, t2)


def collide(m: Model, kin) -> Contacts:
    """Compute all contact slots from FK results.

    Pairs are grouped by (t1, t2) type (contact_layout sorts them) and each group
    runs ONE vmapped primitive over stacked geom poses — ≤8 vectorized op-chains
    per step instead of one chain per pair."""
    dtype = kin.geom_xpos.dtype
    size = jnp.asarray(m.geom_size, dtype)
    specs = contact_layout(m)
    if not specs:
        return Contacts(jnp.zeros(0, dtype), jnp.zeros((0, 3), dtype),
                        jnp.zeros((0, 3, 3), dtype))

    dists, poss, normals = [], [], []
    i = 0
    while i < len(specs):
        t1 = int(m.geom_type[specs[i].geom1])
        t2 = int(m.geom_type[specs[i].geom2])
        j = i
        while j < len(specs) and int(m.geom_type[specs[j].geom1]) == t1 \
                and int(m.geom_type[specs[j].geom2]) == t2:
            j += 1
        g1 = np.array([s.geom1 for s in specs[i:j]], np.int32)
        g2 = np.array([s.geom2 for s in specs[i:j]], np.int32)
        p1, R1 = kin.geom_xpos[g1], kin.geom_xmat[g1]
        p2, R2 = kin.geom_xpos[g2], kin.geom_xmat[g2]
        s1, s2 = size[g1], size[g2]
        marg = jnp.asarray(np.array([s.margin for s in specs[i:j]]), dtype)

        if t1 == GEOM_PLANE and t2 == GEOM_SPHERE:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _plane_sphere(
                p1, R1, p2, s2[0])
        elif t1 == GEOM_PLANE and t2 == GEOM_CAPSULE:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _plane_capsule(
                p1, R1, p2, R2, s2[0], s2[1])
        elif t1 == GEOM_PLANE and t2 == GEOM_BOX:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _plane_box(
                p1, R1, p2, R2, s2)
        elif t1 == GEOM_PLANE and t2 == GEOM_CYLINDER:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _plane_cylinder(
                p1, R1, p2, R2, s2[0], s2[1])
        elif t1 == GEOM_BOX and t2 == GEOM_SPHERE:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _box_sphere(
                p1, R1, s1, p2, s2[0])
        elif t1 == GEOM_BOX and t2 == GEOM_CAPSULE:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _box_capsule(
                p1, R1, s1, p2, R2, s2[0], s2[1])
        elif t1 == GEOM_HFIELD and t2 == GEOM_SPHERE:
            # the margin bias rides the convex hfield pipeline only
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _hfield_sphere(
                m, p1, R1, p2, s2[0], mg)
        elif t1 == GEOM_HFIELD and t2 == GEOM_CAPSULE:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _hfield_capsule(
                m, p1, R1, p2, R2, s2[0], s2[1], mg)
        else:  # pragma: no cover - layout filters unsupported pairs
            raise AssertionError((t1, t2))

        d, p, n = jax.vmap(fn)(p1, R1, p2, R2, s1, s2, marg)  # (G, k, ...)
        dists.append(d.reshape(-1))
        poss.append(p.reshape(-1, 3))
        normals.append(n.reshape(-1, 3))
        i = j

    n_all = jnp.concatenate(normals)
    return Contacts(jnp.concatenate(dists), jnp.concatenate(poss),
                    make_frame(n_all))
