"""Batch-trailing (CL-BT) narrow phase: component-leading planes, batch minor.

Why this module exists: the batched narrow phase in `collision.py` is per-env
code under `jax.vmap`, which yields intermediates shaped (B, G, k, 3, 3) —
batch LEADING, tiny dims minor. The 2026-08-20 platform's layout assignment
places the 128-lane axis on those size-3/4/8 minor dims (2-6% lane occupancy,
~100x HBM tile padding) and the engine regressed 19x (docs/PERF_NOTES.md r4).
Measured on the current platform (scripts/probes/probe_bt_narrow.py): the same
math with every intermediate shaped (..., G, B) — so the minor two dims are
(pairs, batch) and lanes ride the 4096-env batch at full occupancy — runs
4.5-5.1x faster per group, before fusion gains.

Idiom (same as collision._box_box_group, the group that was already written
this way): vectors are LISTS of component planes [x, y, z], rotations nested
lists R[i][j]; every plane is an array shaped (G, B) (sizes broadcast as
(G, 1)). All ops are elementwise over the (G, B) plane; XLA tiles (8, 128) on
(G, B) with full lane occupancy.

Semantics are pinned to the per-env reference implementations in
`collision.py` (which are themselves decoded-MuJoCo-parity; see their
docstrings for the mjc_* anchors). `tests/test_collision_bt.py` gates exact
agreement between the two paths on randomized tumbling states.

Groups without a CL-BT implementation yet (mesh pairs) fall back to the
vmapped per-env path inside `collide_bt` — they keep the old layouts but stay
correct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gym_quadruped_tpu.models.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_HFIELD,
    GEOM_MESH,
    GEOM_PLANE,
    GEOM_SPHERE,
    Model,
)
from gym_quadruped_tpu.physics import collision as _c

# ---------------------------------------------------------------------------------
# plane algebra helpers — vectors are [x, y, z] lists of (G, B) planes
# ---------------------------------------------------------------------------------


def dot3(u, v):
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]


def cross3(u, v):
    return [u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0]]


def norm3(v, eps=1e-30):
    return jnp.sqrt(jnp.maximum(dot3(v, v), eps))


def scale3(v, s):
    return [v[0] * s, v[1] * s, v[2] * s]


def add3(u, v):
    return [u[0] + v[0], u[1] + v[1], u[2] + v[2]]


def sub3(u, v):
    return [u[0] - v[0], u[1] - v[1], u[2] - v[2]]


def where3(c, u, v):
    return [jnp.where(c, u[i], v[i]) for i in range(3)]


def matvec3(R, v):
    """R @ v for nested-list R[i][j]."""
    return [sum(R[i][j] * v[j] for j in range(3)) for i in range(3)]


def mattvec3(R, v):
    """Rᵀ @ v."""
    return [sum(R[j][i] * v[j] for j in range(3)) for i in range(3)]


def col3(R, j):
    """Column j of nested-list R (a vector list)."""
    return [R[0][j], R[1][j], R[2][j]]


def deepest_k_cl(cands, k, dtype):
    """CL version of collision._deepest_k: first-min extraction over a LIST of
    candidates [(d, pos, n)], same first-index-wins tie-break. Returns k
    triples."""
    big = 1e9
    ds = [c[0] for c in cands]
    out = []
    for _ in range(k):
        dmin = ds[0]
        for dd in ds[1:]:
            dmin = jnp.minimum(dmin, dd)
        taken = jnp.zeros_like(dmin, dtype=bool)
        w = []
        for dd in ds:
            hit = (dd == dmin) & ~taken
            taken = taken | hit
            w.append(hit.astype(dtype))
        pos = [sum(w[c] * cands[c][1][i] for c in range(len(cands)))
               for i in range(3)]
        nrm = [sum(w[c] * cands[c][2][i] for c in range(len(cands)))
               for i in range(3)]
        out.append((dmin, pos, nrm))
        ds = [dd + ww * big for dd, ww in zip(ds, w)]
    return out


# ---------------------------------------------------------------------------------
# CL primitive tests — mirror collision._plane_sphere etc. exactly.
# Each returns a list of k slots [(d, pos, n)] with d a (G, B) plane and
# pos/n vector lists.
# ---------------------------------------------------------------------------------


def plane_sphere_cl(pp, pR, c, r):
    n = col3(pR, 2)
    d = dot3(n, sub3(c, pp)) - r
    pos = sub3(c, scale3(n, r + 0.5 * d))
    return [(d, pos, n)]


def plane_capsule_cl(pp, pR, cp, cR, r, h):
    n = col3(pR, 2)
    axis = col3(cR, 2)
    out = []
    for s in (1.0, -1.0):
        e = add3(cp, scale3(axis, s * h))
        d = dot3(n, sub3(e, pp)) - r
        p = sub3(e, scale3(n, r + 0.5 * d))
        out.append((d, p, n))
    return out


def plane_box_cl(pp, pR, bp, bR, size, dtype):
    """collision._plane_box: all 8 corner depths, 4 deepest (same tie-break)."""
    n = col3(pR, 2)
    nl = mattvec3(bR, n)                      # bmat.T @ n
    center_d = dot3(n, sub3(bp, pp))
    cands = []
    for sgn in _c._BOX_CORNER_SIGNS:
        depth = center_d + sum(float(sgn[j]) * nl[j] * size[j]
                               for j in range(3))
        corner = [bp[i] + sum(bR[i][j] * (float(sgn[j]) * size[j])
                              for j in range(3)) for i in range(3)]
        cands.append((depth, corner, n))
    sel = deepest_k_cl(cands, 4, dtype)
    return [(d, sub3(p, scale3(n_, 0.5 * d)), n_) for (d, p, n_) in sel]


def plane_cylinder_cl(pp, pR, cp, cR, r, h):
    """collision._plane_cylinder: 2 rim points + center point."""
    n = col3(pR, 2)
    axis = col3(cR, 2)
    proj = add3(scale3(n, -1.0), scale3(axis, dot3(axis, n)))
    norm = norm3(proj, 0.0)
    safe = where3(norm > 1e-10, scale3(proj, 1.0 / jnp.maximum(norm, 1e-10)),
                  col3(pR, 0))
    out = []
    for s in (1.0, -1.0):
        e = add3(cp, scale3(axis, h * s))
        rim = add3(e, scale3(safe, r))
        d = dot3(n, sub3(rim, pp))
        out.append((d, sub3(rim, scale3(n, 0.5 * d)), n))
    dc = dot3(n, sub3(cp, pp)) - jnp.abs(dot3(n, axis)) * h
    out.append((dc, sub3(cp, scale3(n, 0.5 * dc)), n))
    return out


def box_sphere_cl(bp, bR, size, c, r, dtype):
    """collision._box_sphere (branch-free closest point, inside handling)."""
    local = mattvec3(bR, sub3(c, bp))
    cl = [jnp.clip(local[j], -size[j], size[j]) for j in range(3)]
    dl = sub3(local, cl)
    dist_out = jnp.sqrt(dl[0] * dl[0] + dl[1] * dl[1] + dl[2] * dl[2])
    inside = dist_out < 1e-12
    dep = [size[j] - jnp.abs(local[j]) for j in range(3)]
    dmin = jnp.minimum(dep[0], jnp.minimum(dep[1], dep[2]))
    eq = [dep[j] == dmin for j in range(3)]
    f0 = eq[0]
    f1 = eq[1] & ~f0
    f2 = eq[2] & ~f0 & ~f1
    first = [f0.astype(dtype), f1.astype(dtype), f2.astype(dtype)]
    sign = [jnp.where(local[j] >= 0, 1.0, -1.0) for j in range(3)]
    n_in = [first[j] * sign[j] for j in range(3)]
    surf_in = [jnp.where(first[j] > 0, sign[j] * size[j], local[j])
               for j in range(3)]
    inv = 1.0 / jnp.maximum(dist_out, 1e-12)
    n_local = where3(inside, n_in, scale3(dl, inv))
    surf_l = where3(inside, surf_in, cl)
    d = jnp.where(inside, -(dmin + r), dist_out - r)
    n = matvec3(bR, n_local)
    surface = add3(matvec3(bR, surf_l), bp)
    pos = add3(surface, scale3(n, 0.5 * d))
    return [(d, pos, n)]


def sphere_sphere_cl(p1, r1, p2, r2):
    d12 = sub3(p2, p1)
    dlen = norm3(d12, 0.0)
    unit = scale3(d12, 1.0 / jnp.maximum(dlen, 1e-12))
    zhat = [jnp.zeros_like(dlen), jnp.zeros_like(dlen), jnp.ones_like(dlen)]
    n = where3(dlen > 1e-12, unit, zhat)
    dist = dlen - r1 - r2
    pos = add3(p1, scale3(n, r1 + 0.5 * dist))
    return [(dist, pos, n)]


def _closest_on_segment_cl(p, a, b):
    ab = sub3(b, a)
    t = jnp.clip(dot3(sub3(p, a), ab) / jnp.maximum(dot3(ab, ab), 1e-30),
                 0.0, 1.0)
    return add3(a, scale3(ab, t))


def sphere_capsule_cl(c, r_s, cp, cR, r_c, h):
    axis = col3(cR, 2)
    q = _closest_on_segment_cl(c, sub3(cp, scale3(axis, h)),
                               add3(cp, scale3(axis, h)))
    return sphere_sphere_cl(c, r_s, q, r_c)


def _segment_segment_cl(a1, b1, a2, b2):
    """collision._segment_segment (Ericson §5.1.9), plane form."""
    d1 = sub3(b1, a1)
    d2 = sub3(b2, a2)
    r = sub3(a1, a2)
    a = dot3(d1, d1)
    e = dot3(d2, d2)
    f = dot3(d2, r)
    c = dot3(d1, r)
    b = dot3(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-14,
                  jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-14),
                           0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-30)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(t != t_cl,
                  jnp.clip((t_cl * b - c) / jnp.maximum(a, 1e-30), 0.0, 1.0),
                  s)
    return add3(a1, scale3(d1, s)), add3(a2, scale3(d2, t_cl))


def capsule_capsule_cl(p1, R1, r1, h1, p2, R2, r2, h2):
    ax1 = col3(R1, 2)
    ax2 = col3(R2, 2)
    q1, q2 = _segment_segment_cl(sub3(p1, scale3(ax1, h1)),
                                 add3(p1, scale3(ax1, h1)),
                                 sub3(p2, scale3(ax2, h2)),
                                 add3(p2, scale3(ax2, h2)))
    return sphere_sphere_cl(q1, r1, q2, r2)


def sphere_cylinder_cl(c, r_s, cp, cR, R_c, h):
    """collision._sphere_cylinder: side/cap/rim closest point, inside push."""
    axis = col3(cR, 2)
    rel = sub3(c, cp)
    a = dot3(rel, axis)
    radial = sub3(rel, scale3(axis, a))
    rlen = norm3(radial, 0.0)
    rdir = where3(rlen > 1e-12, scale3(radial, 1.0 / jnp.maximum(rlen, 1e-12)),
                  col3(cR, 0))
    a_cl = jnp.clip(a, -h, h)
    r_cl = jnp.minimum(rlen, R_c)
    inside = (jnp.abs(a) < h) & (rlen < R_c)
    q_out = add3(cp, add3(scale3(axis, a_cl), scale3(rdir, r_cl)))
    d_side = R_c - rlen
    d_cap = h - jnp.abs(a)
    q_side = add3(cp, add3(scale3(axis, a), scale3(rdir, R_c)))
    q_cap = add3(cp, add3(scale3(axis, jnp.sign(a) * h), scale3(rdir, rlen)))
    q_in = where3(d_side < d_cap, q_side, q_cap)
    q = where3(inside, q_in, q_out)
    dvec = sub3(c, q)
    dlen = norm3(dvec, 0.0)
    inv = 1.0 / jnp.maximum(dlen, 1e-12)
    n_out = where3(dlen > 1e-12, scale3(dvec, -inv), scale3(axis, -1.0))
    n_in = where3(dlen > 1e-12, scale3(dvec, inv), axis)
    n = where3(inside, n_in, n_out)
    dist = jnp.where(inside, -(dlen + r_s), dlen - r_s)
    pos = add3(c, scale3(n, r_s + 0.5 * dist))
    return [(dist, pos, n)]


def box_box_cl(p1, R1, s1, p2, R2, s2, dtype):
    """Reuses collision._box_box_group's component-plane core (it was already
    written in this idiom); planes here are (G, B) instead of (G,)."""
    cands = _c._box_box_cands_cl(p1, R1, s1, p2, R2, s2, dtype)
    return deepest_k_cl(cands, 4, dtype)


# ---------------------------------------------------------------------------------
# heightfield (plane forms of collision._hfield_sphere / _hfield_capsule)
# ---------------------------------------------------------------------------------


def _closest_point_triangle_cl(p, a, b, c):
    """collision._closest_point_triangle in plane form (Ericson §5.1.5)."""
    ab, ac, ap = sub3(b, a), sub3(c, a), sub3(p, a)
    d1 = dot3(ab, ap)
    d2 = dot3(ac, ap)
    bp = sub3(p, b)
    d3 = dot3(ab, bp)
    d4 = dot3(ac, bp)
    cp = sub3(p, c)
    d5 = dot3(ab, cp)
    d6 = dot3(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom_in = jnp.maximum(va + vb + vc, 1e-30)
    v_in = vb / denom_in
    w_in = vc / denom_in
    q_face = add3(a, add3(scale3(ab, v_in), scale3(ac, w_in)))

    v_ab = jnp.clip(d1 / jnp.where(d1 - d3 == 0, 1.0, d1 - d3), 0.0, 1.0)
    q_ab = add3(a, scale3(ab, v_ab))
    w_ac = jnp.clip(d2 / jnp.where(d2 - d6 == 0, 1.0, d2 - d6), 0.0, 1.0)
    q_ac = add3(a, scale3(ac, w_ac))
    den_bc = (d4 - d3) + (d5 - d6)
    t_bc = jnp.clip((d4 - d3) / jnp.where(den_bc == 0, 1.0, den_bc), 0.0, 1.0)
    q_bc = add3(b, scale3(sub3(c, b), t_bc))

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    q = q_face
    q = where3(on_bc, q_bc, q)
    q = where3(on_ac, q_ac, q)
    q = where3(on_ab, q_ab, q)
    q = where3(in_c, c, q)
    q = where3(in_b, b, q)
    q = where3(in_a, a, q)
    in_face = ~(in_a | in_b | in_c | on_ab | on_ac | on_bc)
    return q, in_face


def _sphere_triangle_cl(center, radius, a, b, c):
    """collision._sphere_triangle in plane form (same sign rule)."""
    q, in_face = _closest_point_triangle_cl(center, a, b, c)
    n_tri = cross3(sub3(b, a), sub3(c, a))
    n_tri = scale3(n_tri, 1.0 / jnp.maximum(norm3(n_tri, 0.0), 1e-30))
    dvec = sub3(center, q)
    dlen = norm3(dvec, 0.0)
    side = jnp.sign(dot3(dvec, n_tri))
    side = jnp.where((side == 0) | ~in_face, 1.0, side)
    n = where3(dlen > 1e-12,
               scale3(dvec, side / jnp.maximum(dlen, 1e-12)), n_tri)
    dist = side * dlen - radius
    pos = sub3(center, scale3(n, radius + 0.5 * dist))
    return dist, pos, n


def _hfield_grids(m, dtype):
    sz = [float(s) for s in np.asarray(m.hfield_size)]
    nr, nc = m.hfield_nrow, m.hfield_ncol
    data = jnp.asarray(m.hfield_data, dtype)
    return sz, nr, nc, data


def _hfield_corner(m, dtype, jj, ii, margin):
    sz, nr, nc, data = _hfield_grids(m, dtype)
    x = (ii.astype(dtype) / (nc - 1) * 2.0 - 1.0) * sz[0]
    y = (jj.astype(dtype) / (nr - 1) * 2.0 - 1.0) * sz[1]
    return [x, y, data[jj, ii] * sz[2] + margin]


def hfield_sphere_cl(m, hpos, hmat, center, radius, margin):
    """collision._hfield_sphere in plane form: 8 slots (2x2 cells x 2 tris),
    same duplicate-cell masking and margin inflation."""
    dtype = center[0].dtype
    sz, nr, nc, _ = _hfield_grids(m, dtype)
    local = mattvec3(hmat, sub3(center, hpos))
    fx = (local[0] / sz[0] + 1.0) * 0.5 * (nc - 1)
    fy = (local[1] / sz[1] + 1.0) * 0.5 * (nr - 1)
    rx = (radius + 0.5 * margin) / sz[0] * 0.5 * (nc - 1)
    ry = (radius + 0.5 * margin) / sz[1] * 0.5 * (nr - 1)
    i0 = jnp.clip(jnp.floor(fx - rx).astype(jnp.int32), 0, nc - 2)
    j0 = jnp.clip(jnp.floor(fy - ry).astype(jnp.int32), 0, nr - 2)
    i1 = jnp.clip(jnp.floor(fx + rx).astype(jnp.int32), 0, nc - 2)
    j1 = jnp.clip(jnp.floor(fy + ry).astype(jnp.int32), 0, nr - 2)
    r_eff = radius + 0.5 * margin

    slots = []
    far = 1e6
    for jj, j_dup in ((j0, None), (j1, j0)):
        for ii, i_dup in ((i0, None), (i1, i0)):
            if i_dup is not None and j_dup is not None:
                is_dup = (ii == i_dup) | (jj == j_dup)
            elif i_dup is not None:
                is_dup = ii == i_dup
            elif j_dup is not None:
                is_dup = jj == j_dup
            else:
                is_dup = None
            v00 = _hfield_corner(m, dtype, jj, ii, margin)
            v10 = _hfield_corner(m, dtype, jj, ii + 1, margin)
            v01 = _hfield_corner(m, dtype, jj + 1, ii, margin)
            v11 = _hfield_corner(m, dtype, jj + 1, ii + 1, margin)
            for tri in ((v00, v10, v11), (v00, v11, v01)):
                d_t, p_t, n_t = _sphere_triangle_cl(local, r_eff, *tri)
                if is_dup is not None:
                    d_t = jnp.where(is_dup, far, d_t)
                slots.append((d_t, add3(matvec3(hmat, p_t), hpos),
                              matvec3(hmat, n_t)))
    return slots


def _hfield_point_contact_cl(m, local, r_eff, margin, dtype):
    """collision._hfield_point_contact in plane form."""
    sz, nr, nc, _ = _hfield_grids(m, dtype)
    fx = (local[0] / sz[0] + 1.0) * 0.5 * (nc - 1)
    fy = (local[1] / sz[1] + 1.0) * 0.5 * (nr - 1)
    i = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nc - 2)
    j = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, nr - 2)
    v00 = _hfield_corner(m, dtype, j, i, margin)
    v10 = _hfield_corner(m, dtype, j, i + 1, margin)
    v01 = _hfield_corner(m, dtype, j + 1, i, margin)
    v11 = _hfield_corner(m, dtype, j + 1, i + 1, margin)
    d1, p1, n1 = _sphere_triangle_cl(local, r_eff, v00, v10, v11)
    d2, p2, n2 = _sphere_triangle_cl(local, r_eff, v00, v11, v01)
    take1 = d1 <= d2
    return (jnp.where(take1, d1, d2), where3(take1, p1, p2),
            where3(take1, n1, n2))


def hfield_capsule_cl(m, hpos, hmat, cpos, cmat, radius, halflen, margin):
    """collision._hfield_capsule in plane form: 2 endpoint spheres (16 slots)
    + 5 interior axis samples with the same duplicate suppression."""
    dtype = cpos[0].dtype
    axis = col3(cmat, 2)
    slots = []
    for s in (1.0, -1.0):
        end = add3(cpos, scale3(axis, s * halflen))
        slots.extend(hfield_sphere_cl(m, hpos, hmat, end, radius, margin))

    interior = []
    for t in (-2.0 / 3, -1.0 / 3, 0.0, 1.0 / 3, 2.0 / 3):
        c = add3(cpos, scale3(axis, t * halflen))
        local = mattvec3(hmat, sub3(c, hpos))
        di, pi, ni = _hfield_point_contact_cl(m, local, radius + 0.5 * margin,
                                              margin, dtype)
        pi = add3(matvec3(hmat, pi), hpos)
        ni = matvec3(hmat, ni)
        # drop interior samples that coincide with an endpoint contact
        dup = jnp.zeros_like(di, dtype=bool)
        for (d_e, p_e, _) in slots:
            dd = norm3(sub3(pi, p_e), 0.0)
            dup = dup | ((dd < 2e-3) & (d_e < margin + 1e-6))
        interior.append((jnp.where(dup, 1e6, di), pi, ni))
    return slots + interior


# ---------------------------------------------------------------------------------
# heightfield vs convex (plane form of collision._hfield_convex_ccd + hybrids)
# ---------------------------------------------------------------------------------

_HF_K = _c._HF_CONVEX_K


def _clip_into_prism_cl(pt, verts, zbot):
    """collision._clip_into_prism in plane form (verts: 6 vertex vectors,
    top triangle first)."""
    from gym_quadruped_tpu.physics import ccd_bt
    v0, v1, v2 = verts[0], verts[1], verts[2]
    tn = cross3(sub3(v1, v0), sub3(v2, v1))
    tn = scale3(tn, jnp.sign(tn[2]))
    tn = scale3(tn, 1.0 / jnp.maximum(norm3(tn, 0.0), 1e-30))
    exc = jnp.maximum(dot3(sub3(pt, v0), tn), 0.0)
    q = sub3(pt, scale3(tn, exc))
    zero = jnp.zeros_like(q[0])
    qxy = ccd_bt.clip_onto_triangle([q[0], q[1], zero],
                                    [v0[0], v0[1], zero],
                                    [v1[0], v1[1], zero],
                                    [v2[0], v2[1], zero])
    zt = v0[2] - (tn[0] * (qxy[0] - v0[0]) + tn[1] * (qxy[1] - v0[1])) / \
        jnp.maximum(tn[2], 1e-6)
    z = jnp.clip(q[2], zbot, zt)
    return [qxy[0], qxy[1], z]


def hfield_convex_ccd_cl(m, hpos, hmat, gpos, gmat, margin,
                         supval_g, support_g, face_g, clip_g, clip_vol_g,
                         rbound, n_span, dtype):
    """collision._hfield_convex_ccd in plane form. All geom callbacks take
    plane-form args in the hfield LOCAL frame. Returns _HF_K slot triples
    (world frame)."""
    from gym_quadruped_tpu.physics import ccd_bt
    sz, nr, nc, data = _hfield_grids(m, dtype)
    hmatT = [[hmat[j][i] for j in range(3)] for i in range(3)]
    local_p = mattvec3(hmat, sub3(gpos, hpos))
    local_R = ccd_bt.matmul3(hmatT, gmat)

    fx = (local_p[0] / sz[0] + 1.0) * 0.5 * (nc - 1)
    fy = (local_p[1] / sz[1] + 1.0) * 0.5 * (nr - 1)
    rx = rbound / sz[0] * 0.5 * (nc - 1)
    ry = rbound / sz[1] * 0.5 * (nr - 1)
    i0 = jnp.floor(fx - rx).astype(jnp.int32)
    j0 = jnp.floor(fy - ry).astype(jnp.int32)

    # footprint cells (C = n_span², static) with the cell axis LEADING
    offs = np.arange(n_span)
    di = jnp.asarray(np.tile(offs, n_span), jnp.int32)[:, None, None]
    dj = jnp.asarray(np.repeat(offs, n_span), jnp.int32)[:, None, None]
    ii = jnp.clip(i0[None] + di, 0, nc - 2)                   # (C, G, B)
    jj = jnp.clip(j0[None] + dj, 0, nr - 2)
    cell_dup = (i0[None] + di != ii) | (j0[None] + dj != jj)

    def corner(jj, ii):
        x = (ii.astype(dtype) / (nc - 1) * 2.0 - 1.0) * sz[0]
        y = (jj.astype(dtype) / (nr - 1) * 2.0 - 1.0) * sz[1]
        return [x, y, data[jj, ii] * sz[2] + margin]

    v00, v10 = corner(jj, ii), corner(jj, ii + 1)
    v01, v11 = corner(jj + 1, ii), corner(jj + 1, ii + 1)

    def prisms(tri):
        """Interleave the 2 triangles per cell: (C,...) pairs → (P=2C,...)."""
        return [jnp.stack([tri[0][k], tri[1][k]],
                          axis=1).reshape((-1,) + tri[0][k].shape[1:])
                for k in range(3)]

    # vertex lists per triangle, then interleaved to prism order
    # (c0t0, c0t1, c1t0, ... — matches tops.reshape in the per-env path)
    tris = [(v00, v10, v11), (v00, v11, v01)]
    verts = []
    for v_pair in zip(*tris):                  # 3 top vertices
        verts.append(prisms(list(v_pair)))
    for v_pair in zip(*tris):                  # 3 base vertices (z = -sz[3])
        top = prisms(list(v_pair))
        verts.append([top[0], top[1], jnp.full_like(top[2], -sz[3])])
    is_dup = jnp.stack([cell_dup, cell_dup],
                       axis=1).reshape((-1,) + cell_dup.shape[1:])  # (P,G,B)

    def depth_fn(dirs):
        sa = dot3(dirs, verts[0])
        for v in verts[1:]:
            sa = jnp.maximum(sa, dot3(dirs, v))
        return sa + supval_g([-dirs[i] for i in range(3)], local_R)

    e0 = sub3(verts[1], verts[0])
    e1 = sub3(verts[2], verts[1])
    e2 = sub3(verts[0], verts[2])
    zero = jnp.zeros_like(e0[0])
    one = jnp.ones_like(e0[0])
    zax = [zero, zero, one]
    top_n = cross3(e0, e1)
    cand_list = [zax, top_n, cross3(e0, zax), cross3(e1, zax),
                 cross3(e2, zax)]
    for i in range(3):
        g = [jnp.broadcast_to(local_R[k][i][None], e0[0].shape)
             for k in range(3)]
        cand_list.append(g)
        for e in (e0, e1, e2, zax):
            cand_list.append(cross3(e, g))
    cands = [jnp.stack([jnp.broadcast_to(c[k], e0[0].shape)
                        for c in cand_list]) for k in range(3)]  # (N, P, G, B)
    d0_depth, d0 = ccd_bt.best_axis(depth_fn, cands)
    depths, dirs = ccd_bt.pattern_refine(depth_fn, d0, d0_depth, rounds=14)
    top_u = scale3(top_n, 1.0 / jnp.maximum(norm3(top_n, 0.0), 1e-12))
    axes0 = [jnp.stack([zax[k], top_u[k]]
                       + [jnp.broadcast_to(local_R[k][i][None],
                                           e0[0].shape) for i in range(3)])
             for k in range(3)]                                # (5, P, G, B)
    depths, dirs = ccd_bt.snap_polish(depth_fn, depths, dirs, axes0)
    depths = jnp.where(is_dup, -jnp.inf, depths)               # (P, G, B)

    slots = []
    remaining = depths
    for _ in range(_HF_K):
        mx = jnp.max(remaining, axis=0)
        sel = (remaining >= mx[None]) & jnp.isfinite(remaining)
        oh = (jnp.cumsum(sel.astype(dtype), axis=0) <= 1.0) * sel.astype(dtype)
        verts_k = [[jnp.sum(oh * verts[v][k], axis=0) for k in range(3)]
                   for v in range(6)]
        depth_k = jnp.sum(oh * depths, axis=0)
        dir_k = [jnp.sum(oh * dirs[k], axis=0) for k in range(3)]
        dn = norm3(dir_k, 0.0)
        zfall = [jnp.zeros_like(dn), jnp.zeros_like(dn), jnp.ones_like(dn)]
        dir_k = where3(dn > 1e-6, scale3(dir_k, 1.0 / jnp.maximum(dn, 1e-12)),
                       zfall)
        got = (jnp.sum(oh, axis=0) > 0.5) & (depth_k > -margin)

        neg_dir = [-dir_k[k] for k in range(3)]
        face_k = face_g(neg_dir, local_R)
        vals = [dot3(verts_k[v], dir_k) for v in range(6)]
        vmax = vals[0]
        for v in vals[1:]:
            vmax = jnp.maximum(vmax, v)
        shift_k = scale3(dir_k, depth_k)
        score = []
        for v in range(6):
            tied = vals[v] >= vmax - 1e-9
            moved = norm3(sub3(add3(clip_vol_g(sub3(verts_k[v], shift_k),
                                               local_R), shift_k),
                               verts_k[v]), 0.0)
            score.append(jnp.where(tied, moved, jnp.inf))
        smin = score[0]
        for s_ in score[1:]:
            smin = jnp.minimum(smin, s_)
        taken = jnp.zeros_like(smin, dtype=bool)
        xa = [jnp.zeros_like(smin)] * 3
        for v in range(6):
            hit = (score[v] == smin) & ~taken
            taken = taken | hit
            w = hit.astype(dtype)
            xa = [xa[k] + w * verts_k[v][k] for k in range(3)]
        xb = support_g(neg_dir, local_R)
        pos_k = ccd_bt.witness(
            dir_k, depth_k, [xa, xb, scale3(add3(xa, xb), 0.5)],
            lambda pt: ccd_bt.clip_onto_triangle(pt, verts_k[0], verts_k[1],
                                                 verts_k[2]),
            lambda pt: clip_g(pt, local_R, face_k, neg_dir),
            lambda pt: _clip_into_prism_cl(pt, verts_k, -sz[3]),
            lambda pt: clip_vol_g(pt, local_R))
        d_out = jnp.where(got, -depth_k - 0.5 * margin, 1e6)
        slots.append((d_out, add3(matvec3(hmat, pos_k), hpos),
                      matvec3(hmat, dir_k)))
        remaining = jnp.where(oh > 0.5, -jnp.inf, remaining)
    return slots


def _merge_local_samples_cl(margin, ccd_slots, local_slots):
    """collision._merge_local_samples in plane form: a CCD contact within
    2 mm of an (active) local sample is dropped; local samples win."""
    merged = []
    for (dc, pc, nc_) in ccd_slots:
        dup = jnp.zeros_like(dc, dtype=bool)
        for (d4, p4, _) in local_slots:
            dd = norm3(sub3(p4, pc), 0.0)
            dup = dup | ((dd < 2e-3) & (d4 < margin + 1e-6))
        merged.append((jnp.where(dup, 1e6, dc), pc, nc_))
    return merged + local_slots


def hfield_box_cl(m, hpos, hmat, bpos, bmat, size, margin, n_span, dtype):
    """collision._hfield_box hybrid in plane form."""
    from gym_quadruped_tpu.physics import ccd_bt
    rbound = jnp.sqrt(size[0] ** 2 + size[1] ** 2 + size[2] ** 2)
    hmatT = [[hmat[j][i] for j in range(3)] for i in range(3)]
    lp = mattvec3(hmat, sub3(bpos, hpos))
    ccd_slots = hfield_convex_ccd_cl(
        m, hpos, hmat, bpos, bmat, margin,
        lambda d, R: ccd_bt.supval_box(d, lp, R, size),
        lambda d, R: ccd_bt.support_box(d, lp, R, size),
        lambda d, R: ccd_bt.box_face(d, R, size),
        lambda pt, R, face, d: ccd_bt.clip_face_box(pt, lp, R, size,
                                                    face[0], face[1]),
        lambda pt, R: ccd_bt.clip_into_box(pt, lp, R, size),
        rbound, n_span, dtype)

    cands = []
    for sgn in _c._BOX_CORNER_SIGNS:
        cw = add3(bpos, matvec3(bmat, [size[k] * float(sgn[k])
                                       for k in range(3)]))
        local = mattvec3(hmat, sub3(cw, hpos))
        d_c, p_c, n_c = _hfield_point_contact_cl(m, local, 0.5 * margin,
                                                 margin, dtype)
        cands.append((d_c, p_c, n_c))
    sel4 = deepest_k_cl(cands, 4, dtype)
    local_slots = [(d, add3(matvec3(hmat, p), hpos), matvec3(hmat, n))
                   for (d, p, n) in sel4]
    return _merge_local_samples_cl(margin, ccd_slots, local_slots)


def hfield_cylinder_cl(m, hpos, hmat, cpos, cmat, radius, halflen, margin,
                       n_span, dtype):
    """collision._hfield_cylinder hybrid in plane form."""
    from gym_quadruped_tpu.physics import ccd_bt
    rbound = jnp.sqrt(radius * radius + halflen * halflen)
    lp = mattvec3(hmat, sub3(cpos, hpos))
    ccd_slots = hfield_convex_ccd_cl(
        m, hpos, hmat, cpos, cmat, margin,
        lambda d, R: ccd_bt.supval_cyl(d, lp, R, radius, halflen),
        lambda d, R: ccd_bt.support_cyl(d, lp, R, radius, halflen),
        lambda d, R: ccd_bt.cyl_face(d, R),
        lambda pt, R, face, d: ccd_bt.clip_face_cyl(pt, lp, R, radius,
                                                    halflen, face[0], face[1],
                                                    face[2], d),
        lambda pt, R: ccd_bt.clip_into_cyl(pt, lp, R, radius, halflen),
        rbound, n_span, dtype)
    axis = col3(cmat, 2)
    cands = []
    for s in (1.0, -1.0):
        end = add3(cpos, scale3(axis, s * halflen))
        cands.extend(hfield_sphere_cl(m, hpos, hmat, end, radius, margin))
    sel4 = deepest_k_cl(cands, 4, dtype)
    return _merge_local_samples_cl(margin, ccd_slots, sel4)


# ---------------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------------


def _as_planes_vec(x):
    """(G, 3, B) -> [x, y, z] planes of (G, B)."""
    return [x[:, i] for i in range(3)]


def _as_planes_mat(x):
    """(G, 3, 3, B) -> nested lists of (G, B)."""
    return [[x[:, i, j] for j in range(3)] for i in range(3)]


def _static_planes(arr, n):
    """(G, n) static numpy -> list of (G, 1) planes (broadcast over B)."""
    return [jnp.asarray(arr[:, i])[:, None] for i in range(n)]


def _flatten_group(slots, dtype):
    """k slot triples of (G, B) planes -> (7, G*k, B) feature block in the
    BL path's pair-major slot order (g0k0, g0k1, ..., g1k0, ...)."""
    def pack(planes):  # list over k of (G, B) -> (G*k, B)
        stacked = jnp.stack(planes, axis=1)           # (G, k, B)
        return stacked.reshape((-1,) + stacked.shape[2:])

    d = pack([s[0] for s in slots])
    rows = [d]
    for i in range(3):
        rows.append(pack([s[1][i] for s in slots]))
    for i in range(3):
        rows.append(pack([s[2][i] for s in slots]))
    return jnp.stack(rows, axis=0).astype(dtype)      # (7, G*k, B)


def collide_bt(m: Model, geom_xpos, geom_xmat) -> jnp.ndarray:
    """Batched narrow phase, batch-trailing internals.

    geom_xpos (B, ngeom, 3), geom_xmat (B, ngeom, 3, 3) — batch-leading, as
    produced by the vmapped FK. Returns feat (7, S, B) in collide()'s slot
    order (row 0 dist, 1:4 pos, 4:7 normal).
    """
    B = geom_xpos.shape[0]
    dtype = geom_xpos.dtype
    specs = _c.contact_layout(m)
    if not specs:
        return jnp.zeros((7, 0, B), dtype)

    size_np = np.asarray(m.geom_size)
    # one boundary transpose each: (B, NG, 3) -> (NG, 3, B)
    xpos_T = jnp.transpose(geom_xpos, (1, 2, 0))
    xmat_T = jnp.transpose(geom_xmat, (1, 2, 3, 0))

    feats = []
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
        p1 = _as_planes_vec(xpos_T[g1])
        R1 = _as_planes_mat(xmat_T[g1])
        p2 = _as_planes_vec(xpos_T[g2])
        R2 = _as_planes_mat(xmat_T[g2])
        s1 = _static_planes(size_np[g1], 3)
        s2 = _static_planes(size_np[g2], 3)
        marg = jnp.asarray(np.array([s.margin for s in specs[i:j]]),
                           dtype)[:, None]                     # (G, 1)

        key = (t1, t2)
        if key == (GEOM_PLANE, GEOM_SPHERE):
            slots = plane_sphere_cl(p1, R1, p2, s2[0])
        elif key == (GEOM_PLANE, GEOM_CAPSULE):
            slots = plane_capsule_cl(p1, R1, p2, R2, s2[0], s2[1])
        elif key == (GEOM_PLANE, GEOM_BOX):
            slots = plane_box_cl(p1, R1, p2, R2, s2, dtype)
        elif key == (GEOM_PLANE, GEOM_CYLINDER):
            slots = plane_cylinder_cl(p1, R1, p2, R2, s2[0], s2[1])
        elif key == (GEOM_BOX, GEOM_SPHERE):
            slots = box_sphere_cl(p1, R1, s1, p2, s2[0], dtype)
        elif key == (GEOM_SPHERE, GEOM_BOX):
            slots = [(d, p, scale3(n, -1.0)) for (d, p, n) in
                     box_sphere_cl(p2, R2, s2, p1, s1[0], dtype)]
        elif key == (GEOM_SPHERE, GEOM_SPHERE):
            slots = sphere_sphere_cl(p1, s1[0], p2, s2[0])
        elif key == (GEOM_SPHERE, GEOM_CAPSULE):
            slots = sphere_capsule_cl(p1, s1[0], p2, R2, s2[0], s2[1])
        elif key == (GEOM_SPHERE, GEOM_CYLINDER):
            slots = sphere_cylinder_cl(p1, s1[0], p2, R2, s2[0], s2[1])
        elif key in ((GEOM_CAPSULE, GEOM_CAPSULE), (GEOM_CAPSULE, GEOM_CYLINDER),
                     (GEOM_CYLINDER, GEOM_CYLINDER)):
            # cylinder treated as equal-radius capsule (collision.py:1678-1688)
            slots = capsule_capsule_cl(p1, R1, s1[0], s1[1],
                                       p2, R2, s2[0], s2[1])
        elif key == (GEOM_BOX, GEOM_BOX):
            slots = box_box_cl(p1, R1, s1, p2, R2, s2, dtype)
        elif key == (GEOM_CAPSULE, GEOM_BOX):
            from gym_quadruped_tpu.physics import ccd_bt
            slots = ccd_bt.cap_box_ccd(p1, R1, s1[0], s1[1], p2, R2, s2)
        elif key == (GEOM_BOX, GEOM_CAPSULE):
            # world box (geom1) vs robot capsule (geom2): CCD runs capsule
            # first; flip the normal back to geom1→geom2 (collision.py:1626)
            from gym_quadruped_tpu.physics import ccd_bt
            slots = [(d, p, scale3(n, -1.0)) for (d, p, n) in
                     ccd_bt.cap_box_ccd(p2, R2, s2[0], s2[1], p1, R1, s1)]
        elif key == (GEOM_CYLINDER, GEOM_BOX):
            from gym_quadruped_tpu.physics import ccd_bt
            slots = ccd_bt.cyl_box_ccd(p1, R1, s1[0], s1[1], p2, R2, s2)
        elif key == (GEOM_HFIELD, GEOM_SPHERE):
            slots = hfield_sphere_cl(m, p1, R1, p2, s2[0], marg)
        elif key == (GEOM_HFIELD, GEOM_CAPSULE):
            slots = hfield_capsule_cl(m, p1, R1, p2, R2, s2[0], s2[1], marg)
        elif key == (GEOM_HFIELD, GEOM_BOX):
            n_span = _c.hfield_span(m, g2)
            slots = hfield_box_cl(m, p1, R1, p2, R2, s2, marg, n_span, dtype)
        elif key == (GEOM_HFIELD, GEOM_CYLINDER):
            n_span = _c.hfield_span(m, g2)
            slots = hfield_cylinder_cl(m, p1, R1, p2, R2, s2[0], s2[1], marg,
                                       n_span, dtype)
        else:
            # fallback: vmapped per-env path for groups not yet CL-converted
            # (mesh pairs, CCD pairs, hfield pairs) — correct, old layouts
            feats.append(_fallback_group(m, specs[i:j], t1, t2,
                                         geom_xpos, geom_xmat, dtype))
            i = j
            continue

        feats.append(_flatten_group(slots, dtype))
        i = j

    return jnp.concatenate(feats, axis=1)


def _fallback_group(m, specs, t1, t2, geom_xpos, geom_xmat, dtype):
    """Run one group through the per-env collide() machinery under vmap and
    transpose its feature block to (7, Gk, B)."""
    sub = _SubsetModel(m, specs)

    def one_env(xp, xm):
        kin = _KinView(xp, xm)
        return _c.collide(sub, kin).feat

    feat = jax.vmap(one_env)(geom_xpos, geom_xmat)     # (B, 7, Gk)
    return jnp.transpose(feat, (1, 2, 0))


class _KinView:
    """Minimal kin stand-in for collide(): geom poses only."""

    __slots__ = ('geom_xpos', 'geom_xmat')

    def __init__(self, xp, xm):
        self.geom_xpos = xp
        self.geom_xmat = xm


class _SubsetModel:
    """Model proxy whose contact_layout is a fixed subset of pairs (one type
    group); everything else delegates to the base model."""

    def __init__(self, m, specs):
        self._m = m
        self._layout_override = tuple(specs)

    def __getattr__(self, name):
        return getattr(self._m, name)
