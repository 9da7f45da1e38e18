"""Plane-form (batch-trailing) port of the decoded multiccd pipeline (ccd.py).

Same algorithm, stage for stage — support-function SAT over candidate axes,
pattern refinement, snap-polish canonicalization, 4 perturbed re-solves and
the POCS witness machinery — but expressed on component PLANES: a direction
is [dx, dy, dz] with each plane shaped (G, B) (or (N, G, B) / (4, G, B) with
candidate/config axes LEADING), so the env batch stays the minormost axis of
every intermediate. See collision_bt's module docstring for why this layout
is required on the current platform.

Semantics are pinned 1:1 to ccd.py (that module's docstrings hold the decoded
MuJoCo-parity evidence); tests/test_collision_bt.py gates agreement of the
full cap-box / cyl-box / box-box groups against the per-env path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.physics.ccd import _DEDUP, _FACE_TOL, EPS_PERTURB
from gym_quadruped_tpu.physics.collision_bt import (
    add3,
    col3,
    cross3,
    dot3,
    matvec3,
    mattvec3,
    norm3,
    scale3,
    sub3,
    where3,
)


def matmul3(A, B):
    """Nested-list 3x3 product A @ B."""
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def tangents(n):
    """ccd.tangents: orthonormal tangent pair, branch-free."""
    use_z = jnp.abs(n[2]) < 0.99
    zero = jnp.zeros_like(n[0])
    one = jnp.ones_like(n[0])
    ref = [jnp.where(use_z, zero, one), zero,
           jnp.where(use_z, one, zero)]
    t1 = cross3(n, ref)
    inv = 1.0 / jnp.maximum(norm3(t1, 0.0), 1e-30)
    t1 = scale3(t1, inv)
    return t1, cross3(n, t1)


def axis_angle(axis, ang):
    """ccd.axis_angle: rotation matrices (nested lists) about unit axes."""
    x, y, z = axis
    c, s = jnp.cos(ang), jnp.sin(ang)
    C = 1.0 - c
    return [[c + x * x * C, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, c + y * y * C, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, c + z * z * C]]


def perturb_rots(n, eps=EPS_PERTURB):
    """ccd.perturb_rots: 4 multiccd perturbations; entries get a LEADING
    config axis of size 4."""
    t1, t2 = tangents(n)
    axes = [jnp.stack([t1[i], t1[i], t2[i], t2[i]]) for i in range(3)]
    rank = axes[0].ndim
    sgn = jnp.asarray([1.0, -1.0, 1.0, -1.0],
                      axes[0].dtype).reshape((4,) + (1,) * (rank - 1))
    ang = sgn * eps
    return axis_angle(axes, -ang), axis_angle(axes, ang)


# ---------------------------------------------------------------------------------
# supports / support values / clips (ccd.py counterparts)
# ---------------------------------------------------------------------------------


def support_box(d, p, R, size):
    dl = mattvec3(R, d)
    pts = [jnp.where(dl[j] >= 0, size[j], -size[j]) for j in range(3)]
    return add3(p, matvec3(R, pts))


def support_cap(d, p, R, radius, halflen):
    a = col3(R, 2)
    da = dot3(d, a)
    return add3(p, add3(scale3(a, jnp.sign(da) * halflen), scale3(d, radius)))


def support_cyl(d, p, R, radius, halflen):
    a = col3(R, 2)
    da = dot3(d, a)
    radial = sub3(d, scale3(a, da))
    nr = norm3(radial, 0.0)
    rdir = where3(nr > 1e-12, scale3(radial, 1.0 / jnp.maximum(nr, 1e-12)),
                  [jnp.zeros_like(nr)] * 3)
    return add3(p, add3(scale3(a, jnp.sign(da) * halflen),
                        scale3(rdir, radius)))


def supval_box(d, p, R, size):
    dl = mattvec3(R, d)
    return dot3(d, p) + sum(jnp.abs(dl[j]) * size[j] for j in range(3))


def supval_cap(d, p, R, radius, halflen):
    a = col3(R, 2)
    return dot3(d, p) + halflen * jnp.abs(dot3(d, a)) + radius


def supval_cyl(d, p, R, radius, halflen):
    a = col3(R, 2)
    da = dot3(d, a)
    return dot3(d, p) + halflen * jnp.abs(da) + radius * \
        norm3(sub3(d, scale3(a, da)), 0.0)


def clip_into_box(pt, p, R, size):
    l = mattvec3(R, sub3(pt, p))
    l = [jnp.clip(l[j], -size[j], size[j]) for j in range(3)]
    return add3(p, matvec3(R, l))


def clip_into_cap(pt, p, R, radius, halflen):
    a = col3(R, 2)
    rel = sub3(pt, p)
    ax = jnp.clip(dot3(rel, a), -halflen, halflen)
    axis_pt = add3(p, scale3(a, ax))
    off = sub3(pt, axis_pt)
    on = norm3(off, 0.0)
    return add3(axis_pt,
                scale3(off, jnp.minimum(on, radius) / jnp.maximum(on, 1e-12)))


def clip_into_cyl(pt, p, R, radius, halflen):
    a = col3(R, 2)
    rel = sub3(pt, p)
    axv = dot3(rel, a)
    ax = jnp.clip(axv, -halflen, halflen)
    rad = sub3(rel, scale3(a, axv))
    rn = norm3(rad, 0.0)
    rad = scale3(rad, jnp.minimum(rn, radius) / jnp.maximum(rn, 1e-12))
    return add3(add3(p, scale3(a, ax)), rad)


def box_face(d, R, size, tol=_FACE_TOL):
    dl = mattvec3(R, d)
    return [jnp.abs(dl[j]) > tol for j in range(3)], \
        [jnp.sign(dl[j]) for j in range(3)]


def clip_face_box(pt, p, R, size, mask, sgn):
    q = mattvec3(R, sub3(pt, p))
    pinned = [jnp.where(mask[j], sgn[j] * size[j],
                        jnp.clip(q[j], -size[j], size[j])) for j in range(3)]
    return add3(p, matvec3(R, pinned))


def cap_face(d, R, tol=_FACE_TOL):
    da = dot3(d, col3(R, 2))
    return jnp.abs(da) > tol, jnp.sign(da)


def clip_face_cap(pt, p, R, radius, halflen, mask_ax, sgn_ax, d):
    a = col3(R, 2)
    da = dot3(d, a)
    t = dot3(sub3(pt, p), a) - radius * da
    ax = jnp.where(mask_ax, sgn_ax * halflen, jnp.clip(t, -halflen, halflen))
    return add3(p, add3(scale3(a, ax), scale3(d, radius)))


def cyl_face(d, R, tol=_FACE_TOL):
    a = col3(R, 2)
    da = dot3(d, a)
    npr = norm3(sub3(d, scale3(a, da)), 0.0)
    return jnp.abs(da) > tol, jnp.sign(da), npr > tol


def clip_face_cyl(pt, p, R, radius, halflen, mask_ax, sgn_ax, mask_rad, d):
    a = col3(R, 2)
    da = dot3(d, a)
    rel = sub3(pt, p)
    relx = dot3(rel, a)
    ax = jnp.where(mask_ax, sgn_ax * halflen,
                   jnp.clip(relx, -halflen, halflen))
    dperp = sub3(d, scale3(a, da))
    npr = norm3(dperp, 0.0)
    rad_pin = scale3(dperp, radius / jnp.maximum(npr, 1e-12))
    rperp = sub3(rel, scale3(a, relx))
    rn = norm3(rperp, 0.0)
    rad_free = scale3(rperp, jnp.minimum(rn, radius) / jnp.maximum(rn, 1e-12))
    rad = where3(mask_rad, rad_pin, rad_free)
    return add3(add3(p, scale3(a, ax)), rad)


# ---------------------------------------------------------------------------------
# SAT + refinement + witness (leading candidate/config axes on the planes)
# ---------------------------------------------------------------------------------


def _first_min_pick(vals, vecs):
    """First-index argmin over the LEADING axis: vals (N, ...),
    vecs planes (N, ...) → (min (...,), picked vector planes)."""
    v = jnp.min(vals, axis=0)
    sel = (vals <= v[None]).astype(vecs[0].dtype)
    oh = sel * (jnp.cumsum(sel, axis=0) <= 1.0)
    return v, [jnp.sum(oh * vecs[i], axis=0) for i in range(3)]


def best_axis(depth_fn, cands):
    """ccd.best_axis: cands planes (N, ...); both signs in one evaluation."""
    nrm = norm3(cands, 0.0)
    units = scale3(cands, 1.0 / jnp.maximum(nrm, 1e-12))
    dirs = [jnp.concatenate([units[i], -units[i]], axis=0) for i in range(3)]
    depths = depth_fn(dirs)                                   # (2N, ...)
    ok = jnp.concatenate([nrm, nrm], axis=0) > 1e-9
    depths = jnp.where(ok, depths, jnp.inf)
    return _first_min_pick(depths, dirs)


_RING_S = 0.70710678


def pattern_refine(depth_fn, d0, depth0, rounds=10, r0=0.35, rmax=None):
    """ccd.pattern_refine: 8-direction ring per round, expand x1.5 / halve."""
    best, bd = depth0, d0
    rad = jnp.full_like(depth0, r0)
    rmax = r0 if rmax is None else rmax
    for _ in range(rounds):
        t1, t2 = tangents(bd)
        ring = [jnp.stack([t1[i], -t1[i], t2[i], -t2[i],
                           (t1[i] + t2[i]) * _RING_S, (t1[i] - t2[i]) * _RING_S,
                           (-t1[i] + t2[i]) * _RING_S,
                           (-t1[i] - t2[i]) * _RING_S]) for i in range(3)]
        dirs = [bd[i][None] + rad[None] * ring[i] for i in range(3)]
        inv = 1.0 / norm3(dirs, 1e-60)
        dirs = scale3(dirs, inv)
        depths = depth_fn(dirs)                               # (8, ...)
        v, cand = _first_min_pick(depths, dirs)
        take = v < best
        bd = where3(take, cand, bd)
        best = jnp.where(take, v, best)
        rad = jnp.where(take, jnp.minimum(rad * 1.5, rmax), rad * 0.5)
    return best, bd


def snap_polish(depth_fn, depth, d, axes, thresh=0.02):
    """ccd.snap_polish: axes planes (A, ...) — canonicalize tie directions."""
    dots = sum(d[i][None] * axes[i] for i in range(3))        # (A, ...)
    small = jnp.abs(dots) < thresh
    allz = [d[i] - jnp.sum(jnp.where(small, dots * axes[i], 0.0), axis=0)
            for i in range(3)]
    zero_c = [jnp.where(small, d[i][None] - dots * axes[i], d[i][None])
              for i in range(3)]
    near = jnp.abs(dots) > 1.0 - 1e-4
    align_c = [jnp.where(near, jnp.sign(dots) * axes[i], d[i][None])
               for i in range(3)]
    cands = [jnp.concatenate([allz[i][None], zero_c[i], align_c[i]], axis=0)
             for i in range(3)]
    inv = 1.0 / jnp.maximum(norm3(cands, 0.0), 1e-12)
    cands = scale3(cands, inv)
    vals = depth_fn(cands)                                    # (2A+1, ...)
    v = jnp.min(vals, axis=0)
    sel = (vals <= v[None] + 1e-12).astype(d[0].dtype)
    oh = sel * (jnp.cumsum(sel, axis=0) <= 1.0)
    dc = [jnp.sum(oh * cands[i], axis=0) for i in range(3)]
    take = v <= depth + 1e-12
    return jnp.where(take, jnp.minimum(v, depth), depth), where3(take, dc, d)


def pocs(w, clip_a, clip_b, rounds=3):
    """ccd.pocs: alternating projections + Aitken vector extrapolation."""
    ws = [clip_a(clip_b(w))]
    for _ in range(rounds - 1):
        ws.append(clip_a(clip_b(ws[-1])))
    d1 = sub3(ws[-2], ws[-3])
    d2 = sub3(ws[-1], ws[-2])
    rho = jnp.clip(dot3(d1, d2) / jnp.maximum(dot3(d1, d1), 1e-30), 0.0, 0.999)
    w = add3(ws[-1], scale3(d2, rho / (1.0 - rho)))
    return clip_a(clip_b(w))


def witness(n, depth, starts, face_a, face_b, vol_a, vol_b, kappa=3e-7):
    """ccd.witness: two-stage (face-POCS, volume touch refinement) with
    residual-picked routes and earlier-candidate preference."""
    shift = scale3(n, depth - kappa)

    def vol_b_shift(pt):
        return add3(vol_b(sub3(pt, shift)), shift)

    def touch(start):
        return pocs(pocs(start, vol_a, vol_b_shift), vol_a, vol_b_shift)

    def resid(q):
        return norm3(sub3(q, vol_b_shift(q)), 0.0)

    best, best_r = None, None
    for s in starts:
        w_face = pocs(s, face_a, face_b)
        for w2 in (w_face, touch(w_face), touch(s)):
            r2 = resid(w2)
            if best is None:
                best, best_r = w2, r2
            else:
                take = r2 < best_r - 1e-6
                best = where3(take, w2, best)
                best_r = jnp.minimum(best_r, r2)
    return sub3(best, scale3(shift, 0.5))


def manifold_from_perturbed(depth0, n0, depth_p, pos_p, n_p, extra_dist=0.0,
                            margin=0.0, pos0=None):
    """ccd.manifold_from_perturbed: 5-slot manifold with pairwise-greedy
    dedup. depth_p (4, ...); pos_p/n_p planes (4, ...). Returns a list of 5
    slot triples [(d, pos, n)] (plane form, ready for collide_bt)."""
    dtype = pos_p[0].dtype
    valid = depth_p > -margin                                  # (4, ...)
    if pos0 is None:
        wsum = jnp.maximum(jnp.sum(valid.astype(dtype), axis=0), 1.0)
        pos0 = [jnp.sum(jnp.where(valid, pos_p[i], 0.0), axis=0) / wsum
                for i in range(3)]
        any_valid = jnp.any(valid, axis=0)
    else:
        any_valid = depth0 > -margin

    pos = [jnp.concatenate([pos0[i][None], pos_p[i]], axis=0)
           for i in range(3)]                                  # (5, ...)
    nrm = [jnp.concatenate([n0[i][None], n_p[i]], axis=0) for i in range(3)]
    keep0 = jnp.concatenate([any_valid[None], valid], axis=0)  # (5, ...)
    dist_val = -depth0 + extra_dist

    kept = [keep0[0]]
    for k in range(1, 5):
        dup = jnp.zeros_like(keep0[0])
        for j in range(k):
            dd2 = sum((pos[i][k] - pos[i][j]) ** 2 for i in range(3))
            close = jnp.sqrt(dd2) <= _DEDUP
            dup = dup | (kept[j] & close)
        kept.append(keep0[k] & ~dup)

    big = jnp.asarray(1e6, dtype)
    return [(jnp.where(kept[k], dist_val, big),
             [pos[i][k] for i in range(3)],
             [nrm[i][k] for i in range(3)]) for k in range(5)]


# ---------------------------------------------------------------------------------
# cap-box / cyl-box drivers (collision._cap_box_ccd / _cyl_box_ccd, plane form)
# ---------------------------------------------------------------------------------

_BOX_SIGNS = [[-1.0, -1.0, -1.0], [1.0, -1.0, -1.0], [-1.0, 1.0, -1.0],
              [1.0, 1.0, -1.0], [-1.0, -1.0, 1.0], [1.0, -1.0, 1.0],
              [-1.0, 1.0, 1.0], [1.0, 1.0, 1.0]]


def _seg_box_cands(p1, a, halflen, p2, R2, size):
    """The 16 SAT candidate axes shared by cap-box and cyl-box."""
    t = jnp.clip(dot3(sub3(p2, p1), a), -halflen, halflen)
    cols = [col3(R2, j) for j in range(3)]
    cands = [cols[0], cols[1], cols[2], a,
             cross3(cols[0], a), cross3(cols[1], a), cross3(cols[2], a),
             sub3(add3(p1, scale3(a, t)), p2)]
    for sgn in _BOX_SIGNS:
        corner = add3(p2, matvec3(R2, [size[j] * sgn[j] for j in range(3)]))
        tc = jnp.clip(dot3(sub3(corner, p1), a), -halflen, halflen)
        cands.append(sub3(corner, add3(p1, scale3(a, tc))))
    return [jnp.stack([jnp.broadcast_to(v[i], cands[7][i].shape)
                       for v in cands]) for i in range(3)]    # (16, ...)


def _expand(planes, k):
    """Broadcast vector planes to a new leading config axis of size k."""
    return [jnp.broadcast_to(p[None], (k,) + p.shape) for p in planes]


def _expand_mat(R, k):
    return [[jnp.broadcast_to(R[i][j][None], (k,) + R[i][j].shape)
             for j in range(3)] for i in range(3)]


def cap_box_ccd(p1, R1, radius, halflen, p2, R2, size):
    """collision._cap_box_ccd in plane form. Returns 5 slot triples."""
    def depth_fn(d):
        return (supval_cap(d, p1, R1, radius, halflen)
                + supval_box([-d[i] for i in range(3)], p2, R2, size))

    a = col3(R1, 2)
    cands = _seg_box_cands(p1, a, halflen, p2, R2, size)
    d0_depth, d0 = best_axis(depth_fn, cands)
    depth0, n0 = pattern_refine(depth_fn, d0, d0_depth, rounds=16)
    # feature axes [a, R2 col0, col1, col2]; component i of col j is R2[i][j]
    axes0 = [jnp.stack([a[i], R2[i][0], R2[i][1], R2[i][2]]) for i in range(3)]
    depth0, n0 = snap_polish(depth_fn, depth0, n0, axes0)

    Ra, Rb = perturb_rots(n0)                                 # entries (4, ...)
    R1p = matmul3(Ra, _expand_mat(R1, 4))
    R2p = matmul3(Rb, _expand_mat(R2, 4))
    p1e, p2e = _expand(p1, 4), _expand(p2, 4)

    def depth_fn_p(d):
        # d planes: (4, ...) or (k, 4, ...); poses broadcast from (4, ...)
        return (supval_cap(d, p1e, R1p, radius, halflen)
                + supval_box([-d[i] for i in range(3)], p2e, R2p, size))

    n0b = _expand(n0, 4)
    depth_p, n_p = pattern_refine(depth_fn_p, n0b, depth_fn_p(n0b),
                                  rounds=8, r0=8e-3)
    # per-config feature axes [a_p, R2p col0, col1, col2]: (A=4, 4, ...)
    axes_p = [jnp.stack([col3(R1p, 2)[i], R2p[i][0], R2p[i][1], R2p[i][2]],
                        axis=0) for i in range(3)]
    depth_p, n_p = snap_polish(depth_fn_p, depth_p, n_p, axes_p)
    xa = support_cap(n_p, p1e, R1p, radius, halflen)
    xb = support_box([-n_p[i] for i in range(3)], p2e, R2p, size)

    # endpoint bias for tie-degenerate tilts (collision._cap_box_ccd)
    t1b, t2b = tangents(n0)
    axes_t = [jnp.stack([t1b[i], t1b[i], t2b[i], t2b[i]]) for i in range(3)]
    rank = axes_t[0].ndim
    sgn_t = jnp.asarray([1.0, -1.0, 1.0, -1.0],
                        p1[0].dtype).reshape((4,) + (1,) * (rank - 1))
    coef = sgn_t * dot3(axes_t, _expand(a, 4)) * (2.0 * halflen)
    bias = scale3(_expand(a, 4), coef)

    m0 = cap_face(n0, R1)
    b0 = box_face([-n0[i] for i in range(3)], R2, size)
    w0 = pocs(scale3(add3(support_cap(n0, p1, R1, radius, halflen),
                          support_box([-n0[i] for i in range(3)], p2, R2,
                                      size)), 0.5),
              lambda pt: clip_face_cap(pt, p1, R1, radius, halflen,
                                       m0[0], m0[1], n0),
              lambda pt: clip_face_box(pt, p2, R2, size, b0[0], b0[1]))

    mask_ax, sgn_ax = cap_face(n_p, R1p)
    bmask, bsgn = box_face([-n_p[i] for i in range(3)], R2p, size)
    pos_p = witness(
        n_p, depth_p, [add3(scale3(add3(xa, xb), 0.5), bias), _expand(w0, 4)],
        lambda pt: clip_face_cap(pt, p1e, R1p, radius, halflen,
                                 mask_ax, sgn_ax, n_p),
        lambda pt: clip_face_box(pt, p2e, R2p, size, bmask, bsgn),
        lambda pt: clip_into_cap(pt, p1e, R1p, radius, halflen),
        lambda pt: clip_into_box(pt, p2e, R2p, size))
    return manifold_from_perturbed(depth0, n0, depth_p, pos_p, n_p)


def clip_onto_triangle(pt, a, b, c):
    """ccd.clip_onto_triangle in plane form (same region decomposition)."""
    ab, ac, ap = sub3(b, a), sub3(c, a), sub3(pt, a)
    d1 = dot3(ab, ap)
    d2 = dot3(ac, ap)
    bp = sub3(pt, b)
    d3 = dot3(ab, bp)
    d4 = dot3(ac, bp)
    cp = sub3(pt, c)
    d5 = dot3(ab, cp)
    d6 = dot3(ac, cp)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-30)
    v = jnp.clip(vb / denom, 0.0, 1.0)
    w = jnp.clip(vc / denom, 0.0, 1.0)
    inner = add3(a, add3(scale3(ab, v), scale3(ac, w)))
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    p_ab = add3(a, scale3(ab, t_ab))
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    p_ac = add3(a, scale3(ac, t_ac))
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30),
                    0.0, 1.0)
    p_bc = add3(b, scale3(sub3(c, b), t_bc))
    out = inner
    out = where3((vc <= 0) & (d1 >= 0) & (d3 <= 0), p_ab, out)
    out = where3((vb <= 0) & (d2 >= 0) & (d6 <= 0), p_ac, out)
    out = where3((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0), p_bc, out)
    out = where3((d1 <= 0) & (d2 <= 0), a, out)
    out = where3((d3 >= 0) & (d4 <= d3), b, out)
    out = where3((d6 >= 0) & (d5 <= d6), c, out)
    return out


def cyl_box_ccd(p1, R1, radius, halflen, p2, R2, size):
    """collision._cyl_box_ccd in plane form. Returns 5 slot triples."""
    def depth_fn(d):
        return (supval_cyl(d, p1, R1, radius, halflen)
                + supval_box([-d[i] for i in range(3)], p2, R2, size))

    a = col3(R1, 2)
    cands = _seg_box_cands(p1, a, halflen, p2, R2, size)
    d0_depth, d0 = best_axis(depth_fn, cands)
    depth0, n0 = pattern_refine(depth_fn, d0, d0_depth, rounds=16)
    axes0 = [jnp.stack([a[i], R2[i][0], R2[i][1], R2[i][2]]) for i in range(3)]
    depth0, n0 = snap_polish(depth_fn, depth0, n0, axes0)

    Ra, Rb = perturb_rots(n0)
    R1p = matmul3(Ra, _expand_mat(R1, 4))
    R2p = matmul3(Rb, _expand_mat(R2, 4))
    p1e, p2e = _expand(p1, 4), _expand(p2, 4)

    def depth_fn_p(d):
        return (supval_cyl(d, p1e, R1p, radius, halflen)
                + supval_box([-d[i] for i in range(3)], p2e, R2p, size))

    n0b = _expand(n0, 4)
    depth_p, n_p = pattern_refine(depth_fn_p, n0b, depth_fn_p(n0b),
                                  rounds=8, r0=8e-3)
    axes_p = [jnp.stack([col3(R1p, 2)[i], R2p[i][0], R2p[i][1], R2p[i][2]],
                        axis=0) for i in range(3)]
    depth_p, n_p = snap_polish(depth_fn_p, depth_p, n_p, axes_p)
    xa = support_cyl(n_p, p1e, R1p, radius, halflen)
    xb = support_box([-n_p[i] for i in range(3)], p2e, R2p, size)

    t1b, t2b = tangents(n0)
    axes_t = [jnp.stack([t1b[i], t1b[i], t2b[i], t2b[i]]) for i in range(3)]
    rank = axes_t[0].ndim
    sgn_t = jnp.asarray([1.0, -1.0, 1.0, -1.0],
                        p1[0].dtype).reshape((4,) + (1,) * (rank - 1))
    coef = sgn_t * dot3(axes_t, _expand(a, 4)) * (2.0 * halflen)
    bias = scale3(_expand(a, 4), coef)

    m0 = cyl_face(n0, R1)
    b0 = box_face([-n0[i] for i in range(3)], R2, size)
    w0 = pocs(scale3(add3(support_cyl(n0, p1, R1, radius, halflen),
                          support_box([-n0[i] for i in range(3)], p2, R2,
                                      size)), 0.5),
              lambda pt: clip_face_cyl(pt, p1, R1, radius, halflen,
                                       m0[0], m0[1], m0[2], n0),
              lambda pt: clip_face_box(pt, p2, R2, size, b0[0], b0[1]))

    mask_ax, sgn_ax, mask_rad = cyl_face(n_p, R1p)
    bmask, bsgn = box_face([-n_p[i] for i in range(3)], R2p, size)
    pos_p = witness(
        n_p, depth_p, [add3(scale3(add3(xa, xb), 0.5), bias), _expand(w0, 4)],
        lambda pt: clip_face_cyl(pt, p1e, R1p, radius, halflen,
                                 mask_ax, sgn_ax, mask_rad, n_p),
        lambda pt: clip_face_box(pt, p2e, R2p, size, bmask, bsgn),
        lambda pt: clip_into_cyl(pt, p1e, R1p, radius, halflen),
        lambda pt: clip_into_box(pt, p2e, R2p, size))
    return manifold_from_perturbed(depth0, n0, depth_p, pos_p, n_p)
