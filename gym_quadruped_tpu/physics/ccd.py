"""Native-CCD-parity convex contact: support-function SAT + pattern refinement
+ MuJoCo's multiccd perturbation manifold, decoded empirically.

MuJoCo ≥3.2 collides convex pairs (cylinder-box, box-hfield-prism, ...) with
its native CCD pipeline (GJK/EPA + multiccd): ONE penetration direction/depth
per pair, then up to 4 extra manifold points from PERTURBED configurations.
The perturbation rule was decoded against MuJoCo 3.10 by toggling the multiccd
flag on isolated pairs (scripts/probe_multiccd.py / probe_multiccd2.py; the
reference reaches this code via mujoco mj_step, quadruped_env.py:271):

  for each tangent axis t in {t1, t2} of the contact frame and sign s in {+,-}:
    rotate geom A by R(t, -s*eps) about A's center,
           geom B by R(t, +s*eps) about B's center   (eps = 1e-3 rad),
    re-run single-contact CCD on the perturbed pair,
    report its witness midpoint with the SHARED unperturbed depth.
  contacts closer than a dedup tolerance to an earlier one are dropped.

Scored over the b2 worst-step self-collision pairs: this rule reproduces the
enabled-multiccd manifold to median 5.6e-5 / p90 7.5e-5 m, vs ~1e-2 for every
single-geom-rotation variant. The unperturbed contact's own position (EPA's
interior witness) is approximated by the mean of the 4 perturbed witnesses
(~1e-3 agreement, the EPA witness is a barycentric interior point we don't
reproduce exactly).

All stages are evaluated BATCHED (leading axes of `d`): every stage is a
handful of tensor ops, not per-direction op chains — XLA compile time and TPU
runtime both depend on it. Support/clip helpers broadcast over arbitrary
leading dims of `d`, and accept poses (p, R) with leading dims that broadcast
against them (perturbed-config stacks pass R of shape (4, 1, 3, 3) against
d of shape (4, m, 3)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS_PERTURB = 1e-3    # multiccd perturbation angle (decoded, see module doc)
_DEDUP = 5e-5         # manifold dedup tolerance. mj's own bracket straddles
                      # ~1e-4 (drops 7.2e-5, keeps 9.6e-5 across cases) but its
                      # internal perturbed witnesses carry ~5e-5 EPA noise vs
                      # ours; 5e-5 scored best on the validation set (keeping a
                      # near-duplicate beats collapsing a manifold MuJoCo kept)


def tangents(n):
    """Orthonormal tangent pair for unit normals n (..., 3), branch-free."""
    use_z = jnp.abs(n[..., 2:3]) < 0.99
    ref = jnp.where(use_z, jnp.asarray([0.0, 0.0, 1.0], n.dtype),
                    jnp.asarray([1.0, 0.0, 0.0], n.dtype))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(
        jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-30)
    t2 = jnp.cross(n, t1)
    return t1, t2


def axis_angle(axis, ang):
    """Rotation matrices (..., 3, 3) about unit axes (..., 3) by ang (...,)."""
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c, s = jnp.cos(ang), jnp.sin(ang)
    C = 1.0 - c
    R = jnp.stack([
        jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], -1),
        jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], -1),
        jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], -1),
    ], -2)
    return R


def perturb_rots(n, eps=EPS_PERTURB):
    """The 4 multiccd perturbations for contact normal n (..., 3).

    Returns (Ra, Rb), each (..., 4, 3, 3): apply Ra[k] to geom A's orientation
    (about A's center) and Rb[k] to geom B's (about B's center)."""
    t1, t2 = tangents(n)
    axes = jnp.stack([t1, t1, t2, t2], axis=-2)               # (..., 4, 3)
    sgn = jnp.asarray([1.0, -1.0, 1.0, -1.0], n.dtype)
    shape = n.shape[:-1] + (4,)
    ang = jnp.broadcast_to(sgn, shape) * eps
    return axis_angle(axes, -ang), axis_angle(axes, ang)


# ---------------------------------------------------------------------------------
# support functions — d (..., 3); poses p (..., 3) / R (..., 3, 3) broadcast
# against d's leading dims
# ---------------------------------------------------------------------------------

def _dotR(d, R):
    """d @ R with broadcastable leading dims (world dir -> local)."""
    return jnp.matmul(d[..., None, :], R)[..., 0, :]


def _dotRT(v, R):
    """v @ R.T with broadcastable leading dims (local vec -> world)."""
    return jnp.matmul(R, v[..., None])[..., 0]


def support_box(d, p, R, size):
    dl = _dotR(d, R)
    return p + _dotRT(jnp.where(dl >= 0, size, -size), R)


def support_cyl(d, p, R, radius, halflen):
    a = R[..., :, 2]
    da = jnp.sum(d * a, -1)
    radial = d - da[..., None] * a
    nr = jnp.linalg.norm(radial, axis=-1, keepdims=True)
    rdir = jnp.where(nr > 1e-12, radial / jnp.maximum(nr, 1e-12), 0.0)
    return p + jnp.sign(da)[..., None] * halflen * a + radius * rdir


def support_cap(d, p, R, radius, halflen):
    a = R[..., :, 2]
    da = jnp.sum(d * a, -1)
    return p + jnp.sign(da)[..., None] * halflen * a + radius * d


def support_verts(d, verts):
    """Support of a polytope given as (..., V, 3) vertices; d is (..., 3) with
    broadcastable leading dims. Ties (face-aligned d) return the centroid of
    the extreme face — a stable interior witness."""
    vals = jnp.sum(d[..., None, :] * verts, -1)              # (..., V)
    w = (vals >= jnp.max(vals, axis=-1, keepdims=True) - 1e-12)
    w = w.astype(d.dtype)
    return jnp.sum(w[..., None] * verts, -2) / jnp.maximum(
        jnp.sum(w, axis=-1, keepdims=True), 1.0)


# support VALUES (max of d.x over the geom) — all the SAT/refine stages need;
# cheaper than materializing support points
def supval_box(d, p, R, size):
    return jnp.sum(d * p, -1) + jnp.abs(_dotR(d, R)) @ size


def supval_cyl(d, p, R, radius, halflen):
    a = R[..., :, 2]
    da = jnp.sum(d * a, -1)
    return jnp.sum(d * p, -1) + halflen * jnp.abs(da) + radius * \
        jnp.linalg.norm(d - da[..., None] * a, axis=-1)


def supval_cap(d, p, R, radius, halflen):
    a = R[..., :, 2]
    return jnp.sum(d * p, -1) + halflen * jnp.abs(jnp.sum(d * a, -1)) + radius


def supval_verts(d, verts):
    return jnp.max(jnp.sum(d[..., None, :] * verts, -1), -1)


# ---------------------------------------------------------------------------------
# clip helpers (witness selection) — pt (..., 3); poses broadcast like supports
# ---------------------------------------------------------------------------------

def clip_into_box(pt, p, R, size):
    l = jnp.clip(_dotR(pt - p, R), -size, size)
    return p + _dotRT(l, R)


def clip_into_cyl(pt, p, R, radius, halflen):
    a = R[..., :, 2]
    rel = pt - p
    ax = jnp.clip(jnp.sum(rel * a, -1), -halflen, halflen)
    rad = rel - jnp.sum(rel * a, -1)[..., None] * a
    rn = jnp.linalg.norm(rad, axis=-1, keepdims=True)
    rad = rad * (jnp.minimum(rn, radius) / jnp.maximum(rn, 1e-12))
    return p + ax[..., None] * a + rad


def clip_into_cap(pt, p, R, radius, halflen):
    a = R[..., :, 2]
    rel = pt - p
    ax = jnp.clip(jnp.sum(rel * a, -1), -halflen, halflen)
    axis_pt = p + ax[..., None] * a
    off = pt - axis_pt
    on = jnp.linalg.norm(off, axis=-1, keepdims=True)
    return axis_pt + off * (jnp.minimum(on, radius) / jnp.maximum(on, 1e-12))

def clip_into_hull(pt, verts, iters=12):
    """Project pt (..., 3) into the convex hull of verts (..., V, 3) by
    Frank-Wolfe with exact line search on ||pt - x||²: each step moves toward
    the support vertex along the residual. Interior points are fixed points
    (their projection is themselves), so this composes with the POCS/witness
    machinery exactly like the closed-form clip_into_box/cyl do; boundary
    projections converge to sub-1e-4 of the hull diameter within `iters`
    (measured on the shipped foot/shin hulls)."""
    x = jnp.broadcast_to(jnp.mean(verts, axis=-2), pt.shape)

    def body(_, x):
        g = pt - x
        s = support_verts(g, verts)
        d = s - x
        gamma = jnp.clip(
            jnp.sum(g * d, -1) / jnp.maximum(jnp.sum(d * d, -1), 1e-30),
            0.0, 1.0)
        return x + gamma[..., None] * d

    # fori_loop, not an unrolled Python loop: clip_into_hull is instantiated
    # dozens of times inside the witness/POCS machinery and an unrolled body
    # blows up trace/compile time
    return jax.lax.fori_loop(0, iters, body, x)


def hull_face(d, verts, tol=1e-6):
    """Top-3 support vertices of the hull along d — the support feature
    triangle (vertex / edge / face; dense hulls have no wider flats at the
    refine resolution). Slots not within tol of the max support value
    replicate the best vertex. d (3,), verts (V, 3) → (3, 3)."""
    vals = verts @ d
    best = jnp.max(vals)
    out, v = [], vals
    for _ in range(3):
        i = jnp.argmax(v)
        out.append((verts[i], vals[i]))
        v = v - jnp.where(jnp.arange(v.shape[0]) == i, jnp.inf, 0.0)
    pts = jnp.stack([p for p, _ in out])
    ok = jnp.stack([val >= best - tol for _, val in out])
    return jnp.where(ok[:, None], pts, pts[0][None])


_FACE_TOL = 2.5e-4   # support-face tie tolerance (between the multiccd tilt
                     # signal ~1e-3 and the snap-polished refine resolution)


def clip_face_box(pt, p, R, size, mask, sgn):
    """Project pt onto a support FACE of the box: box-frame coordinates where
    `mask` is set are pinned to sgn*size, others clamped into the box. The
    (mask, sgn) lattice face is decided ONCE from the canonical unperturbed
    direction (see box_face of the caller) and reused for the perturbed
    configs — the perturbation tilts the geometry, not the contact feature."""
    q = _dotR(pt - p, R)
    pinned = jnp.where(mask, sgn * size, jnp.clip(q, -size, size))
    return p + _dotRT(pinned, R)


def box_face(d, R, size, tol=_FACE_TOL):
    """(mask, sgn) of the box support face along direction d."""
    dl = _dotR(d, R)
    return jnp.abs(dl) > tol, jnp.sign(dl)


def clip_face_cyl(pt, p, R, radius, halflen, mask_ax, sgn_ax, mask_rad, d):
    """Project pt onto a support face of the cylinder: axial coordinate pinned
    to sgn_ax*halflen when mask_ax, radial pinned to the rim in d's radial
    direction when mask_rad. Masks decided once from the canonical direction;
    d is the per-config direction (the rim point rotates with it)."""
    a = R[..., :, 2]
    da = jnp.sum(d * a, -1)
    rel = pt - p
    ax = jnp.where(mask_ax, sgn_ax * halflen,
                   jnp.clip(jnp.sum(rel * a, -1), -halflen, halflen))
    dperp = d - da[..., None] * a
    npr = jnp.linalg.norm(dperp, axis=-1, keepdims=True)
    rad_pin = radius * dperp / jnp.maximum(npr, 1e-12)
    rperp = rel - jnp.sum(rel * a, -1)[..., None] * a
    rn = jnp.linalg.norm(rperp, axis=-1, keepdims=True)
    rad_free = rperp * (jnp.minimum(rn, radius) / jnp.maximum(rn, 1e-12))
    rad = jnp.where(mask_rad, rad_pin, rad_free)
    return p + ax[..., None] * a + rad


def cyl_face(d, R, tol=_FACE_TOL):
    """(mask_ax, sgn_ax, mask_rad) of the cylinder support face along d."""
    a = R[..., :, 2]
    da = jnp.sum(d * a, -1)
    npr = jnp.linalg.norm(d - da[..., None] * a, axis=-1, keepdims=True)
    return jnp.abs(da) > tol, jnp.sign(da), npr > tol




def clip_onto_triangle(pt, a, b, c):
    """Closest point on triangle (a, b, c) to pt; all (..., 3), branch-free
    (barycentric clamp via the standard region decomposition)."""
    ab, ac, ap = b - a, c - a, pt - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = pt - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = pt - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-30)
    v = jnp.clip(vb / denom, 0.0, 1.0)
    w = jnp.clip(vc / denom, 0.0, 1.0)
    inner = a + v[..., None] * ab + w[..., None] * ac
    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    p_ab = a + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    p_ac = a + t_ac[..., None] * ac
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30),
                    0.0, 1.0)
    p_bc = b + t_bc[..., None] * (c - b)
    out = inner
    out = jnp.where((vc <= 0)[..., None] & (d1 >= 0)[..., None]
                    & (d3 <= 0)[..., None], p_ab, out)
    out = jnp.where((vb <= 0)[..., None] & (d2 >= 0)[..., None]
                    & (d6 <= 0)[..., None], p_ac, out)
    out = jnp.where((va <= 0)[..., None] & ((d4 - d3) >= 0)[..., None]
                    & ((d5 - d6) >= 0)[..., None], p_bc, out)
    out = jnp.where((d1 <= 0)[..., None] & (d2 <= 0)[..., None], a, out)
    out = jnp.where((d3 >= 0)[..., None] & (d4 <= d3)[..., None], b, out)
    out = jnp.where((d6 >= 0)[..., None] & (d5 <= d6)[..., None], c, out)
    return out


def pocs(w, clip_a, clip_b, rounds=3):
    """Alternating projections + Aitken vector extrapolation (the two sets
    are (near-)affine, so the error decays geometrically along one mode and
    the extrapolation recovers the limit even for nearly-parallel sets)."""
    ws = [clip_a(clip_b(w))]
    for _ in range(rounds - 1):
        ws.append(clip_a(clip_b(ws[-1])))
    d1, d2 = ws[-2] - ws[-3], ws[-1] - ws[-2]
    rho = jnp.clip(
        jnp.sum(d1 * d2, -1) / jnp.maximum(jnp.sum(d1 * d1, -1), 1e-30),
        0.0, 0.999)
    w = ws[-1] + d2 * (rho / (1.0 - rho))[..., None]
    return clip_a(clip_b(w))


_pocs = pocs


def witness(n, depth, starts, face_a, face_b, vol_a, vol_b, kappa=3e-7):
    """Contact position for one (possibly perturbed) config.

    starts: list of candidate start points (each broadcastable to (..., 3));
    face_a/face_b project onto the support FACE along n (tie lattice per
    config — see box_face/cyl_face); vol_a/vol_b project into the geom
    VOLUMES.

    Each start runs two stages. (1) face-POCS: the EPA witness ⟂ n lies in
    the intersection of the two support faces; exact when that intersection
    is where the bodies actually kiss (faces, lines on faces, vertices).
    (2) touch-point refinement: the witness pair (x1, x2) satisfies
    x1 - x2 = depth*n with x1 the point where A and B-translated-by-depth*n
    touch — volume-POCS pulls cases where a pinned support face sits away
    from the true overlap (line-edge crossings: a rim end can be centimeters
    from the touch point). The translation keeps a kappa-thin lens of overlap
    so the sets aren't exactly tangent (POCS on tangent bodies converges
    sublinearly). The refined candidate with the smallest touch residual
    wins; earlier candidates get a 1e-6 preference (on near-parallel kisses
    the residual barely discriminates and the first start encodes the
    correct feature).
    Returns the witness-pair midpoint, which is what MuJoCo reports."""
    shift = (depth - kappa)[..., None] * n

    def vol_b_shift(pt):
        return vol_b(pt - shift) + shift

    def touch(start):
        # two accelerated sweeps: one Aitken hop from a far start lands
        # partway on curved sets
        return _pocs(_pocs(start, vol_a, vol_b_shift), vol_a, vol_b_shift)

    def resid(q):
        return jnp.linalg.norm(q - vol_b_shift(q), axis=-1)

    best = None
    shape = jnp.broadcast_shapes(n.shape, *[jnp.shape(s) for s in starts])
    for s in starts:
        s = jnp.broadcast_to(s, shape)
        # three routes per start, residual-picked with earlier preference:
        # the RAW face-lattice point (wins exact-tie degeneracies, where the
        # touch stage would drift off the EPA-style endpoint), the touched
        # face point (extended-feature kisses), and the touched raw start
        # (features absent from this config's lattice — e.g. a shared grid
        # vertex against a prism whose triangle extends toward a far corner)
        w_face = _pocs(s, face_a, face_b)
        for w2 in (w_face, touch(w_face), touch(s)):
            r2 = resid(w2)
            if best is None:
                best, best_r = w2, r2
            else:
                take = r2 < best_r - 1e-6
                best = jnp.where(take[..., None], w2, best)
                best_r = jnp.minimum(best_r, r2)
    return best - 0.5 * shift


# ---------------------------------------------------------------------------------
# SAT + pattern refinement (depth_fn takes (..., 3) dirs -> (...,) depths)
# ---------------------------------------------------------------------------------

def best_axis(depth_fn, cands):
    """Minimum-depth unit direction over (..., N, 3) candidate axes (both
    signs tried in ONE batched evaluation). Degenerate (near-zero) candidates
    are skipped. Returns (depth (...,), dir (..., 3))."""
    nrm = jnp.linalg.norm(cands, axis=-1, keepdims=True)
    units = cands / jnp.maximum(nrm, 1e-12)
    dirs = jnp.concatenate([units, -units], axis=-2)          # (..., 2N, 3)
    depths = depth_fn(dirs)                                   # (..., 2N)
    ok = jnp.concatenate([nrm, nrm], axis=-2)[..., 0] > 1e-9
    depths = jnp.where(ok, depths, jnp.inf)
    best = jnp.min(depths, axis=-1)
    sel = (depths <= best[..., None]).astype(cands.dtype)
    oh = sel * (jnp.cumsum(sel, axis=-1) <= 1.0)
    d = jnp.einsum('...n,...nk->...k', oh, dirs)
    return best, d


def pattern_refine(depth_fn, d0, depth0, rounds=10, r0=0.35, rmax=None):
    """Pattern search minimizing depth over the unit sphere. Each round
    evaluates 8 ring directions in ONE batched call; the radius expands x1.5
    on improvement (narrow curved valleys need sustained steps — without
    expansion the search stalls ~0.02 rad short on corner-vs-side-line
    contacts) and halves on failure. Fixed iteration count."""
    best, bd = depth0, d0
    rad = jnp.full(d0.shape[:-1], r0, d0.dtype)
    rmax = r0 if rmax is None else rmax
    s = 0.70710678
    for _ in range(rounds):
        t1, t2 = tangents(bd)
        ring = jnp.stack([t1, -t1, t2, -t2, (t1 + t2) * s, (t1 - t2) * s,
                          (-t1 + t2) * s, (-t1 - t2) * s], axis=-2)
        dirs = bd[..., None, :] + rad[..., None, None] * ring   # (..., 8, 3)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        depths = depth_fn(dirs)                                 # (..., 8)
        v = jnp.min(depths, axis=-1)
        sel = (depths <= v[..., None]).astype(d0.dtype)
        oh = sel * (jnp.cumsum(sel, axis=-1) <= 1.0)
        cand = jnp.einsum('...n,...nk->...k', oh, dirs)
        take = v < best
        bd = jnp.where(take[..., None], cand, bd)
        best = jnp.where(take, v, best)
        rad = jnp.where(take, jnp.minimum(rad * 1.5, rmax), rad * 0.5)
    return best, bd


def clip_face_cap(pt, p, R, radius, halflen, mask_ax, sgn_ax, d):
    """Project pt onto a support face of the capsule along d: the sphere
    offset radius*d from the (pinned or clamped) axis point. The capsule is
    smooth except along its axis, so only the axial tie matters."""
    a = R[..., :, 2]
    da = jnp.sum(d * a, -1)
    t = jnp.sum((pt - p) * a, -1) - radius * da   # axis point beneath pt
    ax = jnp.where(mask_ax, sgn_ax * halflen,
                   jnp.clip(t, -halflen, halflen))
    return p + ax[..., None] * a + radius * d


def cap_face(d, R, tol=_FACE_TOL):
    """(mask_ax, sgn_ax) of the capsule support face along d."""
    a = R[..., :, 2]
    da = jnp.sum(d * a, -1)
    return jnp.abs(da) > tol, jnp.sign(da)


def snap_polish(depth_fn, depth, d, axes, thresh=0.02):
    """Canonicalize a refined direction onto the tie manifold it approximates.

    axes (..., A, 3): unit feature axes of the pair (cylinder axis, box
    columns, prism normals...). Candidates: d with each near-zero axis
    component zeroed (side-line optima are EXACTLY ⟂ their feature axis), all
    near-zero components zeroed together, and d aligned to a near-parallel
    axis (face optima are exactly the face normal). A candidate is taken when
    its depth is no worse than +1e-12 — flat tie valleys accept the canonical
    point, genuine small-angle optima reject it (a multiccd tilt's optimum
    beats its zeroed version by ~eps^2*R/2 ~ 5e-8, so the margin must sit
    well below that — 1e-9 was wrongly absorbing genuine tilts). Without this, residual refine noise (~1e-3 rad on nonsmooth line-line
    valleys) makes clip_face_* mis-pin witnesses to far rim/corner features.
    Returns (depth, d)."""
    dots = jnp.sum(d[..., None, :] * axes, -1)                 # (..., A)
    small = (jnp.abs(dots) < thresh)[..., None]
    allz = d - jnp.sum(jnp.where(small, dots[..., None] * axes, 0.0), -2)
    zero_c = jnp.where(small, d[..., None, :] - dots[..., None] * axes,
                       d[..., None, :])
    near = (jnp.abs(dots) > 1.0 - 1e-4)[..., None]
    align_c = jnp.where(near, jnp.sign(dots)[..., None] * axes,
                        d[..., None, :])
    cands = jnp.concatenate([allz[..., None, :], zero_c, align_c], -2)
    cands = cands / jnp.maximum(
        jnp.linalg.norm(cands, axis=-1, keepdims=True), 1e-12)
    vals = depth_fn(cands)                                     # (..., C)
    v = jnp.min(vals, -1)
    sel = (vals <= v[..., None] + 1e-12).astype(d.dtype)
    oh = sel * (jnp.cumsum(sel, axis=-1) <= 1.0)
    dc = jnp.einsum('...n,...nk->...k', oh, cands)
    take = v <= depth + 1e-12
    return (jnp.where(take, jnp.minimum(v, depth), depth),
            jnp.where(take[..., None], dc, d))


# ---------------------------------------------------------------------------------
# multiccd manifold assembly
# ---------------------------------------------------------------------------------

def manifold_from_perturbed(depth0, n0, depth_p, pos_p, n_p, extra_dist=0.0,
                            margin=0.0, pos0=None):
    """Assemble the 5-slot multiccd manifold from the 4 perturbed re-solves.

    depth0 (...,) / n0 (..., 3): unperturbed penetration depth (>0 =
    penetrating) and direction.
    depth_p (..., 4): perturbed penetration depths (contact k exists only if
    its perturbed config still penetrates — MuJoCo's perturbed GJK finds
    nothing otherwise, observed in the probes). With `margin` > 0 the
    existence test is depth > -margin: mj emits manifolds for separations
    inside the margin shell (hyqreal1 meshes carry margin=1e-3; observed
    positive-dist manifolds in probe_mesh_manifold4.py).
    pos_p (..., 4, 3) / n_p (..., 4, 3): perturbed witness midpoints/normals.

    Contact 0: by default the mean of the valid perturbed witnesses
    (EPA-interior-witness approximation, validated for cyl-box); pass `pos0`
    to use an explicit EPA-witness estimate instead — for hull-hull the POCS
    witness lands ON the deepest vertex for vertex-type contacts, so it
    dedups against that vertex's perturbed contact exactly like MuJoCo's
    does (probe_mesh_manifold3/4.py). Normal = n0. All 5 share
    dist = -depth0 + extra_dist. Dedup: contact k dropped if within _DEDUP
    of any earlier kept contact (pairwise-greedy, matches mj observations).
    Returns (dist (..., 5), pos (..., 5, 3), n (..., 5, 3)); dropped slots
    dist=+1e6.
    """
    dtype = pos_p.dtype
    valid = depth_p > -margin                                  # (..., 4)
    if pos0 is None:
        wsum = jnp.maximum(jnp.sum(valid.astype(dtype), -1), 1.0)
        pos0 = jnp.sum(jnp.where(valid[..., None], pos_p, 0.0), -2) / \
            wsum[..., None]
        any_valid = jnp.any(valid, -1)
    else:
        any_valid = depth0 > -margin

    pos = jnp.concatenate([pos0[..., None, :], pos_p], axis=-2)  # (..., 5, 3)
    nrm = jnp.concatenate([n0[..., None, :], n_p], axis=-2)
    keep = jnp.concatenate([any_valid[..., None], valid], axis=-1)
    dist = jnp.where(keep, -depth0[..., None] + extra_dist, 1e6)

    # pairwise-greedy dedup (static 5-unroll)
    kept = [keep[..., 0]]
    for k in range(1, 5):
        dup = jnp.zeros_like(keep[..., 0])
        for j in range(k):
            close = jnp.linalg.norm(
                pos[..., k, :] - pos[..., j, :], axis=-1) <= _DEDUP
            dup = dup | (kept[j] & close)
        kept.append(keep[..., k] & ~dup)
    dist = jnp.where(jnp.stack(kept, -1), dist, 1e6)
    return dist, pos, nrm
