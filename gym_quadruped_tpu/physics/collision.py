"""Narrow-phase collision: robot primitives vs world geoms, fixed contact slots.

Replaces MuJoCo's mj_collision stage. The candidate pair list is static
(Model.contact_pairs, computed at build time from contype/conaffinity — SURVEY.md §7
hard part (b)): every pair owns a fixed number of contact slots, each always computed
and masked by `dist < margin`, so shapes are static under jit/vmap.

Conventions match MuJoCo: contact normal points from geom1 (world) to geom2 (robot);
`dist` is the signed surface separation (negative = penetration); `pos` is the
midpoint; `frame` rows are (normal, tangent1, tangent2) with MuJoCo's mju_makeNormal
tangent construction (pyramidal-cone parity requires the exact tangent basis).

Supported pairs: {sphere, capsule} × {plane, box, hfield}, box×plane,
cylinder×plane, and mesh convex hulls vs {plane, hfield, sphere, mesh} —
hyqreal1/mini_cheetah collide through meshes in the reference. Feet are
spheres (go2.xml:113, mini_cheetah.xml:78); mesh-vs-box world pairs are not
yet collided (no shipped robot/scene reaches one: box scenes pair with
primitive-bodied robots).
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
    GEOM_MESH,
    GEOM_PLANE,
    GEOM_SPHERE,
    Model,
)
from gym_quadruped_tpu.physics import ccd


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
    # pair margin is the SUM of both geoms' margins, not the max — verified
    # empirically (spheres with margins 1+3 mm first touch at 4 mm and report
    # includemargin 0.004) and via the margin threshold inside disassembled
    # mjc_PlaneConvex. Shipped robots have zero-margin floors, so world pairs
    # are unaffected; self-collision pairs of margin-carrying robots (go2,
    # go1, hyqreal1) activate at the summed shell.
    margin = float(m.geom_margin[g1]) + float(m.geom_margin[g2])
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


# hfield convex pipeline (box/cylinder vs prisms): top-K deepest prisms each
# emit ONE contact. MuJoCo collides EVERY overlapped prism and reports a
# single CCD contact per prism — multiccd does NOT apply to hfield pairs
# (verified by toggling the flag on an isolated hfield-box model: identical
# output, including EXACT duplicate contacts at shared cell features). K=8
# covers the footprints of the shipped trunks at the measured cell sizes.
_HF_CONVEX_K = 8

_NCON_TABLE = {
    # world (geom1) vs robot (geom2) — geom1 order follows the world geom
    (GEOM_PLANE, GEOM_MESH): 3,
    (GEOM_PLANE, GEOM_SPHERE): 1,
    (GEOM_PLANE, GEOM_CAPSULE): 2,
    (GEOM_PLANE, GEOM_BOX): 4,
    (GEOM_PLANE, GEOM_CYLINDER): 3,
    (GEOM_BOX, GEOM_SPHERE): 1,
    (GEOM_BOX, GEOM_CAPSULE): 5,
    (GEOM_HFIELD, GEOM_SPHERE): 8,
    (GEOM_HFIELD, GEOM_CAPSULE): 16 + 5,
    (GEOM_HFIELD, GEOM_BOX): _HF_CONVEX_K + 4,
    (GEOM_HFIELD, GEOM_CYLINDER): _HF_CONVEX_K + 4,
    (GEOM_HFIELD, GEOM_MESH): _HF_CONVEX_K + 4,
    # box vs convex mesh hull: the box rides the SAME decoded hull-hull
    # multiccd pipeline as mesh-mesh, as its own 8-corner hull (MuJoCo's
    # nativeccd reaches box-mesh through the identical convex path) — this is
    # the pair that lets mesh-bodied robots (mini_cheetah, hyqreal1) run on
    # box scenes (stairs/ramp/random_boxes; VERDICT r4 missing #1)
    (GEOM_BOX, GEOM_MESH): 5,
    # robot-robot (self-collision) pairs, stored with type1 ≤ type2
    (GEOM_SPHERE, GEOM_SPHERE): 1,
    (GEOM_SPHERE, GEOM_CAPSULE): 1,
    (GEOM_SPHERE, GEOM_CYLINDER): 1,
    (GEOM_SPHERE, GEOM_BOX): 1,
    (GEOM_CAPSULE, GEOM_CAPSULE): 1,
    (GEOM_CAPSULE, GEOM_CYLINDER): 1,
    (GEOM_CAPSULE, GEOM_BOX): 5,
    (GEOM_CYLINDER, GEOM_CYLINDER): 1,
    (GEOM_CYLINDER, GEOM_BOX): 5,
    (GEOM_BOX, GEOM_BOX): 4,
    (GEOM_SPHERE, GEOM_MESH): 1,
    (GEOM_MESH, GEOM_MESH): 5,
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
        for g, t in ((g1, t1), (g2, t2)):
            if t == GEOM_MESH and (m.geom_dataid.size == 0
                                   or int(m.geom_dataid[g]) < 0):
                ncon = None  # mesh pair without hull data (older archives)
        if ncon is None:
            continue
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
    # collision_bt._SubsetModel narrows the pair list to one type group for
    # its per-group fallback path
    override = getattr(m, '_layout_override', None)
    if override is not None:
        return override
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


def _deepest_k(d, pos, n, k):
    """Select the k smallest-dist candidates from (c,), (c, 3), (c, 3) —
    branch-free iterative min extraction. jax.lax.top_k lowers to a full sort,
    which is pathologically slow replicated over hundreds of pairs × 4096
    envs; k masked-min passes are pure VPU work."""
    ds, ps, ns = [], [], []
    big = jnp.asarray(1e9, d.dtype)
    for _ in range(k):
        dmin = jnp.min(d)
        is_min = (d == dmin).astype(d.dtype)
        first = jnp.where(jnp.cumsum(is_min) * is_min == 1.0, 1.0, 0.0)
        ds.append(dmin)
        ps.append(jnp.sum(first[:, None] * pos, axis=0))
        ns.append(jnp.sum(first[:, None] * n, axis=0))
        d = d + first * big
    return jnp.stack(ds), jnp.stack(ps), jnp.stack(ns)


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
    d4, c4, _ = _deepest_k(depths, corners,
                           jnp.broadcast_to(n, corners.shape), 4)
    pos = c4 - 0.5 * d4[:, None] * n[None, :]
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


def _plane_mesh(ppos, pmat, gpos, gmat, verts, nbr, nvert, rbound, margin):
    """Plane vs convex mesh hull: MuJoCo's mjc_PlaneConvex, decoded from the
    libmujoco 3.10 disassembly and verified to 1e-16 on 658 random tumbling
    poses of hyqreal1 + mini_cheetah (scripts/probe_plane_mesh10.py):

      con0 = support vertex along -n, pos shifted to half depth
      extras = hull-graph NEIGHBORS of the support vertex, in adjacency-list
               order, accepted iff their plane dist < margin AND their 3-D
               distance to con0.pos (the SHIFTED point) >= 0.3 * rbound
      cap: 3 contacts per pair

    verts (Vmax, 3) hull vertices in the geom frame (pad rows arbitrary),
    nbr (Vmax, D) adjacency table (-1 padded), nvert scalar, rbound/margin
    scalars. Anchor: the reference reaches this collider through mj_step
    (quadruped_env.py:271) for hyqreal1/mini_cheetah's mesh geoms.
    """
    dtype = ppos.dtype
    n = pmat[:, 2]
    big = jnp.asarray(1e9, dtype)
    W = verts @ gmat.T + gpos[None]                      # (V, 3)
    pad = jnp.arange(verts.shape[0]) >= nvert
    d = jnp.where(pad, big, W @ n - jnp.dot(n, ppos))    # (V,)
    i0 = jnp.argmin(d)
    dist0 = d[i0]
    pos0 = W[i0] - 0.5 * dist0 * n

    cand = nbr[i0]                                       # (D,)
    safe = jnp.maximum(cand, 0)
    dc = d[safe]
    Wc = W[safe]
    far = jnp.linalg.norm(Wc - pos0[None], axis=1) >= 0.3 * rbound
    valid = (cand >= 0) & (dc < margin) & far
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1       # order among valid
    dists, poss = [dist0], [pos0]
    for k in range(2):
        sel = (valid & (rank == k)).astype(dtype)
        got = jnp.sum(sel) > 0
        dk = jnp.sum(sel * dc)
        pk = jnp.sum(sel[:, None] * Wc, axis=0) - 0.5 * dk * n
        dists.append(jnp.where(got, dk, big))
        poss.append(jnp.where(got, pk, pos0))
    return jnp.stack(dists), jnp.stack(poss), jnp.broadcast_to(n, (3, 3))


def _top3_feature(W, vals, tol):
    """Top-3 support verts of hull W (V, 3) by vals (V,); slots not within
    tol of the max replicate the best vertex. Returns (3, 3)."""
    out, best = [], jnp.max(vals)
    v = vals
    for _ in range(3):
        i = jnp.argmax(v)
        out.append((W[i], v[i]))
        v = v - jnp.where(jnp.arange(v.shape[0]) == i, jnp.inf, 0.0)
    pts = jnp.stack([p for p, _ in out])
    ok = jnp.stack([val >= best - tol for _, val in out])
    return jnp.where(ok[:, None], pts, pts[0][None])


def _feature_tangent(f1, f2, rounds=8):
    """Alternating projections between two support-feature triangles; returns
    the (unlifted) tangential witness point."""
    w = f1[0]
    for _ in range(rounds):
        w = ccd.clip_onto_triangle(w, f1[0], f1[1], f1[2])
        w = ccd.clip_onto_triangle(w, f2[0], f2[1], f2[2])
    return w


def _hull_hull_witness(W1, W2, n, tol=1e-5, rounds=8):
    """Witness point for a hull-hull contact along unit direction n
    (depth_fn = sup1(n) + sup2(-n)): alternating projections between the two
    support features (top-3 verts each side — dense hulls make every contact
    vertex-face / edge-edge scale), lifted midway between the support planes.
    For vertex-face this lands exactly on EPA's witness (the vertex at half
    depth); the multi-point face manifold MuJoCo emits is reproduced by
    _mesh_mesh's perturbed re-solves."""
    f1 = _top3_feature(W1, W1 @ n, tol)
    f2 = _top3_feature(W2, W2 @ (-n), tol)
    s1 = jnp.max(W1 @ n)                  # geom1's support plane: n.x = s1
    s2 = -jnp.max(W2 @ (-n))              # geom2's support plane: n.x = s2
    w = _feature_tangent(f1, f2, rounds)
    return w + (0.5 * (s1 + s2) - jnp.dot(w, n)) * n


def _mesh_mesh(p1, R1, W1l, n1, p2, R2, W2l, n2, margin):
    """Convex hull vs convex hull with MuJoCo's 5-slot multi-contact manifold.

    Depth/normal: support-SAT + pattern refinement (matches mj nativeccd EPA
    at ~5e-5 med / 1e-6 cos on hyqreal1's folded-leg poses —
    scripts/probes/probe_mesh_self2.py). Manifold: mj 3.10 emits 2-5
    IDENTICAL-dist contacts per folded-leg hull pair, sitting at support
    vertices of the vertex-side hull shifted half-depth along n (decoded in
    scripts/probes/probe_mesh_manifold{2,3,4}.py: the selection matches the
    same ±1e-3 rad relative-tilt re-solve rule decoded for cyl-box — a
    vertex is picked when its support gap / distance-along-face ratio is
    under the 2e-3 relative tilt). Contact 0 is the POCS hull witness (the
    EPA-witness equivalent): for vertex-type contacts it lands ON the
    deepest vertex and dedups, for edge/face-type it survives as the
    interior contact — reproducing mj's observed counts. Validity is
    margin-aware (hyqreal1 meshes carry margin=1e-3; mj emits manifolds in
    the margin shell). W*l: (Vmax, 3) hull verts in the geom frame (pads are
    interior points, harmless under support)."""
    W1 = W1l @ R1.T + p1[None]
    W2 = W2l @ R2.T + p2[None]

    def depth_fn(d):
        return ccd.supval_verts(d, W1) + ccd.supval_verts(-d, W2)

    d0s = jnp.stack([p2 - p1, jnp.mean(W2, 0) - jnp.mean(W1, 0)])
    d0_depth, d0 = ccd.best_axis(depth_fn, d0s)
    # 48 rounds: mj's EPA runs to its 1e-6 ccd_tolerance on these dense
    # hulls; 20 rounds left ~4e-4 depth slack on folded-leg pairs, 40+
    # agrees with mj to ~1e-7 (measured at the t=148 trunk-thigh pair)
    depth0, n0 = ccd.pattern_refine(depth_fn, d0, d0_depth, rounds=48)
    w0 = _hull_hull_witness(W1, W2, n0, tol=1e-5)

    # 4 perturbed re-solves about the geom centers (decoded multiccd rule,
    # ccd.py module doc), warm-started at n0. eps for mesh pairs is FIT to
    # the hyqreal1 vertex-selection data (probe_mesh_manifold{4,6}.py): mj
    # emits a support vertex iff its (support gap)/(distance along the face)
    # ratio is under a threshold bracketed in (2.08e-3, ~6e-3) rad — the
    # cyl-box eps=1e-3 (2e-3 relative) falls just short of the emitted
    # boundary case (t=148 v2 at 2.08e-3). 1.75e-3/side makes the relative
    # tilt 3.5e-3 axis-aligned / 2.5e-3 at worst-case diagonal projection:
    # inside the bracket either way
    Ra, Rb = ccd.perturb_rots(n0, eps=1.75e-3)                 # (4, 3, 3)
    W1p = jnp.einsum('kij,vj->kvi', Ra, W1 - p1) + p1
    W2p = jnp.einsum('kij,vj->kvi', Rb, W2 - p2) + p2

    def depth_fn_p(d):
        exp = (slice(None),) + (None,) * (d.ndim - 2)
        return (ccd.supval_verts(d, W1p[exp])
                + ccd.supval_verts(-d, W2p[exp]))

    n0b = jnp.broadcast_to(n0, (4, 3))
    depth_p, n_p = ccd.pattern_refine(depth_fn_p, n0b, depth_fn_p(n0b),
                                      rounds=12, r0=8e-3)
    # Per-config witness: support features selected on the TILTED hulls but
    # materialized at UNROTATED vertex positions (mj reports unperturbed
    # coordinates; rotated positions would scatter the same logical vertex
    # ~2·eps·r apart across configs and defeat the dedup), POCS'd to the
    # tangential witness and lifted midway between the UNPERTURBED support
    # planes (mj's manifold shares the unperturbed depth for both dist and
    # the half-depth lift — probe_mesh_manifold3.py). Vertex-type contacts
    # land exactly on the emitted vertex; edge-edge contacts collapse onto
    # the crossing point and dedup against contact 0, matching mj's
    # single-contact behavior there.
    s1 = jnp.max(W1 @ n0)
    s2 = -jnp.max(W2 @ (-n0))

    def config_witness(Wp1, Wp2, nk):
        f1 = _top3_feature(W1, Wp1 @ nk, 1e-5)
        f2 = _top3_feature(W2, Wp2 @ (-nk), 1e-5)
        w = _feature_tangent(f1, f2)
        return w + (0.5 * (s1 + s2) - jnp.dot(w, n0)) * n0

    pos_p = jax.vmap(config_witness)(W1p, W2p, n_p)
    return ccd.manifold_from_perturbed(depth0, n0, depth_p, pos_p, n_p,
                                       margin=margin, pos0=w0)


def _sphere_mesh(c, r, p2, R2, W2l, n2):
    """Sphere vs convex hull, single contact. Sphere support along +n is
    c + r*n; witness pos = midpoint of the two surface points."""
    W2 = W2l @ R2.T + p2[None]

    def depth_fn(d):
        return jnp.sum(d * c, -1) + r + ccd.supval_verts(-d, W2)

    d0s = jnp.stack([p2 - c, jnp.mean(W2, 0) - c])
    depth0, d0 = ccd.best_axis(depth_fn, d0s)
    depth, n = ccd.pattern_refine(depth_fn, d0, depth0, rounds=20)
    dist = -depth
    pos = c + (r + 0.5 * dist) * n
    return dist[None], pos[None], n[None]


def _box_sphere(bpos, bmat, size, center, radius):
    """Sphere vs box: closest-point; handles center-inside-box.

    Branch-free: the inside-branch axis selection is a one-hot comparison mask
    (argmin + .at[].set lower to scatters, which are pathologically slow at
    B=4096 × hundreds of box pairs on TPU)."""
    local = bmat.T @ (center - bpos)
    clamped = jnp.clip(local, -size, size)
    delta = local - clamped
    dist_out = jnp.linalg.norm(delta)
    inside = dist_out < 1e-12
    # inside: push out along the axis of least penetration (first-min one-hot)
    depth = size - jnp.abs(local)
    dmin = jnp.min(depth)
    is_min = (depth == dmin).astype(local.dtype)
    first = jnp.where(jnp.cumsum(is_min) * is_min == 1.0, 1.0, 0.0)
    sign = jnp.where(local >= 0, 1.0, -1.0)
    n_in = first * sign
    surf_in = jnp.where(first > 0, sign * size, local)
    n_out = delta / jnp.maximum(dist_out, 1e-12)
    n_local = jnp.where(inside, n_in, n_out)
    surface_local = jnp.where(inside, surf_in, clamped)
    d = jnp.where(inside, -(dmin + radius), dist_out - radius)
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


# ------------------------------------------------------------------------------
# self-collision primitives (robot-robot pairs; normal points geom1 → geom2)
# ------------------------------------------------------------------------------

def _sphere_sphere(p1, r1, p2, r2):
    d12 = p2 - p1
    dlen = jnp.linalg.norm(d12)
    n = jnp.where(dlen > 1e-12, d12 / jnp.maximum(dlen, 1e-12),
                  jnp.asarray([0.0, 0.0, 1.0], p1.dtype))
    dist = dlen - r1 - r2
    pos = p1 + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], n[None]


def _closest_on_segment(p, a, b):
    ab = b - a
    t = jnp.clip(jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-30),
                 0.0, 1.0)
    return a + t * ab


def _sphere_capsule(c, r_s, cpos, cmat, r_c, halflen):
    axis = cmat[:, 2]
    q = _closest_on_segment(c, cpos - axis * halflen, cpos + axis * halflen)
    return _sphere_sphere(c, r_s, q, r_c)


def _segment_segment(a1, b1, a2, b2):
    """Closest points between segments (a1,b1) and (a2,b2) (Ericson §5.1.9)."""
    d1 = b1 - a1
    d2 = b2 - a2
    r = a1 - a2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-14, jnp.clip((b * f - c * e) / jnp.maximum(
        denom, 1e-14), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-30)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(t != t_cl,
                  jnp.clip((t_cl * b - c) / jnp.maximum(a, 1e-30), 0.0, 1.0), s)
    p1 = a1 + d1 * s
    p2 = a2 + d2 * t_cl
    return p1, p2


def _capsule_capsule(p1, R1, r1, h1, p2, R2, r2, h2):
    ax1 = R1[:, 2]
    ax2 = R2[:, 2]
    q1, q2 = _segment_segment(p1 - ax1 * h1, p1 + ax1 * h1,
                              p2 - ax2 * h2, p2 + ax2 * h2)
    return _sphere_sphere(q1, r1, q2, r2)


def _sphere_cylinder(c, r_s, cpos, cmat, R_c, halflen):
    """Sphere vs cylinder solid: closest point on the capped cylinder surface
    (side / flat cap / rim regions), analytic like MuJoCo's SphereCylinder."""
    axis = cmat[:, 2]
    rel = c - cpos
    a = jnp.dot(rel, axis)                      # axial coordinate
    radial = rel - a * axis
    rlen = jnp.linalg.norm(radial)
    rdir = jnp.where(rlen > 1e-12, radial / jnp.maximum(rlen, 1e-12),
                     cmat[:, 0])
    a_cl = jnp.clip(a, -halflen, halflen)
    r_cl = jnp.minimum(rlen, R_c)
    inside = (jnp.abs(a) < halflen) & (rlen < R_c)
    # outside: clamp to the surface; the clamped point is on side/cap/rim
    q_out = cpos + axis * a_cl + rdir * r_cl
    # inside: push to the nearer of side wall vs caps
    d_side = R_c - rlen
    d_cap = halflen - jnp.abs(a)
    q_side = cpos + axis * a + rdir * R_c
    q_cap = cpos + axis * (jnp.sign(a) * halflen) + rdir * rlen
    q_in = jnp.where(d_side < d_cap, q_side, q_cap)
    q = jnp.where(inside, q_in, q_out)
    dvec = c - q
    dlen = jnp.linalg.norm(dvec)
    n_out = jnp.where(dlen > 1e-12, -dvec / jnp.maximum(dlen, 1e-12), -axis)
    # inside: normal points from sphere center toward the surface exit
    n_in = jnp.where(dlen > 1e-12, dvec / jnp.maximum(dlen, 1e-12), axis)
    # normal points geom1(sphere) → geom2(cylinder)
    n = jnp.where(inside, n_in, n_out)
    dist = jnp.where(inside, -(dlen + r_s), dlen - r_s)
    pos = c + n * (r_s + 0.5 * dist)
    return dist[None], pos[None], n[None]


def _points_in_box_local(pts, size):
    """Point-vs-box in the box's LOCAL frame, vectorized over (k, 3) points.
    Returns (dist (k,), surface point (k, 3), outward normal (k, 3)) — all
    elementwise (no per-point matmuls, no scatters)."""
    clamped = jnp.clip(pts, -size[None, :], size[None, :])
    delta = pts - clamped
    dist_out = jnp.linalg.norm(delta, axis=1)
    inside = dist_out < 1e-12
    depth = size[None, :] - jnp.abs(pts)                   # (k, 3)
    dmin = jnp.min(depth, axis=1)
    is_min = (depth == dmin[:, None]).astype(pts.dtype)
    first = jnp.where(jnp.cumsum(is_min, axis=1) * is_min == 1.0, 1.0, 0.0)
    sign = jnp.where(pts >= 0, 1.0, -1.0)
    n_in = first * sign
    surf_in = jnp.where(first > 0, sign * size[None, :], pts)
    n_out = delta / jnp.maximum(dist_out, 1e-12)[:, None]
    n_local = jnp.where(inside[:, None], n_in, n_out)
    surf = jnp.where(inside[:, None], surf_in, clamped)
    d = jnp.where(inside, -dmin, dist_out)
    return d, surf, n_local


def _box_box(p1, R1, s1, p2, R2, s2):
    """Box vs box via corner sampling: the 8 corners of each box tested against
    the other (16 point-in-box queries), 4 deepest kept. Captures face-corner
    manifolds (the dominant robot self-contact mode); edge-edge-only crossings
    are approximated by the nearest corners. MuJoCo uses a dedicated SAT
    manifold (mjc_BoxBox) — exact parity deferred. All work happens in each
    box's local frame (two small matmuls per pair) to keep the op graph lean
    under the 4096-env vmap."""
    dtype = p1.dtype
    signs = jnp.asarray(_BOX_CORNER_SIGNS, dtype)          # (8, 3)
    c1_w = p1[None, :] + (signs * s1[None, :]) @ R1.T      # (8, 3) world
    c2_w = p2[None, :] + (signs * s2[None, :]) @ R2.T

    # corners of box2 in box1's local frame (normal g1→g2 = outward of box1 ✓)
    loc2 = (c2_w - p1[None, :]) @ R1
    d_a, surf_a, nl_a = _points_in_box_local(loc2, s1)
    pos_a = (surf_a + 0.5 * d_a[:, None] * nl_a) @ R1.T + p1[None, :]
    n_a = nl_a @ R1.T
    # corners of box1 in box2's local frame (outward of box2 = g2→g1 → flip)
    loc1 = (c1_w - p2[None, :]) @ R2
    d_b, surf_b, nl_b = _points_in_box_local(loc1, s2)
    pos_b = (surf_b + 0.5 * d_b[:, None] * nl_b) @ R2.T + p2[None, :]
    n_b = -(nl_b @ R2.T)

    d = jnp.concatenate([d_a, d_b])
    pos = jnp.concatenate([pos_a, pos_b])
    n = jnp.concatenate([n_a, n_b])
    return _deepest_k(d, pos, n, 4)


def _box_box_group(p1, R1, s1, p2, R2, s2):
    """Group-vectorized box-box: same math as _box_box but every intermediate
    is (G,)-shaped with the PAIR axis minor.

    vmapping the per-pair version puts the pair axis leading, so intermediates
    come out (B, G, 8, 3) — XLA tile-pads the (8, 3) minor dims to (8, 128),
    a 42× HBM/VPU bloat that made this one group cost ~200 ms/step at B=4096.
    Written with static 8-corner/3-axis unrolls over (G,) vectors the same
    group costs ~2 ms. Returns (d (G, 16), pos (G, 16, 3), n (G, 16, 3)) of
    ALL candidates; _deepest_k-style selection happens here too (static
    unroll), emitting (G, 4) slots."""
    dtype = p1.dtype
    P1 = [p1[:, i] for i in range(3)]
    P2 = [p2[:, i] for i in range(3)]
    S1 = [s1[:, i] for i in range(3)]
    S2 = [s2[:, i] for i in range(3)]
    R1c = [[R1[:, i, j] for j in range(3)] for i in range(3)]
    R2c = [[R2[:, i, j] for j in range(3)] for i in range(3)]
    cands = _box_box_cands_cl(P1, R1c, S1, P2, R2c, S2, dtype)

    # 4 deepest of the 17 candidates — static unrolled min extraction
    big = jnp.asarray(1e9, dtype)
    ds = [c[0] for c in cands]
    sel_d, sel_p, sel_n = [], [], []
    for _ in range(4):
        dmin = ds[0]
        for dd in ds[1:]:
            dmin = jnp.minimum(dmin, dd)
        taken = jnp.zeros_like(dmin, dtype=bool)
        w = []
        for dd in ds:
            hit = (dd == dmin) & ~taken
            taken = taken | hit
            w.append(hit.astype(dtype))
        sel_d.append(dmin)
        sel_p.append([sum(w[c] * cands[c][1][i] for c in range(len(cands)))
                      for i in range(3)])
        sel_n.append([sum(w[c] * cands[c][2][i] for c in range(len(cands)))
                      for i in range(3)])
        ds = [dd + ww * big for dd, ww in zip(ds, w)]

    d = jnp.stack(sel_d, axis=1)                              # (G, 4)
    pos = jnp.stack([jnp.stack(p, axis=1) for p in sel_p], axis=1)  # (G, 4, 3)
    n = jnp.stack([jnp.stack(x, axis=1) for x in sel_n], axis=1)
    return d, pos, n


def _box_box_cands_cl(P1, R1c, S1, P2, R2c, S2, dtype):
    """Candidate contacts for box-box in component-plane form: 16 corner tests
    + 1 edge-edge SAT candidate. Inputs are component LISTS of planes of any
    shape — (G,) under the per-env group path, (G, B) under the
    batch-trailing path (collision_bt) — all ops elementwise over the plane.
    Returns a list of (d, pos[3], n[3]) candidate triples."""
    # python floats, not numpy scalars: np.float64 scalars are strong-typed
    # and silently promote the whole feature tensor to f64 under x64
    signs = [[float(x) for x in row] for row in _BOX_CORNER_SIGNS]

    def corners_in(Pa, Ra, Sa, Pb, Rb, Sb):
        """Corners of box b tested inside box a. Returns lists over 8 corners
        of (d, pos[3], n[3]) with pos/n in WORLD coordinates (normal outward
        of box a)."""
        out = []
        for c in range(8):
            # world corner of box b
            cw = [Pb[i] + sum(Rb[i][j] * (signs[c][j] * Sb[j])
                              for j in range(3)) for i in range(3)]
            # into box a local
            loc = [sum(Ra[i][j] * (cw[i] - Pa[i]) for i in range(3))
                   for j in range(3)]
            cl = [jnp.clip(loc[j], -Sa[j], Sa[j]) for j in range(3)]
            dl = [loc[j] - cl[j] for j in range(3)]
            d_out = jnp.sqrt(dl[0] * dl[0] + dl[1] * dl[1] + dl[2] * dl[2])
            inside = d_out < 1e-12
            dep = [Sa[j] - jnp.abs(loc[j]) for j in range(3)]
            dmin = jnp.minimum(dep[0], jnp.minimum(dep[1], dep[2]))
            eq = [dep[j] == dmin for j in range(3)]
            f0 = eq[0]
            f1 = eq[1] & ~f0
            f2 = eq[2] & ~f0 & ~f1
            first = [f0.astype(dtype), f1.astype(dtype), f2.astype(dtype)]
            sign_l = [jnp.where(loc[j] >= 0, 1.0, -1.0) for j in range(3)]
            inv = 1.0 / jnp.maximum(d_out, 1e-12)
            nl = [jnp.where(inside, first[j] * sign_l[j], dl[j] * inv)
                  for j in range(3)]
            sl = [jnp.where(inside,
                            jnp.where(first[j] > 0, sign_l[j] * Sa[j], loc[j]),
                            cl[j]) for j in range(3)]
            d_c = jnp.where(inside, -dmin, d_out)
            # midpoint surface offset then back to world
            pl = [sl[j] + 0.5 * d_c * nl[j] for j in range(3)]
            pw = [Pa[i] + sum(Ra[i][j] * pl[j] for j in range(3))
                  for i in range(3)]
            nw = [sum(Ra[i][j] * nl[j] for j in range(3)) for i in range(3)]
            out.append((d_c, pw, nw))
        return out

    cands = corners_in(P1, R1c, S1, P2, R2c, S2)
    for (d_c, pw, nw) in corners_in(P2, R2c, S2, P1, R1c, S1):
        cands.append((d_c, pw, [-x for x in nw]))  # outward of box2 = g2→g1

    # ---- edge-edge term: corner sampling alone misses contacts where no
    # corner penetrates (two edges crossing). SAT over the 9 cross axes; the
    # minimal-depth axis's support edges give the closest-point contact. ----
    T = [P2[i] - P1[i] for i in range(3)]
    ax1 = [[R1c[i][j] for i in range(3)] for j in range(3)]   # box1 axis j
    ax2 = [[R2c[i][j] for i in range(3)] for j in range(3)]
    big0 = jnp.asarray(1e9, dtype)

    def dot3(u, v):
        return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

    def cross3(u, v):
        return [u[1] * v[2] - u[2] * v[1],
                u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0]]

    def overlap(L):
        r1 = sum(S1[j] * jnp.abs(dot3(ax1[j], L)) for j in range(3))
        r2 = sum(S2[j] * jnp.abs(dot3(ax2[j], L)) for j in range(3))
        return r1 + r2 - jnp.abs(dot3(T, L))

    # face-axis overlaps: separation check + the edge candidate is only valid
    # when its cross axis is the GLOBAL SAT minimum (otherwise the contact is
    # face-type and the cross-axis "depth" is a large interior overlap)
    sep = jnp.full_like(P1[0], -big0)
    min_face = jnp.full_like(P1[0], big0)
    for axs in (ax1, ax2):
        for j in range(3):
            ov = overlap(axs[j])
            sep = jnp.maximum(sep, -ov)
            min_face = jnp.minimum(min_face, ov)

    best_d = jnp.full_like(P1[0], big0)
    best = None
    for j1 in range(3):
        for j2 in range(3):
            L = cross3(ax1[j1], ax2[j2])
            nl = jnp.sqrt(jnp.maximum(dot3(L, L), 1e-30))
            ok = nl > 1e-8                      # parallel edges: axis invalid
            Lu = [L[i] / nl for i in range(3)]
            # orient box1 -> box2
            st = jnp.where(dot3(T, Lu) >= 0, 1.0, -1.0)
            Lu = [st * Lu[i] for i in range(3)]
            dep = overlap(Lu)
            sep = jnp.maximum(sep, jnp.where(ok, -dep, -big0))
            # support edges: box1's corner extreme along +Lu on its other two
            # axes, box2's along -Lu
            c1 = list(P1)
            c2 = list(P2)
            for k in range(3):
                if k != j1:
                    sgn = jnp.where(dot3(ax1[k], Lu) >= 0, 1.0, -1.0)
                    c1 = [c1[i] + sgn * S1[k] * ax1[k][i] for i in range(3)]
                if k != j2:
                    sgn = jnp.where(dot3(ax2[k], Lu) >= 0, -1.0, 1.0)
                    c2 = [c2[i] + sgn * S2[k] * ax2[k][i] for i in range(3)]
            # closest points of segments (c1 ± S1[j1] u, c2 ± S2[j2] v)
            u, v = ax1[j1], ax2[j2]
            w0 = [c1[i] - c2[i] for i in range(3)]
            b_uv = dot3(u, v)
            d_u = dot3(u, w0)
            d_v = dot3(v, w0)
            den = jnp.maximum(1.0 - b_uv * b_uv, 1e-12)
            t_u = jnp.clip((b_uv * d_v - d_u) / den, -S1[j1], S1[j1])
            t_v = jnp.clip((t_u * b_uv - d_v), -S2[j2], S2[j2])
            t_u = jnp.clip(t_v * b_uv - d_u, -S1[j1], S1[j1])
            q1 = [c1[i] + t_u * u[i] for i in range(3)]
            q2 = [c2[i] + t_v * v[i] for i in range(3)]
            mid = [0.5 * (q1[i] + q2[i]) for i in range(3)]
            d_e = jnp.where(ok, -dep, big0)
            take = d_e < best_d
            best_d = jnp.minimum(best_d, d_e)
            if best is None:
                best = (mid, Lu)
            else:
                best = ([jnp.where(take, mid[i], best[0][i])
                         for i in range(3)],
                        [jnp.where(take, Lu[i], best[1][i])
                         for i in range(3)])
    # suppress when separated along any axis or when a corner candidate
    # already covers this contact (within 2 mm)
    near_corner = jnp.zeros_like(P1[0], dtype=bool)
    for (d_c, pw, _) in cands:
        dd2 = sum((pw[i] - best[0][i]) ** 2 for i in range(3))
        near_corner = near_corner | ((dd2 < 4e-6) & (d_c < 0))
    d_edge = jnp.where((sep > 0) | near_corner | (-best_d > min_face),
                       big0, best_d)
    cands.append((d_edge, best[0], best[1]))
    return cands


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

    Margin bias: MuJoCo's convex hfield pipeline collides the sphere INFLATED
    by margin/2 against prisms whose tops are RAISED by margin, and reports
    that inflated contact uncompensated (probed empirically: face contacts
    come out dist_exact − margin·(0.5 + n_z), edge normals tilt toward the
    raised edge, and detection requires the INFLATED dist < 0 — see
    constraints.ConstraintLayout.con_incl). Reproduced here by running the
    exact sphere-triangle test on the raised corners with r + margin/2. The
    robots' foot geoms ship margin=0.001, so hfield parity requires this."""
    dtype = center.dtype
    local = hmat.T @ (center - hpos)
    sz = jnp.asarray(m.hfield_size, dtype)
    nr, nc = m.hfield_nrow, m.hfield_ncol
    data = jnp.asarray(m.hfield_data, dtype)  # (nrow, ncol) in [0, 1]

    fx = (local[0] / sz[0] + 1.0) * 0.5 * (nc - 1)
    fy = (local[1] / sz[1] + 1.0) * 0.5 * (nr - 1)
    # cells per unit local length (inflated radius — margin counts)
    rx = (radius + 0.5 * margin) / sz[0] * 0.5 * (nc - 1)
    ry = (radius + 0.5 * margin) / sz[1] * 0.5 * (nr - 1)
    i0 = jnp.clip(jnp.floor(fx - rx).astype(jnp.int32), 0, nc - 2)
    j0 = jnp.clip(jnp.floor(fy - ry).astype(jnp.int32), 0, nr - 2)
    # second cell of the AABB span; == first at grid borders → masked dup
    i1 = jnp.clip(jnp.floor(fx + rx).astype(jnp.int32), 0, nc - 2)
    j1 = jnp.clip(jnp.floor(fy + ry).astype(jnp.int32), 0, nr - 2)

    r_eff = radius + 0.5 * margin

    def corner(jj, ii):
        x = (ii.astype(dtype) / (nc - 1) * 2.0 - 1.0) * sz[0]
        y = (jj.astype(dtype) / (nr - 1) * 2.0 - 1.0) * sz[1]
        return jnp.stack([x, y, data[jj, ii] * sz[2] + margin])

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
                d_t, p_t, n_t = _sphere_triangle(local, r_eff, *tri)
                ds.append(jnp.where(is_dup, far, d_t))
                ps.append(p_t)
                ns.append(n_t)

    d = jnp.stack(ds)
    pos_local = jnp.stack(ps)
    n_local = jnp.stack(ns)
    pos = pos_local @ hmat.T + hpos[None, :]
    n = n_local @ hmat.T
    return d, pos, n


def _hfield_capsule(m, hpos, hmat, cpos, cmat, radius, halflen, margin,
                    n_span):
    """Capsule vs heightfield: endpoint-sphere samples (exact vs MuJoCo for
    end contacts — validated to 3e-9) plus 5 INTERIOR axis samples treated as
    spheres against their local raised triangles, which add the mid-body
    contacts the endpoint approximation misses (a calf across a terrain
    ridge). A full prism-CCD term was tried and rejected: its min-translation
    contacts claim deeper lateral penetrations MuJoCo's locally-measuring
    pipeline does not emit (docs/PERF_NOTES.md). Interior samples within 2 mm
    of an endpoint contact are dropped. n_span is accepted for signature
    parity with the other hfield colliders (the axis samples look up their
    own cells)."""
    del n_span
    dtype = cpos.dtype
    axis = cmat[:, 2]
    outs = [_hfield_sphere(m, hpos, hmat, cpos + axis * (s * halflen), radius,
                           margin)
            for s in (1.0, -1.0)]
    d = jnp.concatenate([o[0] for o in outs])
    p = jnp.concatenate([o[1] for o in outs])
    n = jnp.concatenate([o[2] for o in outs])

    ts = jnp.asarray([-2.0 / 3, -1.0 / 3, 0.0, 1.0 / 3, 2.0 / 3], dtype)
    centers = cpos[None, :] + ts[:, None] * halflen * axis[None, :]
    local = (centers - hpos[None, :]) @ hmat
    di, pi, ni = jax.vmap(
        lambda c: _hfield_point_contact(m, c, radius + 0.5 * margin, margin,
                                        dtype))(local)
    pi = pi @ hmat.T + hpos[None, :]
    ni = ni @ hmat.T
    # drop interior samples that coincide with an endpoint contact
    dd = jnp.linalg.norm(pi[:, None, :] - p[None, :, :], axis=-1)
    dup = jnp.any((dd < 2e-3) & (d[None, :] < margin + 1e-6), axis=1)
    di = jnp.where(dup, 1e6, di)
    return (jnp.concatenate([d, di]), jnp.concatenate([p, pi]),
            jnp.concatenate([n, ni]))


def _hfield_point_contact(m: Model, local, r_eff, margin, dtype):
    """Deepest raised-triangle contact for one point of an extended geom:
    the 2 triangles of the cell under the point, prism tops raised by margin
    (same inflation the sphere path uses). Returns (dist, pos_local, n_local)."""
    sz = jnp.asarray(m.hfield_size, dtype)
    nr, nc = m.hfield_nrow, m.hfield_ncol
    data = jnp.asarray(m.hfield_data, dtype)
    fx = (local[0] / sz[0] + 1.0) * 0.5 * (nc - 1)
    fy = (local[1] / sz[1] + 1.0) * 0.5 * (nr - 1)
    i = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nc - 2)
    j = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, nr - 2)

    def corner(jj, ii):
        x = (ii.astype(dtype) / (nc - 1) * 2.0 - 1.0) * sz[0]
        y = (jj.astype(dtype) / (nr - 1) * 2.0 - 1.0) * sz[1]
        return jnp.stack([x, y, data[jj, ii] * sz[2] + margin])

    v00, v10 = corner(j, i), corner(j, i + 1)
    v01, v11 = corner(j + 1, i), corner(j + 1, i + 1)
    d1, p1, n1 = _sphere_triangle(local, r_eff, v00, v10, v11)
    d2, p2, n2 = _sphere_triangle(local, r_eff, v00, v11, v01)
    take1 = d1 <= d2
    return (jnp.where(take1, d1, d2), jnp.where(take1, p1, p2),
            jnp.where(take1, n1, n2))


def _cyl_box_ccd(p1, R1, radius, halflen, p2, R2, size):
    """Cylinder (geom1) vs box (geom2) via the native-CCD-parity pipeline
    (ccd.py): SAT candidates + pattern refinement for the penetration
    direction, then MuJoCo's multiccd manifold — 4 perturbed re-solves of the
    pair with the relative orientation tilted ±1e-3 rad about the contact
    tangents (rule decoded in scripts/probe_multiccd2.py: med 5.6e-5 position
    agreement vs MuJoCo 3.10). Replaces MuJoCo's convex collider for this pair
    (reference reaches it via mj_step, quadruped_env.py:271)."""
    def depth_fn(d):
        return (ccd.supval_cyl(d, p1, R1, radius, halflen)
                + ccd.supval_box(-d, p2, R2, size))

    a = R1[:, 2]
    # radial axis: box center to the closest point on the cylinder axis
    t = jnp.clip((p2 - p1) @ a, -halflen, halflen)
    # + radial directions from the cylinder axis to each box corner (the
    # optimum family for corner-on-side-line contacts)
    signs = jnp.asarray(_BOX_CORNER_SIGNS, p1.dtype)
    corners = p2[None, :] + (signs * size[None, :]) @ R2.T        # (8, 3)
    tc = jnp.clip((corners - p1) @ a, -halflen, halflen)
    rad_corner = corners - (p1[None, :] + tc[:, None] * a[None, :])
    cands = jnp.concatenate([
        jnp.stack([R2[:, 0], R2[:, 1], R2[:, 2], a,
                   jnp.cross(R2[:, 0], a), jnp.cross(R2[:, 1], a),
                   jnp.cross(R2[:, 2], a), (p1 + t * a) - p2]),
        rad_corner])
    d0_depth, d0 = ccd.best_axis(depth_fn, cands)
    # 16 rounds with expansion: final pattern radius well under the face-tie
    # tolerance (2.5e-4) — tie directions (line/face contacts) must not read
    # as pinned
    depth0, n0 = ccd.pattern_refine(depth_fn, d0, d0_depth, rounds=16)
    axes0 = jnp.stack([a, R2[:, 0], R2[:, 1], R2[:, 2]])
    depth0, n0 = ccd.snap_polish(depth_fn, depth0, n0, axes0)

    # 4 perturbed re-solves, warm-started at n0 (tilt is ~1e-3, so a small
    # initial pattern radius suffices)
    Ra, Rb = ccd.perturb_rots(n0)                             # (4, 3, 3)
    R1p, R2p = Ra @ R1, Rb @ R2

    def depth_fn_p(d):
        exp = (slice(None),) + (None,) * (d.ndim - 2)
        return (ccd.supval_cyl(d, p1, R1p[exp], radius, halflen)
                + ccd.supval_box(-d, p2, R2p[exp], size))

    n0b = jnp.broadcast_to(n0, (4, 3))
    depth_p, n_p = ccd.pattern_refine(depth_fn_p, n0b, depth_fn_p(n0b),
                                      rounds=8, r0=8e-3)
    axes_p = jnp.concatenate([R1p[:, :, 2:3].swapaxes(-1, -2),
                              R2p.swapaxes(-1, -2)], axis=-2)  # (4, 4, 3)
    depth_p, n_p = ccd.snap_polish(depth_fn_p, depth_p, n_p, axes_p)
    xa = ccd.support_cyl(n_p, p1, R1p, radius, halflen)
    xb = ccd.support_box(-n_p, p2, R2p, size)
    # configs whose tilt axis is ∥ the cylinder axis leave the side-line tie
    # UNBROKEN (rotating the cylinder about its own axis is a no-op), so the
    # witness is indeterminate along the line — MuJoCo's EPA lands at a line
    # ENDPOINT there (observed: its ±t contacts collapse onto the endpoints
    # and dedup). Bias the face-POCS start past the end selected by the tilt
    # sense; the face clip clamps it onto the segment end. Pinned (tie-broken)
    # configs clamp the bias away, so only the degenerate ones are affected.
    t1b, t2b = ccd.tangents(n0)
    axes_t = jnp.stack([t1b, t1b, t2b, t2b])                  # (4, 3)
    sgn_t = jnp.asarray([1.0, -1.0, 1.0, -1.0], p1.dtype)
    bias = (sgn_t * (axes_t @ a))[:, None] * (2.0 * halflen) * a[None, :]
    # unperturbed canonical witness: alternate stage-2 start (see ccd.witness)
    m0 = ccd.cyl_face(n0, R1)
    b0 = ccd.box_face(-n0, R2, size)
    w0 = ccd.pocs(
        0.5 * (ccd.support_cyl(n0, p1, R1, radius, halflen)
               + ccd.support_box(-n0, p2, R2, size)),
        lambda pt: ccd.clip_face_cyl(pt, p1, R1, radius, halflen, *m0, n0),
        lambda pt: ccd.clip_face_box(pt, p2, R2, size, *b0))
    # per-config tie lattice (snap-polished n_p has EXACT zeros on tie axes)
    mask_ax, sgn_ax, mask_rad = ccd.cyl_face(n_p, R1p)
    bmask, bsgn = ccd.box_face(-n_p, R2p, size)
    pos_p = ccd.witness(
        n_p, depth_p, [0.5 * (xa + xb) + bias, w0],
        lambda pt: ccd.clip_face_cyl(pt, p1, R1p, radius, halflen,
                                     mask_ax, sgn_ax, mask_rad, n_p),
        lambda pt: ccd.clip_face_box(pt, p2, R2p, size, bmask, bsgn),
        lambda pt: ccd.clip_into_cyl(pt, p1, R1p, radius, halflen),
        lambda pt: ccd.clip_into_box(pt, p2, R2p, size))
    return ccd.manifold_from_perturbed(depth0, n0, depth_p, pos_p, n_p)


def _cap_box_ccd(p1, R1, radius, halflen, p2, R2, size):
    """Capsule (geom1) vs box (geom2) via the same decoded multiccd pipeline
    as _cyl_box_ccd (MuJoCo collides this pair with nativeccd + multiccd as
    well). A capsule is a segment Minkowski-dilated by its radius, so its
    support value is the segment's plus a constant — all the machinery
    carries over with the capsule support/clip/face functions."""
    def depth_fn(d):
        return (ccd.supval_cap(d, p1, R1, radius, halflen)
                + ccd.supval_box(-d, p2, R2, size))

    a = R1[:, 2]
    t = jnp.clip((p2 - p1) @ a, -halflen, halflen)
    signs = jnp.asarray(_BOX_CORNER_SIGNS, p1.dtype)
    corners = p2[None, :] + (signs * size[None, :]) @ R2.T        # (8, 3)
    tc = jnp.clip((corners - p1) @ a, -halflen, halflen)
    rad_corner = corners - (p1[None, :] + tc[:, None] * a[None, :])
    cands = jnp.concatenate([
        jnp.stack([R2[:, 0], R2[:, 1], R2[:, 2], a,
                   jnp.cross(R2[:, 0], a), jnp.cross(R2[:, 1], a),
                   jnp.cross(R2[:, 2], a), (p1 + t * a) - p2]),
        rad_corner])
    d0_depth, d0 = ccd.best_axis(depth_fn, cands)
    depth0, n0 = ccd.pattern_refine(depth_fn, d0, d0_depth, rounds=16)
    axes0 = jnp.stack([a, R2[:, 0], R2[:, 1], R2[:, 2]])
    depth0, n0 = ccd.snap_polish(depth_fn, depth0, n0, axes0)

    Ra, Rb = ccd.perturb_rots(n0)                             # (4, 3, 3)
    R1p, R2p = Ra @ R1, Rb @ R2

    def depth_fn_p(d):
        exp = (slice(None),) + (None,) * (d.ndim - 2)
        return (ccd.supval_cap(d, p1, R1p[exp], radius, halflen)
                + ccd.supval_box(-d, p2, R2p[exp], size))

    n0b = jnp.broadcast_to(n0, (4, 3))
    depth_p, n_p = ccd.pattern_refine(depth_fn_p, n0b, depth_fn_p(n0b),
                                      rounds=8, r0=8e-3)
    axes_p = jnp.concatenate([R1p[:, :, 2:3].swapaxes(-1, -2),
                              R2p.swapaxes(-1, -2)], axis=-2)  # (4, 4, 3)
    depth_p, n_p = ccd.snap_polish(depth_fn_p, depth_p, n_p, axes_p)
    xa = ccd.support_cap(n_p, p1, R1p, radius, halflen)
    xb = ccd.support_box(-n_p, p2, R2p, size)
    # endpoint bias for tie-degenerate tilts (see _cyl_box_ccd)
    t1b, t2b = ccd.tangents(n0)
    axes_t = jnp.stack([t1b, t1b, t2b, t2b])
    sgn_t = jnp.asarray([1.0, -1.0, 1.0, -1.0], p1.dtype)
    bias = (sgn_t * (axes_t @ a))[:, None] * (2.0 * halflen) * a[None, :]
    m0 = ccd.cap_face(n0, R1)
    b0 = ccd.box_face(-n0, R2, size)
    w0 = ccd.pocs(
        0.5 * (ccd.support_cap(n0, p1, R1, radius, halflen)
               + ccd.support_box(-n0, p2, R2, size)),
        lambda pt: ccd.clip_face_cap(pt, p1, R1, radius, halflen, *m0, n0),
        lambda pt: ccd.clip_face_box(pt, p2, R2, size, *b0))
    mask_ax, sgn_ax = ccd.cap_face(n_p, R1p)
    bmask, bsgn = ccd.box_face(-n_p, R2p, size)
    pos_p = ccd.witness(
        n_p, depth_p, [0.5 * (xa + xb) + bias, w0],
        lambda pt: ccd.clip_face_cap(pt, p1, R1p, radius, halflen,
                                     mask_ax, sgn_ax, n_p),
        lambda pt: ccd.clip_face_box(pt, p2, R2p, size, bmask, bsgn),
        lambda pt: ccd.clip_into_cap(pt, p1, R1p, radius, halflen),
        lambda pt: ccd.clip_into_box(pt, p2, R2p, size),
    )
    return ccd.manifold_from_perturbed(depth0, n0, depth_p, pos_p, n_p)


def _clip_into_prism(pt, verts, zbot):
    """Approximate projection into a heightfield prism volume (verts
    (..., 6, 3), top triangle first): top-plane projection, lateral 2D
    triangle clip, z clamp. Exact for vertical-sided prisms with witnesses
    near the top face — the terrain-contact case; the ±1e-3-rad perturbed
    prisms reuse it with O(eps*height) error."""
    v0, v1, v2 = verts[..., 0, :], verts[..., 1, :], verts[..., 2, :]
    tn = jnp.cross(v1 - v0, v2 - v1)
    tn = tn * jnp.sign(tn[..., 2:3])
    tn = tn / jnp.maximum(jnp.linalg.norm(tn, axis=-1, keepdims=True), 1e-30)
    exc = jnp.maximum(jnp.sum((pt - v0) * tn, -1), 0.0)
    q = pt - exc[..., None] * tn
    flat = jnp.asarray([1.0, 1.0, 0.0], pt.dtype)
    qxy = ccd.clip_onto_triangle(q * flat, v0 * flat, v1 * flat, v2 * flat)
    zt = v0[..., 2] - (tn[..., 0] * (qxy[..., 0] - v0[..., 0])
                       + tn[..., 1] * (qxy[..., 1] - v0[..., 1])) / \
        jnp.maximum(tn[..., 2], 1e-6)
    z = jnp.clip(q[..., 2], zbot, zt)
    return jnp.stack([qxy[..., 0], qxy[..., 1], z], -1)


def _hfield_convex_ccd(m: Model, hpos, hmat, gpos, gmat, margin,
                       supval_g, support_g, face_g, clip_g, clip_vol_g,
                       rbound, n_span):
    """Shared hfield-vs-convex (box / cylinder) narrow phase.

    MuJoCo's convex hfield pipeline collides the geom against EVERY
    margin-raised triangular prism in its AABB footprint, ONE contact per
    prism — multiccd does NOT apply here (verified by toggling the flag on an
    isolated hfield-box model: identical output either way, including exact
    duplicate contacts where a feature is shared by several prisms).
    Reproduced here: per-prism SAT + pattern refinement (all prisms × all
    candidate directions evaluated in single batched tensor ops), then the
    _HF_CONVEX_K deepest prisms each emit their EPA-witness contact. The
    margin bias follows the sphere path's fitted rule (tops raised by margin,
    reported dist lowered by margin/2).

    supval_g(d, R) / support_g(d, R) / clip_g(pt, R) operate in the hfield
    LOCAL frame with batched (..., 3) dirs and explicit (broadcastable) geom
    rotation R — the perturbed re-solves pass rotated copies. rbound is the
    geom's
    circumscribed radius (traced ok); n_span the static per-axis cell count
    of the footprint."""
    dtype = gpos.dtype
    local_p = hmat.T @ (gpos - hpos)
    local_R = hmat.T @ gmat
    sz = jnp.asarray(m.hfield_size, dtype)
    nr, nc = m.hfield_nrow, m.hfield_ncol
    data = jnp.asarray(m.hfield_data, dtype)

    fx = (local_p[0] / sz[0] + 1.0) * 0.5 * (nc - 1)
    fy = (local_p[1] / sz[1] + 1.0) * 0.5 * (nr - 1)
    rx = rbound / sz[0] * 0.5 * (nc - 1)
    ry = rbound / sz[1] * 0.5 * (nr - 1)
    i0 = jnp.floor(fx - rx).astype(jnp.int32)
    j0 = jnp.floor(fy - ry).astype(jnp.int32)

    # footprint cells (n_span², static) → prism vertex stacks (P, 6, 3)
    offs = np.arange(n_span)
    di = jnp.asarray(np.tile(offs, n_span), jnp.int32)        # (C,)
    dj = jnp.asarray(np.repeat(offs, n_span), jnp.int32)
    ii = jnp.clip(i0 + di, 0, nc - 2)
    jj = jnp.clip(j0 + dj, 0, nr - 2)
    cell_dup = (i0 + di != ii) | (j0 + dj != jj)              # (C,)

    def corner(jj, ii):
        x = (ii.astype(dtype) / (nc - 1) * 2.0 - 1.0) * sz[0]
        y = (jj.astype(dtype) / (nr - 1) * 2.0 - 1.0) * sz[1]
        return jnp.stack([x, y, data[jj, ii] * sz[2] + margin], axis=-1)

    v00, v10 = corner(jj, ii), corner(jj, ii + 1)             # (C, 3)
    v01, v11 = corner(jj + 1, ii), corner(jj + 1, ii + 1)
    tops = jnp.stack([jnp.stack([v00, v10, v11], axis=1),
                      jnp.stack([v00, v11, v01], axis=1)], axis=1)  # (C,2,3,3)
    tops = tops.reshape(-1, 3, 3)                             # (P, 3, 3)
    bases = tops.at[:, :, 2].set(-sz[3])
    verts_all = jnp.concatenate([tops, bases], axis=1)        # (P, 6, 3)
    is_dup = jnp.repeat(cell_dup, 2)                          # (P,)

    def depth_fn(dirs):
        """dirs (P, ..., 3) -> depths (P, ...): prism supval + geom supval."""
        sa = jnp.max(jnp.einsum('p...k,pvk->p...v', dirs, verts_all), -1)
        return sa + supval_g(-dirs, local_R)

    # SAT candidates per prism: z, top normal, 3 side normals, 3 geom axes,
    # (3 top edges + z) × geom axes crosses  → 18 axes
    e0 = tops[:, 1] - tops[:, 0]
    e1 = tops[:, 2] - tops[:, 1]
    e2 = tops[:, 0] - tops[:, 2]
    zax = jnp.zeros_like(e0).at[:, 2].set(1.0)
    top_n = jnp.cross(e0, e1)
    cands = [zax, top_n, jnp.cross(e0, zax), jnp.cross(e1, zax),
             jnp.cross(e2, zax)]
    for i in range(3):
        g = jnp.broadcast_to(local_R[:, i], e0.shape)
        cands.append(g)
        for e in (e0, e1, e2, zax):
            cands.append(jnp.cross(e, g))
    cands = jnp.stack(cands, axis=1)                          # (P, N, 3)
    d0_depth, d0 = ccd.best_axis(depth_fn, cands)
    depths, dirs = ccd.pattern_refine(depth_fn, d0, d0_depth, rounds=14)
    top_u = top_n / jnp.maximum(
        jnp.linalg.norm(top_n, axis=-1, keepdims=True), 1e-12)
    axes0 = jnp.concatenate([
        zax[:, None, :], top_u[:, None, :],
        jnp.broadcast_to(local_R.T, tops.shape)], axis=1)     # (P, 5, 3)
    depths, dirs = ccd.snap_polish(depth_fn, depths, dirs, axes0)
    depths = jnp.where(is_dup, -jnp.inf, depths)              # (P,)

    # K deepest prisms by masked-max extraction (comparison one-hot — no sort)
    ds, ps, ns = [], [], []
    remaining = depths
    for _ in range(_HF_CONVEX_K):
        mx = jnp.max(remaining)
        sel = (remaining >= mx) & jnp.isfinite(remaining)
        oh = (jnp.cumsum(sel.astype(dtype)) <= 1.0) * sel.astype(dtype)
        verts_k = jnp.einsum('p,pvk->vk', oh, verts_all)
        depth_k = oh @ depths
        dir_k = oh @ dirs
        dn = jnp.linalg.norm(dir_k)
        dir_k = jnp.where(dn > 1e-6, dir_k / jnp.maximum(dn, 1e-12),
                          jnp.zeros_like(dir_k).at[2].set(1.0))
        got = (jnp.sum(oh) > 0.5) & (depth_k > -margin)

        # ONE contact per prism (mj semantics — multiccd is a no-op for
        # hfield pairs): EPA-witness position at the unperturbed direction
        face_k = face_g(-dir_k, local_R)
        # support-tie break: when dir_k is ⟂ a prism edge, several verts are
        # equally extreme but only one is where the bodies actually touch —
        # start from the tied vert inside the TOUCH LENS (the geom translated
        # by depth*dir just kisses the prism there; any other tied vert sits
        # outside it). The tie centroid or an un-shifted containment test
        # both stray (measured 3e-2+).
        vals = verts_k @ dir_k
        tied = vals >= jnp.max(vals) - 1e-9
        shift_k = depth_k * dir_k
        moved = jnp.linalg.norm(
            clip_vol_g(verts_k - shift_k[None, :], local_R)
            + shift_k[None, :] - verts_k, axis=-1)
        score = jnp.where(tied, moved, jnp.inf)
        vsel = (score <= jnp.min(score)).astype(dtype)
        vsel = vsel * (jnp.cumsum(vsel) <= 1.0)
        xa = vsel @ verts_k
        xb = support_g(-dir_k, local_R)
        # candidate witnesses: the tie-broken prism vertex (terrain feature
        # into geom face — the dominant case), the geom support point (geom
        # corner into prism top), and the support midpoint (edge-edge)
        pos_k = ccd.witness(
            dir_k, depth_k, [xa, xb, 0.5 * (xa + xb)],
            lambda pt: ccd.clip_onto_triangle(pt, verts_k[0], verts_k[1],
                                              verts_k[2]),
            lambda pt: clip_g(pt, local_R, face_k, -dir_k),
            lambda pt: _clip_into_prism(pt, verts_k, -sz[3]),
            lambda pt: clip_vol_g(pt, local_R))
        ds.append(jnp.where(got, -depth_k - 0.5 * margin, 1e6))
        ps.append(pos_k)
        ns.append(dir_k)
        # mask ONLY the selected prism: exact ties (a feature shared by 2-6
        # prisms) must emit one duplicate contact per prism, like MuJoCo
        remaining = jnp.where(oh > 0.5, -jnp.inf, remaining)

    d = jnp.stack(ds)
    pos_local = jnp.stack(ps)
    n_local = jnp.stack(ns)
    return (d, pos_local @ hmat.T + hpos[None, :], n_local @ hmat.T)


def hfield_span(m: Model, geom_ids) -> int:
    """Static per-axis footprint cell count for a group of hfield-convex pairs
    (worst case over the group's geom circumscribed diameters)."""
    cell = 2.0 * float(np.min(np.asarray(m.hfield_size)[:2])) / \
        (min(m.hfield_nrow, m.hfield_ncol) - 1)
    rmax = float(np.max(np.linalg.norm(
        np.asarray(m.geom_size)[np.asarray(geom_ids)], axis=-1)))
    return min(int(np.ceil(2.0 * rmax / cell)) + 2, 8)


def _merge_local_samples(margin, dc, pc, nc_, d4, p4w, n4w):
    """Merge local-sample contacts with the CCD per-prism set. When both
    pipelines find the same feature (within 2 mm) the LOCAL sample wins and
    the CCD contact is dropped: MuJoCo's hfield pipeline measures contacts
    locally (docs/PERF_NOTES.md), and on tilted grinding configs the
    min-translation depth overshoots the locally-measured one (box-12 repro:
    MTV 0.0050 vs mj 0.0037). For point-feature contacts the two coincide,
    so nothing is lost on the validated clean cases; CCD contacts at terrain
    features away from any sample (ridge into face) survive untouched."""
    dd = jnp.linalg.norm(p4w[:, None, :] - pc[None, :, :], axis=-1)
    dup_c = jnp.any((dd < 2e-3) & (d4[:, None] < margin + 1e-6), axis=0)
    dc = jnp.where(dup_c, 1e6, dc)
    return (jnp.concatenate([dc, d4]), jnp.concatenate([pc, p4w]),
            jnp.concatenate([nc_, n4w]))


def _hfield_box(m: Model, hpos, hmat, bpos, bmat, size, margin, n_span):
    """Box vs heightfield: HYBRID narrow phase.

    (a) per-prism CCD contacts (_hfield_convex_ccd) — geometrically-exact
    min-translation contacts, validated 1e-7 against MuJoCo on shallow poses
    (terrain features into the box). (b) the 4 deepest box CORNERS sampled
    against the raised cell triangles (point-wise local depths). MuJoCo's
    hfield pipeline emits non-MTV locally-measured satellite contacts during
    tilted grinding (docs/PERF_NOTES.md) whose load DISTRIBUTION the corner
    samples approximate far better than MTV contacts alone — go2/perlin
    tumbling parity regressed 1e-3 -> 3.5e-3 on pure CCD. Near-duplicates
    between the two sets are dropped (_merge_local_samples)."""
    rbound = jnp.linalg.norm(size)
    lp = hmat.T @ (bpos - hpos)
    dc, pc, nc_ = _hfield_convex_ccd(
        m, hpos, hmat, bpos, bmat, margin,
        lambda d, R: ccd.supval_box(d, lp, R, size),
        lambda d, R: ccd.support_box(d, lp, R, size),
        lambda d, R: ccd.box_face(d, R, size),
        lambda pt, R, face, d: ccd.clip_face_box(pt, lp, R, size, *face),
        lambda pt, R: ccd.clip_into_box(pt, lp, R, size),
        rbound, n_span)
    dtype = bpos.dtype
    signs = jnp.asarray(_BOX_CORNER_SIGNS, dtype)
    corners = bpos[None, :] + (signs * size[None, :]) @ bmat.T   # (8, 3)
    local = (corners - hpos[None, :]) @ hmat
    d, p, n = jax.vmap(
        lambda c: _hfield_point_contact(m, c, 0.5 * margin, margin, dtype))(
            local)
    d4, p4, n4 = _deepest_k(d, p, n, 4)
    return _merge_local_samples(margin, dc, pc, nc_, d4,
                                p4 @ hmat.T + hpos[None, :], n4 @ hmat.T)


def _hfield_cylinder(m: Model, hpos, hmat, cpos, cmat, radius, halflen,
                     margin, n_span):
    """Cylinder vs heightfield: HYBRID narrow phase — per-prism CCD contacts
    plus the 4 deepest endpoint-sphere samples (see _hfield_box for why the
    local samples matter on grinding configs)."""
    rbound = jnp.sqrt(radius * radius + halflen * halflen)
    lp = hmat.T @ (cpos - hpos)
    dc, pc, nc_ = _hfield_convex_ccd(
        m, hpos, hmat, cpos, cmat, margin,
        lambda d, R: ccd.supval_cyl(d, lp, R, radius, halflen),
        lambda d, R: ccd.support_cyl(d, lp, R, radius, halflen),
        lambda d, R: ccd.cyl_face(d, R),
        lambda pt, R, face, d: ccd.clip_face_cyl(pt, lp, R, radius, halflen,
                                                 *face, d),
        lambda pt, R: ccd.clip_into_cyl(pt, lp, R, radius, halflen),
        rbound, n_span)
    axis = cmat[:, 2]
    outs = [_hfield_sphere(m, hpos, hmat, cpos + axis * (s * halflen), radius,
                           margin)
            for s in (1.0, -1.0)]
    d = jnp.concatenate([o[0] for o in outs])
    p = jnp.concatenate([o[1] for o in outs])
    n = jnp.concatenate([o[2] for o in outs])
    d4, p4, n4 = _deepest_k(d, p, n, 4)
    return _merge_local_samples(margin, dc, pc, nc_, d4, p4, n4)


def hfield_span_rbound(m: Model, geom_ids) -> int:
    """hfield_span for mesh geoms: their footprint radius is geom_rbound (the
    hull's circumscribed radius), not |geom_size| (unset for meshes)."""
    cell = 2.0 * float(np.min(np.asarray(m.hfield_size)[:2])) / \
        (min(m.hfield_nrow, m.hfield_ncol) - 1)
    rmax = float(np.max(np.asarray(m.geom_rbound)[np.asarray(geom_ids)]))
    return min(int(np.ceil(2.0 * rmax / cell)) + 2, 8)


def _hfield_mesh(m: Model, hpos, hmat, gpos, gmat, verts, nvert, rbound,
                 margin, n_span):
    """Convex mesh hull vs heightfield: HYBRID narrow phase — per-prism CCD
    contacts plus the 4 deepest hull-vertex local samples, the same
    decomposition as _hfield_box (and for the same reason: MuJoCo reaches
    mesh geoms through the SAME mjc_ConvexHField pipeline as box/cylinder,
    one contact per overlapped margin-raised prism, and emits locally-measured
    satellite contacts during tilted grinding). The CCD part reuses
    _hfield_convex_ccd with hull support callbacks; the witness volume clip
    is a Frank-Wolfe projection into the hull (ccd.clip_into_hull). Anchor:
    the reference reaches hfield-mesh contacts via mj_step
    (quadruped_env.py:271) for mini_cheetah / hyqreal1 on procedural scenes.

    verts (Vmax, 3) hull vertices in the geom frame; nvert scalar (pads
    collapse to vertex 0 — zeros are NOT guaranteed interior for off-center
    hulls); rbound the hull's circumscribed radius."""
    dtype = gpos.dtype
    pad = jnp.arange(verts.shape[0]) >= nvert
    V = jnp.where(pad[:, None], verts[0], verts)
    lp = hmat.T @ (gpos - hpos)
    lR = hmat.T @ gmat

    def hull_local(R):
        return lp[None, :] + V @ R.T          # hull verts, hfield-local frame

    dc, pc, nc_ = _hfield_convex_ccd(
        m, hpos, hmat, gpos, gmat, margin,
        lambda d, R: jnp.sum(d * lp, -1) + ccd.supval_verts(d @ R, V),
        lambda d, R: lp + ccd.support_verts(d @ R, V) @ R.T,
        lambda d, R: ccd.hull_face(d, hull_local(R)),
        lambda pt, R, face, d: ccd.clip_onto_triangle(pt, face[0], face[1],
                                                      face[2]),
        lambda pt, R: ccd.clip_into_hull(pt, hull_local(R)),
        rbound, n_span)
    d, p, n = jax.vmap(
        lambda c: _hfield_point_contact(m, c, 0.5 * margin, margin, dtype))(
            hull_local(lR))
    d = jnp.where(pad, 1e6, d)          # pad rows replicate vertex 0 — drop
    d4, p4, n4 = _deepest_k(d, p, n, 4)
    return _merge_local_samples(margin, dc, pc, nc_, d4,
                                p4 @ hmat.T + hpos[None, :], n4 @ hmat.T)


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
    """Fixed-slot contact set (one env). Slot order is static per model.

    Storage is ONE channel-major feature tensor (7, S): row 0 = dist, rows
    1:4 = pos, rows 4:7 = normal. Under a 4096-env vmap a (B, S, 3, 3)
    frame tensor gets tile-padded ~100× in HBM (XLA pads the minor two dims
    to (8, 128)); the (B, 7, S) layout pads ≤2× and the full (3, 3) frames
    are only constructed lazily for the slots that need them (the ≤32 culled
    solver slots, the feet slots, debug probes)."""

    feat: Any    # (7, ncon)

    @property
    def dist(self):
        return self.feat[0]

    @property
    def pos(self):
        return self.feat[1:4].T

    @property
    def normal(self):
        return self.feat[4:7].T

    @property
    def frame(self):
        """(S, 3, 3) rows (n, t1, t2) — computed on demand (mju_makeFrame)."""
        return make_frame(self.normal)


def collide(m: Model, kin) -> Contacts:
    """Compute all contact slots from FK results.

    Pairs are grouped by (t1, t2) type (contact_layout sorts them) and each group
    runs ONE vmapped primitive over stacked geom poses — ≤8 vectorized op-chains
    per step instead of one chain per pair."""
    dtype = kin.geom_xpos.dtype
    size = jnp.asarray(m.geom_size, dtype)
    specs = contact_layout(m)
    if not specs:
        return Contacts(jnp.zeros((7, 0), dtype))

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
        p1, R1 = kin.geom_xpos[g1], kin.geom_xmat[g1]
        p2, R2 = kin.geom_xpos[g2], kin.geom_xmat[g2]
        s1, s2 = size[g1], size[g2]
        marg = jnp.asarray(np.array([s.margin for s in specs[i:j]]), dtype)

        if t1 == GEOM_PLANE and t2 == GEOM_MESH:
            did = np.asarray(m.geom_dataid)[g2]
            mverts = jnp.asarray(m.mesh_vert, dtype)[did]       # (G, Vmax, 3)
            mnbr = jnp.asarray(m.mesh_nbr)[did]                 # (G, Vmax, D)
            mnum = jnp.asarray(m.mesh_vertnum)[did]             # (G,)
            mrb = jnp.asarray(m.geom_rbound, dtype)[g2]         # (G,)
            d, p, nrm = jax.vmap(_plane_mesh)(p1, R1, p2, R2, mverts, mnbr,
                                              mnum, mrb, marg)
            feats.append(jnp.concatenate([
                d.reshape(1, -1), p.reshape(-1, 3).T,
                nrm.reshape(-1, 3).T], axis=0))
            i = j
            continue
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
            # world box (geom1) vs robot capsule (geom2): CCD runs capsule
            # first; flip the normal back to the geom1→geom2 convention
            def fn(p1, R1, p2, R2, s1, s2, mg):
                d, pos, n = _cap_box_ccd(p2, R2, s2[0], s2[1], p1, R1, s1)
                return d, pos, -n
        elif t1 == GEOM_HFIELD and t2 == GEOM_SPHERE:
            # the margin bias rides the convex hfield pipeline only
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _hfield_sphere(
                m, p1, R1, p2, s2[0], mg)
        elif t1 == GEOM_HFIELD and t2 == GEOM_CAPSULE:
            n_span = hfield_span(m, g2)
            fn = lambda p1, R1, p2, R2, s1, s2, mg, ns=n_span: \
                _hfield_capsule(m, p1, R1, p2, R2, s2[0], s2[1], mg, ns)
        elif t1 == GEOM_HFIELD and t2 == GEOM_BOX:
            n_span = hfield_span(m, g2)
            fn = lambda p1, R1, p2, R2, s1, s2, mg, ns=n_span: _hfield_box(
                m, p1, R1, p2, R2, s2, mg, ns)
        elif t1 == GEOM_HFIELD and t2 == GEOM_CYLINDER:
            n_span = hfield_span(m, g2)
            fn = lambda p1, R1, p2, R2, s1, s2, mg, ns=n_span: \
                _hfield_cylinder(m, p1, R1, p2, R2, s2[0], s2[1], mg, ns)
        elif t1 == GEOM_HFIELD and t2 == GEOM_MESH:
            n_span = hfield_span_rbound(m, g2)
            did = np.asarray(m.geom_dataid)[g2]
            mverts = jnp.asarray(m.mesh_vert, dtype)[did]       # (G, Vmax, 3)
            mnum = jnp.asarray(m.mesh_vertnum)[did]             # (G,)
            mrb = jnp.asarray(m.geom_rbound, dtype)[g2]         # (G,)
            d, p, nrm = jax.vmap(
                lambda p1, R1, p2, R2, vts, nv, rb, mg, ns=n_span:
                _hfield_mesh(m, p1, R1, p2, R2, vts, nv, rb, mg, ns))(
                    p1, R1, p2, R2, mverts, mnum, mrb, marg)
            feats.append(jnp.concatenate([
                d.reshape(1, -1), p.reshape(-1, 3).T,
                nrm.reshape(-1, 3).T], axis=0))
            i = j
            continue
        # ---- robot-robot (self-collision) pairs, type1 ≤ type2 ----
        elif t1 == GEOM_SPHERE and t2 == GEOM_SPHERE:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _sphere_sphere(
                p1, s1[0], p2, s2[0])
        elif t1 == GEOM_SPHERE and t2 == GEOM_CAPSULE:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _sphere_capsule(
                p1, s1[0], p2, R2, s2[0], s2[1])
        elif t1 == GEOM_SPHERE and t2 == GEOM_CYLINDER:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _sphere_cylinder(
                p1, s1[0], p2, R2, s2[0], s2[1])
        elif t1 == GEOM_SPHERE and t2 == GEOM_BOX:
            # _box_sphere's normal points box→sphere = g2→g1 → negate
            def fn(p1, R1, p2, R2, s1, s2, mg):
                d, pos, n = _box_sphere(p2, R2, s2, p1, s1[0])
                return d, pos, -n
        elif t1 == GEOM_CAPSULE and t2 == GEOM_CAPSULE:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _capsule_capsule(
                p1, R1, s1[0], s1[1], p2, R2, s2[0], s2[1])
        elif t1 == GEOM_CAPSULE and t2 == GEOM_CYLINDER:
            # cylinder treated as a capsule of the same radius/halflen (flat
            # caps/rims approximated round — documented approximation)
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _capsule_capsule(
                p1, R1, s1[0], s1[1], p2, R2, s2[0], s2[1])
        elif t1 == GEOM_CAPSULE and t2 == GEOM_BOX:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _cap_box_ccd(
                p1, R1, s1[0], s1[1], p2, R2, s2)
        elif t1 == GEOM_CYLINDER and t2 == GEOM_CYLINDER:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _capsule_capsule(
                p1, R1, s1[0], s1[1], p2, R2, s2[0], s2[1])
        elif t1 == GEOM_CYLINDER and t2 == GEOM_BOX:
            fn = lambda p1, R1, p2, R2, s1, s2, mg: _cyl_box_ccd(
                p1, R1, s1[0], s1[1], p2, R2, s2)
        elif t1 == GEOM_SPHERE and t2 == GEOM_MESH:
            did2 = np.asarray(m.geom_dataid)[g2]
            W2l = jnp.asarray(m.mesh_vert, dtype)[did2]
            n2 = jnp.asarray(m.mesh_vertnum)[did2]
            d, p, n = jax.vmap(lambda p1, p2, R2, s1, W2, nv2: _sphere_mesh(
                p1, s1[0], p2, R2, W2, nv2))(p1, p2, R2, s1, W2l, n2)
            feats.append(jnp.concatenate([
                d.reshape(1, -1), p.reshape(-1, 3).T, n.reshape(-1, 3).T],
                axis=0))
            i = j
            continue
        elif t1 == GEOM_BOX and t2 == GEOM_MESH:
            # box as its 8-corner hull through the hull-hull multiccd pipeline
            # (see _NCON_TABLE note; normal convention box→mesh = geom1→geom2
            # matches _mesh_mesh's hull1→hull2)
            did2 = np.asarray(m.geom_dataid)[g2]
            W2l = jnp.asarray(m.mesh_vert, dtype)[did2]
            n2 = jnp.asarray(m.mesh_vertnum)[did2]
            corners = jnp.asarray(_BOX_CORNER_SIGNS, dtype)
            W1l = corners[None, :, :] * s1[:, None, :]        # (G, 8, 3)
            n1 = jnp.full((len(g1),), 8, jnp.int32)
            d, p, n = jax.vmap(_mesh_mesh)(p1, R1, W1l, n1, p2, R2, W2l, n2,
                                           marg)
            feats.append(jnp.concatenate([
                d.reshape(1, -1), p.reshape(-1, 3).T, n.reshape(-1, 3).T],
                axis=0))
            i = j
            continue
        elif t1 == GEOM_MESH and t2 == GEOM_MESH:
            did1 = np.asarray(m.geom_dataid)[g1]
            did2 = np.asarray(m.geom_dataid)[g2]
            W1l = jnp.asarray(m.mesh_vert, dtype)[did1]
            W2l = jnp.asarray(m.mesh_vert, dtype)[did2]
            n1 = jnp.asarray(m.mesh_vertnum)[did1]
            n2 = jnp.asarray(m.mesh_vertnum)[did2]
            d, p, n = jax.vmap(_mesh_mesh)(p1, R1, W1l, n1, p2, R2, W2l, n2,
                                           marg)
            feats.append(jnp.concatenate([
                d.reshape(1, -1), p.reshape(-1, 3).T, n.reshape(-1, 3).T],
                axis=0))
            i = j
            continue
        elif t1 == GEOM_BOX and t2 == GEOM_BOX:
            fn = None  # group-vectorized path below (pair axis minor)
        else:  # pragma: no cover - layout filters unsupported pairs
            raise AssertionError((t1, t2))

        if fn is None:
            d, p, n = _box_box_group(p1, R1, s1, p2, R2, s2)
        else:
            d, p, n = jax.vmap(fn)(p1, R1, p2, R2, s1, s2, marg)  # (G, k, ...)
        # channel-major (7, G*k) feature block — see Contacts docstring
        feats.append(jnp.concatenate([
            d.reshape(1, -1), p.reshape(-1, 3).T, n.reshape(-1, 3).T], axis=0))
        i = j

    return Contacts(jnp.concatenate(feats, axis=1))
