"""Constraint assembly: MuJoCo's soft-constraint model with static row layout.

Replaces mj_makeConstraint / mj_projectConstraint. Two static-shape groups:

  * SIMPLE rows — row-separable costs: dof friction-loss (Huber), joint limits
    (one-sided), frictionless contact normals, and pyramidal contact rows
    (J_n ± μᵢ·J_fi pairs). Stored as a dense (ns, nv) Jacobian.
  * CONE blocks — elliptic contacts with condim > 1: per contact slot a padded
    (6, nv) Jacobian + (6,) aref/R with a static dim mask; the solver applies the
    dual-cone projection cost per block, vectorized over slots.

Soft-constraint parameters per row (verified numerically against mjData.efc_*,
scripts/probe_efc.py):
  x      = pos − margin                       (constraint violation)
  imp(x) = d0 + (d1−d0)·spline(|x|/width)     (solimp midpoint/power sigmoid)
  B      = 2/(d1·timeconst),  K = 1/(d1²·timeconst²·dampratio²)
  aref   = −B·(J qvel) − K·imp·x              (friction rows: no position term)
  R      = max(1−imp, 1e−4)/imp · diagApprox  (D = 1/R)
  diagApprox: dof_invweight0 (dof rows); body_invweight0[b,0] sums (contact
    normals); pyramidal row i: 2·(inv_t + μᵢ²·inv_dim_i); elliptic friction row i:
    inv_t·(μ₀/μᵢ)²/impratio (go2.xml:4 impratio=100).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gym_quadruped_tpu.models.model import CONE_ELLIPTIC, Model
from gym_quadruped_tpu.physics.collision import Contacts, contact_layout
from gym_quadruped_tpu.physics.kinematics import Kin, ancestor_dof_mask


# ---------------------------------------------------------------------------------
# static layout
# ---------------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConstraintLayout:
    """Static constraint structure (numpy, trace-time constants)."""

    fl_dofs: np.ndarray        # (nfl,)
    lim_jnts: np.ndarray       # (nlim,)
    n_fl: int
    n_lim: int
    elliptic: bool
    # contact slots (parallel to collision slot order)
    con_condim: np.ndarray     # (S,)
    con_mu: np.ndarray         # (S, 5)
    con_solref: np.ndarray     # (S, 2)
    con_solimp: np.ndarray     # (S, 5)
    con_margin: np.ndarray     # (S,)
    con_incl: np.ndarray       # (S,) inclusion threshold: margin for primitive
                               # colliders; 0 for hfield pairs (MuJoCo's convex
                               # hfield pipeline only returns contacts whose
                               # margin-BIASED dist is negative — probed r2)
    con_body: np.ndarray       # (S,) robot body of geom2
    con_body1: np.ndarray      # (S,) body of geom1 (0 for world pairs)
    con_geom1: np.ndarray      # (S,) world geom id
    con_geom2: np.ndarray      # (S,) robot geom id (for per-foot force extraction)
    con_prio: np.ndarray       # (S,) -1 geom1 wins, +1 geom2 wins, 0 equal (max rule)
    # derived
    n_simple: int              # total simple rows
    simple_unilateral: np.ndarray  # (n_simple,) bool (False → huber/fl row)
    con_is_cone: np.ndarray    # (S,) bool — handled as cone block
    cone_slots: np.ndarray     # indices of cone slots
    simple_con_slots: np.ndarray  # indices of slots emitted as simple rows
    cone_dim_mask: np.ndarray  # (n_cone, 6)


_MODEL_CACHE: dict = {}


@functools.lru_cache(maxsize=64)
def _layout_cached(key) -> ConstraintLayout:
    m: Model = _MODEL_CACHE[key]
    fl_dofs = np.where(np.asarray(m.dof_frictionloss) > 0)[0].astype(np.int32)
    lim_jnts = np.where(np.asarray(m.jnt_limited))[0].astype(np.int32)
    elliptic = int(m.cone) == CONE_ELLIPTIC

    specs = contact_layout(m)
    condims, mus, solrefs, solimps, margins, incls = [], [], [], [], [], []
    bodies, bodies1, geom1s, geom2s, prios = [], [], [], [], []
    from gym_quadruped_tpu.models.model import GEOM_HFIELD
    for spec in specs:
        p1 = int(m.geom_priority[spec.geom1])
        p2 = int(m.geom_priority[spec.geom2])
        prio = 0 if p1 == p2 else (-1 if p1 > p2 else 1)
        hfield_pair = int(m.geom_type[spec.geom1]) == GEOM_HFIELD
        for _ in range(spec.ncon):
            condims.append(spec.condim)
            mus.append(spec.friction)
            solrefs.append(spec.solref)
            solimps.append(spec.solimp)
            margins.append(spec.margin)
            incls.append(0.0 if hfield_pair else spec.margin)
            bodies.append(int(m.geom_bodyid[spec.geom2]))
            bodies1.append(int(m.geom_bodyid[spec.geom1]))
            geom1s.append(spec.geom1)
            geom2s.append(spec.geom2)
            prios.append(prio)
    condims = np.array(condims, np.int32)
    S = len(condims)
    is_cone = np.array([elliptic and cd > 1 for cd in condims], bool)
    cone_slots = np.where(is_cone)[0].astype(np.int32)
    simple_slots = np.where(~is_cone)[0].astype(np.int32)

    n_simple = len(fl_dofs) + len(lim_jnts)
    for s in simple_slots:
        cd = int(condims[s])
        n_simple += 1 if cd == 1 else 2 * (cd - 1)
    unilateral = np.ones(n_simple, bool)
    unilateral[:len(fl_dofs)] = False  # huber rows

    cone_dim_mask = np.zeros((len(cone_slots), 6), np.float64)
    for i, s in enumerate(cone_slots):
        cone_dim_mask[i, :int(condims[s])] = 1.0

    return ConstraintLayout(
        fl_dofs=fl_dofs, lim_jnts=lim_jnts,
        n_fl=len(fl_dofs), n_lim=len(lim_jnts), elliptic=elliptic,
        con_condim=condims,
        con_mu=np.array(mus, np.float64).reshape(S, 5),
        con_solref=np.array(solrefs, np.float64).reshape(S, 2),
        con_solimp=np.array(solimps, np.float64).reshape(S, 5),
        con_margin=np.array(margins, np.float64).reshape(S),
        con_incl=np.array(incls, np.float64).reshape(S),
        con_body=np.array(bodies, np.int32),
        con_body1=np.array(bodies1, np.int32),
        con_geom1=np.array(geom1s, np.int32),
        con_geom2=np.array(geom2s, np.int32),
        con_prio=np.array(prios, np.int32),
        n_simple=n_simple,
        simple_unilateral=unilateral,
        con_is_cone=is_cone, cone_slots=cone_slots,
        simple_con_slots=simple_slots,
        cone_dim_mask=cone_dim_mask)


def constraint_layout(m: Model) -> ConstraintLayout:
    key = id(m)
    _MODEL_CACHE[key] = m
    return _layout_cached(key)


# ---------------------------------------------------------------------------------
# soft-constraint scalar model
# ---------------------------------------------------------------------------------

def impedance(solimp, x):
    """Position-dependent impedance d(x) (solimp spline), clamped to (1e-4, 1-1e-4)."""
    d0, d1, width, mid, power = (solimp[..., 0], solimp[..., 1], solimp[..., 2],
                                 solimp[..., 3], solimp[..., 4])
    y = jnp.minimum(jnp.abs(x) / jnp.maximum(width, 1e-12), 1.0)
    lo = mid ** (1.0 - power) * y ** power
    hi = 1.0 - (1.0 - mid) ** (1.0 - power) * (1.0 - y) ** power
    z = jnp.where(y < mid, lo, hi)
    return jnp.clip(d0 + z * (d1 - d0), 1e-4, 1.0 - 1e-4)


def kb(solref, solimp):
    """Stiffness K and damping B from solref (negative solref = direct spec)."""
    tc, dr = solref[..., 0], solref[..., 1]
    d1 = solimp[..., 1]
    K_std = 1.0 / jnp.maximum(d1 * d1 * tc * tc * dr * dr, 1e-12)
    B_std = 2.0 / jnp.maximum(d1 * tc, 1e-12)
    K_dir = -tc / jnp.maximum(d1 * d1, 1e-12)
    B_dir = -dr / jnp.maximum(d1, 1e-12)
    std = jnp.minimum(tc, dr) > 0
    return jnp.where(std, K_std, K_dir), jnp.where(std, B_std, B_dir)


# ---------------------------------------------------------------------------------
# efc data (traced)
# ---------------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Efc:
    """Assembled constraint rows (one env). Simple rows + padded cone blocks."""

    J: Any            # (ns, nv)
    aref: Any         # (ns,)
    R: Any            # (ns,)
    active: Any       # (ns,) bool
    frictionloss: Any  # (ns,)
    con_J: Any        # (C, 6, nv)
    con_aref: Any     # (C, 6)
    con_R: Any        # (C, 6)
    con_active: Any   # (C,) bool
    cone_mu: Any      # (C, 5) friction of the cone slots (traced: may be randomized)
    cone_dim_mask: Any  # (C, 6) condim mask (traced so slots can be culled/gathered)
    cone_dist: Any    # (C,) contact distance of the cone slots (culling key)
    cone_sel: Any = None  # (C,) int32 original cone-slot index of each block (for
    #                   scattering forces back when assembly was pre-culled)
    pyr_sel: Any = None  # (Kp,) int32 local indices into lay.simple_con_slots
    #                   when PYRAMIDAL contact rows were cull-assembled; the
    #                   simple block then holds n_fl+n_lim static rows followed
    #                   by 2(condim-1) rows per selected slot (forces.py
    #                   decodes/scatters through this)


def _point_jacobians(m: Model, kin: Kin, cdof: jnp.ndarray, pos: jnp.ndarray,
                     body_ids: np.ndarray):
    """Translational/rotational jacobians (k, 3, nv) for k points on bodies."""
    from gym_quadruped_tpu.physics.kinematics import spatial_origin

    omega = cdof[:, :3]
    v0 = cdof[:, 3:]
    rel = pos - spatial_origin(kin)[None, :]
    vp = v0[None] + jnp.cross(
        jnp.broadcast_to(omega[None], (rel.shape[0],) + omega.shape),
        rel[:, None, :])  # (k, nv, 3)
    masks = np.stack([ancestor_dof_mask(m, int(b)) for b in body_ids])
    masks_j = jnp.asarray(masks, pos.dtype)[..., None]
    jacp = jnp.swapaxes(vp * masks_j, 1, 2)
    jacr = jnp.swapaxes(omega[None] * masks_j, 1, 2)
    return jacp, jacr


def runtime_con_mu(m: Model, geom_friction) -> jnp.ndarray:
    """Per-slot friction (S, 5) from a traced (ngeom, 3) geom_friction table.

    Applies MuJoCo's combination rule (priority winner, else elementwise max) with
    the static priority relation captured in the layout, so per-env friction
    randomization (reference _set_ground_friction, quadruped_env.py:1277-1298) stays
    a pure-array op under vmap.
    """
    lay = constraint_layout(m)
    f1 = geom_friction[lay.con_geom1]  # (S, 3)
    f2 = geom_friction[lay.con_geom2]
    prio = jnp.asarray(lay.con_prio)[:, None]
    fri3 = jnp.where(prio < 0, f1, jnp.where(prio > 0, f2, jnp.maximum(f1, f2)))
    return jnp.stack([fri3[:, 0], fri3[:, 0], fri3[:, 1],
                      fri3[:, 2], fri3[:, 2]], axis=1)


@functools.lru_cache(maxsize=64)
def _con_mask_table_cached(key) -> np.ndarray:
    """(S, nv) SIGNED dof masks per slot: mask(body2) - mask(body1).

    The contact Jacobian is the RELATIVE point-velocity Jacobian; the point
    velocity field vp is body-independent, so J_rel = vp.(mask2 - mask1) —
    shared-ancestor dofs cancel exactly. World pairs keep the plain body2
    mask (the world body's mask is zero)."""
    lay: ConstraintLayout = _MODEL_CACHE[key][1]
    m: Model = _MODEL_CACHE[key][0]
    m2 = np.stack([ancestor_dof_mask(m, int(b)) for b in lay.con_body])
    m1 = np.stack([ancestor_dof_mask(m, int(b)) for b in lay.con_body1])
    return m2 - m1


def con_mask_table(m: Model, lay: ConstraintLayout) -> np.ndarray:
    key = (id(m), id(lay))
    _MODEL_CACHE[key] = (m, lay)
    return _con_mask_table_cached(key)


def _point_jacobians_dyn(kin: Kin, cdof: jnp.ndarray, pos: jnp.ndarray,
                         masks: jnp.ndarray):
    """Point Jacobians for traced (gathered) points with traced dof masks."""
    from gym_quadruped_tpu.physics.kinematics import spatial_origin

    omega = cdof[:, :3]
    v0 = cdof[:, 3:]
    rel = pos - spatial_origin(kin)[None, :]
    vp = v0[None] + jnp.cross(
        jnp.broadcast_to(omega[None], (rel.shape[0],) + omega.shape),
        rel[:, None, :])  # (k, nv, 3)
    masks_j = masks[..., None]
    jacp = jnp.swapaxes(vp * masks_j, 1, 2)
    jacr = jnp.swapaxes(omega[None] * masks_j, 1, 2)
    return jacp, jacr


def make_efc(m: Model, kin: Kin, qpos: jnp.ndarray, qvel: jnp.ndarray,
             contacts: Contacts, cdof: jnp.ndarray, con_mu=None,
             max_cone: int | None = None) -> Efc:
    """Assemble constraint rows. With `max_cone`, only the max_cone
    nearest-by-distance cone slots get Jacobians and efc rows (contact culling
    BEFORE assembly — measured at ~18 ms/step for all-slot assembly at B=4096;
    exact whenever ≤ max_cone slots touch)."""
    dtype = qpos.dtype
    lay = constraint_layout(m)
    nv = m.nv
    if con_mu is None:
        con_mu = jnp.asarray(lay.con_mu, dtype)
    else:
        con_mu = jnp.asarray(con_mu, dtype)
    J_rows, aref_rows, R_rows, act_rows, fl_rows = [], [], [], [], []

    # ---- 1. dof friction loss ------------------------------------------------------
    if lay.n_fl:
        dofs = lay.fl_dofs
        solref = jnp.asarray(m.dof_solref[dofs], dtype)
        solimp = jnp.asarray(m.dof_solimp[dofs], dtype)
        imp = impedance(solimp, jnp.zeros(len(dofs), dtype))
        _, B = kb(solref, solimp)
        eye_rows = jnp.zeros((len(dofs), nv), dtype)
        eye_rows = eye_rows.at[jnp.arange(len(dofs)), dofs].set(1.0)
        J_rows.append(eye_rows)
        aref_rows.append(-B * qvel[dofs])
        R_rows.append(jnp.maximum(1.0 - imp, 1e-4) / imp *
                      jnp.asarray(m.dof_invweight0[dofs], dtype))
        act_rows.append(jnp.ones(len(dofs), bool))
        fl_rows.append(jnp.asarray(m.dof_frictionloss[dofs], dtype))

    # ---- 2. joint limits -------------------------------------------------------------
    if lay.n_lim:
        jids = lay.lim_jnts
        qadr = m.jnt_qposadr[jids]
        dadr = m.jnt_dofadr[jids]
        lo = jnp.asarray(m.jnt_range[jids, 0], dtype)
        hi = jnp.asarray(m.jnt_range[jids, 1], dtype)
        dist_lo = qpos[qadr] - lo
        dist_hi = hi - qpos[qadr]
        low_side = dist_lo < dist_hi
        dist = jnp.where(low_side, dist_lo, dist_hi)
        sign = jnp.where(low_side, 1.0, -1.0).astype(dtype)
        Jl = jnp.zeros((len(jids), nv), dtype)
        Jl = Jl.at[jnp.arange(len(jids)), dadr].set(sign)
        margin = jnp.asarray(m.jnt_margin[jids], dtype)
        solref = jnp.asarray(m.jnt_solref[jids], dtype)
        solimp = jnp.asarray(m.jnt_solimp[jids], dtype)
        x = dist - margin
        imp = impedance(solimp, x)
        K, B = kb(solref, solimp)
        J_rows.append(Jl)
        aref_rows.append(-B * (sign * qvel[dadr]) - K * imp * x)
        R_rows.append(jnp.maximum(1.0 - imp, 1e-4) / imp *
                      jnp.asarray(m.dof_invweight0[dadr], dtype))
        act_rows.append(dist < margin)
        fl_rows.append(jnp.zeros(len(jids), dtype))

    # ---- 3. contacts ------------------------------------------------------------------
    S = len(lay.con_condim)
    C_all = len(lay.cone_slots)
    mask_table = con_mask_table(m, lay) if S else None

    def slot_dirs_vel(pos, frame, masks):
        """(k, 6, nv) contact-frame direction rows + (k, 6) velocities."""
        jacp, jacr = _point_jacobians_dyn(kin, cdof, pos, masks)
        dirs_t = jnp.einsum('sij,sjv->siv', frame, jacp)
        dirs_r = jnp.einsum('sij,sjv->siv', frame, jacr)
        dirs = jnp.concatenate([dirs_t, dirs_r], axis=1)
        return dirs, jnp.einsum('sdv,v->sd', dirs, qvel)

    # MuJoCo's diagApprox for a contact sums BOTH bodies' invweights (the
    # world body's invweight0 is zero, so world pairs are unchanged)
    inv_t_all = jnp.asarray(m.body_invweight0[lay.con_body, 0]
                            + m.body_invweight0[lay.con_body1, 0], dtype) \
        if S else None
    inv_r_all = jnp.asarray(m.body_invweight0[lay.con_body, 1]
                            + m.body_invweight0[lay.con_body1, 1], dtype) \
        if S else None

    # simple-row contacts (frictionless or pyramidal)
    ss = lay.simple_con_slots
    pyr_sel = None
    uniform_cd = ({int(c) for c in lay.con_condim[ss]} if len(ss) else set())
    if len(ss) and len(uniform_cd) == 1 and (cd_u := uniform_cd.pop()) > 1:
        # Vectorized CULLED pyramidal assembly: only the max_cone nearest
        # slots get rows (exact when ≤ max_cone slots touch — the same
        # measured cap argument as the cone path). Replaces the per-slot
        # Python loop below, which at hyqreal2/random_boxes scale (6173
        # slots → 24722 rows) neither compiles nor runs in budget.
        from gym_quadruped_tpu.physics.collision import make_frame as _mkp
        Ks = len(ss) if max_cone is None else min(max_cone, len(ss))
        ss_np = np.asarray(ss)
        dist_s = contacts.dist[ss_np]
        if Ks < len(ss):
            _, sel = jax.lax.top_k(-dist_s, Ks)
        else:
            sel = jnp.arange(len(ss), dtype=jnp.int32)
        onehot_p = (sel[:, None] ==
                    jnp.arange(len(ss), dtype=sel.dtype)[None, :]).astype(dtype)

        def take_pyr(x):
            flat = x.reshape(len(ss), -1)
            out = jnp.matmul(onehot_p, flat,
                             precision=jax.lax.Precision.HIGHEST)
            return out.reshape((Ks,) + x.shape[1:])

        feat_static = jnp.asarray(np.concatenate([
            mask_table[ss_np],                            # nv
            np.asarray(lay.con_margin)[ss_np, None],      # 1
            np.asarray(lay.con_solimp)[ss_np],            # 5
            np.asarray(lay.con_solref)[ss_np],            # 2
            np.asarray(lay.con_incl)[ss_np, None],        # 1
        ], axis=1), dtype)
        feat_traced = jnp.concatenate([
            contacts.feat[:, ss_np].T,                    # 7
            inv_t_all[ss_np][:, None],                    # 1
            inv_r_all[ss_np][:, None],                    # 1
            con_mu[ss_np],                                # 5
        ], axis=1)
        sel_feat = take_pyr(jnp.concatenate([feat_static, feat_traced],
                                            axis=1))
        o = 0
        masks_s = sel_feat[:, o:o + nv]; o += nv
        margin_s = sel_feat[:, o]; o += 1
        solimp_s = sel_feat[:, o:o + 5]; o += 5
        solref_s = sel_feat[:, o:o + 2]; o += 2
        incl_s = sel_feat[:, o]; o += 1
        dist_sel = sel_feat[:, o]; o += 1
        pos_s = sel_feat[:, o:o + 3]; o += 3
        n_s = sel_feat[:, o:o + 3]; o += 3
        inv_ts = sel_feat[:, o]; o += 1
        inv_rs = sel_feat[:, o]; o += 1
        mu_s = sel_feat[:, o:o + 5]; o += 5

        dirs, vel6 = slot_dirs_vel(pos_s, _mkp(n_s), masks_s)
        x_p = dist_sel - margin_s
        imp_p = impedance(solimp_s, x_p)
        K_p, B_p = kb(solref_s, solimp_s)
        include_p = dist_sel < incl_s
        rimp_p = jnp.maximum(1.0 - imp_p, 1e-4) / imp_p
        fri_inv = [inv_ts, inv_ts, inv_rs, inv_rs, inv_rs]
        rows_J, rows_aref, rows_R = [], [], []
        for i in range(cd_u - 1):
            mu_i = mu_s[:, i]
            diag = 2.0 * (inv_ts + mu_i * mu_i * fri_inv[i])
            for sgn in (1.0, -1.0):
                rows_J.append(dirs[:, 0] + sgn * mu_i[:, None] * dirs[:, 1 + i])
                vel = vel6[:, 0] + sgn * mu_i * vel6[:, 1 + i]
                rows_aref.append(-B_p * vel - K_p * imp_p * x_p)
                rows_R.append(rimp_p * diag)
        nrows = 2 * (cd_u - 1)
        J_rows.append(jnp.stack(rows_J, axis=1).reshape(Ks * nrows, nv))
        aref_rows.append(jnp.stack(rows_aref, axis=1).reshape(-1))
        R_rows.append(jnp.stack(rows_R, axis=1).reshape(-1))
        act_rows.append(jnp.repeat(include_p, nrows))
        fl_rows.append(jnp.zeros(Ks * nrows, dtype))
        pyr_sel = sel.astype(jnp.int32)
        ss = ss[:0]                                       # skip the loop below

    if len(ss):
        from gym_quadruped_tpu.physics.collision import make_frame as _mk
        pos_s = contacts.pos[ss]
        dirs, vel6 = slot_dirs_vel(pos_s, _mk(contacts.normal[ss]),
                                   jnp.asarray(mask_table[ss], dtype))
        margin = jnp.asarray(lay.con_margin[ss], dtype)
        solimp = jnp.asarray(lay.con_solimp[ss], dtype)
        x = contacts.dist[ss] - margin
        imp = impedance(solimp, x)
        K, B = kb(jnp.asarray(lay.con_solref[ss], dtype), solimp)
        include = contacts.dist[ss] < jnp.asarray(lay.con_incl[ss], dtype)
        rimp = jnp.maximum(1.0 - imp, 1e-4) / imp
        aref_n = -B * vel6[:, 0] - K * imp * x
        inv_t = inv_t_all[ss]
        inv_r = inv_r_all[ss]

        for li, s in enumerate(ss):
            s = int(s)
            cd = int(lay.con_condim[s])
            if cd == 1:
                J_rows.append(dirs[li, 0][None])
                aref_rows.append(aref_n[li][None])
                R_rows.append((rimp[li] * inv_t[li])[None])
                act_rows.append(include[li][None])
                fl_rows.append(jnp.zeros(1, dtype))
            else:
                fri_inv = [inv_t[li], inv_t[li], inv_r[li], inv_r[li],
                           inv_r[li]]
                for i in range(cd - 1):
                    mu_i = con_mu[s, i]
                    diag = 2.0 * (inv_t[li] + mu_i * mu_i * fri_inv[i])
                    for sgn in (1.0, -1.0):
                        Jr = dirs[li, 0] + sgn * mu_i * dirs[li, 1 + i]
                        vel = vel6[li, 0] + sgn * mu_i * vel6[li, 1 + i]
                        J_rows.append(Jr[None])
                        aref_rows.append(
                            (-B[li] * vel - K[li] * imp[li] * x[li])[None])
                        R_rows.append((rimp[li] * diag)[None])
                        act_rows.append(include[li][None])
                        fl_rows.append(jnp.zeros(1, dtype))

    # cone blocks (elliptic, condim > 1): cull BEFORE assembly — Jacobians and
    # rows are only built for the max_cone nearest slots
    if C_all:
        cs_np = np.asarray(lay.cone_slots)
        dist_c = contacts.dist[cs_np]                     # (C_all,)
        if max_cone is not None and max_cone < C_all:
            _, sel = jax.lax.top_k(-dist_c, max_cone)     # local cone indices
        else:
            sel = jnp.arange(C_all, dtype=jnp.int32)

        # ONE one-hot matmul selects every per-slot feature: batched dynamic
        # gathers serialize on the TPU (measured ~240 ms/step at B=4096 with
        # ~1000 self-collision slots); a (K, C_all) 0/1 matrix against a
        # concatenated (C_all, F) feature table rides the MXU instead.
        onehot = (sel[:, None] ==
                  jnp.arange(C_all, dtype=sel.dtype)[None, :]).astype(dtype)

        def take_cone(x):
            """(C_all, ...) → (K, ...) via the one-hot matmul."""
            flat = x.reshape(C_all, -1)
            out = jnp.matmul(onehot, flat, precision=jax.lax.Precision.HIGHEST)
            return out.reshape((onehot.shape[0],) + x.shape[1:])

        # static per-slot tables restricted to cone slots (numpy, build-time)
        feat_static = jnp.asarray(np.concatenate([
            mask_table[cs_np],                            # nv
            np.asarray(lay.con_margin)[cs_np, None],      # 1
            np.asarray(lay.con_solimp)[cs_np],            # 5
            np.asarray(lay.con_solref)[cs_np],            # 2
            np.asarray(lay.con_incl)[cs_np, None],        # 1
        ], axis=1), dtype)
        feat_traced = jnp.concatenate([
            contacts.feat[:, cs_np].T,                    # 7: dist, pos, normal
            inv_t_all[cs_np][:, None],                    # 1
            con_mu[cs_np],                                # 5
        ], axis=1)
        sel_feat = take_cone(jnp.concatenate([feat_static, feat_traced],
                                             axis=1))
        o = 0
        masks_c = sel_feat[:, o:o + nv]; o += nv
        margin_c = sel_feat[:, o]; o += 1
        solimp_c = sel_feat[:, o:o + 5]; o += 5
        solref_c = sel_feat[:, o:o + 2]; o += 2
        incl_c = sel_feat[:, o]; o += 1
        dist_sel = sel_feat[:, o]; o += 1
        pos_c = sel_feat[:, o:o + 3]; o += 3
        n_c = sel_feat[:, o:o + 3]; o += 3
        inv_tc = sel_feat[:, o]; o += 1
        mu = sel_feat[:, o:o + 5]; o += 5

        from gym_quadruped_tpu.physics.collision import make_frame as _mkf
        frame_c = _mkf(n_c)                            # built for K slots only
        dirs_c, vel6_c = slot_dirs_vel(pos_c, frame_c, masks_c)
        x_c = dist_sel - margin_c
        imp_c = impedance(solimp_c, x_c)
        K_c, B_c = kb(solref_c, solimp_c)
        include_c = dist_sel < incl_c
        rimp_c = jnp.maximum(1.0 - imp_c, 1e-4) / imp_c
        aref_nc = -B_c * vel6_c[:, 0] - K_c * imp_c * x_c

        dim_mask = take_cone(jnp.asarray(lay.cone_dim_mask, dtype))
        mu0 = mu[:, 0]
        con_J = dirs_c * dim_mask[:, :, None]
        aref_f = -B_c[:, None] * vel6_c[:, 1:]            # friction: no K term
        con_aref = jnp.concatenate([aref_nc[:, None], aref_f], axis=1) * dim_mask
        # R: normal = rimp·inv_t; friction i = rimp·inv_t·(μ₀/μᵢ)²/impratio
        R_fric = (rimp_c[:, None] * inv_tc[:, None] *
                  (mu0[:, None] / jnp.maximum(mu, 1e-12)) ** 2 / m.impratio)
        con_R = jnp.concatenate([(rimp_c * inv_tc)[:, None], R_fric], axis=1)
        con_R = jnp.where(dim_mask > 0, con_R, 1.0)
        con_active = include_c
        cone_mu = mu
        cone_dim_mask = dim_mask
        cone_dist = dist_sel
        cone_sel = sel.astype(jnp.int32)
    else:
        con_J = jnp.zeros((0, 6, nv), dtype)
        con_aref = jnp.zeros((0, 6), dtype)
        con_R = jnp.ones((0, 6), dtype)
        con_active = jnp.zeros((0,), bool)
        cone_mu = jnp.zeros((0, 5), dtype)
        cone_dim_mask = jnp.zeros((0, 6), dtype)
        cone_dist = jnp.zeros((0,), dtype)
        cone_sel = jnp.zeros((0,), jnp.int32)

    if J_rows:
        J = jnp.concatenate(J_rows)
        aref = jnp.concatenate(aref_rows)
        R = jnp.concatenate(R_rows)
        active = jnp.concatenate(act_rows)
        fl = jnp.concatenate(fl_rows)
    else:
        J = jnp.zeros((0, nv), dtype)
        aref = R = fl = jnp.zeros((0,), dtype)
        active = jnp.zeros((0,), bool)
    if pyr_sel is None:
        assert J.shape[0] == lay.n_simple, (J.shape, lay.n_simple)
    return Efc(J=J, aref=aref, R=R, active=active, frictionloss=fl,
               con_J=con_J, con_aref=con_aref, con_R=con_R, con_active=con_active,
               cone_mu=cone_mu, cone_dim_mask=cone_dim_mask, cone_dist=cone_dist,
               cone_sel=cone_sel, pyr_sel=pyr_sel)


def scatter_cone_forces(cone_sel, f_cone, C_all: int):
    """(K,) slot indices + (K, 6) culled forces → (C_all, 6) full-slot forces.
    One-hot transpose matmul — a batched scatter serializes on TPU."""
    onehot = (cone_sel[:, None] ==
              jnp.arange(C_all, dtype=cone_sel.dtype)[None, :]).astype(
                  f_cone.dtype)
    return jnp.matmul(onehot.T, f_cone, precision=jax.lax.Precision.HIGHEST)


def cull_cone_slots(efc: Efc, k: int):
    """Keep the k nearest cone slots (exact when ≤ k slots are in contact).

    Inactive slots (dist ≥ margin) contribute zero force and zero curvature, so
    restricting the solve to the k smallest-distance slots is exact whenever the
    number of touching contacts is ≤ k — MuJoCo similarly caps its contact count.
    Cuts the Newton solve's cone-block work from C to k (go2/flat C=99,
    go2/random_boxes C=1999) and bounds the VMEM footprint for fused kernels.

    Returns (culled Efc, sel (k,) indices into the original slot axis).
    """
    import jax

    C = efc.con_J.shape[0]
    if C <= k:
        return efc, None
    _, sel = jax.lax.top_k(-efc.cone_dist, k)
    take = lambda x: jnp.take(x, sel, axis=0)
    return Efc(J=efc.J, aref=efc.aref, R=efc.R, active=efc.active,
               frictionloss=efc.frictionloss,
               con_J=take(efc.con_J), con_aref=take(efc.con_aref),
               con_R=take(efc.con_R), con_active=take(efc.con_active),
               cone_mu=take(efc.cone_mu), cone_dim_mask=take(efc.cone_dim_mask),
               cone_dist=take(efc.cone_dist),
               cone_sel=take(efc.cone_sel)), sel
