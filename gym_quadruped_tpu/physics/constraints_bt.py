"""Batch-trailing constraint assembly (the efc counterpart of collision_bt).

`constraints.make_efc` under a 4096-env vmap builds its cone-slot Jacobians
and direction rows as (B, K, 6, nv) / (B, K, nv, 3) batch-LEADING tensors;
the current platform's layout assignment puts the 128-lane axis on the tiny
minor dims (docs/PERF_NOTES.md r4 — efc assembly alone accounts for ~780 of
984 ms/step). This module assembles the SAME rows with every large
intermediate shaped (..., K, nv, B) — batch minor — and transposes only the
final solver-facing leaves back to batch-leading.

Division of labor (measured, scripts/probes/probe_bt_narrow.py):
  * slot selection (top-k + one-hot feature matmuls) stays batch-LEADING —
    these are MXU contractions, unaffected by the layout regression;
  * everything elementwise after selection (frames, point Jacobians,
    direction rows, aref/R scalars) runs batch-trailing on full-occupancy
    (K·nv, B) tiles.

Semantics pinned to constraints.make_efc (same formulas, same slot order,
same tie-breaks); tests/test_constraints_bt.py gates leaf-exact agreement.
Supported: elliptic-cone models with no simple contact rows (go2 family).
Pyramidal models fall back to the vmapped per-env path in engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics.constraints import (
    ConstraintLayout,
    Efc,
    con_mask_table,
    impedance,
    kb,
)


def supports_bt(lay: ConstraintLayout) -> bool:
    """BT assembly covers (a) elliptic models whose contacts are all cone
    blocks (go2 family) and (b) pyramidal models with uniform condim > 1
    (aliengo/b2/hyqreal)."""
    ss = lay.simple_con_slots
    if len(ss) == 0:
        return True
    cds = {int(c) for c in lay.con_condim[ss]}
    return len(lay.cone_slots) == 0 and len(cds) == 1 and cds != {1}


def _cross_planes(a, b):
    """Cross product of two 3-lists of broadcast-compatible planes."""
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _make_frame_planes(n):
    """collision.make_frame in plane form: n = [x, y, z] planes (K, B) →
    rows [n, t1, t2] (same mju_makeFrame helper-axis tie-breaks)."""
    ax, ay, az = jnp.abs(n[0]), jnp.abs(n[1]), jnp.abs(n[2])
    pick_x = (ax < ay) & (ax < az)
    pick_y = (~pick_x) & (ay < az)
    one = jnp.ones_like(n[0])
    zero = jnp.zeros_like(n[0])
    helper = [jnp.where(pick_x, one, zero),
              jnp.where(pick_x, zero, jnp.where(pick_y, one, zero)),
              jnp.where(pick_x | pick_y, zero, one)]
    nh = n[0] * helper[0] + n[1] * helper[1] + n[2] * helper[2]
    t1 = [helper[i] - n[i] * nh for i in range(3)]
    t1n = jnp.sqrt(t1[0] ** 2 + t1[1] ** 2 + t1[2] ** 2)
    inv = 1.0 / jnp.maximum(t1n, 1e-12)
    t1 = [t1[i] * inv for i in range(3)]
    t2 = _cross_planes(n, t1)
    return [n, t1, t2]


def _dirs_vel_bt(pos_c, n_c, masks_bt, cdof, origin, qvel):
    """Contact-frame direction rows + row velocities, batch-trailing:
    pos_c/n_c plane lists (K, B); masks_bt (K, nv, B); cdof (B, nv, 6);
    origin (B, 3); qvel (B, nv) → (dirs 6x(K, nv, B), vel6 6x(K, B))."""
    frame = _make_frame_planes(n_c)                         # rows [n, t1, t2]
    originT = origin.T                                      # (3, B)
    rel = [pos_c[i] - originT[i][None] for i in range(3)]   # (K, B)
    cdofT = jnp.transpose(cdof, (1, 2, 0))                  # (nv, 6, B)
    omega = [cdofT[:, i] for i in range(3)]                 # (nv, B)
    v0 = [cdofT[:, 3 + i] for i in range(3)]
    # vp = v0 + omega x rel → (K, nv, B) per component
    vp = [v0[i][None] + (omega[(i + 1) % 3][None] * rel[(i + 2) % 3][:, None]
                         - omega[(i + 2) % 3][None] * rel[(i + 1) % 3][:, None])
          for i in range(3)]
    jacp = [vp[i] * masks_bt for i in range(3)]             # (K, nv, B)
    jacr = [omega[i][None] * masks_bt for i in range(3)]
    dirs = [sum(frame[r][j][:, None] * jacp[j] for j in range(3))
            for r in range(3)] + \
           [sum(frame[r][j][:, None] * jacr[j] for j in range(3))
            for r in range(3)]                              # 6 x (K, nv, B)
    qvelT = qvel.T                                          # (nv, B)
    vel6 = [jnp.sum(dirs[r] * qvelT[None], axis=1) for r in range(6)]
    return dirs, vel6


def _impedance_pl(solimp, x):
    """constraints.impedance on plane lists (solimp = 5 planes)."""
    d0, d1, width, mid, power = solimp
    y = jnp.minimum(jnp.abs(x) / jnp.maximum(width, 1e-12), 1.0)
    lo_ = mid ** (1.0 - power) * y ** power
    hi_ = 1.0 - (1.0 - mid) ** (1.0 - power) * (1.0 - y) ** power
    z = jnp.where(y < mid, lo_, hi_)
    return jnp.clip(d0 + z * (d1 - d0), 1e-4, 1.0 - 1e-4)


def _kb_pl(solref, solimp):
    """constraints.kb on plane lists."""
    tc, dr = solref
    d1 = solimp[1]
    K_std = 1.0 / jnp.maximum(d1 * d1 * tc * tc * dr * dr, 1e-12)
    B_std = 2.0 / jnp.maximum(d1 * tc, 1e-12)
    K_dir = -tc / jnp.maximum(d1 * d1, 1e-12)
    B_dir = -dr / jnp.maximum(d1, 1e-12)
    std = jnp.minimum(tc, dr) > 0
    return jnp.where(std, K_std, K_dir), jnp.where(std, B_std, B_dir)


def make_efc_bt(m: Model, lay: ConstraintLayout, feat_bt, qpos, qvel, cdof,
                origin, con_mu=None, max_cone=None) -> Efc:
    """Batched make_efc with batch-trailing internals.

    feat_bt (7, S, B) from collision_bt.collide_bt; qpos (B, nq), qvel (B, nv),
    cdof (B, nv, 6), origin (B, 3) = spatial_origin per env; con_mu (B, S, 5)
    traced per-env friction or None (static layout table). Returns an Efc
    whose every leaf is batch-LEADING, identical to vmap(make_efc).
    """
    assert supports_bt(lay)
    dtype = qpos.dtype
    nv = m.nv
    B = qpos.shape[0]

    # ---- 1. dof friction loss (constraints.make_efc step 1) --------------------
    J_rows, aref_rows, R_rows, act_rows, fl_rows = [], [], [], [], []
    if lay.n_fl:
        dofs = lay.fl_dofs
        solref = jnp.asarray(m.dof_solref[dofs], dtype)
        solimp = jnp.asarray(m.dof_solimp[dofs], dtype)
        imp = impedance(solimp, jnp.zeros(len(dofs), dtype))
        _, Bd = kb(solref, solimp)
        eye_rows = np.zeros((len(dofs), nv), np.float64)
        eye_rows[np.arange(len(dofs)), dofs] = 1.0
        J_rows.append(jnp.broadcast_to(jnp.asarray(eye_rows, dtype),
                                       (B, len(dofs), nv)))
        aref_rows.append(-Bd[None] * qvel[:, dofs])
        R_fl = jnp.maximum(1.0 - imp, 1e-4) / imp * \
            jnp.asarray(m.dof_invweight0[dofs], dtype)
        R_rows.append(jnp.broadcast_to(R_fl[None], (B, len(dofs))))
        act_rows.append(jnp.ones((B, len(dofs)), bool))
        fl_rows.append(jnp.broadcast_to(
            jnp.asarray(m.dof_frictionloss[dofs], dtype)[None],
            (B, len(dofs))))

    # ---- 2. joint limits (step 2) ----------------------------------------------
    if lay.n_lim:
        jids = lay.lim_jnts
        qadr = m.jnt_qposadr[jids]
        dadr = m.jnt_dofadr[jids]
        lo = jnp.asarray(m.jnt_range[jids, 0], dtype)
        hi = jnp.asarray(m.jnt_range[jids, 1], dtype)
        q = qpos[:, qadr]                                   # (B, nlim)
        dist_lo = q - lo[None]
        dist_hi = hi[None] - q
        low_side = dist_lo < dist_hi
        dist = jnp.where(low_side, dist_lo, dist_hi)
        sign = jnp.where(low_side, 1.0, -1.0).astype(dtype)
        eye_d = np.zeros((len(jids), nv), np.float64)
        eye_d[np.arange(len(jids)), dadr] = 1.0
        J_rows.append(sign[:, :, None] * jnp.asarray(eye_d, dtype)[None])
        margin = jnp.asarray(m.jnt_margin[jids], dtype)
        solref = jnp.asarray(m.jnt_solref[jids], dtype)
        solimp = jnp.asarray(m.jnt_solimp[jids], dtype)
        x = dist - margin[None]
        imp = impedance(solimp, x)                          # (B, nlim)
        K_l, B_l = kb(solref, solimp)
        aref_rows.append(-B_l[None] * (sign * qvel[:, dadr])
                         - K_l[None] * imp * x)
        R_rows.append(jnp.maximum(1.0 - imp, 1e-4) / imp *
                      jnp.asarray(m.dof_invweight0[dadr], dtype)[None])
        act_rows.append(dist < margin[None])
        fl_rows.append(jnp.zeros((B, len(jids)), dtype))

    # ---- 2b. culled pyramidal contact rows (make_efc vectorized path) ----------
    pyr_sel = None
    ss = lay.simple_con_slots
    if len(ss):
        cd_u = int(lay.con_condim[ss[0]])
        Ks = len(ss) if max_cone is None else min(max_cone, len(ss))
        ss_np = np.asarray(ss)
        mask_table_p = con_mask_table(m, lay)
        inv_tr = (np.asarray(m.body_invweight0)[np.asarray(lay.con_body)]
                  + np.asarray(m.body_invweight0)[np.asarray(lay.con_body1)])
        if con_mu is None:
            mu_all_p = jnp.broadcast_to(
                jnp.asarray(np.asarray(lay.con_mu)[ss_np], dtype)[None],
                (B, len(ss), 5))
        else:
            mu_all_p = jnp.asarray(con_mu, dtype)[:, ss_np]

        dist_sb = feat_bt[0][ss_np].T                     # (B, Ss)
        if Ks < len(ss):
            _, sel = jax.lax.top_k(-dist_sb, Ks)
        else:
            sel = jnp.broadcast_to(
                jnp.arange(len(ss), dtype=jnp.int32)[None], (B, len(ss)))
        onehot = (sel[:, :, None] == jnp.arange(
            len(ss), dtype=sel.dtype)[None, None, :]).astype(dtype)
        feat_static = jnp.asarray(np.concatenate([
            mask_table_p[ss_np],                          # nv
            np.asarray(lay.con_margin)[ss_np, None],      # 1
            np.asarray(lay.con_solimp)[ss_np],            # 5
            np.asarray(lay.con_solref)[ss_np],            # 2
            np.asarray(lay.con_incl)[ss_np, None],        # 1
            inv_tr[ss_np],                                # 2 (inv_t, inv_r)
        ], axis=1), dtype)
        sel_static = jnp.einsum('bkc,cf->bkf', onehot, feat_static,
                                precision=jax.lax.Precision.HIGHEST)
        featp = feat_bt[:, ss_np]                         # (7, Ss, B)
        sel_feat = jnp.einsum('bkc,fcb->bfk', onehot, featp,
                              precision=jax.lax.Precision.HIGHEST)
        sel_mu = jnp.einsum('bkc,bcf->bkf', onehot, mu_all_p,
                            precision=jax.lax.Precision.HIGHEST)

        o = 0
        masks_bt = jnp.transpose(sel_static[:, :, o:o + nv], (1, 2, 0))
        o += nv
        margin_s = sel_static[:, :, o].T; o += 1          # (Ks, B)
        solimp_s = [sel_static[:, :, o + i].T for i in range(5)]; o += 5
        solref_s = [sel_static[:, :, o + i].T for i in range(2)]; o += 2
        incl_s = sel_static[:, :, o].T; o += 1
        inv_ts = sel_static[:, :, o].T; o += 1
        inv_rs = sel_static[:, :, o].T; o += 1
        dist_sel = sel_feat[:, 0].T
        pos_s = [sel_feat[:, 1 + i].T for i in range(3)]
        n_s = [sel_feat[:, 4 + i].T for i in range(3)]
        mu = [sel_mu[:, :, i].T for i in range(5)]

        dirs, vel6 = _dirs_vel_bt(pos_s, n_s, masks_bt, cdof, origin, qvel)
        x_p = dist_sel - margin_s
        imp_p = _impedance_pl(solimp_s, x_p)
        K_p, B_p = _kb_pl(solref_s, solimp_s)
        include_p = dist_sel < incl_s
        rimp_p = jnp.maximum(1.0 - imp_p, 1e-4) / imp_p
        fri_inv = [inv_ts, inv_ts, inv_rs, inv_rs, inv_rs]
        rows_J, rows_aref, rows_R = [], [], []
        for i in range(cd_u - 1):
            mu_i = mu[i]
            diag = 2.0 * (inv_ts + mu_i * mu_i * fri_inv[i])
            for sgn in (1.0, -1.0):
                rows_J.append(dirs[0] + sgn * mu_i[:, None] * dirs[1 + i])
                vel = vel6[0] + sgn * mu_i * vel6[1 + i]
                rows_aref.append(-B_p * vel - K_p * imp_p * x_p)
                rows_R.append(rimp_p * diag)
        nrows = 2 * (cd_u - 1)
        # rows (nrows, Ks, nv, B) → (B, Ks*nrows, nv); per-slot row order
        # [i0+, i0-, i1+, i1-] matches make_efc's stack(axis=1)
        Jp = jnp.transpose(jnp.stack(rows_J), (3, 1, 0, 2))
        J_rows.append(Jp.reshape(B, Ks * nrows, nv))
        arefp = jnp.transpose(jnp.stack(rows_aref), (2, 1, 0))
        aref_rows.append(arefp.reshape(B, Ks * nrows))
        Rp = jnp.transpose(jnp.stack(rows_R), (2, 1, 0))
        R_rows.append(Rp.reshape(B, Ks * nrows))
        act_rows.append(jnp.repeat(include_p.T, nrows, axis=1))
        fl_rows.append(jnp.zeros((B, Ks * nrows), dtype))
        pyr_sel = sel.astype(jnp.int32)

    if J_rows:
        J = jnp.concatenate(J_rows, axis=1)
        aref = jnp.concatenate(aref_rows, axis=1)
        R = jnp.concatenate(R_rows, axis=1)
        active = jnp.concatenate(act_rows, axis=1)
        fl = jnp.concatenate(fl_rows, axis=1)
    else:
        J = jnp.zeros((B, 0, nv), dtype)
        aref = R = fl = jnp.zeros((B, 0), dtype)
        active = jnp.zeros((B, 0), bool)
    if pyr_sel is None:
        assert J.shape[1] == lay.n_simple

    # ---- 3. elliptic cone blocks (step 3, cull before assembly) ----------------
    C_all = len(lay.cone_slots)
    if not C_all:
        return Efc(J=J, aref=aref, R=R, active=active, frictionloss=fl,
                   con_J=jnp.zeros((B, 0, 6, nv), dtype),
                   con_aref=jnp.zeros((B, 0, 6), dtype),
                   con_R=jnp.ones((B, 0, 6), dtype),
                   con_active=jnp.zeros((B, 0), bool),
                   cone_mu=jnp.zeros((B, 0, 5), dtype),
                   cone_dim_mask=jnp.zeros((B, 0, 6), dtype),
                   cone_dist=jnp.zeros((B, 0), dtype),
                   cone_sel=jnp.zeros((B, 0), jnp.int32),
                   pyr_sel=pyr_sel)

    cs_np = np.asarray(lay.cone_slots)
    mask_table = con_mask_table(m, lay)
    if con_mu is None:
        mu_all = jnp.broadcast_to(
            jnp.asarray(np.asarray(lay.con_mu)[cs_np], dtype)[None],
            (B, C_all, 5))
    else:
        mu_all = jnp.asarray(con_mu, dtype)[:, cs_np]       # (B, C_all, 5)

    dist_cb = feat_bt[0][cs_np].T                           # (B, C_all)
    if max_cone is not None and max_cone < C_all:
        _, sel = jax.lax.top_k(-dist_cb, max_cone)          # (B, K)
    else:
        sel = jnp.broadcast_to(
            jnp.arange(C_all, dtype=jnp.int32)[None], (B, C_all))
    K = sel.shape[1]

    # batch-leading selection: one-hot contractions ride the MXU (unaffected
    # by the layout regression — see module docstring)
    onehot = (sel[:, :, None] ==
              jnp.arange(C_all, dtype=sel.dtype)[None, None, :]).astype(dtype)
    inv_t_np = (np.asarray(m.body_invweight0)[np.asarray(lay.con_body), 0]
                + np.asarray(m.body_invweight0)[np.asarray(lay.con_body1), 0])
    feat_static = jnp.asarray(np.concatenate([
        mask_table[cs_np],                                  # nv
        np.asarray(lay.con_margin)[cs_np, None],            # 1
        np.asarray(lay.con_solimp)[cs_np],                  # 5
        np.asarray(lay.con_solref)[cs_np],                  # 2
        np.asarray(lay.con_incl)[cs_np, None],              # 1
        inv_t_np[cs_np, None],                              # 1
        np.asarray(lay.cone_dim_mask),                      # 6
    ], axis=1), dtype)
    sel_static = jnp.einsum('bkc,cf->bkf', onehot, feat_static,
                            precision=jax.lax.Precision.HIGHEST)
    featc = feat_bt[:, cs_np]                               # (7, C_all, B)
    sel_feat = jnp.einsum('bkc,fcb->bfk', onehot, featc,
                          precision=jax.lax.Precision.HIGHEST)  # (B, 7, K)
    sel_mu = jnp.einsum('bkc,bcf->bkf', onehot, mu_all,
                        precision=jax.lax.Precision.HIGHEST)    # (B, K, 5)

    o = 0
    masks_bt = jnp.transpose(sel_static[:, :, o:o + nv], (1, 2, 0))  # (K,nv,B)
    o += nv
    margin_c = sel_static[:, :, o].T; o += 1                # (K, B)
    solimp_c = [sel_static[:, :, o + i].T for i in range(5)]; o += 5
    solref_c = [sel_static[:, :, o + i].T for i in range(2)]; o += 2
    incl_c = sel_static[:, :, o].T; o += 1
    inv_tc = sel_static[:, :, o].T; o += 1
    dm = [sel_static[:, :, o + i].T for i in range(6)]; o += 6

    dist_sel = sel_feat[:, 0].T                             # (K, B)
    pos_c = [sel_feat[:, 1 + i].T for i in range(3)]
    n_c = [sel_feat[:, 4 + i].T for i in range(3)]
    mu = [sel_mu[:, :, i].T for i in range(5)]

    dirs, vel6 = _dirs_vel_bt(pos_c, n_c, masks_bt, cdof, origin, qvel)

    # ---- impedance / stiffness / aref / R (plane forms of make_efc math) -------
    x_c = dist_sel - margin_c
    imp_c = _impedance_pl(solimp_c, x_c)
    K_c, B_c = _kb_pl(solref_c, solimp_c)
    include_c = dist_sel < incl_c
    rimp_c = jnp.maximum(1.0 - imp_c, 1e-4) / imp_c
    aref_n = -B_c * vel6[0] - K_c * imp_c * x_c
    aref6 = [aref_n * dm[0]] + [-B_c * vel6[r] * dm[r] for r in range(1, 6)]
    conJ_rows = [dirs[r] * dm[r][:, None] for r in range(6)]
    mu0 = mu[0]
    R6 = [rimp_c * inv_tc] + \
         [rimp_c * inv_tc * (mu0 / jnp.maximum(mu[r - 1], 1e-12)) ** 2
          / m.impratio for r in range(1, 6)]
    R6 = [jnp.where(dm[r] > 0, R6[r], 1.0) for r in range(6)]

    # ---- transpose the solver-facing leaves back to batch-leading --------------
    con_J = jnp.transpose(jnp.stack(conJ_rows), (3, 1, 0, 2))  # (B, K, 6, nv)
    con_aref = jnp.transpose(jnp.stack(aref6), (2, 1, 0))      # (B, K, 6)
    con_R = jnp.transpose(jnp.stack(R6), (2, 1, 0))
    return Efc(J=J, aref=aref, R=R, active=active, frictionloss=fl,
               con_J=con_J, con_aref=con_aref, con_R=con_R,
               con_active=include_c.T, cone_mu=sel_mu,
               cone_dim_mask=jnp.stack(dm, axis=-1).transpose(1, 0, 2),
               cone_dist=dist_sel.T, cone_sel=sel.astype(jnp.int32),
               pyr_sel=pyr_sel)
