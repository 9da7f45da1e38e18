"""Full forward dynamics + semi-implicit Euler step (mj_forward / mj_step parity).

Pipeline per step (cf. SURVEY.md §3.2's hot loop, executed as ONE fused XLA program
instead of the reference's Python→C fan-out):
  FK → cdof → CRBA M → RNE bias → passive → actuation → collide → efc assembly →
  Newton constraint solve → Euler integration with implicit joint damping
  (MuJoCo's Euler integrator solves (M + h·diag(damping)) for the velocity update).

Single-env pure functions; batch = vmap, multi-chip = shard_map (parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gym_quadruped_tpu.models.model import FREE, BALL, Model
from gym_quadruped_tpu.ops.spd_solve import spd_solve
from gym_quadruped_tpu.physics import dynamics
from gym_quadruped_tpu.physics.collision import Contacts, collide
from gym_quadruped_tpu.physics.constraints import (
    Efc,
    constraint_layout,
    cull_cone_slots,
    make_efc,
    scatter_cone_forces,
)
from gym_quadruped_tpu.physics.collision_bt import collide_bt
from gym_quadruped_tpu.physics.constraints_bt import make_efc_bt, supports_bt
from gym_quadruped_tpu.physics.kinematics import Kin, cdof as _cdof, fk
from gym_quadruped_tpu.physics.solver import solve
from gym_quadruped_tpu.utils.maths import quat_integrate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Forward:
    """Forward-dynamics results (one env) — the mjData subset the env layer reads."""

    kin: Kin
    cdof: Any            # (nv, 6)
    M: Any               # (nv, nv)
    qfrc_bias: Any       # (nv,)
    qfrc_passive: Any    # (nv,)
    qfrc_actuator: Any   # (nv,)
    qfrc_smooth: Any     # (nv,)
    qacc_smooth: Any     # (nv,)
    contacts: Contacts
    efc: Efc
    qacc: Any            # (nv,) constrained acceleration
    efc_force: Any       # (n_simple,) simple-row forces
    f_cone: Any          # (C, 6) elliptic block forces (contact frame)
    qfrc_constraint: Any  # (nv,)


def _pre_solve(m: Model, qpos, qvel, ctrl, qfrc_applied=None, con_mu=None,
               max_cone=None):
    """Everything before the constraint solve (one env)."""
    dtype = qpos.dtype
    if max_cone is None:
        max_cone = MAX_CONE_CONTACTS
    if qfrc_applied is None:
        qfrc_applied = jnp.zeros(m.nv, dtype)

    kin = fk(m, qpos)
    cdof = _cdof(m, kin)
    M = dynamics.mass_matrix(m, kin, cdof)
    bias = dynamics.rne_bias(m, kin, qvel, cdof)
    passive = dynamics.passive_force(m, qpos, qvel)
    act = dynamics.actuator_force(m, ctrl)
    qfrc_smooth = passive + act + qfrc_applied - bias

    qacc_smooth = spd_solve(M, qfrc_smooth)

    feat, efc = _collide_efc(m, max_cone)(kin, qpos, qvel, cdof, con_mu)
    contacts = Contacts(feat)
    return (kin, cdof, M, bias, passive, act, qfrc_smooth, qacc_smooth,
            contacts, efc)


# narrow phase + constraint assembly, with a custom-vmap rule that dispatches
# the BATCHED case to the batch-trailing implementations — the layout the
# current TPU platform needs (collision_bt/constraints_bt module docstrings).
# Per-env callers (engine.step) run the validated per-env path unchanged;
# vmapped callers (step_batched, vmap(env.step)) get the BT path for free.
_COLLIDE_EFC_CACHE: dict = {}


def _collide_efc(m: Model, max_cone):
    key = (id(m), max_cone)
    cached = _COLLIDE_EFC_CACHE.get(key)
    if cached is not None:
        return cached
    from gym_quadruped_tpu.physics.constraints import constraint_layout as _cl
    lay = _cl(m)

    @jax.custom_batching.custom_vmap
    def collide_efc(kin, qpos, qvel, cdof, con_mu):
        contacts = collide(m, kin)
        efc = make_efc(m, kin, qpos, qvel, contacts, cdof, con_mu=con_mu,
                       max_cone=max_cone)
        return contacts.feat, efc

    @collide_efc.def_vmap
    def _rule(axis_size, in_batched, kin, qpos, qvel, cdof, con_mu):
        # broadcast any unbatched LEAF (flags are per-leaf: empty/constant
        # Kin leaves can be unbatched while the rest are batched)
        def bc(x, xb):
            return jax.tree_util.tree_map(
                lambda l, b: l if b
                else jnp.broadcast_to(l, (axis_size,) + l.shape), x, xb)

        kin_b, qpos_b, qvel_b, cdof_b, mu_b = in_batched
        kin = bc(kin, kin_b)
        qpos = bc(qpos, qpos_b)
        qvel = bc(qvel, qvel_b)
        cdof = bc(cdof, cdof_b)
        if con_mu is not None:
            con_mu = bc(con_mu, mu_b)

        # nested vmaps (e.g. vmap over robots of vmap over envs) reach this
        # rule with EXTRA leading batch dims — flatten them into one batch
        # axis for the BT implementations, unflatten on the way out
        lead = qpos.ndim - 1
        batch_shape = qpos.shape[:lead]

        def flat(x):
            return jax.tree_util.tree_map(
                lambda l: l.reshape((-1,) + l.shape[lead:]), x)

        if lead > 1:
            kin, qpos, qvel, cdof = (flat(kin), flat(qpos), flat(qvel),
                                     flat(cdof))
            if con_mu is not None:
                con_mu = flat(con_mu)

        feat_bt = collide_bt(m, kin.geom_xpos, kin.geom_xmat)   # (7, S, B)
        feat_bl = jnp.transpose(feat_bt, (2, 0, 1))             # (B, 7, S)
        if supports_bt(lay):
            origin = kin.subtree_com[:, 0]
            efc = make_efc_bt(m, lay, feat_bt, qpos, qvel, cdof, origin,
                              con_mu=con_mu, max_cone=max_cone)
        else:
            # pyramidal / simple-contact models: per-env assembly (narrow
            # phase still ran batch-trailing above)
            if con_mu is None:
                efc = jax.vmap(lambda k, qp, qv, cd, f: make_efc(
                    m, k, qp, qv, Contacts(f), cd, con_mu=None,
                    max_cone=max_cone))(kin, qpos, qvel, cdof, feat_bl)
            else:
                efc = jax.vmap(lambda k, qp, qv, cd, f, cm: make_efc(
                    m, k, qp, qv, Contacts(f), cd, con_mu=cm,
                    max_cone=max_cone))(kin, qpos, qvel, cdof, feat_bl,
                                        con_mu)
        out = (feat_bl, efc)
        if lead > 1:
            out = jax.tree_util.tree_map(
                lambda l: l.reshape(batch_shape + l.shape[1:]), out)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    _COLLIDE_EFC_CACHE[key] = collide_efc
    return collide_efc


# Default Newton iteration cap. Overridable via GQT_SOLVER_ITERS so the whole
# parity suite can be re-gated at a reduced cap (the measured hardware ladder:
# it=10: 74k, it=8: 85k, it=6: 98k steps/s at B=4096 — docs/PERF_NOTES.md).
DEFAULT_SOLVER_ITERS = int(__import__('os').environ.get('GQT_SOLVER_ITERS', 10))

# cap on simultaneously-solved cone contacts (MuJoCo similarly caps contacts);
# exact whenever ≤ MAX_CONE_CONTACTS slots touch, and it bounds solver cost on
# slot-heavy scenes (go2/flat C=99, go2/random_boxes C=1999 → 32). Sized from
# measurement: a 200-step random-torque go2 tumble reaches 20 simultaneous
# MuJoCo contacts, and caps ≥24 give bit-identical trajectories to no cap.
MAX_CONE_CONTACTS = 32


def forward(m: Model, qpos, qvel, ctrl, qfrc_applied=None,
            warmstart=None, solver_iterations: int = DEFAULT_SOLVER_ITERS, con_mu=None,
            max_contacts: int = MAX_CONE_CONTACTS) -> Forward:
    (kin, cdof, M, bias, passive, act, qfrc_smooth, qacc_smooth, contacts,
     efc) = _pre_solve(m, qpos, qvel, ctrl, qfrc_applied, con_mu, max_contacts)
    lay = constraint_layout(m)
    qacc, f_simple, f_cone, qfrc_constraint = solve(
        m, lay, M, qacc_smooth, efc,
        warmstart=warmstart, iterations=solver_iterations)
    C_all = len(lay.cone_slots)
    if f_cone.shape[0] < C_all:  # scatter culled forces to the full slot axis
        f_cone = scatter_cone_forces(efc.cone_sel, f_cone, C_all)

    return Forward(kin=kin, cdof=cdof, M=M, qfrc_bias=bias, qfrc_passive=passive,
                   qfrc_actuator=act, qfrc_smooth=qfrc_smooth,
                   qacc_smooth=qacc_smooth, contacts=contacts, efc=efc,
                   qacc=qacc, efc_force=f_simple, f_cone=f_cone,
                   qfrc_constraint=qfrc_constraint)


def integrate_pos(m: Model, qpos, qvel, h) -> jnp.ndarray:
    """mj_integratePos: position update respecting quaternion manifolds."""
    parts = []
    covered = np.zeros(m.nq, bool)
    out = qpos
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
        if jtype == FREE:
            pos = qpos[qadr:qadr + 3] + h * qvel[dadr:dadr + 3]
            quat = quat_integrate(qpos[qadr + 3:qadr + 7], qvel[dadr + 3:dadr + 6], h)
            out = jax.lax.dynamic_update_slice(out, pos, (qadr,))
            out = jax.lax.dynamic_update_slice(out, quat, (qadr + 3,))
            covered[qadr:qadr + 7] = True
        elif jtype == BALL:
            quat = quat_integrate(qpos[qadr:qadr + 4], qvel[dadr:dadr + 3], h)
            out = jax.lax.dynamic_update_slice(out, quat, (qadr,))
            covered[qadr:qadr + 4] = True
        else:
            out = out.at[qadr].set(qpos[qadr] + h * qvel[dadr])
            covered[qadr] = True
    del parts, covered
    return out


def euler(m: Model, qpos, qvel, fwd: Forward):
    """mj_Euler: semi-implicit Euler with implicit joint damping."""
    dtype = qpos.dtype
    h = jnp.asarray(m.timestep, dtype)
    qfrc = fwd.qfrc_smooth + fwd.qfrc_constraint
    damping = np.asarray(m.dof_damping)
    if np.any(damping > 0):
        MhB = fwd.M + h * jnp.diag(jnp.asarray(damping, dtype))
        qacc_int = spd_solve(MhB, qfrc)
    else:
        qacc_int = fwd.qacc
    qvel_new = qvel + h * qacc_int
    qpos_new = integrate_pos(m, qpos, qvel_new, h)
    return qpos_new, qvel_new


def step(m: Model, qpos, qvel, ctrl, qfrc_applied=None, warmstart=None,
         solver_iterations: int = DEFAULT_SOLVER_ITERS, con_mu=None,
         max_contacts: int = MAX_CONE_CONTACTS):
    """mj_step equivalent: returns (qpos', qvel', Forward-at-old-state)."""
    fwd = forward(m, qpos, qvel, ctrl, qfrc_applied, warmstart, solver_iterations,
                  con_mu=con_mu, max_contacts=max_contacts)
    qpos_new, qvel_new = euler(m, qpos, qvel, fwd)
    return qpos_new, qvel_new, fwd


def step_batched(m: Model, qpos, qvel, ctrl, qfrc_applied=None,
                 warmstart=None, solver_iterations: int = DEFAULT_SOLVER_ITERS, con_mu=None,
                 max_contacts: int = MAX_CONE_CONTACTS):
    """Batch-level mj_step: identical math to vmap(step), structured so the
    pre-solve fan-out and the Newton constraint solve are separately vmapped
    stages (XLA fuses them; keeping the split lets profiling attribute time).

    The Newton solve is deliberately the VMAPPED XLA SOLVER, not a fused
    Pallas kernel: two full fused-solver generations were built, verified,
    and measured 25× SLOWER than XLA on real v5e (retirement note in
    docs/PERF_NOTES.md round 4; research artifacts in scripts/experimental/).
    The production Pallas surface is the lane-batched tiny-SPD solve inside
    the solver (ops/spd_solve.py). Inputs/outputs carry a leading batch axis."""
    import jax

    from gym_quadruped_tpu.physics import solver as _solver

    if qfrc_applied is None:
        pre = jax.vmap(lambda a, b, c: _pre_solve(
            m, a, b, c, None, con_mu, max_contacts))(qpos, qvel, ctrl)
    else:
        pre = jax.vmap(lambda a, b, c, q: _pre_solve(
            m, a, b, c, q, con_mu, max_contacts))(qpos, qvel, ctrl, qfrc_applied)
    (kin, cdof, M, bias, passive, act, qfrc_smooth, qacc_smooth, contacts,
     efc) = pre

    lay = constraint_layout(m)
    if warmstart is None:
        qacc, f_simple, f_cone, qfrc_constraint = jax.vmap(
            lambda Mi, ai, ei: _solver.solve(
                m, lay, Mi, ai, ei, iterations=solver_iterations))(
                    M, qacc_smooth, efc)
    else:
        qacc, f_simple, f_cone, qfrc_constraint = jax.vmap(
            lambda Mi, ai, ei, wi: _solver.solve(
                m, lay, Mi, ai, ei, warmstart=wi,
                iterations=solver_iterations))(
                    M, qacc_smooth, efc, warmstart)
    C_all = len(lay.cone_slots)
    if f_cone.shape[1] < C_all:
        f_cone = jax.vmap(
            lambda s, f: scatter_cone_forces(s, f, C_all))(
                efc.cone_sel, f_cone)

    fwd = Forward(kin=kin, cdof=cdof, M=M, qfrc_bias=bias, qfrc_passive=passive,
                  qfrc_actuator=act, qfrc_smooth=qfrc_smooth,
                  qacc_smooth=qacc_smooth, contacts=contacts, efc=efc,
                  qacc=qacc, efc_force=f_simple, f_cone=f_cone,
                  qfrc_constraint=qfrc_constraint)
    qpos_new, qvel_new = jax.vmap(lambda qp, qv, f: euler(m, qp, qv, f))(
        qpos, qvel, fwd)
    return qpos_new, qvel_new, fwd
