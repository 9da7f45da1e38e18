"""Contact-force extraction: per-slot world forces and per-foot aggregates.

Replaces the reference's per-contact mj_contactForce scan (quadruped_env.py:799-872):
it loops over mjData.contact, reads each 6D force, rotates to world, and sums per
foot. Here the layout is static so the whole thing is a masked matmul.

Force conventions (match MuJoCo): solver forces act on the robot geom (geom2);
contact-frame force f (rows n,t1,t2) maps to world as frame.T @ f[:3]; pyramidal
forces decode via mju_decodePyramid (normal = Σ edges, tangent_i = μ_i(f⁺_i − f⁻_i)).

The reference keys "foot contact" by *body* id (quadruped_env.py:836-847): any
contact on the body owning the foot geom (usually the calf) counts — reproduced here
via ConstraintLayout.con_body.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics.constraints import ConstraintLayout


@functools.lru_cache(maxsize=64)
def _simple_row_table(lay_key) -> np.ndarray:
    """(S, 11) static per-slot rows in the simple-J block: [start, n_rows] — -1 for
    cone slots. Row layout follows make_efc: fl rows, limit rows, then per
    simple_con_slot 1 row (condim 1) or 2*(condim-1) pyramid rows."""
    lay: ConstraintLayout = _LAY_CACHE[lay_key]
    S = len(lay.con_condim)
    table = np.full((S, 2), -1, np.int64)
    row = lay.n_fl + lay.n_lim
    for s in lay.simple_con_slots:
        cd = int(lay.con_condim[s])
        n = 1 if cd == 1 else 2 * (cd - 1)
        table[s] = (row, n)
        row += n
    return table


_LAY_CACHE: dict = {}


def simple_row_table(lay: ConstraintLayout) -> np.ndarray:
    key = id(lay)
    _LAY_CACHE[key] = lay
    return _simple_row_table(key)


def slot_forces_world(m: Model, lay: ConstraintLayout, fwd) -> jnp.ndarray:
    """(S, 3) world-frame contact force on the robot geom, per contact slot."""
    S = len(lay.con_condim)
    dtype = fwd.qacc.dtype
    if S == 0:
        return jnp.zeros((0, 3), dtype)
    f3 = jnp.zeros((S, 3), dtype)

    # elliptic cone slots: frame force is the first 3 block rows directly
    if len(lay.cone_slots):
        f3 = f3.at[jnp.asarray(lay.cone_slots)].set(fwd.f_cone[:, :3])

    # simple slots: frictionless normals and pyramid decode
    if getattr(fwd.efc, 'pyr_sel', None) is not None:
        # culled pyramidal assembly (constraints.make_efc vectorized path):
        # rows n_fl+n_lim onward are 2(condim-1) edges per SELECTED slot, in
        # pyr_sel order — decode vectorized, scatter to the full slot axis
        sel = fwd.efc.pyr_sel                             # (Kp,) local idx
        cd = int(lay.con_condim[lay.simple_con_slots[0]])
        nrows = 2 * (cd - 1)
        Kp = sel.shape[0]
        edges = fwd.efc_force[lay.n_fl + lay.n_lim:].reshape(Kp, nrows)
        mu_sel = jnp.asarray(lay.con_mu, dtype)[
            jnp.asarray(lay.simple_con_slots)[sel]]       # (Kp, 5)
        normal = jnp.sum(edges, axis=1)
        tangents = [(edges[:, 2 * i] - edges[:, 2 * i + 1]) * mu_sel[:, i]
                    for i in range(cd - 1)]
        while len(tangents) < 2:
            tangents.append(jnp.zeros(Kp, dtype))
        f3_sel = jnp.stack([normal, tangents[0], tangents[1]], axis=1)
        # scatter to global slots via one-hot matmul (batched scatters
        # serialize on TPU — same rationale as scatter_cone_forces)
        gslots = jnp.asarray(lay.simple_con_slots)[sel]   # (Kp,) global
        onehot = (gslots[:, None] ==
                  jnp.arange(S, dtype=gslots.dtype)[None, :]).astype(dtype)
        f3 = f3 + jnp.matmul(onehot.T, f3_sel,
                             precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum('sij,si->sj', fwd.contacts.frame, f3)

    table = simple_row_table(lay)
    for s in lay.simple_con_slots:
        s = int(s)
        start, n = int(table[s, 0]), int(table[s, 1])
        cd = int(lay.con_condim[s])
        if cd == 1:
            f3 = f3.at[s, 0].set(fwd.efc_force[start])
        else:
            edges = fwd.efc_force[start:start + n]
            normal = jnp.sum(edges)
            tangents = [(edges[2 * i] - edges[2 * i + 1]) * lay.con_mu[s, i]
                        for i in range(cd - 1)]
            while len(tangents) < 2:
                tangents.append(jnp.zeros((), dtype))
            f3 = f3.at[s].set(jnp.stack([normal, tangents[0], tangents[1]]))

    # rotate each slot's frame force to world: frame rows are (n, t1, t2)
    return jnp.einsum('sij,si->sj', fwd.contacts.frame, f3)


@functools.lru_cache(maxsize=64)
def _feet_slot_mask_cached(m_key) -> np.ndarray:
    m: Model = _MODEL_CACHE[m_key]
    from gym_quadruped_tpu.physics.constraints import constraint_layout

    lay = constraint_layout(m)
    world = np.asarray(lay.con_body1) == 0   # reference counts only contacts
    # between the feet and the WORLD (quadruped_env.py:838-844); self-contact
    # slots never contribute to contact_state / GRF
    return ((np.asarray(lay.con_body)[None, :] ==
             np.asarray(m.feet_body_id)[:, None]) &
            world[None, :]).astype(np.float64)  # (4, S)


_MODEL_CACHE: dict = {}


def feet_slot_mask(m: Model) -> np.ndarray:
    key = id(m)
    _MODEL_CACHE[key] = m
    return _feet_slot_mask_cached(key)


def active_slots(lay: ConstraintLayout, fwd) -> jnp.ndarray:
    """(S,) bool — slot is in the contact set (dist < margin, mjData.contact)."""
    margin = jnp.asarray(lay.con_incl, fwd.contacts.dist.dtype)
    return fwd.contacts.dist < margin


def feet_contact_state(m: Model, lay: ConstraintLayout, fwd) -> jnp.ndarray:
    """(4,) bool FL,FR,RL,RR (reference feet_contact_state, quadruped_env.py:799)."""
    mask = jnp.asarray(feet_slot_mask(m), bool)
    act = active_slots(lay, fwd)
    if act.shape[0] == 0:
        return jnp.zeros(4, bool)
    return jnp.any(mask & act[None, :], axis=1)


def feet_contact_forces(m: Model, lay: ConstraintLayout, fwd) -> jnp.ndarray:
    """(4, 3) world ground-reaction force per foot (sum over that foot's slots)."""
    dtype = fwd.qacc.dtype
    fw = slot_forces_world(m, lay, fwd)
    if fw.shape[0] == 0:
        return jnp.zeros((4, 3), dtype)
    mask = jnp.asarray(feet_slot_mask(m), dtype)
    return jnp.einsum('fs,sj->fj', mask, fw)


def invalid_contact(m: Model, lay: ConstraintLayout, fwd) -> jnp.ndarray:
    """() bool — any active contact on a non-foot robot body
    (reference _check_for_invalid_contacts, quadruped_env.py:1228-1248)."""
    act = active_slots(lay, fwd)
    if act.shape[0] == 0:
        return jnp.zeros((), bool)
    # reference: only WORLD contacts on non-foot bodies terminate; robot
    # self-contacts are explicitly ignored (quadruped_env.py:1245-1246)
    world = np.asarray(lay.con_body1) == 0
    nonfoot = ~np.any(np.asarray(feet_slot_mask(m)) > 0, axis=0) & world
    return jnp.any(act & jnp.asarray(nonfoot))
