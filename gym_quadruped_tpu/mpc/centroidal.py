"""Centroidal (single-rigid-body) dynamics model for convex quadruped MPC.

New-scope component per BASELINE.json's north star. Standard yaw-linearized SRB
model (Di Carlo et al. convex-MPC formulation): state
    x = [θ (rpy), p, ω (world), v, 1]  ∈ R¹³
with gravity folded into the constant-augmented state; inputs are the stacked
ground-reaction forces f ∈ R¹² at the (frozen over the horizon) foot positions.

    θ̇ = Rz(ψ)ᵀ ω        (yaw-only Euler-rate approximation)
    ṗ = v
    ω̇ = I_w⁻¹ Σ rᵢ × fᵢ  (I_w = Rz I_b Rzᵀ)
    v̇ = Σ fᵢ / m + g

Inertia/mass come from the physics Model (base spatial inertia at the nominal
configuration — serving the reference's get_base_inertia/com accessors,
quadruped_env.py:543-562,918-929). Discretization: forward Euler at the MPC dt.
All builders return batched arrays and vmap over envs.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.utils.maths import skew

NX = 13   # state dim
NU = 12   # 4 legs × 3 force components


@dataclasses.dataclass(frozen=True)
class CentroidalParams:
    mass: float
    inertia_body: np.ndarray  # (3, 3) base rotational inertia in the body frame
    mu: float = 0.7           # friction coefficient for the force cone
    fz_min: float = 0.0
    fz_max: float = 500.0

    @classmethod
    def from_model(cls, m: Model, **kw) -> 'CentroidalParams':
        total_mass = float(np.sum(m.body_mass))
        b = m.base_body_id
        # base body's rotational inertia about its CoM (body frame, diagonal in
        # the inertial frame) — matches mj_fullM's base block at q0 up to the
        # leg coupling the SRB model ignores
        from gym_quadruped_tpu.utils.maths import quat_to_mat
        import jax

        R = np.asarray(jax.device_get(quat_to_mat(jnp.asarray(m.body_iquat[b]))))
        I_b = R @ np.diag(m.body_inertia[b]) @ R.T
        # scale up: legs contribute to the composite inertia; use the total-robot
        # heuristic of 1.0× base (legs are light) — refined per-robot if needed
        return cls(mass=total_mass, inertia_body=I_b, **kw)


def rz(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    return jnp.stack([jnp.stack([c, -s, z]), jnp.stack([s, c, z]),
                      jnp.stack([z, z, o])])


def srb_dynamics(params: CentroidalParams, yaw, feet_pos_rel, contact, dt,
                 gravity=-9.81):
    """One-knot discrete SRB matrices.

    Args:
        yaw: () current yaw (linearization point).
        feet_pos_rel: (4, 3) foot positions relative to the CoM, world frame.
        contact: (4,) stance flags — swing legs' force columns are zeroed.
        dt: MPC step.
    Returns:
        A (13, 13), B (13, 12).
    """
    dtype = feet_pos_rel.dtype
    R = rz(yaw)
    I_w = R @ jnp.asarray(params.inertia_body, dtype) @ R.T
    I_inv = jnp.linalg.inv(I_w)

    A = jnp.zeros((NX, NX), dtype)
    A = A.at[0:3, 6:9].set(R.T)                  # θ̇ = Rzᵀ ω
    A = A.at[3:6, 9:12].set(jnp.eye(3, dtype=dtype))   # ṗ = v
    A = A.at[11, 12].set(gravity)                # v̇_z += g · 1
    A = jnp.eye(NX, dtype=dtype) + A * dt

    cols = []
    for i in range(4):
        r = feet_pos_rel[i]
        top = I_inv @ skew(r)                    # ω̇ ← I⁻¹ (r × f)
        Bi = jnp.zeros((NX, 3), dtype)
        Bi = Bi.at[6:9, :].set(top)
        Bi = Bi.at[9:12, :].set(jnp.eye(3, dtype=dtype) / params.mass)
        cols.append(Bi * contact[i])
    B = jnp.concatenate(cols, axis=1) * dt
    return A, B


def build_horizon(params: CentroidalParams, yaw, feet_pos_rel, schedule, dt):
    """(H, 13, 13), (H, 13, 12) — feet positions frozen over the horizon (the
    classic convex-MPC simplification), contacts from the gait schedule (H, 4)."""
    import jax

    def knot(c):
        return srb_dynamics(params, yaw, feet_pos_rel, c, dt)

    return jax.vmap(knot)(schedule)


def state_from_env(qpos, qvel, base_euler):
    """Pack the SRB state from env quantities (world-frame ω)."""
    from gym_quadruped_tpu.utils.maths import quat_to_mat

    R = quat_to_mat(qpos[3:7])
    omega_w = R @ qvel[3:6]
    one = jnp.ones((1,), qpos.dtype)
    return jnp.concatenate([base_euler, qpos[0:3], omega_w, qvel[0:3], one])


def reference_trajectory(x0, ref_lin_vel_w, ref_yaw_dot, height, horizon, dt):
    """(H, 13) tracking reference: integrate the commanded twist from x0
    (velocity-command task of quadruped_env.py:488-531 as an MPC cost)."""
    dtype = x0.dtype
    ks = jnp.arange(1, horizon + 1, dtype=dtype) * dt
    yaw = x0[2] + ks * ref_yaw_dot
    p = x0[3:6][None, :] + ks[:, None] * ref_lin_vel_w[None, :]
    xs = jnp.zeros((horizon, NX), dtype)
    xs = xs.at[:, 2].set(yaw)
    xs = xs.at[:, 3:5].set(p[:, 0:2])
    xs = xs.at[:, 5].set(jnp.asarray(height, dtype))
    xs = xs.at[:, 8].set(ref_yaw_dot)
    xs = xs.at[:, 9:12].set(ref_lin_vel_w[None, :])
    xs = xs.at[:, 12].set(1.0)
    return xs
