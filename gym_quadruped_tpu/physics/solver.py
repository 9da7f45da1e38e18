"""Constraint solver: exact Newton on MuJoCo's primal soft-constraint cost.

Replaces MuJoCo's Newton solver (the default solver; the reference hits it inside
mj_step). The problem is strictly convex with a unique optimum, so numerical parity
with MuJoCo only requires solving the *same* problem to tolerance:

    Φ(a) = ½ (a − a_smooth)ᵀ M (a − a_smooth) + Σ s(J a − aref)

Per-row costs: Huber for dof friction loss; one-sided quadratic for limits /
frictionless normals / pyramidal rows; and for elliptic contacts the dual-cone
projection cost  s(u) = ½·dist²_D(u, K*),  K* = {N ≥ μ₀‖(μᵢ/μ₀)uᵢ‖}, whose force
law (zones top/middle/bottom) was verified against mjData.efc_force on 400
randomized single-contact states (scripts/probe_elliptic3.py):

    T = ‖(μᵢ/μ₀)uᵢ‖,  ρ = μᵢ²Rᵢ (equal across friction rows by construction)
    top     N ≥ μ₀T          → f = 0
    bottom  μ₀T + ρDₙN ≤ 0   → f = −D∘u
    middle                   → w = (μ₀T + ρDₙN)/(1+ρDₙ),
                               fₙ = Dₙ(w−N),  fᵢ = −Dᵢuᵢ(1 − w/(μ₀T))

TPU design: analytic gradient; Hessian = M + JᵀCJ with per-block 6×6 cone
Hessians from jax.jacfwd of the closed-form force (vmapped over slots); the Newton
step is a batched (nv × nv) Cholesky; the linesearch is a fixed-iteration guarded
bisection on the 1-D convex derivative using precomputed row projections (J·p
evaluated once — the 1-D evals are pure elementwise ops). Static shapes throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.ops.spd_solve import spd_solve
from gym_quadruped_tpu.physics.constraints import ConstraintLayout, Efc


def _safe_norm(x, eps=1e-30):
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1), eps))


# ---------------------------------------------------------------------------------
# force laws
# ---------------------------------------------------------------------------------

def simple_force(u, D, fl, unilateral):
    """Row-separable force: one-sided quadratic or Huber clamp."""
    f_uni = -D * jnp.minimum(u, 0.0)
    f_hub = -jnp.clip(D * u, -fl, fl)
    return jnp.where(unilateral, f_uni, f_hub)


def simple_hess_weight(u, D, fl, unilateral):
    """Diagonal curvature of the simple-row costs at u."""
    c_uni = jnp.where(u < 0, D, 0.0)
    c_hub = jnp.where(jnp.abs(D * u) < fl, D, 0.0)
    return jnp.where(unilateral, c_uni, c_hub)


def _cone_force_block(u, D, mu, dim_mask):
    """Elliptic force for one contact block (u, D: (6,), mu: (5,), mask: (6,))."""
    mu0 = mu[0]
    N = u[0]
    uf = u[1:] * dim_mask[1:]
    Dn = D[0]
    Dt = D[1]
    rho = mu0 * mu0 / jnp.maximum(Dt, 1e-30)
    T = _safe_norm(uf * mu / mu0)
    w = (mu0 * T + rho * Dn * N) / (1.0 + rho * Dn)
    f_bottom = -D * u * dim_mask
    fn_mid = Dn * (w - N)
    ff_mid = -D[1:] * uf * (1.0 - w / jnp.maximum(mu0 * T, 1e-30))
    f_mid = jnp.concatenate([fn_mid[None], ff_mid]) * dim_mask
    zero = jnp.zeros_like(u)
    return jnp.where(N >= mu0 * T, zero, jnp.where(w <= 0.0, f_bottom, f_mid))


_cone_force_vmap = jax.vmap(_cone_force_block)
_cone_jac_vmap = jax.vmap(jax.jacfwd(_cone_force_block))


def cone_force(u, D, mu, dim_mask):
    """(C, 6) elliptic forces, vectorized over contact blocks."""
    if u.shape[0] == 0:
        return u
    return _cone_force_vmap(u, D, mu, dim_mask)


def cone_hessian(u, D, mu, dim_mask):
    """(C, 6, 6) block curvatures  C = −∂f/∂u  (PSD within zones)."""
    if u.shape[0] == 0:
        return jnp.zeros((0, 6, 6), u.dtype)
    return -_cone_jac_vmap(u, D, mu, dim_mask)


# ---------------------------------------------------------------------------------
# Newton solve
# ---------------------------------------------------------------------------------

def solve(m: Model, lay: ConstraintLayout, M, a_smooth, efc: Efc,
          warmstart=None, iterations: int = 10, ls_iterations: int = 6):
    """Returns (qacc, f_simple, f_cone, qfrc_constraint)."""
    dtype = a_smooth.dtype
    nv = a_smooth.shape[0]
    ns = efc.J.shape[0]
    C = efc.con_J.shape[0]
    if ns == 0 and C == 0:
        return a_smooth, jnp.zeros((0,), dtype), jnp.zeros((0, 6), dtype), \
            jnp.zeros(nv, dtype)

    unilateral = jnp.asarray(lay.simple_unilateral)
    D_s = jnp.where(efc.active, 1.0 / efc.R, 0.0)
    fl = efc.frictionloss
    if C:
        dim_mask = jnp.asarray(lay.cone_dim_mask, dtype)
        mu = efc.cone_mu
        D_c = jnp.where(efc.con_active[:, None], 1.0 / efc.con_R, 0.0) * dim_mask
    else:
        dim_mask = jnp.zeros((0, 6), dtype)
        mu = jnp.zeros((0, 5), dtype)
        D_c = jnp.zeros((0, 6), dtype)

    a0 = a_smooth if warmstart is None else warmstart

    def forces(us, uc):
        fs = simple_force(us, D_s, fl, unilateral)
        fc = cone_force(uc, D_c, mu, dim_mask)
        return fs, fc

    def newton_iter(_, a):
        us = efc.J @ a - efc.aref
        uc = (jnp.einsum('cdv,v->cd', efc.con_J, a) - efc.con_aref
              if C else jnp.zeros((0, 6), dtype))
        fs, fc = forces(us, uc)
        g = M @ (a - a_smooth) - efc.J.T @ fs
        if C:
            g = g - jnp.einsum('cdv,cd->v', efc.con_J, fc)

        cw = simple_hess_weight(us, D_s, fl, unilateral)
        H = M + efc.J.T @ (cw[:, None] * efc.J)
        if C:
            Cb = cone_hessian(uc, D_c, mu, dim_mask)
            H = H + jnp.einsum('cdv,cde,cew->vw', efc.con_J, Cb, efc.con_J)
        H = H + 1e-10 * jnp.trace(M) / nv * jnp.eye(nv, dtype=dtype)
        p = -spd_solve(H, g)

        # 1-D guarded linesearch on the convex derivative φ'(t):
        # precompute projections once; evals are elementwise.
        Mp = M @ p
        pMp = p @ Mp
        pMr = p @ (M @ (a - a_smooth))
        dus = efc.J @ p
        duc = (jnp.einsum('cdv,v->cd', efc.con_J, p)
               if C else jnp.zeros((0, 6), dtype))

        def dphi(t):
            fs_t, fc_t = forces(us + t * dus, uc + t * duc)
            val = pMr + t * pMp - fs_t @ dus
            if C:
                val = val - jnp.sum(fc_t * duc)
            return val

        # 1-D root bracket of the convex derivative φ'(t): ONE vectorized grid
        # evaluation (the grid axis rides the TPU lanes) instead of a long chain
        # of sequential widen/bisect kernels, then a few polish bisections.
        grid = jnp.asarray(np.geomspace(1e-3, 64.0, 14), dtype)
        vals = jax.vmap(dphi)(grid)
        neg = vals < 0
        # largest grid t with φ' < 0 (0 if none), smallest with φ' ≥ 0 (64 if none)
        lo = jnp.max(jnp.where(neg, grid, jnp.zeros_like(grid)))
        hi = jnp.min(jnp.where(neg, jnp.full_like(grid, grid[-1]), grid))

        def bisect(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            v = dphi(mid)
            return jnp.where(v < 0, mid, lo), jnp.where(v < 0, hi, mid)

        lo, hi = jax.lax.fori_loop(0, ls_iterations, bisect, (lo, hi))
        t = 0.5 * (lo + hi)
        # descent is guaranteed along a Newton direction of a convex function;
        # guard against a zero direction (already converged)
        return a + t * p

    a = jax.lax.fori_loop(0, iterations, newton_iter, a0)

    us = efc.J @ a - efc.aref
    uc = (jnp.einsum('cdv,v->cd', efc.con_J, a) - efc.con_aref
          if C else jnp.zeros((0, 6), dtype))
    fs, fc = forces(us, uc)
    qfrc = efc.J.T @ fs
    if C:
        qfrc = qfrc + jnp.einsum('cdv,cd->v', efc.con_J, fc)
    return a, fs, fc, qfrc
