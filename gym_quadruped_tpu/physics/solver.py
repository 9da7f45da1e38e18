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


# Layout-derived constant arrays (simple_unilateral, cone_dim_mask, linesearch
# grid) are normally embedded as jnp constants; a Pallas kernel wrapping solve()
# must pass them as kernel inputs instead (captured array constants are illegal
# there), so it injects them here around its trace. Used by the retired fused
# kernels kept for study in scripts/experimental/ (docs/PERF_NOTES.md round 4).
CONST_OVERRIDE: dict = {}

# When True every matrix product lowers as broadcast-multiply + reduction
# instead of dot_general: required inside Pallas kernels, where the env-last
# vmapped dots hit unsupported Mosaic dot-dimension layouts. The dims here are
# tiny (nv≈18), so the VPU reduction form costs the same as the dot.
SUM_FORM = False

# All dot_general-lowered products in the solver pin HIGHEST precision: the TPU
# default is bf16 MXU passes, which NaN the Newton solve (measured — a user
# running without jax_default_matmul_precision='highest' would crash). The
# solver is not MXU-bound, so this costs nothing.
_PREC = jax.lax.Precision.HIGHEST


def _mv(A, x):
    """(r, c) @ (c,) matvec."""
    return jnp.sum(A * x, axis=-1) if SUM_FORM else \
        jnp.matmul(A, x, precision=_PREC)


def _mtv(A, y):
    """Aᵀ y for A (r, c), y (r,)."""
    return jnp.sum(A * y[:, None], axis=0) if SUM_FORM else \
        jnp.matmul(A.T, y, precision=_PREC)


def _cmv(cJ, x):
    """(C, 6, v) @ (v,) → (C, 6)."""
    return jnp.sum(cJ * x, axis=-1) if SUM_FORM else \
        jnp.einsum('cdv,v->cd', cJ, x, precision=_PREC)


def _cmtv(cJ, f):
    """Σ_cd cJ[c, d] f[c, d] → (v,)."""
    if SUM_FORM:
        # static loop over output columns with FULL reductions: partial
        # reductions over leading dims of rank-4 batched tensors trip Mosaic's
        # relayout ("non-singleton logical dimension is replicated")
        return jnp.stack([jnp.sum(cJ[:, :, v] * f)
                          for v in range(cJ.shape[2])])
    return jnp.einsum('cdv,cd->v', cJ, f, precision=_PREC)


def _jtwj(J, w):
    """Jᵀ diag(w) J for J (r, v)."""
    if SUM_FORM:
        # single-axis expands only: Mosaic rejects multi-1 reshapes (… → …,1,1)
        aw = jnp.expand_dims(w, 1) * J                         # (r, v)
        return jnp.sum(jnp.expand_dims(aw, 2) * jnp.expand_dims(J, 1), axis=0)
    return jnp.matmul(J.T, w[:, None] * J, precision=_PREC)


def _cone_quad(cJ, Cb):
    """Σ_c cJ_cᵀ Cb_c cJ_c for cJ (C, 6, v), Cb (C, 6, 6) → (v, v).

    NOT a single 3-operand einsum: XLA's path for 'cdv,cde,cew->vw' under a
    4096-env vmap materializes a (B, C, 6, v, v) ≈ 1.6 GB intermediate and the
    step becomes HBM-bound (measured 68 of 104 ms/step). The unrolled Cb·J
    (6 fused multiply-adds, no big buffer) followed by ONE flat batched GEMM
    over the C·6 = 192 contraction rows is ~20× cheaper."""
    if SUM_FORM:
        # mixed int+None indexing lowers through gather and multi-1 reshapes
        # fail in Mosaic: use basic slicing + single-axis expand_dims only
        H = 0.0
        for d in range(6):
            cb_d = jnp.expand_dims(Cb[:, d], 2)             # (C, 6, 1)
            t_d = jnp.sum(cb_d * cJ, axis=1)                # (C, v)
            cj_d = jnp.expand_dims(cJ[:, d], 2)             # (C, v, 1)
            H = H + jnp.sum(cj_d * jnp.expand_dims(t_d, 1), axis=0)
        return H
    C, _, v = cJ.shape
    # t[c, d, :] = Σ_e Cb[c, d, e] · cJ[c, e, :]
    t = sum(Cb[:, :, e, None] * cJ[:, None, e, :] for e in range(6))
    return jnp.matmul(cJ.reshape(C * 6, v).T, t.reshape(C * 6, v),
                      precision=_PREC)


def _dot(a, b):
    return jnp.sum(a * b)


# ---------------------------------------------------------------------------------
# force laws
# ---------------------------------------------------------------------------------

def simple_force(u, D, fl, uni_f):
    """Row-separable force: one-sided quadratic or Huber clamp.
    uni_f is a FLOAT 0/1 mask (Mosaic mishandles 1-D bool broadcasts)."""
    f_uni = -D * jnp.minimum(u, 0.0)
    f_hub = -jnp.clip(D * u, -fl, fl)
    return uni_f * f_uni + (1.0 - uni_f) * f_hub


def simple_hess_weight(u, D, fl, uni_f):
    """Diagonal curvature of the simple-row costs at u (uni_f: float mask)."""
    c_uni = jnp.where(u < 0, D, 0.0)
    c_hub = jnp.where(jnp.abs(D * u) < fl, D, 0.0)
    return uni_f * c_uni + (1.0 - uni_f) * c_hub


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


def cone_hessian_analytic(u, D, mu, dim_mask):
    """Closed-form (C, 6, 6) cone block curvature — same values as the jacfwd
    path (verified in tests/test_solver_internals.py) but expressed with plain
    broadcast arithmetic, which the batch-trailing Pallas kernel can lower.

    Middle zone (W = (μ₀T + ρDₙN)/(1+ρDₙ), s = μ₀T, γⱼ = μⱼ²uⱼ/(μ₀T),
    βⱼ = γⱼ/(1+ρDₙ)):
        −∂fₙ/∂N  = Dₙ(1−α),    −∂fₙ/∂uⱼ = −Dₙβⱼ          (α = ρDₙ/(1+ρDₙ))
        −∂fᵢ/∂N  = −Dᵢuᵢα/s
        −∂fᵢ/∂uⱼ = Dᵢδᵢⱼ(1−W/s) − Dᵢuᵢ(βⱼ − (W/s)γⱼ)/s
    """
    dtype = u.dtype
    C = u.shape[0]
    mu0 = mu[:, 0]                                     # (C,)
    N = u[:, 0]
    uf = u[:, 1:] * dim_mask[:, 1:]                    # (C, 5)
    Dn = D[:, 0]
    Dt = D[:, 1]
    rho = mu0 * mu0 / jnp.maximum(Dt, 1e-30)
    T = jnp.sqrt(jnp.maximum(
        jnp.sum((uf * mu[:, :5] / jnp.expand_dims(mu0, 1)) ** 2, axis=1),
        1e-30))
    s = mu0 * T
    alpha = rho * Dn / (1.0 + rho * Dn)
    W = (s + rho * Dn * N) / (1.0 + rho * Dn)
    gamma = (mu[:, :5] ** 2) * uf / jnp.expand_dims(
        jnp.maximum(mu0 * T, 1e-30), 1)   # μⱼ²uⱼ/(μ₀T)
    beta = gamma / jnp.expand_dims(1.0 + rho * Dn, 1)
    Ws = W / jnp.maximum(s, 1e-30)

    Df = D[:, 1:] * dim_mask[:, 1:]                    # (C, 5)
    # assemble by concatenation, not .at[].set — batched scatters cost ~14
    # ms/step at B=4096 on TPU; concat lowers to plain copies
    row0 = jnp.concatenate([
        jnp.expand_dims(Dn * (1.0 - alpha), 1),        # (C, 1)
        -jnp.expand_dims(Dn, 1) * beta,                # (C, 5)
    ], axis=1)                                         # (C, 6)
    col0 = -Df * uf * jnp.expand_dims(
        alpha / jnp.maximum(s, 1e-30), 1)              # (C, 5)
    diag = Df * jnp.expand_dims(1.0 - Ws, 1)           # (C, 5)
    outer = (jnp.expand_dims(Df * uf, 2) *
             jnp.expand_dims(beta - jnp.expand_dims(Ws, 1) * gamma, 1) /
             jnp.expand_dims(jnp.expand_dims(jnp.maximum(s, 1e-30), 1), 2))
    ff = jnp.expand_dims(diag, 2) * jnp.eye(5, dtype=dtype)[None] - outer
    bottom = jnp.concatenate([jnp.expand_dims(col0, 2), ff], axis=2)  # (C,5,6)
    H = jnp.concatenate([jnp.expand_dims(row0, 1), bottom], axis=1)   # (C,6,6)

    # zone selection
    top = N >= mu0 * T                                  # f = 0 → H = 0
    bottom = W <= 0.0                                   # f = −D∘u → H = diag(D)
    Hm = H * jnp.expand_dims(dim_mask, 1) * jnp.expand_dims(dim_mask, 2)
    Hb = (jnp.eye(6, dtype=dtype)[None] *
          jnp.expand_dims(D * dim_mask, 1) *
          jnp.expand_dims(dim_mask, 2))
    zero = jnp.zeros_like(Hm)
    top_e = jnp.expand_dims(jnp.expand_dims(top, 1), 2)
    bot_e = jnp.expand_dims(jnp.expand_dims(bottom, 1), 2)
    return jnp.where(top_e, zero, jnp.where(bot_e, Hb, Hm))




def cone_hessian_rows(u, D, mu, dim_mask):
    """The analytic block curvature as SIX (C, 6) row tensors H[:, d, :]
    instead of one (C, 6, 6) array: never materializing the rank-4 batched
    (B, C, 6, 6) tensor saves ~10 ms/step at B=4096 (XLA's layout for the
    (6, 6) minor pair is pathological). Same values as cone_hessian_analytic
    (tests/test_solver_internals.py)."""
    dtype = u.dtype
    mu0 = mu[:, 0]
    N = u[:, 0]
    uf = u[:, 1:] * dim_mask[:, 1:]
    Dn = D[:, 0]
    Dt = D[:, 1]
    rho = mu0 * mu0 / jnp.maximum(Dt, 1e-30)
    T = jnp.sqrt(jnp.maximum(
        jnp.sum((uf * mu[:, :5] / jnp.expand_dims(mu0, 1)) ** 2, axis=1),
        1e-30))
    s = mu0 * T
    s_safe = jnp.maximum(s, 1e-30)
    alpha = rho * Dn / (1.0 + rho * Dn)
    W = (s + rho * Dn * N) / (1.0 + rho * Dn)
    gamma = (mu[:, :5] ** 2) * uf / s_safe[:, None]
    beta = gamma / (1.0 + rho * Dn)[:, None]
    Ws = W / s_safe
    Df = D[:, 1:] * dim_mask[:, 1:]

    col0 = -Df * uf * (alpha / s_safe)[:, None]            # (C, 5)
    diag = Df * (1.0 - Ws)[:, None]                        # (C, 5)
    right = (beta - Ws[:, None] * gamma) / s_safe[:, None]  # (C, 5)
    Dfuf = Df * uf

    top = (N >= mu0 * T)[:, None]
    bot = (W <= 0.0)[:, None]
    zero6 = jnp.zeros_like(u)

    # Rows are assembled by static slicing + concatenation ONLY — no eye6
    # constant rows: 1-D constant arrays become captured constants inside the
    # fused Pallas kernel's trace and Mosaic rejects them (ADVICE r1).
    rows = []
    for d in range(6):
        if d == 0:
            row = jnp.concatenate([
                jnp.expand_dims(Dn * (1.0 - alpha), 1),
                -jnp.expand_dims(Dn, 1) * beta,
            ], axis=1)
        else:
            j = d - 1
            base = -Dfuf[:, j:j + 1] * right               # (C, 5)
            parts = ([base[:, :j]] if j else []) \
                + [base[:, j:j + 1] + diag[:, j:j + 1]] \
                + ([base[:, j + 1:]] if j < 4 else [])
            ff_row = parts[0] if len(parts) == 1 \
                else jnp.concatenate(parts, axis=1)
            row = jnp.concatenate([col0[:, j:j + 1], ff_row], axis=1)
        row = row * dim_mask[:, d:d + 1] * dim_mask        # zone: middle
        # zone: bottom — diag(D); only column d is nonzero
        val_b = D[:, d:d + 1] * dim_mask[:, d:d + 1] * dim_mask[:, d:d + 1]
        parts_b = ([zero6[:, :d]] if d else []) + [val_b] \
            + ([zero6[:, d + 1:]] if d < 5 else [])
        row_b = parts_b[0] if len(parts_b) == 1 \
            else jnp.concatenate(parts_b, axis=1)
        rows.append(jnp.where(top, zero6, jnp.where(bot, row_b, row)))
    return tuple(rows)


def _cone_quad_rows(cJ, rows):
    """Sigma_c J_c^T Cb_c J_c with Cb given as 6 row tensors (cone_hessian_rows).
    Same contraction order as _cone_quad (unrolled Cb.J + one flat GEMM)."""
    C, _, v = cJ.shape
    t = jnp.stack([
        sum(rows[d][:, e, None] * cJ[:, e] for e in range(6))
        for d in range(6)], axis=1)                        # (C, 6, v)
    return jnp.matmul(cJ.reshape(C * 6, v).T, t.reshape(C * 6, v),
                      precision=_PREC)


# ---------------------------------------------------------------------------------
# Newton solve
# ---------------------------------------------------------------------------------

# Convergence tolerance on the accepted Newton step, relative to |qacc|:
# MuJoCo's Newton terminates on scaled improvement/gradient < tolerance
# (engine_solver.c, default 1e-8); the step norm is the analogous quadratic-
# convergence measure and is dtype-aware (f32 cannot resolve 1e-8 relative).
_TOL = {jnp.dtype('float32'): 1e-6, jnp.dtype('float64'): 1e-10}


def solve(m: Model, lay: ConstraintLayout, M, a_smooth, efc: Efc,
          warmstart=None, iterations: int = 10, ls_iterations: int = 6):
    """Returns (qacc, f_simple, f_cone, qfrc_constraint).

    `iterations` is the Newton iteration CAP: the loop exits early (per
    lax.while_loop batching: a converged env's carry freezes while the rest
    continue) once the accepted step is below _TOL·(1+|qacc|∞) — with the
    qacc warm start threaded by the env layer, typical locomotion steps
    converge in 2-5 iterations, so the cap only binds on hard multi-contact
    states."""
    dtype = a_smooth.dtype
    nv = a_smooth.shape[0]
    ns = efc.J.shape[0]
    C = efc.con_J.shape[0]
    if ns == 0 and C == 0:
        return a_smooth, jnp.zeros((0,), dtype), jnp.zeros((0, 6), dtype), \
            jnp.zeros(nv, dtype)

    # unilateral rows are exactly the zero-frictionloss rows (friction-loss
    # Huber rows are the only bilateral simple rows) — deriving the mask from
    # the traced frictionloss avoids a 1-D constant array, which crashes
    # Mosaic's layout pass inside the fused kernel
    unilateral = (efc.frictionloss <= 0).astype(dtype)
    # activity masks may arrive as float (Mosaic cannot reshape i1 vectors, so
    # the fused kernel keeps them f32); multiply-by-mask == where(active, ·, 0)
    act_f = efc.active.astype(dtype) if efc.active.dtype == jnp.bool_ \
        else efc.active
    D_s = act_f * (1.0 / efc.R)
    fl = efc.frictionloss
    if C:
        dim_mask = efc.cone_dim_mask
        mu = efc.cone_mu
        con_act_f = efc.con_active.astype(dtype) \
            if efc.con_active.dtype == jnp.bool_ else efc.con_active
        D_c = con_act_f[:, None] * (1.0 / efc.con_R) * dim_mask
    else:
        dim_mask = jnp.zeros((0, 6), dtype)
        mu = jnp.zeros((0, 5), dtype)
        D_c = jnp.zeros((0, 6), dtype)

    a0 = a_smooth if warmstart is None else warmstart
    tol = jnp.asarray(_TOL.get(jnp.dtype(dtype), 1e-6), dtype)

    def forces(us, uc):
        fs = simple_force(us, D_s, fl, unilateral)
        fc = cone_force(uc, D_c, mu, dim_mask)
        return fs, fc

    def newton_iter(carry):
        a, it, _ = carry
        us = _mv(efc.J, a) - efc.aref
        uc = (_cmv(efc.con_J, a) - efc.con_aref
              if C else jnp.zeros((0, 6), dtype))
        fs, fc = forces(us, uc)
        g = _mv(M, a - a_smooth) - _mtv(efc.J, fs)
        if C:
            g = g - _cmtv(efc.con_J, fc)

        cw = simple_hess_weight(us, D_s, fl, unilateral)
        H = M + _jtwj(efc.J, cw)
        if C:
            # closed form, not jacfwd (jacfwd costs ~15 ms/step at B=4096),
            # as row tensors, not a rank-4 (B, C, 6, 6) array (another ~10
            # ms/step) — parity in tests/test_solver_internals.py
            rows = cone_hessian_rows(uc, D_c, mu, dim_mask)
            H = H + _cone_quad_rows(efc.con_J, rows)
        trace_M = sum(M[i, i] for i in range(nv))  # static-index diagonal sum
        H = H + 1e-10 * trace_M / nv * jnp.eye(nv, dtype=dtype)
        p = -spd_solve(H, g)

        # 1-D guarded linesearch on the convex derivative φ'(t):
        # precompute projections once; evals are elementwise.
        Mp = _mv(M, p)
        pMp = _dot(p, Mp)
        pMr = _dot(p, _mv(M, a - a_smooth))
        dus = _mv(efc.J, p)
        duc = (_cmv(efc.con_J, p)
               if C else jnp.zeros((0, 6), dtype))

        def dphi(t):
            fs_t, fc_t = forces(us + t * dus, uc + t * duc)
            val = pMr + t * pMp - _dot(fs_t, dus)
            if C:
                val = val - jnp.sum(fc_t * duc)
            return val

        # 1-D root bracket of the convex derivative φ'(t): ONE vectorized grid
        # evaluation (the grid axis rides the TPU lanes) instead of a long chain
        # of sequential widen/bisect kernels, then a few polish bisections.
        if SUM_FORM:
            # static unroll with PYTHON-float grid points: a vmap level over the
            # grid axis creates rank-4 broadcasts and 1-D array constants crash
            # Mosaic's layout pass
            t_pts = [float(x) for x in np.geomspace(1e-3, 256.0, 15)]
            vals = [dphi(t) for t in t_pts]
            lo = jnp.zeros_like(vals[0])
            hi = jnp.full_like(vals[0], 256.0)
            for t, v in zip(t_pts, vals):
                lo = jnp.where(v < 0, t, lo)          # last negative (ascending)
            for t, v in zip(reversed(t_pts), reversed(vals)):
                hi = jnp.where(v >= 0, t, hi)         # first non-negative
        else:
            grid = CONST_OVERRIDE.get(
                'ls_grid', jnp.asarray(np.geomspace(1e-3, 256.0, 15), dtype))
            vals = jax.vmap(dphi)(grid)
            neg = vals < 0
            # largest grid t with φ' < 0 (0 if none), smallest with φ' ≥ 0
            # (the static grid endpoint if none)
            lo = jnp.max(jnp.where(neg, grid, jnp.zeros_like(grid)))
            hi = jnp.min(jnp.where(neg, jnp.full_like(grid, 256.0), grid))

        def bisect(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            v = dphi(mid)
            return jnp.where(v < 0, mid, lo), jnp.where(v < 0, hi, mid)

        lo, hi = jax.lax.fori_loop(0, ls_iterations, bisect, (lo, hi))
        t = 0.5 * (lo + hi)
        step = t * p
        a_new = a + step
        done = jnp.max(jnp.abs(step)) < tol * (1.0 + jnp.max(jnp.abs(a_new)))
        return a_new, it + 1, done

    a, _, _ = jax.lax.while_loop(
        lambda c: (c[1] < iterations) & ~c[2], newton_iter,
        (a0, jnp.zeros((), jnp.int32), jnp.zeros((), bool)))

    us = _mv(efc.J, a) - efc.aref
    uc = (_cmv(efc.con_J, a) - efc.con_aref
          if C else jnp.zeros((0, 6), dtype))
    fs, fc = forces(us, uc)
    qfrc = _mtv(efc.J, fs)
    if C:
        qfrc = qfrc + _cmtv(efc.con_J, fc)
    return a, fs, fc, qfrc


# ---------------------------------------------------------------------------------
# Batch-trailing solve (B = env axis minor)
#
# TPU/XLA stores an array's minor TWO dims tile-padded to (8, 128). The vmapped
# per-env solve works on (B, C, 6, nv)/(B, C, 6)/(B, C, 6, 6) tensors whose minor
# dims are tiny: (6, 18)→(8, 128) is ~9× HBM bloat, (C, 6) and (6, 6) are 21×+ —
# every elementwise op in the force/Hessian laws and every read of the cone
# Jacobian pays it (measured ~40 of 61 ms/step at B=4096). Here the SAME math is
# laid out with the batch axis minor — (C, 6, nv, B), (C, 6, B) — so the padding
# is ≤4/3× and contractions lower as leading-axis reductions or dot_generals with
# a trailing batch dim.
# ---------------------------------------------------------------------------------

def cone_force_bt(u, D, mu, dim_mask):
    """Elliptic cone forces, batch-trailing: u, D, dim_mask (C, 6, B), mu
    (C, 5, B) → (C, 6, B). Same formulas as _cone_force_block."""
    mu0 = mu[:, 0]                                        # (C, B)
    N = u[:, 0]
    uf = u[:, 1:] * dim_mask[:, 1:]                       # (C, 5, B)
    Dn = D[:, 0]
    Dt = D[:, 1]
    rho = mu0 * mu0 / jnp.maximum(Dt, 1e-30)
    T = jnp.sqrt(jnp.maximum(
        jnp.sum((uf * mu / mu0[:, None]) ** 2, axis=1), 1e-30))     # (C, B)
    w = (mu0 * T + rho * Dn * N) / (1.0 + rho * Dn)
    f_bottom = -D * u * dim_mask
    fn_mid = Dn * (w - N)
    ff_mid = -D[:, 1:] * uf * (1.0 - (w / jnp.maximum(mu0 * T, 1e-30))[:, None])
    f_mid = jnp.concatenate([fn_mid[:, None], ff_mid], axis=1) * dim_mask
    zero = jnp.zeros_like(u)
    top = (N >= mu0 * T)[:, None]
    bot = (w <= 0.0)[:, None]
    return jnp.where(top, zero, jnp.where(bot, f_bottom, f_mid))


def cone_hessian_analytic_bt(u, D, mu, dim_mask):
    """Closed-form block curvature, batch-trailing: (C, 6, B) inputs →
    (C, 6, 6, B). Same formulas as cone_hessian_analytic."""
    dtype = u.dtype
    mu0 = mu[:, 0]                                        # (C, B)
    N = u[:, 0]
    uf = u[:, 1:] * dim_mask[:, 1:]                       # (C, 5, B)
    Dn = D[:, 0]
    Dt = D[:, 1]
    rho = mu0 * mu0 / jnp.maximum(Dt, 1e-30)
    T = jnp.sqrt(jnp.maximum(
        jnp.sum((uf * mu / mu0[:, None]) ** 2, axis=1), 1e-30))
    s = mu0 * T
    s_safe = jnp.maximum(s, 1e-30)
    alpha = rho * Dn / (1.0 + rho * Dn)
    W = (s + rho * Dn * N) / (1.0 + rho * Dn)
    gamma = (mu ** 2) * uf / s_safe[:, None]              # (C, 5, B)
    beta = gamma / (1.0 + rho * Dn)[:, None]
    Ws = W / s_safe

    Df = D[:, 1:] * dim_mask[:, 1:]                       # (C, 5, B)
    row0 = jnp.concatenate([
        (Dn * (1.0 - alpha))[:, None],
        -Dn[:, None] * beta,
    ], axis=1)                                            # (C, 6, B)
    col0 = -Df * uf * (alpha / s_safe)[:, None]           # (C, 5, B)
    diag = Df * (1.0 - Ws)[:, None]                       # (C, 5, B)
    outer = (Df * uf)[:, :, None] * \
        (beta - Ws[:, None] * gamma)[:, None, :] / s_safe[:, None, None]
    eye5 = jnp.eye(5, dtype=dtype)[None, :, :, None]
    ff = diag[:, :, None] * eye5 - outer                  # (C, 5, 5, B)
    bottom = jnp.concatenate([col0[:, :, None], ff], axis=2)      # (C, 5, 6, B)
    H = jnp.concatenate([row0[:, None], bottom], axis=1)          # (C, 6, 6, B)

    top = (N >= mu0 * T)[:, None, None]
    bot = (W <= 0.0)[:, None, None]
    Hm = H * dim_mask[:, None, :, :] * dim_mask[:, :, None, :]
    Hb = (jnp.eye(6, dtype=dtype)[None, :, :, None] *
          (D * dim_mask)[:, None] * dim_mask[:, :, None, :])
    return jnp.where(top, jnp.zeros_like(Hm), jnp.where(bot, Hb, Hm))


def solve_batched(m: Model, lay: ConstraintLayout, M, a_smooth, efc: Efc,
                  iterations: int = 10, ls_iterations: int = 6):
    """Batched Newton solve, numerically identical to vmap(solve) (same force
    laws, same linesearch; verified in tests/test_solver_internals.py) but laid
    out batch-trailing internally. In/outputs are batch-leading:
    M (B, nv, nv), a_smooth (B, nv), efc batched → (qacc, f_simple, f_cone,
    qfrc_constraint) batch-leading."""
    dtype = a_smooth.dtype
    B, nv = a_smooth.shape
    ns = efc.J.shape[1]
    C = efc.con_J.shape[1]
    if ns == 0 and C == 0:
        return (a_smooth, jnp.zeros((B, 0), dtype), jnp.zeros((B, 0, 6), dtype),
                jnp.zeros((B, nv), dtype))

    # --- one-time transposes to batch-trailing -----------------------------
    Jb = jnp.transpose(efc.J, (1, 2, 0))                  # (ns, nv, B)
    arefb = efc.aref.T                                    # (ns, B)
    flb = efc.frictionloss.T
    actb = efc.active.T.astype(dtype)
    unilateral = (flb <= 0).astype(dtype)
    D_s = actb * (1.0 / efc.R.T)
    if C:
        cJb = jnp.transpose(efc.con_J, (1, 2, 3, 0))      # (C, 6, nv, B)
        carefb = jnp.transpose(efc.con_aref, (1, 2, 0))   # (C, 6, B)
        dmb = jnp.transpose(efc.cone_dim_mask, (1, 2, 0))
        cmub = jnp.transpose(efc.cone_mu, (1, 2, 0))      # (C, 5, B)
        cactb = efc.con_active.T.astype(dtype)            # (C, B)
        D_c = cactb[:, None] * jnp.transpose(1.0 / efc.con_R, (1, 2, 0)) * dmb
        cJx = cJb.reshape(C * 6, nv, B)                   # view, contiguous

    asm = a_smooth.T                                      # (nv, B)

    # --- contractions ------------------------------------------------------
    def smv(x):                                           # (nv,B) → (ns,B)
        return jnp.sum(Jb * x[None], axis=1)

    def smtv(f):                                          # (ns,B) → (nv,B)
        return jnp.sum(Jb * f[:, None], axis=0)

    def cmv(x):                                           # (nv,B) → (C,6,B)
        return jnp.sum(cJb * x[None, None], axis=2)

    def cmtv(f):                                          # (C,6,B) → (nv,B)
        return jnp.sum(cJb * f[:, :, None], axis=(0, 1))

    def mv_M(x):                                          # (nv,B) → (nv,B)
        return jax.lax.dot_general(M, x, (((2,), (0,)), ((0,), (1,))),
                                   precision=_PREC).T

    def jtwj_bl(w):                                       # (ns,B) → (B,nv,nv)
        return jax.lax.dot_general(Jb * w[:, None], Jb,
                                   (((0,), (0,)), ((2,), (2,))),
                                   precision=_PREC)

    def quad_bl(Cb):                                      # (C,6,6,B) → (B,nv,nv)
        t = sum(Cb[:, :, e][:, :, None] * cJb[:, e][:, None]
                for e in range(6))                        # (C, 6, nv, B)
        return jax.lax.dot_general(cJx, t.reshape(C * 6, nv, B),
                                   (((0,), (0,)), ((2,), (2,))),
                                   precision=_PREC)

    def forces(us, uc):
        fs = simple_force(us, D_s, flb, unilateral)
        fc = cone_force_bt(uc, D_c, cmub, dmb) if C else None
        return fs, fc

    eye = jnp.eye(nv, dtype=dtype)
    trace_M = jnp.trace(M, axis1=1, axis2=2)              # (B,)

    def newton_iter(_, a):
        us = smv(a) - arefb                               # (ns, B)
        uc = cmv(a) - carefb if C else None               # (C, 6, B)
        fs, fc = forces(us, uc)
        g = mv_M(a - asm) - smtv(fs)
        if C:
            g = g - cmtv(fc)

        cw = simple_hess_weight(us, D_s, flb, unilateral)
        H = M + jtwj_bl(cw)
        if C:
            H = H + quad_bl(cone_hessian_analytic_bt(uc, D_c, cmub, dmb))
        H = H + (1e-10 / nv) * trace_M[:, None, None] * eye
        p = -spd_solve(H, g.T)                            # (B, nv)
        p = p.T                                           # (nv, B)

        Mp = mv_M(p)
        pMp = jnp.sum(p * Mp, axis=0)                     # (B,)
        pMr = jnp.sum(p * mv_M(a - asm), axis=0)
        dus = smv(p)
        duc = cmv(p) if C else None

        def dphi(t):
            # t: scalar or (B,)
            fs_t, fc_t = forces(us + t * dus,
                                uc + t * duc if C else None)
            val = pMr + t * pMp - jnp.sum(fs_t * dus, axis=0)
            if C:
                val = val - jnp.sum(fc_t * duc, axis=(0, 1))
            return val                                    # (B,)

        t_pts = [float(x) for x in np.geomspace(1e-3, 256.0, 15)]
        vals = [dphi(t) for t in t_pts]
        lo = jnp.zeros_like(vals[0])
        hi = jnp.full_like(vals[0], 256.0)
        for t, v in zip(t_pts, vals):
            lo = jnp.where(v < 0, t, lo)
        for t, v in zip(reversed(t_pts), reversed(vals)):
            hi = jnp.where(v >= 0, t, hi)

        def bisect(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            v = dphi(mid)
            return jnp.where(v < 0, mid, lo), jnp.where(v < 0, hi, mid)

        lo, hi = jax.lax.fori_loop(0, ls_iterations, bisect, (lo, hi))
        return a + (0.5 * (lo + hi)) * p

    a = jax.lax.fori_loop(0, iterations, newton_iter, asm)

    us = smv(a) - arefb
    uc = cmv(a) - carefb if C else None
    fs, fc = forces(us, uc)
    qfrc = smtv(fs)
    if C:
        qfrc = qfrc + cmtv(fc)
    fc_out = (jnp.transpose(fc, (2, 0, 1)) if C
              else jnp.zeros((B, 0, 6), dtype))
    return a.T, fs.T, fc_out, qfrc.T
