"""Batch-trailing fused Newton contact solver (Pallas TPU kernel).

The second-generation fused solver: unlike ops/newton_solve.py (which wraps the
per-env solver in an in-kernel vmap — vmap canonicalizes the batch to dim 0 and
sinks Mosaic), every line here is written EXPLICITLY batch-trailing: each per-env
scalar is an (8, 128) tile, per-env tensors carry their small static dims in
front, and all products are broadcast-multiply + leading-axis reductions — the
exact patterns probed green on real hardware (docs/PERF_NOTES.md §7).

One kernel instance = the full Newton iteration loop for 1024 envs with all
constraint data resident in VMEM: the cone Jacobians are read from HBM once per
step instead of once per iteration per XLA op.

Math is identical to physics/solver.py (same force laws, analytic cone Hessian —
cone_hessian_analytic is jacfwd-verified; the unrolled Cholesky is the kernel
from ops/spd_solve.py). Cross-checked against the XLA solver in
tests/test_newton_bt.py (interpreter mode) and on hardware.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics.constraints import ConstraintLayout, Efc

INTERPRET = False
# Round-3 status — compiles, runs, PARKED for speed (measured, not assumed):
# round-2's C≥6 wall was the compiler's default 16 MB scoped-vmem budget (not
# Mosaic); with vmem_limit_bytes=100MB the production C=32 × it=10 kernel
# compiles and runs on real v5e (scripts/probe_bt_compile.py, rel err ~1e-3 vs
# the XLA solver on unconverged hard states, exact on converged ones). But it
# executes at ~1.4 s/step at B=4096 — 25× SLOWER than the vmapped XLA solver
# (~55 ms/step): Mosaic schedules the fully-unrolled scalar-tile Cholesky/
# H-assembly/linesearch far from the VPU roofline, and 50-step scans (~70 s
# per execution) trip the axon worker watchdog ("TPU worker crashed").
# Evidence: scripts/probe_bt_perf.py, probe_bt_fault.py, /tmp/bt_bisect runs
# logged in docs/PERF_NOTES.md round 3. Kept for study; do not enable.
ENABLE = False
# XLA fallback flavor when the Pallas kernel is off: 'vmap' (production) or
# 'bt' (batch-trailing solve_batched — slower on v5e, kept for study)
XLA_FALLBACK = 'vmap'
_SUB, _LANES = 8, 128
_CHUNK = _SUB * _LANES
# SAME grid as physics/solver.py's linesearch: with a shorter grid (tried:
# max 64) hard tumbling states need t>max and the kernel's iterates drift from
# the XLA solver's, costing convergence within the iteration cap.
_LS_GRID = [float(x) for x in np.geomspace(1e-3, 256.0, 15)]
_LS_BISECT = 6


# -------------------------------------------------------------------------------
# batch-trailing helpers: trailing (*T) = (8, 128) env tile on every tensor
# -------------------------------------------------------------------------------

def _mv(A, x):
    """(r, c, *T) @ (c, *T) → (r, *T)."""
    return jnp.sum(A * jnp.expand_dims(x, 0), axis=1)


def _mtv(A, y):
    """(r, c, *T), (r, *T) → (c, *T)."""
    return jnp.sum(A * jnp.expand_dims(y, 1), axis=0)


def _cmv(cJ, x):
    """(C, 6, v, *T) @ (v, *T) → (C, 6, *T).

    Accumulated column-by-column: a broadcast product against the full cJ would
    materialize a second (C, 6, v, *T) tensor (~11 MB at C=24) on top of the
    input and overflow VMEM."""
    nv = cJ.shape[2]
    acc = cJ[:, :, 0] * x[0]
    for v in range(1, nv):
        acc = acc + cJ[:, :, v] * x[v]
    return acc


def _cmtv(cJ, f):
    """Σ_cd cJ[c, d] f[c, d] → (v, *T) (column loop — same VMEM reasoning)."""
    nv = cJ.shape[2]
    cols = []
    for v in range(nv):
        cols.append(_dot(cJ[:, :, v], f))
    return jnp.stack(cols)


def _dot(a, b):
    """Full reduce over leading per-env dims → (*T)."""
    out = a * b
    while out.ndim > 2:
        out = jnp.sum(out, axis=0)
    return out


def _axis1_mask(i, dim, ndim):
    """Boolean (1, dim, 1, …) selector of index i along axis 1 — built from a
    broadcasted iota so no constant array is captured and no scatter is needed."""
    shape = (1, dim) + (1,) * (ndim - 2)
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1) == i


def _set_at1(x, i, val):
    """x with val placed at index i of axis 1 (x (C, dim, *T), val (C, *T))."""
    sel = _axis1_mask(i, x.shape[1], x.ndim)
    return jnp.where(sel, jnp.expand_dims(val, 1), x)


def _add_at1(x, i, val):
    sel = _axis1_mask(i, x.shape[1], x.ndim)
    return x + jnp.where(sel, jnp.expand_dims(val, 1), jnp.zeros_like(x))


def _cone_force_bt(u, D, mu, mask):
    """Elliptic cone forces, batch-trailing. u, D, mask: (C, 6, *T); mu (C, 5, *T)."""
    mu0 = mu[:, 0]                       # (C, *T)
    N = u[:, 0]
    uf = u[:, 1:] * mask[:, 1:]          # (C, 5, *T)
    Dn = D[:, 0]
    Dt = D[:, 1]
    rho = mu0 * mu0 / jnp.maximum(Dt, 1e-30)
    T = jnp.sqrt(jnp.maximum(jnp.sum(
        (uf * mu / jnp.expand_dims(mu0, 1)) ** 2, axis=1), 1e-30))
    s = mu0 * T
    w = (s + rho * Dn * N) / (1.0 + rho * Dn)
    fn_mid = Dn * (w - N)                                       # (C, *T)
    ff_mid = -D[:, 1:] * uf * (1.0 - jnp.expand_dims(
        w / jnp.maximum(s, 1e-30), 1))                          # (C, 5, *T)
    f_mid = jnp.concatenate([jnp.expand_dims(fn_mid, 1), ff_mid], axis=1) * mask
    f_bottom = -D * u * mask
    top = jnp.expand_dims(N >= s, 1)
    bottom = jnp.expand_dims(w <= 0.0, 1)
    return jnp.where(top, jnp.zeros_like(f_mid),
                     jnp.where(bottom, f_bottom, f_mid))


def _cone_hessian_rows_bt(u, D, mu, mask):
    """Analytic block curvature rows: returns a list Hrow[d] of (C, 6, *T) for
    d = 0..5 (H = −∂f/∂u of solver.cone_hessian_analytic, zone-selected),
    avoiding a materialized (C, 6, 6, *T) tensor."""
    mu0 = mu[:, 0]
    N = u[:, 0]
    uf = u[:, 1:] * mask[:, 1:]
    Dn = D[:, 0]
    Dt = D[:, 1]
    rho = mu0 * mu0 / jnp.maximum(Dt, 1e-30)
    T = jnp.sqrt(jnp.maximum(jnp.sum(
        (uf * mu / jnp.expand_dims(mu0, 1)) ** 2, axis=1), 1e-30))
    s = jnp.maximum(mu0 * T, 1e-30)
    denom = 1.0 + rho * Dn
    alpha = rho * Dn / denom
    W = (mu0 * T + rho * Dn * N) / denom
    gamma = (mu ** 2) * uf / jnp.expand_dims(s, 1)              # (C, 5, *T)
    beta = gamma / jnp.expand_dims(denom, 1)
    Ws = W / s
    Df = D[:, 1:] * mask[:, 1:]

    top = N >= mu0 * T
    bottom = W <= 0.0
    topb = jnp.expand_dims(top, 1)
    botb = jnp.expand_dims(bottom, 1)

    def zone(mid_row, bot_row):
        """Select per zone; top → 0."""
        z = jnp.where(botb, bot_row, mid_row)
        return jnp.where(topb, jnp.zeros_like(z), z)

    rows = []
    # row 0: [Dn(1−α), −Dn·β]
    r0_mid = jnp.concatenate(
        [jnp.expand_dims(Dn * (1.0 - alpha), 1),
         -jnp.expand_dims(Dn, 1) * beta], axis=1) * mask
    r0_bot = jnp.concatenate(
        [jnp.expand_dims(D[:, 0], 1),
         jnp.zeros_like(beta)], axis=1) * mask
    rows.append(zone(r0_mid, r0_bot) * jnp.expand_dims(mask[:, 0], 1))

    # rows 1..5: [−Dᵢuᵢα/s, Dᵢδᵢⱼ(1−W/s) − Dᵢuᵢ(βⱼ − (W/s)γⱼ)/s]
    coef = beta - jnp.expand_dims(Ws, 1) * gamma                # (C, 5, *T)
    for i in range(5):
        di_ui = Df[:, i] * uf[:, i]                             # (C, *T)
        col0 = -di_ui * alpha / s
        fr = -jnp.expand_dims(di_ui / s, 1) * coef              # (C, 5, *T)
        fr = _add_at1(fr, i, Df[:, i] * (1.0 - Ws))
        r_mid = jnp.concatenate([jnp.expand_dims(col0, 1), fr], axis=1) * mask
        bot_diag = _set_at1(jnp.zeros_like(fr), i, D[:, 1 + i])
        r_bot = jnp.concatenate(
            [jnp.zeros_like(jnp.expand_dims(col0, 1)), bot_diag],
            axis=1) * mask
        rows.append(zone(r_mid, r_bot) * jnp.expand_dims(mask[:, 1 + i], 1))
    return rows


def _chol_solve_bt(A, b, n):
    """Unrolled Cholesky solve on entry tiles: A (n, n, *T), b (n, *T)."""
    a = [[A[i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    Linv = [None] * n
    for j in range(n):
        sdiag = a[j][j]
        for k in range(j):
            sdiag = sdiag - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(sdiag, 1e-30))
        L[j][j] = d
        Linv[j] = 1.0 / d
        for i in range(j + 1, n):
            s2 = a[i][j]
            for k in range(j):
                s2 = s2 - L[i][k] * L[j][k]
            L[i][j] = s2 * Linv[j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * Linv[i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * Linv[i]
    return jnp.stack(x)


# -------------------------------------------------------------------------------
# kernel body
# -------------------------------------------------------------------------------

def _chol_solve_inplace(Hs, g, n):
    """Cholesky factor IN PLACE on the scratch ref Hs (n, n, *T), then solve.

    Keeping L in the scratch buffer instead of SSA values caps the register/VMEM
    pressure: the fully-SSA form holds n(n+1)/2 ≈ 171 live tiles (~5.5 MB) and
    pushed the kernel past the VMEM budget."""
    Linv = [None] * n
    for j in range(n):
        s = Hs[j, j]
        for k in range(j):
            ljk = Hs[j, k]
            s = s - ljk * ljk
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        inv = 1.0 / d
        Linv[j] = inv
        Hs[j, j] = d
        for i in range(j + 1, n):
            s2 = Hs[i, j]
            for k in range(j):
                s2 = s2 - Hs[i, k] * Hs[j, k]
            Hs[i, j] = s2 * inv
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - Hs[i, k] * y[k]
        y[i] = s * Linv[i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - Hs[k, i] * x[k]
        x[i] = s * Linv[i]
    return jnp.stack(x)


def _solver_kernel(nv, ns, C, iterations,
                   M_ref, a_ref, a0_ref, J_ref, aref_ref, R_ref, act_ref,
                   fl_ref, cJ_ref, caref_ref, cR_ref, cact_ref, cmu_ref,
                   cmask_ref, qacc_ref, fs_ref, fc_ref, qfrc_ref, Hs):
    M = M_ref[:]               # (nv, nv, *T)
    a_smooth = a_ref[:]        # (nv, *T)
    a0 = a0_ref[:]             # (nv, *T) warm start (mjData.qacc_warmstart)
    J = J_ref[:]               # (ns, nv, *T)
    aref = aref_ref[:]
    R = R_ref[:]
    act = act_ref[:]           # float mask (ns, *T)
    fl = fl_ref[:]
    cJ = cJ_ref[:]             # (C, 6, nv, *T)
    caref = caref_ref[:]       # (C, 6, *T)
    cR = cR_ref[:]
    cact = cact_ref[:]         # (C, *T)
    cmu = cmu_ref[:]           # (C, 5, *T)
    cmask = cmask_ref[:]       # (C, 6, *T)

    uni = (fl <= 0.0).astype(M.dtype)
    D_s = act * (1.0 / R)
    D_c = jnp.expand_dims(cact, 1) * (1.0 / cR) * cmask

    def simple_force(us):
        f_uni = -D_s * jnp.minimum(us, 0.0)
        f_hub = -jnp.clip(D_s * us, -fl, fl)
        return uni * f_uni + (1.0 - uni) * f_hub

    def forces(us, uc):
        return simple_force(us), _cone_force_bt(uc, D_c, cmu, cmask)

    trace_M = M[0, 0]
    for i in range(1, nv):
        trace_M = trace_M + M[i, i]
    reg = 1e-10 * trace_M / nv

    def newton_iter(_, a):
        us = _mv(J, a) - aref
        uc = _cmv(cJ, a) - caref
        fs, fc = forces(us, uc)
        g = _mv(M, a - a_smooth) - _mtv(J, fs) - _cmtv(cJ, fc)

        # H = M + Jᵀdiag(cw)J + Σ_c cJᵀ Cb cJ, assembled ROW-WISE: a full outer
        # product would materialize a (C, nv, nv, *T) ≈ 32 MB intermediate and
        # crash the Mosaic compiler; per-row sums keep transients ≤ (C, nv, *T).
        c_uni = jnp.where(us < 0, D_s, 0.0)
        c_hub = jnp.where(jnp.abs(D_s * us) < fl, D_s, 0.0)
        cw = uni * c_uni + (1.0 - uni) * c_hub                  # (ns, *T)
        Jw = jnp.expand_dims(cw, 1) * J                         # (ns, nv, *T)

        hrows = _cone_hessian_rows_bt(uc, D_c, cmu, cmask)      # 6 × (C, 6, *T)
        # assemble H row-by-row INTO THE SCRATCH ref (diag gets the regularizer);
        # one t_d (C, nv, *T) alive at a time, built by an e-loop: broadcasting
        # hrows against full cJ would create a (C, 6, nv, *T) transient
        ridx = jax.lax.broadcasted_iota(jnp.int32, (nv, 1, 1), 0)
        for i in range(nv):
            row = M[i] + jnp.sum(jnp.expand_dims(Jw[:, i], 1) * J, axis=0)
            Hs[i] = row + jnp.where(ridx == i, jnp.expand_dims(reg, 0),
                                    jnp.zeros_like(row))
        for d in range(6):
            t_d = jnp.expand_dims(hrows[d][:, 0], 1) * cJ[:, 0]
            for e in range(1, 6):
                t_d = t_d + jnp.expand_dims(hrows[d][:, e], 1) * cJ[:, e]
            for i in range(nv):
                Hs[i] = Hs[i] + jnp.sum(
                    jnp.expand_dims(cJ[:, d, i], 1) * t_d, axis=0)

        p = -_chol_solve_inplace(Hs, g, nv)

        Mp = _mv(M, p)
        pMp = _dot(p, Mp)
        pMr = _dot(p, _mv(M, a - a_smooth))
        dus = _mv(J, p)
        duc = _cmv(cJ, p)

        def dphi(t):
            fs_t, fc_t = forces(us + t * dus, uc + t * duc)
            return pMr + t * pMp - _dot(fs_t, dus) - _dot(fc_t, duc)

        vals = [dphi(t) for t in _LS_GRID]
        lo = jnp.zeros_like(vals[0])
        hi = jnp.full_like(vals[0], _LS_GRID[-1])
        for t, v in zip(_LS_GRID, vals):
            lo = jnp.where(v < 0, t, lo)
        for t, v in zip(reversed(_LS_GRID), reversed(vals)):
            hi = jnp.where(v >= 0, t, hi)

        def bisect(_, bounds):
            blo, bhi = bounds
            mid = 0.5 * (blo + bhi)
            v = dphi(mid)
            return jnp.where(v < 0, mid, blo), jnp.where(v < 0, bhi, mid)

        lo, hi = jax.lax.fori_loop(0, _LS_BISECT, bisect, (lo, hi))
        return a + 0.5 * (lo + hi) * p

    a = jax.lax.fori_loop(0, iterations, newton_iter, a0)

    us = _mv(J, a) - aref
    uc = _cmv(cJ, a) - caref
    fs, fc = forces(us, uc)
    qacc_ref[:] = a
    fs_ref[:] = fs
    fc_ref[:] = fc
    qfrc_ref[:] = _mtv(J, fs) + _cmtv(cJ, fc)


# -------------------------------------------------------------------------------
# host-side wrapper
# -------------------------------------------------------------------------------

def _to_tiles(x):
    """(B, ...) → (..., B/128, 128)."""
    x = jnp.moveaxis(x, 0, -1)
    return x.reshape(x.shape[:-1] + (x.shape[-1] // _LANES, _LANES))


def _from_tiles(x):
    x = x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
    return jnp.moveaxis(x, -1, 0)


@functools.lru_cache(maxsize=32)
def _call(nv, ns, C, Bp, iterations, interpret):
    rows = Bp // _LANES
    kernel = functools.partial(_solver_kernel, nv, ns, C, iterations)

    def spec(lead):
        nd = len(lead) + 2
        return pl.BlockSpec(lead + (_SUB, _LANES),
                            (lambda c, nd=nd: (0,) * (nd - 2) + (c, 0)),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(s) for s in (
        (nv, nv), (nv,), (nv,), (ns, nv), (ns,), (ns,), (ns,), (ns,),
        (C, 6, nv), (C, 6), (C, 6), (C,), (C, 5), (C, 6))]
    out_leads = ((nv,), (ns,), (C, 6), (nv,))
    return pl.pallas_call(
        kernel, grid=(rows // _SUB,),
        in_specs=in_specs,
        out_specs=tuple(spec(s) for s in out_leads),
        out_shape=tuple(jax.ShapeDtypeStruct(s + (rows, _LANES), jnp.float32)
                        for s in out_leads),
        scratch_shapes=[pltpu.VMEM((nv, nv, _SUB, _LANES), jnp.float32)],
        # the working set at C=32 (cone Jacobians + constraint data + H scratch)
        # exceeds the compiler's default 16 MB scoped-vmem budget; raise it
        # toward the physical VMEM (the C=16 compile needs ~18.4 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def solve_batched_bt(m: Model, lay: ConstraintLayout, M, a_smooth, efc: Efc,
                     warmstart=None, iterations: int = 10):
    """Batch-leading in/out; fused batch-trailing kernel inside.

    Falls back to the vmapped XLA solver off-TPU or when the model has no cone
    blocks / no simple rows (pyramidal robots keep the XLA path)."""
    from gym_quadruped_tpu.physics import solver as _solver

    B = a_smooth.shape[0]
    ns = efc.J.shape[1]
    C = efc.con_J.shape[1]
    on_tpu = jax.default_backend() == 'tpu'
    use_kernel = (((on_tpu and ENABLE) or INTERPRET)
                  and a_smooth.dtype == jnp.float32 and ns > 0 and C > 0
                  and a_smooth.shape[1] <= 18 and C <= 32)
    if not use_kernel:
        if XLA_FALLBACK == 'bt' and warmstart is None:
            # batch-trailing XLA solver (physics/solver.py solve_batched):
            # same math, env axis minor. Measured SLOWER than the vmapped
            # solver on v5e (130 vs 61 ms/step at B=4096) — the contractions
            # pay relayouts that outweigh the elementwise layout win. Kept for
            # study; 'vmap' is the production path.
            return _solver.solve_batched(m, lay, M, a_smooth, efc,
                                         iterations=iterations)
        if warmstart is None:
            return jax.vmap(lambda Mi, ai, ei: _solver.solve(
                m, lay, Mi, ai, ei, iterations=iterations))(M, a_smooth, efc)
        return jax.vmap(lambda Mi, ai, ei, wi: _solver.solve(
            m, lay, Mi, ai, ei, warmstart=wi, iterations=iterations))(
                M, a_smooth, efc, warmstart)

    nv = a_smooth.shape[1]
    Bp = ((B + _CHUNK - 1) // _CHUNK) * _CHUNK
    pad = Bp - B

    def prep(x, pad_value=0.0):
        x = x.astype(jnp.float32)
        if pad:
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, width, constant_values=pad_value)
        return _to_tiles(x)

    M_in = M.astype(jnp.float32)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(nv, dtype=jnp.float32), (pad, nv, nv))
        M_in = jnp.concatenate([M_in, eye], axis=0)

    a0 = a_smooth if warmstart is None else warmstart
    args = (
        _to_tiles(M_in), prep(a_smooth), prep(a0),
        prep(efc.J), prep(efc.aref), prep(efc.R, 1.0), prep(efc.active),
        prep(efc.frictionloss),
        prep(efc.con_J), prep(efc.con_aref), prep(efc.con_R, 1.0),
        prep(efc.con_active), prep(efc.cone_mu, 1.0), prep(efc.cone_dim_mask),
    )
    qacc, fs, fc, qfrc = _call(nv, ns, C, Bp, iterations, INTERPRET)(*args)
    return (_from_tiles(qacc)[:B], _from_tiles(fs)[:B],
            _from_tiles(fc)[:B], _from_tiles(qfrc)[:B])
