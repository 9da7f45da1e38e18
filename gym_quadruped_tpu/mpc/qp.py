"""Condensed-QP solver for centroidal MPC: dense condensing + consensus ADMM.

TPU design rationale: at H=12 the condensed decision vector is U ∈ R¹⁴⁴, so one
solve is a 144×144 Cholesky plus a few dozen ADMM iterations of dense matvecs —
exactly the shape the MXU wants when batched over thousands of envs (the
"solves/s" headline of BASELINE.json). No dynamic shapes, no data-dependent
branching; warm starting across replans makes the per-tick refinement cheap.

    min_U  ½ Uᵀ H U + qᵀ U      s.t.  U ∈ C (per-leg friction pyramids)
    H = SᵤᵀQ̄Sᵤ + R̄,  q = SᵤᵀQ̄(Sₓx₀ − X_ref)

Consensus ADMM (z is the cone-feasible copy; swing legs force-pinned to zero):
    U ← (H + ρI)⁻¹(ρ(z − y) − q)       (Cholesky factored once per solve)
    z ← Π_C(U + y);  y ← y + U − z

The constraint set C is handled by direct per-3-vector projection (fz clamp, then
tangentials to ±μfz) instead of a constraint matrix: the swing-leg force columns of
B are zero and R > 0, so pinning them via the projection is exact. ρ is set
relative to the force-effort regularizer (the small end of H's spectrum, where the
cone-constrained directions live) — validated against scipy SLSQP in
tests/test_mpc.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.mpc.centroidal import NU, NX


@dataclasses.dataclass(frozen=True)
class MPCWeights:
    """Tracking weights (θ, p, ω, v ordering of the SRB state).

    Defaults follow the classic convex-MPC tuning (position + yaw tracking with
    near-zero rate weights): position integration over the horizon supplies the
    damping. Selected by a vmapped closed-loop sweep over candidate weights —
    heavy roll/pitch or velocity weights starve the stance fz (the diagonal
    support forces necessarily create attitude moments) and the robot sags or
    bounces instead of trotting."""

    q_diag: tuple = (0.25, 0.25, 10.0,   # rpy
                     2.0, 2.0, 50.0,     # position
                     0.0, 0.0, 0.3,      # ω
                     0.2, 0.2, 0.2,      # v
                     0.0)                # augmented 1
    r_diag: float = 1e-5                 # force effort


def condense(A, B, x0, x_ref, q_diag, r_scalar):
    """Dense condensing over the horizon.

    Args:
        A: (H, NX, NX), B: (H, NX, NU), x0: (NX,), x_ref: (H, NX)
    Returns:
        Hq (H·NU, H·NU), q (H·NU,)
    """
    H = A.shape[0]
    dtype = x0.dtype

    # running-row recursion: row_k = A_k row_{k−1} (+ B_k in block k), so the
    # whole (H·NX, H·NU) prediction matrix costs H matmuls instead of H²/2
    Sx_rows, Su_rows = [], []
    phi = jnp.eye(NX, dtype=dtype)
    row = jnp.zeros((NX, H * NU), dtype)
    for k in range(H):
        phi = A[k] @ phi
        row = A[k] @ row
        row = jax.lax.dynamic_update_slice(
            row, row[:, k * NU:(k + 1) * NU] + B[k], (0, k * NU))
        Sx_rows.append(phi)
        Su_rows.append(row)
    Sx = jnp.stack(Sx_rows)                 # (H, NX, NX)
    Su = jnp.concatenate(Su_rows, axis=0)   # (H·NX, H·NU)

    Qd = jnp.tile(jnp.asarray(q_diag, dtype), (H,))
    xbar = (Sx @ x0).reshape(-1)
    r = xbar - x_ref.reshape(-1)
    Hq = Su.T @ (Qd[:, None] * Su) + r_scalar * jnp.eye(H * NU, dtype=dtype)
    q = Su.T @ (Qd * r)
    return Hq, q


def _project_wedge(t, n, mu):
    """Exact Euclidean projection of (t, n) pairs onto the 2D wedge |t| ≤ μ n."""
    inside = jnp.abs(t) <= mu * n
    below = mu * jnp.abs(t) <= -n          # polar cone: projects to the origin
    lam = jnp.maximum((mu * jnp.abs(t) + n) / (1.0 + mu * mu), 0.0)
    t_edge = jnp.sign(t) * mu * lam
    t_new = jnp.where(inside, t, jnp.where(below, 0.0, t_edge))
    n_new = jnp.where(inside, n, jnp.where(below, 0.0, lam))
    return t_new, n_new


def project_pyramid(v, stance, mu, fz_min, fz_max, sweeps: int = 8):
    """Π_C: exact per-leg-knot projection onto the friction pyramid
    {|fx| ≤ μfz, |fy| ≤ μfz, fz ∈ [fz_min·c, fz_max·c]} via Dykstra's algorithm
    over the two wedges and the z-box (a handful of elementwise sweeps — exact to
    float tolerance for this 3-set intersection). v (H·NU,), stance (H·4,)."""
    f0 = v.reshape(-1, 3)
    lo, hi = fz_min * stance, fz_max * stance

    def proj_sets(f, p):
        # set 1: x-wedge
        w = f + p[0]
        fx, fz = _project_wedge(w[:, 0], w[:, 2], mu)
        f1 = jnp.stack([fx, w[:, 1], fz], axis=1)
        p0 = w - f1
        # set 2: y-wedge
        w = f1 + p[1]
        fy, fz = _project_wedge(w[:, 1], w[:, 2], mu)
        f2 = jnp.stack([w[:, 0], fy, fz], axis=1)
        p1 = w - f2
        # set 3: z-box
        w = f2 + p[2]
        f3 = w.at[:, 2].set(jnp.clip(w[:, 2], lo, hi))
        p2 = w - f3
        return f3, (p0, p1, p2)

    p = (jnp.zeros_like(f0),) * 3

    def body(_, carry):
        return proj_sets(carry[0], carry[1])

    f, _ = jax.lax.fori_loop(0, sweeps, body, (f0, p))
    # final safety clamp so the return value is strictly feasible
    fz = jnp.clip(f[:, 2], lo, hi)
    fx = jnp.clip(f[:, 0], -mu * fz, mu * fz)
    fy = jnp.clip(f[:, 1], -mu * fz, mu * fz)
    return jnp.stack([fx, fy, fz], axis=1).reshape(-1)


_NS_ITERS = 18
_NS_SHIFT = 0.02
_PREC = jax.lax.Precision.HIGHEST


def spd_inverse(K, swing_mask, iters: int = _NS_ITERS):
    """Matmul-only SPD inverse for the ADMM x-update (Newton-Schulz).

    Why not `jnp.linalg.inv`: the batched (B, 144, 144) LU inverse costs
    468 ms at B=4096 on v5e — 95% of the ENTIRE MPC solve (measured,
    scripts/probes/probe_mpc_cost.py); XLA lowers the factorization to
    sequential loops that cannot use the MXU. Newton-Schulz
    (X ← X(2I − KX)) is two batched matmuls per iteration.

    Conditioning (measured on real trot matrices, probe_mpc_ns.py):
    ~75% of K's spectrum sits AT the r_diag+rho floor (1.1e-4) — all swing
    force directions plus the cost-flat stance tangentials — against a
    1.4e-1 top eigenvalue (κ ≈ 1.3e3). Mitigations, all measured:
      * swing columns of K are EXACTLY (r_diag+rho)·I (their Su columns are
        zero), so they are lifted by `_NS_SHIFT` before the iteration and
        restored by an exact diagonal correction afterwards;
      * bf16 and bf16x3 matmuls diverge / floor at ~0.4 residual (the 1/base
        ≈ 9e3 dynamic range amplifies multiply noise) — the loop must run at
        f32-highest;
      * 18 iterations from the identity/row-sum init reach the f32 residual
        floor (‖I − XK‖_F ≈ 2e-3, vs 1e-4 for LU); the end-to-end ADMM
        solution differs from the LU path by ~4e-3 N on a 165 N force scale.
    Net: 468 ms → ~170 ms for the x-update setup; whole-solve rate 7.9k →
    ~17k solves/s at B=4096.
    """
    n = K.shape[-1]
    dtype = K.dtype
    eye = jnp.eye(n, dtype=dtype)
    # swing diagonal = r_diag + rho exactly; min over the diag recovers it
    # without threading the weight constants through
    base = jnp.min(jnp.diagonal(K))
    D = jnp.where(swing_mask, jnp.asarray(_NS_SHIFT, dtype), 0.0)
    K2 = K + jnp.diag(D)
    lam = jnp.max(jnp.sum(jnp.abs(K2), axis=-1))       # ≥ λmax(K2)
    X = eye / lam

    def body(_, X):
        # Pinned to HIGHEST: the bf16 MXU default diverges here (see above) —
        # a library user must not need the global matmul-precision flag for
        # the controller to produce a correct inverse (matches solver._PREC).
        KX = jnp.matmul(K2, X, precision=_PREC)
        return jnp.matmul(X, 2.0 * eye - KX, precision=_PREC)

    X = jax.lax.fori_loop(0, iters, body, X)
    corr = jnp.where(swing_mask, 1.0 / base - 1.0 / (base + _NS_SHIFT), 0.0)
    return X + jnp.diag(corr)


def admm_solve(Hq, q, schedule, mu, fz_min, fz_max, iterations: int = 30,
               rho: float = 1e-4, warmstart=None):
    """Fixed-iteration consensus ADMM. Returns (U_feasible, (U, z, y) warm).

    The x-update uses an explicit K⁻¹ computed ONCE per solve: batched small
    triangular solves are a TPU weak spot (XLA lowers them to sequential loops —
    measured ~92 ms per iteration at B=4096), whereas K⁻¹ turns every iteration
    into one (n × n) matvec that batches onto the MXU. The inverse itself is
    Newton-Schulz (`spd_inverse`), not LU — see its docstring for the measured
    rationale. ADMM is robust to the slightly less accurate x-update (K is
    regularized by ρI)."""
    dtype = Hq.dtype
    n = Hq.shape[0]
    K = Hq + rho * jnp.eye(n, dtype=dtype)
    stance = schedule.reshape(-1).astype(dtype)
    swing3 = jnp.repeat(stance, 3) == 0          # (H·NU,) force-component mask
    Kinv = spd_inverse(K, swing3)

    if warmstart is None:
        U = jnp.zeros(n, dtype)
        z = jnp.zeros(n, dtype)
        y = jnp.zeros(n, dtype)
    else:
        U, z, y = warmstart

    def body(_, carry):
        U, z, y = carry
        U = jnp.matmul(Kinv, rho * (z - y) - q, precision=_PREC)
        z = project_pyramid(U + y, stance, mu, fz_min, fz_max)
        y = y + U - z
        return U, z, y

    U, z, y = jax.lax.fori_loop(0, iterations, body, (U, z, y))
    return z, (U, z, y)


def pyramid_constraints(H: int, mu: float, dtype=jnp.float32):
    """Constraint matrix form of the pyramid set (used by parity tests to hand
    the same QP to reference CPU solvers): rows per leg-knot
    [fx−μfz, −fx−μfz, fy−μfz, −fy−μfz, fz]."""
    g_leg = np.array([
        [1, 0, -mu],
        [-1, 0, -mu],
        [0, 1, -mu],
        [0, -1, -mu],
        [0, 0, 1.0],
    ])
    G = np.zeros((5 * 4 * H, H * NU))
    for k in range(H):
        for leg in range(4):
            r0 = (k * 4 + leg) * 5
            c0 = k * NU + leg * 3
            G[r0:r0 + 5, c0:c0 + 3] = g_leg
    return jnp.asarray(G, dtype)


def pyramid_bounds(schedule, fz_min, fz_max, dtype=jnp.float32):
    """(l, u) for pyramid_constraints' rows from the (H, 4) contact schedule."""
    c = schedule.reshape(-1).astype(dtype)
    big = jnp.asarray(1e9, dtype)
    l_leg = jnp.stack([-big * jnp.ones_like(c)] * 4 + [fz_min * c], axis=1)
    u_leg = jnp.stack([jnp.zeros_like(c)] * 4 + [fz_max * c], axis=1)
    return l_leg.reshape(-1), u_leg.reshape(-1)
