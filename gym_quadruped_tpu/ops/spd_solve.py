"""Batched tiny-SPD linear solve as a Pallas TPU kernel.

The physics hot loop solves thousands of independent (nv × nv) SPD systems per
step (smooth dynamics, implicit-damping Euler, every Newton iteration of the
contact solver; nv ≤ ~20). XLA's batched Cholesky lowers to a blocked while-loop
designed for large matrices — measured ~11 ms for (4096, 18, 18) on a v5e, ~0.7
GFLOP/s. This kernel flips the layout: the ENV BATCH rides the (sublane, lane)
axes and each matrix entry is a vector register, so the fully-unrolled n-step
Cholesky + triangular solves run entirely on the VPU at full width with zero
intra-matrix data movement.

Layout: A (B, n, n) → A_t (n², B/128, 128); grid over batch chunks; per chunk the
(n², CH, 128) block lives in VMEM (~1.3 MB at n=18, CH=8).

`spd_solve(A, b)` is exposed unbatched with a custom-vmap rule, so per-env physics
code (`engine.forward`, `solver.solve`) written for one env dispatches to the
lane-batched kernel when vmapped — the idiomatic TPU path costs nothing at the
call site. Falls back to jax.scipy Cholesky off-TPU, for f64 (parity tests), and
for n > 32.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CH = 8           # sublane chunk: each entry-vector block is (CH, 128)
_LANES = 128
_MAX_N = 32


def _solve_kernel(n: int, a_ref, b_ref, x_ref):
    """Unrolled Cholesky factor + solve on entry-vector rows.

    a_ref: (n², CH, 128) — row i*n+j holds A[i, j] for CH·128 systems.
    b_ref, x_ref: (n, CH, 128).
    """
    a = [[a_ref[i * n + j] for j in range(n)] for i in range(n)]
    # Cholesky: L (lower) with reciprocal diagonal kept separate
    L = [[None] * n for _ in range(n)]
    Linv = [None] * n
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = d
        Linv[j] = 1.0 / d
        for i in range(j + 1, n):
            s2 = a[i][j]
            for k in range(j):
                s2 = s2 - L[i][k] * L[j][k]
            L[i][j] = s2 * Linv[j]

    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b_ref[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * Linv[i]
    # back substitution: Lᵀ x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * Linv[i]
    for i in range(n):
        x_ref[i] = x[i]


INTERPRET = False  # set True to run the kernel in interpreter mode (CPU tests)


@functools.lru_cache(maxsize=16)
def _solver_call(n: int, n_rows: int, interpret: bool = False):
    chunk = _CH * _LANES
    grid = (n_rows // _CH,)
    kernel = functools.partial(_solve_kernel, n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((n * n, _CH, _LANES), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _CH, _LANES), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, _CH, _LANES), lambda c: (0, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_rows, _LANES), jnp.float32),
    ), chunk


def spd_solve_batched(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B, n, n), (B, n) → (B, n) via the lane-batched kernel (f32, TPU)."""
    B, n = b.shape
    chunk = _CH * _LANES
    Bp = ((B + chunk - 1) // chunk) * chunk
    n_rows = Bp // _LANES
    A32 = A.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    if Bp != B:
        pad = Bp - B
        eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (pad, n, n))
        A32 = jnp.concatenate([A32, eye], axis=0)
        b32 = jnp.concatenate([b32, jnp.zeros((pad, n), jnp.float32)], axis=0)
    # entry-major layout: (n², Bp) → (n², Bp/128, 128)
    At = A32.reshape(Bp, n * n).T.reshape(n * n, n_rows, _LANES)
    bt = b32.T.reshape(n, n_rows, _LANES)
    call, _ = _solver_call(n, n_rows, INTERPRET)
    xt = call(At, bt)
    x = xt.reshape(n, Bp).T
    return x[:B].astype(b.dtype)


def _fallback(A, b):
    L = jax.scipy.linalg.cho_factor(A, lower=True)
    return jax.scipy.linalg.cho_solve(L, b)


def unrolled_chol_solve(A, b):
    """Fully-unrolled scalar Cholesky solve for one (n, n) SPD system.

    Same algorithm as the Pallas kernel but expressed on traced scalars, so it
    can run INSIDE other Pallas kernels (nested pallas_call is not allowed) or
    under `vmap(in_axes=-1)` where each entry is already a lane vector."""
    n = b.shape[-1]
    a = [[A[i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    Linv = [None] * n
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
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


# When True, spd_solve lowers to the unrolled scalar Cholesky regardless of
# backend — required when the caller is itself inside a Pallas kernel (the
# megakernel path), where a nested pallas_call is illegal.
FORCE_UNROLLED = False


@jax.custom_batching.custom_vmap
def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for one SPD system (n, n), (n,). Under jax.vmap this
    dispatches to the lane-batched Pallas kernel on TPU."""
    if FORCE_UNROLLED:
        return unrolled_chol_solve(A, b)
    return _fallback(A, b)


@spd_solve.def_vmap
def _spd_solve_vmap(axis_size, in_batched, A, b):
    A_b, b_b = in_batched
    if not A_b:
        A = jnp.broadcast_to(A, (axis_size,) + A.shape)
    if not b_b:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    if FORCE_UNROLLED:
        return jax.vmap(unrolled_chol_solve)(A, b), True
    n = b.shape[-1]
    use_kernel = (jax.default_backend() == 'tpu' and n <= _MAX_N
                  and A.dtype == jnp.float32 and A.ndim == 3)
    if use_kernel:
        return spd_solve_batched(A, b), True
    return jax.vmap(_fallback)(A, b), True
