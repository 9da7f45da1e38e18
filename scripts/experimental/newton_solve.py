"""Fused Newton contact solver: the whole iteration loop in one Pallas kernel.

Profiling (docs/PERF_NOTES.md) shows the Newton solve dominates the step and is
launch-bound: each of the ~10 iterations re-launches dozens of small XLA kernels
over (B, small) tensors and re-reads the constraint Jacobians from HBM. Here the
batch is chunked onto the lane axis and ONE kernel instance runs the entire
Newton loop for its chunk with everything resident in VMEM — the (C, 6, nv)
cone-Jacobian block is read from HBM exactly once per step.

Implementation trick: the kernel body is the *existing* per-env solver
(`physics.solver.solve`) wrapped in `jax.vmap(in_axes=-1, out_axes=-1)`, so the
math is literally the same code the oracle-parity tests validate; the linear
solves inside use the unrolled scalar Cholesky (ops/spd_solve.unrolled_chol_solve
— nested pallas_call is illegal). Batch-last layout puts the env batch on
(sublane, lane) tiles for every elementwise op.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics.constraints import ConstraintLayout, Efc

# NOTE: `from gym_quadruped_tpu.ops import spd_solve` yields the FUNCTION (the
# package re-exports it under the submodule's name); resolve the module itself.
spd_mod = importlib.import_module('gym_quadruped_tpu.ops.spd_solve')

INTERPRET = False
_SUB, _LANES = 8, 128
_CHUNK = _SUB * _LANES  # envs per kernel instance, shaped (8, 128) in-kernel

# The fused kernel is numerically verified (tests/test_newton_kernel.py runs it
# in interpreter mode against the XLA solver) but the current Mosaic release
# crashes in its layout pass on rank-1 (per-env-scalar) vectors when compiling
# it for real TPUs ("Check failed: arr.size() >= layout_rank"). Until that is
# resolved (or the solver is reshaped to 2-D batch tiles), it stays opt-in.
ENABLE_FUSED = False


def _to_last(x):
    """(B, ...) → (..., B/128, 128): batch as trailing (sublane, lane) tiles."""
    x = jnp.moveaxis(x, 0, -1)
    return x.reshape(x.shape[:-1] + (x.shape[-1] // _LANES, _LANES))


def _from_last(x):
    x = x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
    return jnp.moveaxis(x, -1, 0)


def solve_batched(m: Model, lay: ConstraintLayout, M, a_smooth, efc: Efc,
                  iterations: int = 10, ls_iterations: int = 6):
    """Batch-leading solve: (B, nv, nv), (B, nv), Efc with leading B.

    Returns (qacc (B, nv), f_simple (B, ns), f_cone (B, C, 6),
    qfrc_constraint (B, nv)). Dispatches to the fused kernel on TPU; otherwise
    vmaps the reference solver.
    """
    from gym_quadruped_tpu.physics import solver as _solver

    B = a_smooth.shape[0]
    ns = efc.J.shape[1]
    C = efc.con_J.shape[1]
    on_tpu = jax.default_backend() == 'tpu'
    use_kernel = (((on_tpu and ENABLE_FUSED) or INTERPRET)
                  and a_smooth.dtype == jnp.float32 and ns > 0 and C > 0)
    if not use_kernel:
        return jax.vmap(lambda Mi, ai, ei: _solver.solve(
            m, lay, Mi, ai, ei, iterations=iterations,
            ls_iterations=ls_iterations))(M, a_smooth, efc)

    nv = a_smooth.shape[1]
    Bp = ((B + _CHUNK - 1) // _CHUNK) * _CHUNK
    pad = Bp - B

    def prep(x, pad_value=0.0):
        x = x.astype(jnp.float32)
        if pad:
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, width, constant_values=pad_value)
        return _to_last(x)

    # pad M with identity so the dummy envs stay solvable
    M_in = M.astype(jnp.float32)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(nv, dtype=jnp.float32), (pad, nv, nv))
        M_in = jnp.concatenate([M_in, eye], axis=0)
    M_p = _to_last(M_in)

    args = dict(
        M=M_p, a=prep(a_smooth),
        J=prep(efc.J), aref=prep(efc.aref), R=prep(efc.R, 1.0),
        active=prep(efc.active), fl=prep(efc.frictionloss),
        con_J=prep(efc.con_J), con_aref=prep(efc.con_aref),
        con_R=prep(efc.con_R, 1.0), con_active=prep(efc.con_active),
        cone_mu=prep(efc.cone_mu, 1.0),
        cone_dim_mask=prep(efc.cone_dim_mask),
        cone_dist=prep(efc.cone_dist, 1.0),
    )
    names = list(args.keys())
    m_key, lay_key = register(m, lay)
    call = _kernel_call(m_key, lay_key, nv, ns, C, Bp, iterations,
                        ls_iterations, tuple(args[k].shape for k in names),
                        INTERPRET)
    qacc, fs, fc, qfrc = call(*[args[k] for k in names])
    out = (_from_last(qacc)[:B], _from_last(fs)[:B],
           _from_last(fc)[:B], _from_last(qfrc)[:B])
    return out


_LAY_CACHE: dict = {}


@functools.lru_cache(maxsize=32)
def _kernel_call(m_key, lay_key, nv, ns, C, Bp, iterations, ls_iterations,
                 shapes, interpret):
    m: Model = _LAY_CACHE[m_key]
    lay: ConstraintLayout = _LAY_CACHE[lay_key]
    from gym_quadruped_tpu.physics import solver as _solver

    grid = (Bp // _CHUNK,)
    n_batched = 14  # all args carry the env batch on their trailing axes

    def spec(shape):
        block = shape[:-2] + (_SUB, _LANES)
        nd = len(shape)
        return pl.BlockSpec(block, (lambda c, nd=nd: (0,) * (nd - 2) + (c, 0)),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda c, nd=nd: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def kernel(M_ref, a_ref, J_ref, aref_ref, R_ref, act_ref, fl_ref,
               cJ_ref, caref_ref, cR_ref, cact_ref, cmu_ref,
               cmask_ref, cdist_ref,
               qacc_ref, fs_ref, fc_ref, qfrc_ref):
        old_unrolled = spd_mod.FORCE_UNROLLED
        old_sum_form = _solver.SUM_FORM
        spd_mod.FORCE_UNROLLED = True
        _solver.SUM_FORM = True
        try:
            # masks stay f32: Mosaic cannot reshape i1 vectors
            efc = Efc(J=J_ref[:], aref=aref_ref[:], R=R_ref[:],
                      active=act_ref[:], frictionloss=fl_ref[:],
                      con_J=cJ_ref[:], con_aref=caref_ref[:], con_R=cR_ref[:],
                      con_active=cact_ref[:], cone_mu=cmu_ref[:],
                      cone_dim_mask=cmask_ref[:], cone_dist=cdist_ref[:])
            solve_env = functools.partial(
                _solver.solve, m, lay, iterations=iterations,
                ls_iterations=ls_iterations)
            solve2 = jax.vmap(jax.vmap(
                lambda Mi, ai, ei: solve_env(Mi, ai, ei),
                in_axes=-1, out_axes=-1), in_axes=-1, out_axes=-1)
            qacc, fs, fc, qfrc = solve2(M_ref[:], a_ref[:], efc)
            qacc_ref[:] = qacc
            fs_ref[:] = fs
            fc_ref[:] = fc
            qfrc_ref[:] = qfrc
        finally:
            spd_mod.FORCE_UNROLLED = old_unrolled
            _solver.SUM_FORM = old_sum_form
            _solver.CONST_OVERRIDE.clear()

    rows = Bp // _LANES
    out_shapes = (
        jax.ShapeDtypeStruct((nv, rows, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((ns, rows, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((C, 6, rows, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((nv, rows, _LANES), jnp.float32),
    )
    in_specs = [spec(s) for s in shapes[:n_batched]] + \
        [const_spec(s) for s in shapes[n_batched:]]
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=tuple(spec(s.shape) for s in out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
    )


def register(m: Model, lay: ConstraintLayout):
    _LAY_CACHE[id(m)] = m
    _LAY_CACHE[id(lay)] = lay
    return id(m), id(lay)
