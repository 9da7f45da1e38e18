"""Pallas SPD-solve kernel: correctness in interpreter mode vs numpy."""

import numpy as np
import jax
import jax.numpy as jnp

import importlib

mod = importlib.import_module('gym_quadruped_tpu.ops.spd_solve')
spd_solve = mod.spd_solve


def _random_spd(rng, B, n, dtype=np.float32):
    A = rng.randn(B, n, n).astype(dtype)
    A = A @ np.swapaxes(A, 1, 2) + n * np.eye(n, dtype=dtype)
    b = rng.randn(B, n).astype(dtype)
    return A, b


def test_kernel_matches_numpy_interpret():
    mod.INTERPRET = True
    try:
        rng = np.random.RandomState(0)
        for B, n in [(64, 18), (1024, 18), (100, 7), (2048, 13)]:
            A, b = _random_spd(rng, B, n)
            x = np.asarray(mod.spd_solve_batched(jnp.asarray(A), jnp.asarray(b)))
            x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
            err = np.abs(x - x_ref).max() / (1 + np.abs(x_ref).max())
            assert err < 1e-4, (B, n, err)
    finally:
        mod.INTERPRET = False


def test_custom_vmap_dispatch_fallback():
    """Off-TPU the vmapped spd_solve uses the Cholesky fallback; results match."""
    rng = np.random.RandomState(1)
    A, b = _random_spd(rng, 32, 18, np.float64)
    x = np.asarray(jax.jit(jax.vmap(spd_solve))(jnp.asarray(A), jnp.asarray(b)))
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, x_ref, atol=1e-9)
