"""Pallas TPU kernels for the physics hot path."""

from gym_quadruped_tpu.ops.spd_solve import spd_solve, spd_solve_batched

__all__ = ['spd_solve', 'spd_solve_batched']
