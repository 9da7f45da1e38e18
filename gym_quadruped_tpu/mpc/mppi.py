"""Sampling-based MPC (MPPI) over the full contact physics — scenario fan-out.

The BASELINE north star calls for "thousands of sampled rollouts per solve sharded
across chips, reduced with psum/all_gather" (SURVEY.md §2 parallelism item 2).
This is that component: Model-Predictive Path Integral control where every
candidate control sequence is rolled out through the REAL batched engine (not the
SRB approximation), so the planner sees contacts, joint limits and actuator
saturation exactly.

One solve = (K rollouts × H steps) of engine.step — pure fan-out over K, ideal for
vmap on one chip and shard_map over a mesh (`solve_sharded`): each chip rolls its
shard of scenarios, and the softmax weights / control update reduce with one psum
pair over ICI.

    u*_t = Σ_k w_k (u_t + ε_k,t),   w_k ∝ exp(−cost_k / λ)
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import Model
from gym_quadruped_tpu.physics import engine


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    horizon: int = 24            # physics steps per rollout (dt = model timestep)
    n_samples: int = 1024        # K scenarios per solve
    sigma: float = 2.0           # exploration noise std [Nm]
    temperature: float = 1.0     # λ
    solver_iterations: int = 4   # rollouts tolerate a looser contact solve


def velocity_tracking_cost(m: Model, ref_lin_vel_w, ref_yaw_dot, height,
                           w_vel=10.0, w_height=50.0, w_upright=20.0,
                           w_ctrl=1e-4):
    """Per-(state, ctrl) running cost for the velocity-command task
    (mirrors the env's base_lin_vel_err observable semantics)."""

    def cost(qpos, qvel, ctrl):
        from gym_quadruped_tpu.utils.maths import quat_to_mat

        R = quat_to_mat(qpos[3:7])
        vel_err = qvel[0:3] - ref_lin_vel_w
        yaw_rate_err = (R @ qvel[3:6])[2] - ref_yaw_dot
        up_err = 1.0 - R[2, 2]
        h_err = qpos[2] - height
        return (w_vel * (vel_err @ vel_err + yaw_rate_err ** 2)
                + w_height * h_err ** 2 + w_upright * up_err ** 2
                + w_ctrl * ctrl @ ctrl)

    return cost


class MPPI:
    """Static config; `solve` is pure and jit/vmap/shard_map-able."""

    def __init__(self, model: Model, cost_fn: Callable,
                 config: MPPIConfig = MPPIConfig()):
        self.model = model
        self.cfg = config
        self.cost_fn = cost_fn

    def _rollout_cost(self, qpos, qvel, ctrl_seq):
        """Total cost of one (H, nu) control sequence from (qpos, qvel)."""
        m = self.model

        def body(carry, ctrl):
            qp, qv = carry
            qp2, qv2, _ = engine.step(
                m, qp, qv, ctrl, solver_iterations=self.cfg.solver_iterations)
            return (qp2, qv2), self.cost_fn(qp2, qv2, ctrl)

        _, costs = jax.lax.scan(body, (qpos, qvel), ctrl_seq)
        return jnp.sum(costs)

    def solve(self, rng, qpos, qvel, u_nominal):
        """One MPPI solve. Returns (u_new (H, nu), info dict).

        u_nominal: (H, nu) previous plan (receding horizon: shift by one and
        repeat the tail between solves).
        """
        cfg = self.cfg
        m = self.model
        dtype = qpos.dtype
        eps = cfg.sigma * jax.random.normal(
            rng, (cfg.n_samples, cfg.horizon, m.nu), dtype)
        ctrls = u_nominal[None] + eps

        costs = jax.vmap(lambda c: self._rollout_cost(qpos, qvel, c))(ctrls)
        return self._update(u_nominal, eps, costs)

    def _update(self, u_nominal, eps, costs):
        beta = jnp.min(costs)
        w = jnp.exp(-(costs - beta) / self.cfg.temperature)
        w = w / jnp.sum(w)
        u_new = u_nominal + jnp.einsum('k,khu->hu', w, eps)
        return u_new, {'best_cost': beta, 'ess': 1.0 / jnp.sum(w * w)}

    def solve_sharded(self, mesh, rng, qpos, qvel, u_nominal):
        """Multi-chip solve: scenarios sharded over every mesh axis; the weight
        normalization and control update reduce with psum over the mesh
        (the NCCL-free XLA-collective path — SURVEY.md §2 item 2)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        import math

        cfg = self.cfg
        axes = mesh.axis_names
        n_dev = math.prod(mesh.shape[a] for a in axes)
        assert cfg.n_samples % n_dev == 0

        def shard_fn(rng, qpos, qvel, u_nominal):
            idx = jax.lax.axis_index(axes)
            local_rng = jax.random.fold_in(rng, idx)
            k_local = cfg.n_samples // n_dev
            eps = cfg.sigma * jax.random.normal(
                local_rng, (k_local, cfg.horizon, self.model.nu), qpos.dtype)
            ctrls = u_nominal[None] + eps
            costs = jax.vmap(lambda c: self._rollout_cost(qpos, qvel, c))(ctrls)
            beta = jax.lax.pmin(jnp.min(costs), axes)
            w = jnp.exp(-(costs - beta) / cfg.temperature)
            denom = jax.lax.psum(jnp.sum(w), axes)
            w = w / denom
            du = jax.lax.psum(jnp.einsum('k,khu->hu', w, eps), axes)
            ess = 1.0 / jax.lax.psum(jnp.sum(w * w), axes)
            return u_nominal + du, beta, ess

        fn = shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(), P(), P(), P()),
                       out_specs=(P(), P(), P()), check_rep=False)
        u_new, best, ess = fn(rng, qpos, qvel, u_nominal)
        return u_new, {'best_cost': best, 'ess': ess}

    @staticmethod
    def shift(u, fill=None):
        """Receding-horizon shift: drop the executed step, repeat the tail."""
        tail = u[-1:] if fill is None else fill[None]
        return jnp.concatenate([u[1:], tail], axis=0)
