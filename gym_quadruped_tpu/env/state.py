"""EnvState: the per-environment simulation state pytree.

The reference keeps all of this as mutable attributes spread across mjData and the
QuadrupedEnv instance (quadruped_env.py:85-249). Here it is one frozen pytree so that
`step: (EnvState, action) -> EnvState` is pure, jit-able, vmap-able over the batch
axis, and shard_map-able over a device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.model import Model


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """One environment's full dynamic state (batch via vmap over the leading axis)."""

    qpos: Any            # (nq,)
    qvel: Any            # (nv,)
    ctrl: Any            # (nu,) last applied torque command
    qacc: Any            # (nv,) acceleration of the last solve (mjData.qacc analog)
    time: Any            # () simulation time [s]
    step_num: Any        # () int32

    rng: Any             # jax PRNG key — per-env independent stream

    # velocity-command task (quadruped_env.py:1046-1072)
    ref_base_lin_vel_H: Any   # (3,) command in heading frame
    ref_base_ang_yaw_dot: Any  # ()
    steps_until_resample_vel: Any  # () int32 (-1 → never resample)

    # external disturbances (quadruped_env.py:1074-1139)
    external_wrench: Any       # (6,) applied to the free-joint dofs (qfrc_applied[:6])
    steps_until_resample_wrench: Any  # () int32 (-1 → never)

    # domain randomization (quadruped_env.py:1277-1298)
    geom_friction: Any   # (ngeom, 3) per-env friction table (traced)

    # per-sensor state pytrees, ordered as env.sensors (empty tuple when none)
    sensors: Any = ()


def init_state(m: Model, rng, dtype=None) -> EnvState:
    """Zero state at keyframe 0 (no randomization). reset() builds on this."""
    dtype = dtype or jnp.zeros(0).dtype
    qpos = jnp.asarray(m.key_qpos[0] if m.key_qpos.shape[0] else m.qpos0, dtype)
    return EnvState(
        qpos=qpos,
        qvel=jnp.zeros(m.nv, dtype),
        ctrl=jnp.zeros(m.nu, dtype),
        qacc=jnp.zeros(m.nv, dtype),
        time=jnp.zeros((), dtype),
        step_num=jnp.zeros((), jnp.int32),
        rng=rng,
        ref_base_lin_vel_H=jnp.zeros(3, dtype),
        ref_base_ang_yaw_dot=jnp.zeros((), dtype),
        steps_until_resample_vel=jnp.asarray(-1, jnp.int32),
        external_wrench=jnp.zeros(6, dtype),
        steps_until_resample_wrench=jnp.asarray(-1, jnp.int32),
        geom_friction=jnp.asarray(m.geom_friction, dtype),
        sensors=(),
    )
