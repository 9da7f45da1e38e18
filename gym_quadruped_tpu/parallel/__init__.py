"""Multi-chip scale-out: device meshes, sharded batched rollouts, and the
multi-host (jax.distributed) runtime."""

from gym_quadruped_tpu.parallel import distributed
from gym_quadruped_tpu.parallel.mesh import batch_spec, make_mesh, rollout, shard_env

__all__ = ['make_mesh', 'batch_spec', 'shard_env', 'rollout', 'distributed']
