"""Multi-chip scale-out: device meshes and sharded batched rollouts."""

from gym_quadruped_tpu.parallel.mesh import batch_spec, make_mesh, rollout, shard_env

__all__ = ['make_mesh', 'batch_spec', 'shard_env', 'rollout']
