"""Environment layer: functional core + gym-compatible adapter."""

from gym_quadruped_tpu.env.env import QuadrupedEnv
from gym_quadruped_tpu.env.observables import ALL_OBS
from gym_quadruped_tpu.env.state import EnvState, init_state

__all__ = ['QuadrupedEnv', 'EnvState', 'init_state', 'ALL_OBS']
