"""Functional sensor protocol.

The reference's Sensor ABC (sensors/base_sensor.py:4) is a stateful plug-in stepped
after each mj_step. Here a sensor is a static config object whose state lives in
EnvState.sensors (a pytree slot per sensor), so sensors jit/vmap/shard with the env:

  init(rng, dtype) -> state0                   # per-env sensor state pytree
  step(ss, qpos, qvel, fwd) -> ss'             # qpos/qvel are PRE-step (MuJoCo
                                               # sensordata semantics), fwd is the
                                               # step's Forward
  get_observation(name, ss) -> array           # read a named observable
  available_observations() -> tuple[str, ...]
  observation_dim(name) -> int

Unlike the reference — where HeightMap and Camera do NOT subclass Sensor and must be
driven by hand (SURVEY.md §8.6) — all sensors here implement this one protocol and
can still be driven manually on arbitrary states.
"""

from __future__ import annotations

import abc


class Sensor(abc.ABC):
    """Static sensor config; per-env state flows through EnvState.sensors."""

    @abc.abstractmethod
    def available_observations(self) -> tuple:
        ...

    @abc.abstractmethod
    def observation_dim(self, name: str) -> int:
        ...

    def init(self, rng, dtype):
        """Initial per-env sensor state pytree."""
        return ()

    def step(self, ss, qpos, qvel, fwd):
        """Advance sensor state after a physics step."""
        return ss

    @abc.abstractmethod
    def get_observation(self, name: str, ss):
        ...
