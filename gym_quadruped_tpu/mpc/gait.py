"""Periodic gait scheduling: per-leg contact flags over the MPC horizon.

New-scope component (the reference ships no controller — SURVEY.md §0); design
follows the standard periodic-phase gait generators used with centroidal MPC.
Everything is a pure function of time, so the schedule is computed on-device for
the whole horizon in one shot and vmaps over envs.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

# phase offsets (FL, FR, RL, RR) and duty factor per gait
GAITS = {
    'trot': (np.array([0.0, 0.5, 0.5, 0.0]), 0.6),
    'walk': (np.array([0.0, 0.5, 0.75, 0.25]), 0.8),
    'pace': (np.array([0.0, 0.5, 0.0, 0.5]), 0.6),
    'bound': (np.array([0.0, 0.0, 0.5, 0.5]), 0.6),
    'pronk': (np.array([0.0, 0.0, 0.0, 0.0]), 0.5),
    'stand': (np.array([0.0, 0.0, 0.0, 0.0]), 1.0),
}


@dataclasses.dataclass(frozen=True)
class GaitConfig:
    name: str = 'trot'
    period: float = 0.5          # gait cycle length [s]
    offsets: tuple = None        # per-leg phase offsets, defaults from GAITS
    duty: float = None           # stance fraction, defaults from GAITS

    def resolved(self):
        off, duty = GAITS[self.name]
        return (np.asarray(self.offsets) if self.offsets is not None else off,
                self.duty if self.duty is not None else duty)


def leg_phases(cfg: GaitConfig, t):
    """(4,) phase in [0,1) for each leg at time t (t may be traced)."""
    off, _ = cfg.resolved()
    return jnp.mod(t / cfg.period + jnp.asarray(off), 1.0)


def contact_schedule(cfg: GaitConfig, t, horizon: int, dt: float):
    """(horizon, 4) stance flags over the lookahead starting at time t."""
    off, duty = cfg.resolved()
    ks = jnp.arange(horizon) * dt
    phases = jnp.mod((t + ks)[:, None] / cfg.period + jnp.asarray(off)[None, :],
                     1.0)
    if duty >= 1.0:
        return jnp.ones((horizon, 4), phases.dtype)
    return (phases < duty).astype(phases.dtype)


def swing_phase(cfg: GaitConfig, t):
    """(4,) normalized swing progress in [0,1] (0 at liftoff, 1 at touchdown);
    clamped to 0 during stance."""
    off, duty = cfg.resolved()
    ph = leg_phases(cfg, t)
    if duty >= 1.0:
        return jnp.zeros_like(ph)
    s = (ph - duty) / max(1.0 - duty, 1e-6)
    return jnp.clip(s, 0.0, 1.0) * (ph >= duty)
