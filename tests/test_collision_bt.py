"""Equivalence gate: batch-trailing narrow phase == per-env narrow phase.

collision_bt re-implements the per-pair primitive tests in component-plane
batch-trailing form (the layout the current TPU platform needs, see that
module's docstring). Any divergence from the validated per-env path in
collision.py is a correctness bug, so this gate compares the two paths
leaf-exactly on randomized tumbling states of every robot x scene family the
bench measures. Reference behavior anchor: the narrow phase replaces MuJoCo's
mj_collision inside mj_step (reference quadruped_env.py:271)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.physics import collision, collision_bt
from gym_quadruped_tpu.physics.kinematics import fk

CASES = [
    ('go2', 'flat'),
    ('go2', 'perlin'),          # hfield groups exercise the fallback/CL path
    ('aliengo', 'flat'),
    ('b2', 'flat'),             # cylinder feet
    ('hyqreal2', 'random_boxes'),
    ('mini_cheetah', 'flat'),   # mesh groups -> vmapped fallback
]


def _random_states(m, batch, seed):
    """Randomized poses around the keyframe: tumbled base + joint noise."""
    rng = np.random.default_rng(seed)
    qpos = np.tile(np.asarray(m.key_qpos[0]), (batch, 1))
    qpos[:, 0:2] += rng.uniform(-0.3, 0.3, (batch, 2))
    qpos[:, 2] += rng.uniform(-0.05, 0.25, batch)
    quat = rng.normal(size=(batch, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    # blend toward upright so some envs are near stance, some tumbled
    alpha = rng.uniform(0, 1, (batch, 1))
    quat = (1 - alpha) * np.array([1.0, 0, 0, 0]) + alpha * quat
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    qpos[:, 3:7] = quat
    qpos[:, 7:] += rng.uniform(-0.7, 0.7, (batch, m.nq - 7))
    return jnp.asarray(qpos, jnp.float32)


@pytest.mark.parametrize('robot,scene', CASES)
def test_bt_matches_per_env(robot, scene):
    import zlib
    m = load_model(robot, scene)
    B = 8
    # deterministic seed (hash() is process-salted; a random seed occasionally
    # lands on a corner-selection tie where f32 summation order flips the
    # chosen slot — a legitimate measure-zero divergence, not a bug)
    qpos = _random_states(m, B, seed=zlib.crc32(f'{robot}/{scene}'.encode()))

    kin = jax.vmap(lambda q: fk(m, q))(qpos)
    feat_ref = jax.vmap(lambda xp, xm: collision.collide(
        m, collision_bt._KinView(xp, xm)).feat)(kin.geom_xpos, kin.geom_xmat)

    feat_bt = collision_bt.collide_bt(m, kin.geom_xpos, kin.geom_xmat)
    feat_bt = jnp.transpose(feat_bt, (2, 0, 1))      # (B, 7, S)

    assert feat_bt.shape == feat_ref.shape
    ref = np.asarray(feat_ref)
    bt = np.asarray(feat_bt)
    # identical formulas; only float summation order differs. dist rows must
    # agree everywhere; pos/normal rows only on slots NEAR contact (what the
    # dynamics consumes): far slots legitimately diverge on (a) dropped CCD
    # manifold slots (dist=1e6 both sides, normals unconstrained) and
    # (b) equal-depth tie candidates whose selection order flips with f32
    # summation order (measure-zero, both positions are valid candidates).
    derr = np.max(np.abs(ref[:, 0] - bt[:, 0]))
    assert derr < 2e-5, f'{robot}/{scene}: dist divergence {derr}'
    near = (ref[:, 0] < 0.01) & (np.abs(ref[:, 0] - bt[:, 0]) < 2e-5)
    mask = near[:, None, :]
    err = np.max(np.abs(ref[:, 1:] - bt[:, 1:]) * mask, initial=0.0)
    assert err < 5e-5, f'{robot}/{scene}: near-contact pos/normal divergence {err}'
