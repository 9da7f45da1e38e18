"""Smooth-dynamics parity vs CPU MuJoCo ground truth (SURVEY.md §4 test pyramid (a)):
FK poses, mass matrix, RNE bias, passive forces — machine-precision in float64."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics import dynamics, kinematics

ROBOTS = ['mini_cheetah', 'go2', 'aliengo']


@pytest.fixture(scope='module', params=ROBOTS)
def oracle(request):
    robot = request.param
    mj, limits = build_mj_model(robot, 'flat')
    model = extract_model(mj, robot, 'flat', limits)
    d = mujoco.MjData(mj)
    return mj, d, model


def _random_state(mj, d, seed):
    rng = np.random.RandomState(seed)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    d.qpos[:3] += rng.uniform(-1, 1, 3)
    q = rng.randn(4)
    d.qpos[3:7] = q / np.linalg.norm(q)
    d.qpos[7:] += rng.uniform(-0.5, 0.5, mj.nq - 7)
    d.qvel[:] = rng.uniform(-2, 2, mj.nv)
    mujoco.mj_forward(mj, d)


def test_fk_parity(oracle):
    mj, d, model = oracle
    for seed in range(5):
        _random_state(mj, d, seed)
        kin = kinematics.fk(model, jnp.asarray(d.qpos))
        np.testing.assert_allclose(kin.xpos, d.xpos, atol=1e-12)
        np.testing.assert_allclose(np.abs(kin.xquat), np.abs(d.xquat), atol=1e-12)
        np.testing.assert_allclose(kin.geom_xpos, d.geom_xpos, atol=1e-12)
        np.testing.assert_allclose(
            kin.geom_xmat, d.geom_xmat.reshape(-1, 3, 3), atol=1e-12)
        np.testing.assert_allclose(kin.subtree_com, d.subtree_com, atol=1e-12)
        np.testing.assert_allclose(kin.xanchor, d.xanchor, atol=1e-12)
        np.testing.assert_allclose(kin.xaxis, d.xaxis, atol=1e-12)
        if model.nsite:
            np.testing.assert_allclose(kin.site_xpos, d.site_xpos, atol=1e-12)


def test_mass_matrix_parity(oracle):
    mj, d, model = oracle
    for seed in range(5):
        _random_state(mj, d, seed)
        kin = kinematics.fk(model, jnp.asarray(d.qpos))
        M = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, M)
        np.testing.assert_allclose(dynamics.mass_matrix(model, kin), M, atol=1e-11)


def test_bias_and_passive_parity(oracle):
    mj, d, model = oracle
    for seed in range(5):
        _random_state(mj, d, seed)
        kin = kinematics.fk(model, jnp.asarray(d.qpos))
        bias = dynamics.rne_bias(model, kin, jnp.asarray(d.qvel))
        np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-10)
        passive = dynamics.passive_force(
            model, jnp.asarray(d.qpos), jnp.asarray(d.qvel))
        np.testing.assert_allclose(passive, d.qfrc_passive, atol=1e-12)


def test_vmap_batch_consistency(oracle):
    """Batched FK+CRBA via vmap matches the single-env path (the TPU execution mode)."""
    mj, d, model = oracle
    qs = []
    for seed in range(4):
        _random_state(mj, d, seed + 100)
        qs.append(d.qpos.copy())
    qs = jnp.asarray(np.stack(qs))
    batched_M = jax.vmap(lambda q: dynamics.mass_matrix(model, kinematics.fk(model, q)))(qs)
    for i in range(4):
        single = dynamics.mass_matrix(model, kinematics.fk(model, qs[i]))
        np.testing.assert_allclose(batched_M[i], single, atol=1e-12)
