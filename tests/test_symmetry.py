"""Symmetry augmentation (utils/symmetry.augment_obs_data) with a mock
reflection group — the escnn duck-type surface, no morpho_symm needed.

Reference anchor: examples/dataset_reproduction.py:26-58 (augment_sensor_data).
"""

import numpy as np
import pytest

from gym_quadruped_tpu.utils import maths
from gym_quadruped_tpu.utils.symmetry import augment_obs_data


class _MirrorRep:
    """Representation of the sagittal reflection C2 = {e, s} on R^3."""

    M = np.diag([1.0, -1.0, 1.0])

    def __init__(self, group, mat_fn):
        self.group = group
        self._fn = mat_fn

    def __call__(self, g):
        return self._fn(g)


class _C2:
    identity = 'e'
    elements = ('e', 's')


def _mk_group():
    G = _C2()
    r3 = _MirrorRep(G, lambda g: np.eye(3) if g == 'e' else _MirrorRep.M)
    G.representations = {'R3': r3}
    return G, r3


def test_vector_and_none_reps():
    G, r3 = _mk_group()
    data = {'base_lin_vel': np.array([[1.0, 2.0, 3.0]]),
            'work': np.array([[0.5]])}
    reps = {'base_lin_vel': r3, 'work': None}
    out = augment_obs_data(data, reps)
    np.testing.assert_array_equal(out['base_lin_vel']['e'], data['base_lin_vel'])
    np.testing.assert_array_equal(out['base_lin_vel']['s'],
                                  [[1.0, -2.0, 3.0]])
    assert out['work']['s'] is None


def test_quaternion_conjugation():
    G, r3 = _mk_group()
    rng = np.random.RandomState(0)
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qpos = np.concatenate([rng.normal(size=(5, 3)), q,
                           rng.normal(size=(5, 12))], axis=-1)
    # qpos rep: block-diag(R3, I4-placeholder, joint perm=I12); the
    # quaternion block is overwritten by the conjugation path
    def qpos_mat(g):
        M = np.eye(19)
        M[:3, :3] = r3(g)
        return M

    reps = {'qpos': _MirrorRep(G, qpos_mat)}
    out = augment_obs_data({'qpos': qpos}, reps)
    got = out['qpos']['s'][..., 3:7]
    R = np.asarray(maths.quat_to_mat(q))
    want = np.asarray(maths.mat_to_quat(
        np.einsum('ij,njk,lk->nil', _MirrorRep.M, R, _MirrorRep.M)))
    # quaternions are double covers: compare up to sign
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=1e-6)
    # a mirrored frame is still a rotation (det +1 after conjugation)
    Rm = np.asarray(maths.quat_to_mat(got))
    np.testing.assert_allclose(np.linalg.det(Rm), 1.0, atol=1e-6)


def test_involution():
    G, r3 = _mk_group()
    v = np.array([[0.3, -1.2, 0.7]])
    out = augment_obs_data({'base_ang_vel': v}, {'base_ang_vel': r3})
    twice = np.einsum('ij,...j->...i', r3('s'), out['base_ang_vel']['s'])
    np.testing.assert_allclose(twice, v, atol=1e-12)


def test_fix_base_pins_xy():
    G, r3 = _mk_group()
    data = {
        'base_pos': np.array([[2.0, 3.0, 0.4]]),
        'qpos': np.concatenate(
            [np.array([[2.0, 3.0, 0.4]]),
             np.array([[1.0, 0, 0, 0]]), np.zeros((1, 12))], axis=-1),
        'feet_pos': np.arange(12, dtype=float).reshape(1, 12),
    }
    reps = {'base_pos': r3, 'qpos': None, 'feet_pos': None}
    out = augment_obs_data(data, reps, fix_base=True)
    np.testing.assert_array_equal(out['base_pos']['e'][..., :2], [[1.0, 1.0]])
    np.testing.assert_array_equal(out['qpos']['e'][..., :2], [[1.0, 1.0]])
    # feet xy shifted into the pinned frame: x - (2-1), y - (3-1)
    np.testing.assert_array_equal(out['feet_pos']['e'][0, :2], [-1.0, -1.0])


def test_reps_mapping_requires_morpho_symm():
    from gym_quadruped_tpu.utils.symmetry import (
        configure_observation_space_representations,
    )

    with pytest.raises(ImportError):
        configure_observation_space_representations('go2', ('qpos',))
