"""Math core vs scipy ground truth (the reference uses scipy Rotation throughout)."""

import numpy as np
from scipy.spatial.transform import Rotation

from gym_quadruped_tpu.utils import maths


def _rand_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _scipy(q_wxyz):
    return Rotation.from_quat(np.roll(q_wxyz, -1, axis=-1))


def test_quat_to_mat():
    q = _rand_quats(64)
    np.testing.assert_allclose(
        np.asarray(maths.quat_to_mat(q)), _scipy(q).as_matrix(), atol=1e-12)


def test_quat_mul_rotate():
    q1, q2 = _rand_quats(32, 1), _rand_quats(32, 2)
    r = _scipy(q1) * _scipy(q2)
    q12 = np.asarray(maths.quat_mul(q1, q2))
    q12 = np.where(np.sign(q12[:, :1]) == 0, q12, q12)
    expect = np.roll(r.as_quat(), 1, axis=-1)
    # quaternion double cover: compare up to sign
    sign = np.sign(np.sum(q12 * expect, axis=-1, keepdims=True))
    np.testing.assert_allclose(q12 * sign, expect, atol=1e-12)

    v = np.random.RandomState(3).randn(32, 3)
    np.testing.assert_allclose(
        np.asarray(maths.quat_rotate(q1, v)), _scipy(q1).apply(v), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(maths.quat_rotate_inv(q1, v)), _scipy(q1).apply(v, inverse=True),
        atol=1e-12)


def test_mat_quat_roundtrip():
    q = _rand_quats(128, 7)
    m = maths.quat_to_mat(q)
    q2 = np.asarray(maths.mat_to_quat(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-10)


def test_euler_xyz():
    q = _rand_quats(64, 11)
    np.testing.assert_allclose(
        np.asarray(maths.quat_to_euler_xyz(q)), _scipy(q).as_euler('xyz'), atol=1e-10)
    e = np.random.RandomState(5).uniform(-1.2, 1.2, (32, 3))
    expect = np.roll(Rotation.from_euler('xyz', e).as_quat(), 1, axis=-1)
    got = np.asarray(maths.euler_xyz_to_quat(e))
    sign = np.sign(np.sum(got * expect, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, expect, atol=1e-12)


def test_axis_angle_and_integrate():
    rng = np.random.RandomState(9)
    axis = rng.randn(16, 3)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    ang = rng.uniform(-3, 3, 16)
    expect = np.roll(Rotation.from_rotvec(axis * ang[:, None]).as_quat(), 1, axis=-1)
    got = np.asarray(maths.quat_from_axis_angle(axis, ang))
    sign = np.sign(np.sum(got * expect, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, expect, atol=1e-12)


def test_skew():
    v = np.random.RandomState(2).randn(8, 3)
    w = np.random.RandomState(4).randn(8, 3)
    got = np.einsum('bij,bj->bi', np.asarray(maths.skew(v)), w)
    np.testing.assert_allclose(got, np.cross(v, w), atol=1e-12)
