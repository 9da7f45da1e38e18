"""Oblique-ray hfield raycast error bound vs the mj_ray oracle
(VERDICT r3 weak #7: vertical rays are exact, oblique rays were unpinned).

Camera-like rays over go2/perlin: origins near standing height, directions
spread over the lower hemisphere. mj_ray intersects the hfield's actual
triangles; our oblique path is an AABB-windowed fixed-step march + bisection.
The assertions pin the error bound the camera/heightmap sensors inherit.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import mujoco

from gym_quadruped_tpu.models.builder import build_mj_model, extract_model
from gym_quadruped_tpu.physics.raycast import raycast


@pytest.fixture(scope='module')
def setup():
    mj, limits = build_mj_model('go2', 'perlin')
    model = extract_model(mj, 'go2', 'perlin', limits)
    d = mujoco.MjData(mj)
    mujoco.mj_forward(mj, d)
    return mj, model, d


def _mj_ray(mj, d, o, dir_):
    geomid = np.zeros(1, np.int32)
    t = mujoco.mj_ray(mj, d, o.astype(np.float64), dir_.astype(np.float64),
                      None, 1, -1, geomid)
    return t, int(geomid[0])


def test_oblique_hfield_error_bound(setup):
    mj, model, d = setup
    rng = np.random.RandomState(3)
    n = 200
    origins = np.column_stack([
        rng.uniform(-3, 3, n), rng.uniform(-3, 3, n), rng.uniform(0.8, 1.6, n)])
    # lower-hemisphere directions, at least 15 deg below horizontal
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(np.deg2rad(15), np.deg2rad(80), n)
    dirs = np.column_stack([np.cos(az) * np.cos(el), np.sin(az) * np.cos(el),
                            -np.sin(el)])

    t_ref = np.empty(n)
    for i in range(n):
        t_ref[i], _ = _mj_ray(mj, d, origins[i], dirs[i])

    t_ours, _ = jax.jit(lambda o, di: raycast(model, o, di))(
        jnp.asarray(origins), jnp.asarray(dirs))
    t_ours = np.asarray(t_ours)

    both_hit = (t_ref > 0) & (t_ours > 0)
    assert both_hit.mean() > 0.9, 'too few common hits to measure'
    # hit/miss agreement (the hfield spans the whole scene, so essentially
    # every downward ray hits)
    assert np.mean((t_ref > 0) == (t_ours > 0)) > 0.97

    err = np.abs(t_ours[both_hit] - t_ref[both_hit])
    med, p95, mx = np.median(err), np.percentile(err, 95), err.max()
    # pinned bound: windowed 64-step march + 12 bisections over a few-meter
    # overlap gives centimeter-scale strides; bilinear-vs-triangle surface
    # disagreement adds O(cell roughness) near grazing incidence
    assert med < 2e-3, f'median {med:.2e}'
    assert p95 < 2e-2, f'p95 {p95:.2e}'
    assert mx < 0.3, f'max {mx:.2e}'


def test_vertical_hfield_exactness(setup):
    mj, model, d = setup
    rng = np.random.RandomState(4)
    n = 100
    origins = np.column_stack([
        rng.uniform(-5, 5, n), rng.uniform(-5, 5, n), np.full(n, 2.0)])
    dirs = np.tile(np.array([0.0, 0.0, -1.0]), (n, 1))
    t_ref = np.empty(n)
    for i in range(n):
        t_ref[i], _ = _mj_ray(mj, d, origins[i], dirs[i])
    t_ours, _ = jax.jit(lambda o, di: raycast(model, o, di))(
        jnp.asarray(origins), jnp.asarray(dirs))
    t_ours = np.asarray(t_ours)
    both = (t_ref > 0) & (t_ours > 0)
    # bilinear interpolation vs mj's two-triangle cells: exact on triangle
    # interiors that agree, tiny on the diagonal split
    assert np.median(np.abs(t_ours[both] - t_ref[both])) < 5e-3