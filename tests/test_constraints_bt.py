"""Equivalence gates for the batch-trailing efc assembly + engine dispatch.

1. make_efc_bt == vmap(make_efc) leaf-for-leaf (go2: elliptic cone path).
2. The custom-vmap dispatch in engine._collide_efc: a full step through
   step_batched (BT path) matches engine.step applied per env in a Python
   loop (per-env reference path, no vmap anywhere).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_quadruped_tpu.models.builder import load_model
from gym_quadruped_tpu.physics import collision, collision_bt, engine
from gym_quadruped_tpu.physics.constraints import constraint_layout, make_efc
from gym_quadruped_tpu.physics.constraints_bt import make_efc_bt, supports_bt
from gym_quadruped_tpu.physics.kinematics import cdof as _cdof, fk, spatial_origin

from test_collision_bt import _random_states


@pytest.mark.parametrize('robot,scene', [('go2', 'flat'), ('go2', 'perlin'),
                                         ('aliengo', 'flat'), ('b2', 'flat')])
def test_make_efc_bt_matches_vmap(robot, scene):
    m = load_model(robot, scene)
    lay = constraint_layout(m)
    assert supports_bt(lay)
    B = 6
    qpos = _random_states(m, B, seed=123)
    rng = np.random.default_rng(7)
    qvel = jnp.asarray(rng.normal(0, 1.5, (B, m.nv)), jnp.float32)

    kin = jax.vmap(lambda q: fk(m, q))(qpos)
    cdof = jax.vmap(lambda k: _cdof(m, k))(kin)
    feat_bl = jax.vmap(lambda xp, xm: collision.collide(
        m, collision_bt._KinView(xp, xm)).feat)(kin.geom_xpos, kin.geom_xmat)

    efc_ref = jax.vmap(lambda k, qp, qv, cd, f: make_efc(
        m, k, qp, qv, collision.Contacts(f), cd,
        max_cone=engine.MAX_CONE_CONTACTS))(kin, qpos, qvel, cdof, feat_bl)

    feat_bt = jnp.transpose(feat_bl, (1, 2, 0))
    origin = jax.vmap(lambda k: spatial_origin(k))(kin)
    efc_bt = make_efc_bt(m, lay, feat_bt, qpos, qvel, cdof, origin,
                         con_mu=None, max_cone=engine.MAX_CONE_CONTACTS)

    ref_leaves, treedef = jax.tree_util.tree_flatten(efc_ref)
    bt_leaves, treedef2 = jax.tree_util.tree_flatten(efc_bt)
    assert treedef == treedef2
    names = [str(i) for i in range(len(ref_leaves))]
    for name, a, b in zip(names, ref_leaves, bt_leaves):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (name, a.shape, b.shape)
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            assert np.array_equal(a, b), f'leaf {name} mismatch'
        else:
            err = np.max(np.abs(a - b)) if a.size else 0.0
            assert err < 2e-4, f'leaf {name} diverges by {err}'


def test_pyramidal_cull_exact_when_under_cap():
    """Culled pyramidal assembly (constraints.make_efc vectorized path) must
    give the same constrained acceleration as assembling EVERY slot's rows
    whenever ≤ max_cone slots touch — the same exactness argument the cone
    cull relies on (engine.MAX_CONE_CONTACTS docstring)."""
    from gym_quadruped_tpu.physics import solver
    m = load_model('aliengo', 'flat')
    lay = constraint_layout(m)
    B = 4
    # near-stance states: a handful of foot contacts, far below the cap
    rng = np.random.default_rng(3)
    qpos = np.tile(np.asarray(m.key_qpos[0]), (B, 1))
    qpos[:, 2] += rng.uniform(-0.01, 0.01, B)
    qpos[:, 7:] += rng.uniform(-0.05, 0.05, (B, m.nq - 7))
    qpos = jnp.asarray(qpos, jnp.float32)
    qvel = jnp.asarray(rng.normal(0, 0.5, (B, m.nv)), jnp.float32)
    ctrl = jnp.asarray(rng.uniform(-1, 1, (B, m.nu)), jnp.float32)

    def qacc_with_cap(cap):
        _, _, fwd = engine.step_batched(m, qpos, qvel, ctrl, max_contacts=cap)
        return np.asarray(fwd.qacc)

    q_cull = qacc_with_cap(engine.MAX_CONE_CONTACTS)
    q_full = qacc_with_cap(10**9)
    scale = 1.0 + np.max(np.abs(q_full))
    assert np.max(np.abs(q_cull - q_full)) / scale < 1e-5


@pytest.mark.parametrize('robot,scene', [('go2', 'flat'), ('aliengo', 'flat')])
def test_step_batched_matches_per_env_loop(robot, scene):
    m = load_model(robot, scene)
    B = 3
    qpos = _random_states(m, B, seed=99)
    rng = np.random.default_rng(11)
    qvel = jnp.asarray(rng.normal(0, 1.0, (B, m.nv)), jnp.float32)
    ctrl = jnp.asarray(rng.uniform(-2, 2, (B, m.nu)), jnp.float32)

    qp_b, qv_b, _ = engine.step_batched(m, qpos, qvel, ctrl)

    for b in range(B):
        qp1, qv1, _ = engine.step(m, qpos[b], qvel[b], ctrl[b])
        assert np.max(np.abs(np.asarray(qp1) - np.asarray(qp_b[b]))) < 2e-5
        assert np.max(np.abs(np.asarray(qv1) - np.asarray(qv_b[b]))) < 2e-3
