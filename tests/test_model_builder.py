"""Model pipeline: MJCF → frozen arrays, save/load roundtrip, registry parity."""

import numpy as np
import pytest

from gym_quadruped_tpu.models.builder import build_model
from gym_quadruped_tpu.models.robots import available_robots, get_robot_config


def test_registry_matches_reference():
    cfg = get_robot_config('go2')
    assert cfg.hip_height == 0.28
    assert get_robot_config('mini_cheetah').qpos0_js is not None
    assert 'pegasus' in available_robots()


def test_build_mini_cheetah_flat():
    m = build_model('mini_cheetah', 'flat')
    assert (m.nq, m.nv, m.nu) == (19, 18, 12)
    assert m.timestep == 0.002
    # feet: FL FR RL RR sphere geoms
    assert list(m.geom_names[i] for i in m.feet_geom_id) == ['FL', 'FR', 'RL', 'RR']
    assert np.all(m.geom_type[m.feet_geom_id] == 2)  # spheres
    # qpos0 override applied (reference quadruped_env.py:171-173)
    np.testing.assert_allclose(
        m.qpos0[7:], [0, -np.pi / 2, 0] * 2 + [0, np.pi / 2, 0] * 2)
    # contact candidate pairs include the 4 feet vs floor (world pairs);
    # self-collision pairs (foot vs foot etc.) add more entries
    feet_world_pairs = [p for p in m.contact_pairs
                        if p[1] in m.feet_geom_id and m.geom_bodyid[p[0]] == 0]
    assert len(feet_world_pairs) == 4
    # keyframe exists for reset
    assert m.key_qpos.shape[0] >= 1


def test_go2_options():
    m = build_model('go2', 'flat')
    assert m.cone == 1  # elliptic (go2.xml:4)
    assert m.impratio == 100.0
    assert np.all(m.geom_condim[m.feet_geom_id] == 6)
    assert np.all(m.geom_priority[m.feet_geom_id] == 1)


def test_save_load_roundtrip(tmp_path):
    m = build_model('mini_cheetah', 'flat')
    p = tmp_path / 'mc.npz'
    m.save(p)
    from gym_quadruped_tpu.models.model import Model
    m2 = Model.load(p)
    np.testing.assert_array_equal(m.body_pos, m2.body_pos)
    np.testing.assert_array_equal(m.contact_pairs, m2.contact_pairs)
    assert m2.robot == 'mini_cheetah'
    assert m2.body_names == m.body_names


@pytest.mark.parametrize('scene', ['stairs', 'ramp', 'slippery'])
def test_static_scenes_compile(scene):
    m = build_model('go2', scene)
    assert m.ngeom > 0
    n_world = int(np.sum(m.geom_bodyid == 0))
    assert n_world >= 2  # floor + scene boxes


@pytest.mark.parametrize('robot,scene,min_world', [
    ('aliengo', 'rough', 100),          # 2500-box field (scene_rough.xml)
    ('aliengo', 'stairs', 10),          # generic stairs wins (ref semantics)
    ('mini_cheetah', 'slope', 1),       # ships only a floor plane
    ('mini_cheetah', 'suspend_stairs', 1),
    ('hyqreal1', 'rough', 100),
])
def test_per_robot_scenes_compile(robot, scene, min_world):
    """Per-robot extra scenes shipped by the reference under
    robot_model/<robot>/scene_*.xml (unreachable via the reference's own
    scene= arg — quadruped_env.py:153; reachable here by name)."""
    import mujoco

    from gym_quadruped_tpu.models.builder import build_mj_model

    mj, limits = build_mj_model(robot, scene)
    n_world = sum(1 for g in range(mj.ngeom) if mj.geom_bodyid[g] == 0)
    assert n_world >= min_world
    assert limits[0] > limits[1] and limits[2] > limits[3]
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    mujoco.mj_forward(mj, d)  # the merged model is steppable


def test_unknown_scene_raises():
    from gym_quadruped_tpu.models.builder import compose_scene_xml

    with pytest.raises(ValueError):
        compose_scene_xml('go2', 'no_such_scene')
