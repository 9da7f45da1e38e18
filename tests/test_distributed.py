"""Multi-host runtime helpers on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_quadruped_tpu.parallel import distributed as dist


def test_initialize_noop_single_process():
    dist.initialize()  # must not raise or hang off-pod
    assert jax.process_count() == 1


def test_global_mesh_spans_devices():
    mesh = dist.global_mesh()
    assert mesh.axis_names == ('dcn', 'ici')
    assert mesh.devices.shape == (1, len(jax.devices()))


def test_host_local_batch_sharding():
    mesh = dist.global_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = dist.host_local_batch(mesh, {'x': x})['x']
    assert g.shape == (16, 3)
    assert g.sharding == dist.batch_sharding(mesh)
    # the sharded array is usable in a jitted reduction
    assert float(jax.jit(jnp.sum)(g)) == float(x.sum())


def test_all_hosts_sum_identity():
    assert dist.all_hosts_sum(2.5) == 2.5
