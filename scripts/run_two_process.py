"""Two-process jax.distributed evidence run (VERDICT r2 item 8).

Launches TWO OS processes on this host (coordinator = localhost), each with 4
virtual CPU devices, brings up the cross-process runtime through the SHIPPED
helpers (parallel.distributed initialize/global_mesh/host_local_batch — the
same path __graft_entry__.dryrun_multichip validates), runs a globally-sharded
batched engine rollout with a cross-process metric reduction, and records the
artifact to docs/SCALING_2PROC.json.

Run: python scripts/run_two_process.py
Worker mode (internal): _GQT_2PROC_WORKER=<pid> python scripts/run_two_process.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get('GQT_2PROC_PORT', 12357))
N_PROC = 2
DEV_PER_PROC = 4
PER_HOST_B = 8
N_STEPS = 10


def worker(pid: int):
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')

    sys.path.insert(0, REPO)
    from gym_quadruped_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=f'127.0.0.1:{PORT}',
                    num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC, jax.process_count()
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC

    import numpy as np
    import jax.numpy as jnp

    from gym_quadruped_tpu.models.builder import load_model
    from gym_quadruped_tpu.physics import engine

    mesh = dist.global_mesh()
    assert mesh.devices.shape == (N_PROC, DEV_PER_PROC)

    model = load_model('go2', 'flat')
    # per-process local shard of the global batch
    local = {
        'qpos': np.tile(np.asarray(model.key_qpos[0], np.float32),
                        (PER_HOST_B, 1)),
        'qvel': np.zeros((PER_HOST_B, model.nv), np.float32),
        'ctrl': np.random.RandomState(pid).uniform(
            -2, 2, (PER_HOST_B, model.nu)).astype(np.float32),
    }
    g = dist.host_local_batch(mesh, local)
    assert g['qpos'].shape[0] == N_PROC * PER_HOST_B

    @jax.jit
    def run(qpos, qvel, ctrl):
        def body(c, _):
            qp, qv, fwd = engine.step_batched(model, c[0], c[1], ctrl,
                                              warmstart=c[2],
                                              solver_iterations=2)
            return (qp, qv, fwd.qacc), None

        (qp, qv, w), _ = jax.lax.scan(
            body, (qpos, qvel, jnp.zeros_like(qvel)), None, length=N_STEPS)
        return qp, jnp.mean(qp[:, 2])   # global mean: a cross-process reduce

    qp, h = run(g['qpos'], g['qvel'], g['ctrl'])
    jax.block_until_ready(qp)
    t0 = time.perf_counter()
    qp, h = run(g['qpos'], g['qvel'], g['ctrl'])
    jax.block_until_ready(qp)
    dt = time.perf_counter() - t0

    total = dist.all_hosts_sum(1.0)
    assert total == float(N_PROC)

    if pid == 0:
        art = {
            'processes': N_PROC,
            'devices': N_PROC * DEV_PER_PROC,
            'global_batch': N_PROC * PER_HOST_B,
            'steps': N_STEPS,
            'steps_per_s': round(N_PROC * PER_HOST_B * N_STEPS / dt, 1),
            'global_mean_height': float(h),
            'backend': 'cpu-gloo (virtual 2-host)',
        }
        with open(os.path.join(REPO, 'docs', 'SCALING_2PROC.json'), 'w') as f:
            json.dump(art, f, indent=1)
        print(json.dumps(art))
    print(f'worker {pid} ok', flush=True)


def main():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                        f' --xla_force_host_platform_device_count='
                        f'{DEV_PER_PROC}').strip()
    procs = []
    for pid in range(N_PROC):
        e = dict(env)
        e['_GQT_2PROC_WORKER'] = str(pid)
        procs.append(subprocess.Popen([sys.executable, __file__], env=e))
    rc = [p.wait(timeout=1200) for p in procs]
    assert rc == [0] * N_PROC, rc
    print('two-process run ok')


if __name__ == '__main__':
    wid = os.environ.get('_GQT_2PROC_WORKER')
    if wid is None:
        main()
    else:
        worker(int(wid))
