"""Headline benchmark: batched env steps/s on real TPU hardware.

Config follows BASELINE.json's north star (4096 batched go2 envs, torque control,
full contact solve at dt=0.002) on one chip. Baseline for `vs_baseline` is the
reference's own stack measured in-process: single-env CPU MuJoCo mj_step on the same
compiled model (the reference has no batching and publishes no numbers —
BASELINE.md). Prints ONE JSON line.

Run: python bench.py            (defaults: go2/flat, B=4096, T=50)
Env overrides: BENCH_ROBOT, BENCH_SCENE, BENCH_BATCH, BENCH_STEPS.
"""

import json
import os
import time

import numpy as np


def measure_mujoco_cpu(robot: str, scene: str, n_steps: int = 2000) -> float:
    """Reference-stack baseline: serial CPU MuJoCo steps/s, one env."""
    import mujoco

    from gym_quadruped_tpu.models.builder import build_mj_model

    mj, _ = build_mj_model(robot, scene)
    d = mujoco.MjData(mj)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    rng = np.random.RandomState(0)
    ctrl = rng.uniform(-2, 2, (n_steps, mj.nu))
    # warmup
    for t in range(100):
        d.ctrl[:] = ctrl[t]
        mujoco.mj_step(mj, d)
    mujoco.mj_resetDataKeyframe(mj, d, 0)
    t0 = time.perf_counter()
    for t in range(n_steps):
        d.ctrl[:] = ctrl[t]
        mujoco.mj_step(mj, d)
    return n_steps / (time.perf_counter() - t0)


def measure_tpu(robot: str, scene: str, batch: int, n_steps: int) -> float:
    """Batched engine steps/s on the default JAX backend (TPU under the driver)."""
    import jax

    # true-f32 matmul accumulation: the TPU bf16 MXU default breaks the solver
    jax.config.update('jax_default_matmul_precision', 'highest')
    import jax.numpy as jnp

    from gym_quadruped_tpu.models.builder import load_model
    from gym_quadruped_tpu.physics import engine

    model = load_model(robot, scene)
    dtype = jnp.float32
    qpos = jnp.tile(jnp.asarray(model.key_qpos[0], dtype), (batch, 1))
    qvel = jnp.zeros((batch, model.nv), dtype)
    key = jax.random.PRNGKey(0)
    ctrl_seq = jax.random.uniform(key, (n_steps, batch, model.nu), dtype, -2, 2)

    @jax.jit
    def run(qpos, qvel, ctrl_seq):
        def body(carry, ctrl):
            qp, qv = carry
            qp2, qv2, fwd = jax.vmap(
                lambda a, b, c: engine.step(model, a, b, c))(qp, qv, ctrl)
            return (qp2, qv2), fwd.qacc[:, 0]

        (qp, qv), _ = jax.lax.scan(body, (qpos, qvel), ctrl_seq)
        return qp, qv

    out = run(qpos, qvel, ctrl_seq)  # compile + warmup
    jax.block_until_ready(out)
    # time several DISTINCT executions (identical calls can be memoized by the
    # runtime); chain the state so no run is skippable, take the median
    times = []
    qp, qv = qpos, qvel
    for r in range(3):
        ctrl_r = jax.random.uniform(jax.random.PRNGKey(r + 1),
                                    (n_steps, batch, model.nu), dtype, -2, 2)
        _ = float(jnp.sum(ctrl_r))  # materialize inputs before the clock starts
        t0 = time.perf_counter()
        qp, qv = run(qp, qv, ctrl_r)
        # host readback of a reduction: forces true completion even on runtimes
        # where block_until_ready resolves early (remote-backend tunnels)
        checksum = float(jnp.sum(qp))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(checksum), 'non-finite states in bench'
    assert np.isfinite(np.asarray(qp)).all(), 'non-finite states in bench'
    return batch * n_steps / float(np.median(times))


def main():
    robot = os.environ.get('BENCH_ROBOT', 'go2')
    scene = os.environ.get('BENCH_SCENE', 'flat')
    batch = int(os.environ.get('BENCH_BATCH', 4096))
    n_steps = int(os.environ.get('BENCH_STEPS', 50))

    tpu_rate = measure_tpu(robot, scene, batch, n_steps)
    try:
        cpu_rate = measure_mujoco_cpu(robot, scene)
    except Exception:
        cpu_rate = float('nan')

    print(json.dumps({
        'metric': f'env_steps_per_s_{robot}_{scene}_b{batch}',
        'value': round(tpu_rate, 1),
        'unit': 'steps/s',
        'vs_baseline': round(tpu_rate / cpu_rate, 2) if np.isfinite(cpu_rate)
        else None,
    }))


if __name__ == '__main__':
    main()
