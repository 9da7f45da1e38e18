"""Profiling/metrics utilities (SURVEY §5 tracing + metrics sinks)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from gym_quadruped_tpu.utils.profiling import MetricsLogger, RateMeter, trace


def test_rate_meter_counts_real_work():
    meter = RateMeter(unit='steps')
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((64, 64))
    for _ in range(3):
        with meter.lap(n=1000):
            meter.sync(f(x))
    assert np.isfinite(meter.rate()) and meter.rate() > 0
    assert meter.total() == 3000
    meter.reset()
    assert np.isnan(meter.rate())


def test_metrics_logger_jsonl_roundtrip(tmp_path):
    path = tmp_path / 'metrics.jsonl'
    with MetricsLogger(str(path)) as m:
        m.log(0, reward=jnp.asarray(1.5), term_frac=np.float32(0.25))
        m.log(10, reward=2.0)
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert rows[0]['step'] == 0 and rows[0]['reward'] == 1.5
    assert rows[0]['term_frac'] == 0.25
    assert rows[1]['step'] == 10 and 't' in rows[1]


def test_trace_contextmanager(tmp_path):
    # must not raise even where the profiler backend is limited (forced CPU)
    with trace(str(tmp_path / 'prof')):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
