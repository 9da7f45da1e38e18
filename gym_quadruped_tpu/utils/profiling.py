"""First-class profiling + host metrics sink (SURVEY §5 tracing/metrics).

The reference has no profiling story (its metrics live in the manual
`info` dict printed by user scripts); a batched TPU framework needs one:

- `trace(dir)` — context manager around `jax.profiler.trace` producing a
  TensorBoard/XProf trace of the device timeline (compile, kernels,
  transfers). Use on real hardware to see where a step program spends HBM
  bandwidth vs MXU time.
- `RateMeter` — steps/s (or solves/s) counter with the measurement hygiene
  bench.py established: counts only completed, host-observed work
  (`block_until_ready` before each lap), reports median-of-laps so a single
  recompile or tunnel hiccup cannot skew the number.
- `MetricsLogger` — append-only JSONL host sink for scalar metrics
  (reward means, termination fractions, solver iteration counts). Device
  arrays are pulled with one host transfer per `log` call; rows carry a
  monotonic wall clock. Readable by any tooling that speaks JSONL.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import numpy as np

__all__ = ['trace', 'RateMeter', 'MetricsLogger']


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a device-timeline profile of the enclosed block.

    Writes an XProf trace under `log_dir` (view with TensorBoard's profile
    plugin or Perfetto). No-ops gracefully if the installed jax build lacks
    the profiler (e.g. stripped CPU-only wheels).
    """
    import jax

    try:
        jax.profiler.start_trace(log_dir,
                                 create_perfetto_link=create_perfetto_link)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class RateMeter:
    """Median-of-laps throughput counter.

    >>> meter = RateMeter(unit='env steps')
    >>> for _ in range(5):
    ...     with meter.lap(n=batch * n_steps):
    ...         out = step_n(state)          # jitted chunk
    ...         meter.sync(out)              # host-observe before the lap ends
    >>> meter.rate()                         # median steps/s across laps
    """

    def __init__(self, unit: str = 'steps'):
        self.unit = unit
        self._laps: list[tuple[int, float]] = []
        self._t0: float | None = None
        self._n: int = 0

    @contextlib.contextmanager
    def lap(self, n: int):
        self._n = int(n)
        self._t0 = time.perf_counter()
        try:
            yield self
        finally:
            self._laps.append((self._n, time.perf_counter() - self._t0))
            self._t0 = None

    @staticmethod
    def sync(tree):
        """Block until `tree`'s arrays are materialized on the host side.
        Call on the lap's outputs — async dispatch returns before the device
        finishes, and without a barrier the lap measures dispatch, not work."""
        import jax

        jax.block_until_ready(tree)
        return tree

    def rate(self) -> float:
        """Median per-lap rate (work units / second). NaN before any lap."""
        if not self._laps:
            return float('nan')
        return float(np.median([n / dt for n, dt in self._laps if dt > 0]))

    def total(self) -> int:
        return sum(n for n, _ in self._laps)

    def reset(self) -> None:
        self._laps.clear()


class MetricsLogger:
    """Append-only JSONL scalar sink: one row per `log` call.

    Accepts python scalars, numpy scalars, and device arrays (reduced with
    float() — pass means/fractions, not full tensors). Rows:
        {"t": <unix s>, "step": <int>, "<name>": <float>, ...}
    """

    def __init__(self, path: str):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = self.path.open('a', buffering=1)

    def log(self, step: int, **metrics) -> None:
        row = {'t': time.time(), 'step': int(step)}
        for k, v in metrics.items():
            row[k] = float(np.asarray(v).reshape(()))
        self._f.write(json.dumps(row) + '\n')

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
