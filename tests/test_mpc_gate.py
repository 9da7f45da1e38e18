"""North-star MPC gate: warm replan rate >= the engine's control-rate demand
(BASELINE.json: "MPC replan rate >= sim control rate").

The numbers come from real-TPU measurements recorded in docs/MPC_GATE.json
(written by `python bench.py` runs via scripts/record_mpc_gate.py — CI hosts
have no TPU, so the artifact is the measurement of record; re-record it
whenever the solver or engine changes materially).

Gate semantics: the reference controller stack replans at 100 Hz while
physics runs at 500 Hz (dt=0.002; the reference's MPC examples use a
0.01 s replan interval). At B=4096, the engine produces
`headline_steps_per_s` env-steps/s, i.e. `headline/5` replan events/s must
be served; the warm-started solver must sustain at least that many
solves/s. The cold rate is the worst case (first tick / contact-schedule
switch) and must cover the same demand within a 2x startup allowance.
"""

import json
import pathlib

import pytest

ARTIFACT = pathlib.Path(__file__).parent.parent / 'docs' / 'MPC_GATE.json'

REPLAN_DIVISOR = 5  # 100 Hz replan cadence over 500 Hz physics


@pytest.fixture(scope='module')
def gate():
    if not ARTIFACT.exists():
        pytest.skip('docs/MPC_GATE.json not recorded (needs a TPU bench run)')
    return json.loads(ARTIFACT.read_text())


def test_artifact_fields(gate):
    for k in ('headline_steps_per_s', 'mpc_warm_solves_per_s',
              'mpc_cold_solves_per_s', 'batch', 'recorded'):
        assert k in gate, k
    assert gate['batch'] == 4096


def test_warm_replan_rate_meets_control_rate(gate):
    demand = gate['headline_steps_per_s'] / REPLAN_DIVISOR
    assert gate['mpc_warm_solves_per_s'] >= demand, (
        f"warm replan rate {gate['mpc_warm_solves_per_s']:.0f}/s < "
        f"engine demand {demand:.0f}/s "
        f"(= {gate['headline_steps_per_s']:.0f} steps/s / {REPLAN_DIVISOR})")


def test_cold_solve_rate_within_startup_allowance(gate):
    demand = gate['headline_steps_per_s'] / REPLAN_DIVISOR
    assert gate['mpc_cold_solves_per_s'] >= demand / 2, (
        f"cold solve rate {gate['mpc_cold_solves_per_s']:.0f}/s < half the "
        f"steady demand {demand:.0f}/s")
