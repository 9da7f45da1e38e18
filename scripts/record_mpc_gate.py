"""Record docs/MPC_GATE.json from a real-TPU bench run (tests/test_mpc_gate.py
reads it).

Runs the headline, mpc and mpc_warm configs through bench.py's orchestrator
(subprocess-isolated, budgeted) and writes the gate artifact. Run on a host
with the TPU backend: `python scripts/record_mpc_gate.py`.
"""

import datetime
import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / 'docs' / 'MPC_GATE.json'


def main():
    env = dict(os.environ, BENCH_ONLY='headline,mpc,mpc_warm')
    r = subprocess.run([sys.executable, str(ROOT / 'bench.py')], env=env,
                       capture_output=True, text=True, timeout=3600)
    summary = None
    for line in r.stdout.strip().splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if 'configs' in d:
            summary = d
    if summary is None:
        raise SystemExit(f'no bench summary parsed: {r.stdout[-500:]!r}')
    cfg = summary['configs']
    batch = int(summary['metric'].rsplit('_b', 1)[1])

    def pick(prefix):
        for k, v in cfg.items():
            if k.startswith(prefix) and isinstance(v, (int, float)):
                return float(v)
        raise SystemExit(f'{prefix} missing/errored in {cfg}')

    headline = pick('go2_flat_b')
    note = ('all rates measured in one bench run by record_mpc_gate.py '
            '(subprocess-isolated configs, real TPU)')

    # The gate demand derives from the headline: silently re-recording a
    # LOWER headline (e.g. measured during a platform regression) would relax
    # the replan-rate gate and make tests/test_mpc_gate.py vacuous (ADVICE
    # r4). The pin is therefore MONOTONE: keep the historical max unless
    # MPC_GATE_FORCE=1 explicitly accepts a lower ceiling; provenance is
    # recorded either way.
    if OUT.exists():
        prev = json.loads(OUT.read_text())
        prev_headline = float(prev.get('headline_steps_per_s', 0.0))
        if headline < prev_headline:
            if os.environ.get('MPC_GATE_FORCE'):
                note += (f'; headline FORCED below the previous pin '
                         f'{prev_headline:.1f} (MPC_GATE_FORCE=1)')
            else:
                note += (f'; headline pinned at the historical max '
                         f'{prev_headline:.1f} (measured {headline:.1f} this '
                         'run; MPC_GATE_FORCE=1 to accept a lower ceiling)')
                headline = prev_headline

    out = {
        'headline_steps_per_s': headline,
        'mpc_warm_solves_per_s': pick('mpc_warm_solves_per_s'),
        'mpc_cold_solves_per_s': pick('mpc_solves_per_s'),
        'batch': batch,
        'solver_iters': os.environ.get('BENCH_SOLVER_ITERS', 'default'),
        'recorded': datetime.datetime.now().isoformat(timespec='seconds'),
        'note': note,
    }
    OUT.write_text(json.dumps(out, indent=2) + '\n')
    print(json.dumps(out))


if __name__ == '__main__':
    main()
