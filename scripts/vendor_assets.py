#!/usr/bin/env python
"""Vendor the robot MJCF + mesh assets into the package for a standalone wheel.

The reference distributes robot_model/** inside its package
(reference: gym_quadruped/robot_model/). This repo keeps the tree out of git
(the mesh sets are tens of MB of third-party binary data) and instead ships
precompiled array archives (models/compiled/*.npz) that cover the physics
path asset-free. Anything that needs real MJCF — display/viewer models, host
RGB rendering, rebuilding archives — resolves assets via
models.robots.find_assets_dir().

Run this before `python -m build` to produce a fully self-contained wheel:

    python scripts/vendor_assets.py [--source DIR]

It copies the robot_model tree from --source (or the first source
find_assets_dir() can see) into gym_quadruped_tpu/assets/robot_model, which
is first in the search order after $GYM_QUADRUPED_ASSETS and is included in
wheels via pyproject package-data.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / 'gym_quadruped_tpu'
DEST = PKG / 'assets' / 'robot_model'


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--source', type=Path, default=None,
                    help='robot_model directory to vendor (default: whatever '
                         'find_assets_dir() resolves)')
    ap.add_argument('--force', action='store_true',
                    help='replace an existing vendored tree')
    args = ap.parse_args()

    src = args.source
    if src is None:
        sys.path.insert(0, str(PKG.parent))
        from gym_quadruped_tpu.models.robots import find_assets_dir
        src = find_assets_dir()
        if src == DEST:  # already vendored; look past it
            src = None
            for cand in (Path('/root/reference/gym_quadruped/robot_model'),):
                if cand.exists():
                    src = cand
    if src is None or not Path(src).exists():
        print('No robot_model source found. Pass --source DIR '
              '(a gym-quadruped robot_model directory).', file=sys.stderr)
        return 1
    src = Path(src)

    if DEST.exists():
        if not args.force:
            print(f'{DEST} already exists (use --force to replace).')
            return 0
        shutil.rmtree(DEST)
    DEST.parent.mkdir(parents=True, exist_ok=True)
    shutil.copytree(src, DEST)
    n_files = sum(1 for _ in DEST.rglob('*') if _.is_file())
    size_mb = sum(f.stat().st_size for f in DEST.rglob('*') if f.is_file()) / 1e6
    print(f'Vendored {n_files} files ({size_mb:.1f} MB) from {src} -> {DEST}')
    print('Build a self-contained wheel with: python -m build')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
