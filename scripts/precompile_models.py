"""Precompile robot+scene Models into standalone .npz archives.

The archives make `load_model` work without MuJoCo or MJCF assets installed —
the TPU runtime path. Run whenever robot configs or the Model schema change.
"""

import sys
from pathlib import Path

sys.path.insert(0, '.')

from gym_quadruped_tpu.models.builder import COMPILED_DIR, build_model

CONFIGS = (
    [(r, 'flat') for r in ('mini_cheetah', 'go1', 'go2', 'aliengo', 'b2',
                           'hyqreal1', 'hyqreal2', 'spot')]
    # every reference smoke-matrix robot (env_test.py:14) on perlin, plus spot
    + [(r, 'perlin') for r in ('mini_cheetah', 'go1', 'go2', 'aliengo', 'b2',
                               'hyqreal1', 'hyqreal2', 'spot')]
    + [('go2', 'stairs'), ('go2', 'ramp'), ('go2', 'slippery'),
       ('hyqreal2', 'random_boxes')]
)


def main():
    COMPILED_DIR.mkdir(parents=True, exist_ok=True)
    for robot, scene in CONFIGS:
        model = build_model(robot, scene)
        path = COMPILED_DIR / f'{robot}-{scene}.npz'
        model.save(path)
        print(f'{path.name}: {path.stat().st_size / 1024:.0f} KB')


if __name__ == '__main__':
    main()
