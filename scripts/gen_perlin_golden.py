"""Generate tests/fixtures/perlin_golden_128.npy — the reference perlin scene's
exact uint8 heightfield image (terrain.py:76-87 parameters).

By default this uses the scalar oracle in tests/test_terrain.py (a direct
transcription of the `noise` package's _perlin.c). If the real `noise`
package is installed (it is NOT in this environment — no pip installs), pass
--use-noise-lib to regenerate the golden from the actual library and verify
the transcription end-to-end.
"""

import argparse
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'tests'))

OUT = ROOT / 'tests' / 'fixtures' / 'perlin_golden_128.npy'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--use-noise-lib', action='store_true')
    args = ap.parse_args()

    n, smooth = 128, 50.0
    img = np.zeros((n, n), np.uint8)
    if args.use_noise_lib:
        import noise  # real library, where available

        for y in range(n):
            for x in range(n):
                v = noise.pnoise2(x / smooth, y / smooth, octaves=5,
                                  persistence=0.5, lacunarity=4.0)
                img[y, x] = int((v + 1) / 2 * 255)
    else:
        from test_terrain import _scalar_pnoise2

        for y in range(n):
            for x in range(n):
                v = _scalar_pnoise2(x / smooth, y / smooth, octaves=5,
                                    persistence=0.5, lacunarity=4.0)
                img[y, x] = int((float(v) + 1) / 2 * 255)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.save(OUT, img)
    print(f'wrote {OUT} (min={img.min()} max={img.max()} '
          f'mean={img.mean():.2f})')


if __name__ == '__main__':
    main()
