"""Classic Perlin-noise heightfield generation (vectorized numpy, build-time).

Replaces the reference's per-pixel `noise.pnoise2` double loop + cv2 PNG round-trip
(reference: gym_quadruped/utils/mujoco/terrain.py:76-102) with a vectorized
implementation of the same classic Perlin `noise2` algorithm (Ken Perlin's standard
permutation table, 12-edge gradient set, quintic fade), including the reference
pipeline's uint8 quantization so the produced terrain matches what the reference
feeds MuJoCo.

Heightfields are generated offline at model-build time (terrain is a compile-time
constant for the TPU engine), so numpy is the right tool here; the on-device hot path
only *samples* the heightfield (see physics/collision.py).
"""

from __future__ import annotations

import numpy as np

# Ken Perlin's reference permutation table (public domain, "Improved Noise", 2002).
_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175,
    74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122,
    60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54,
    65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169,
    200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64,
    52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212,
    207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213,
    119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
    129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104,
    218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241,
    81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157,
    184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
    222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180,
], dtype=np.int64)
_PERM = np.concatenate([_PERM, _PERM])

# 12 edge-of-cube gradient vectors; 2D uses the first two components.
_GRAD3 = np.array([
    [1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
    [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
    [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1],
], dtype=np.float64)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _grad2(h, x, y):
    g = _GRAD3[h % 12]
    return g[..., 0] * x + g[..., 1] * y


def noise2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Single-octave classic 2D Perlin noise, vectorized over array inputs."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    xi = np.floor(x).astype(np.int64)
    yi = np.floor(y).astype(np.int64)
    fx = x - xi
    fy = y - yi
    ii = xi & 255
    jj = yi & 255
    u = _fade(fx)
    v = _fade(fy)
    a = _PERM[ii] + jj
    b = _PERM[ii + 1] + jj
    n00 = _grad2(_PERM[a], fx, fy)
    n10 = _grad2(_PERM[b], fx - 1.0, fy)
    n01 = _grad2(_PERM[a + 1], fx, fy - 1.0)
    n11 = _grad2(_PERM[b + 1], fx - 1.0, fy - 1.0)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    return nx0 + v * (nx1 - nx0)


def pnoise2(x, y, octaves: int = 1, persistence: float = 0.5,
            lacunarity: float = 2.0) -> np.ndarray:
    """Fractal (fBm) Perlin noise matching the `noise.pnoise2` contract."""
    total = np.zeros(np.broadcast(np.asarray(x), np.asarray(y)).shape, np.float64)
    freq, amp, max_amp = 1.0, 1.0, 0.0
    for _ in range(max(1, octaves)):
        total += noise2(np.asarray(x) * freq, np.asarray(y) * freq) * amp
        max_amp += amp
        amp *= persistence
        freq *= lacunarity
    return total / max_amp


def perlin_hfield(nrow: int = 128, ncol: int = 128, smooth: float = 50.0,
                  octaves: int = 5, persistence: float = 0.5,
                  lacunarity: float = 4.0) -> np.ndarray:
    """Heightfield in [0, 1], replicating the reference generation pipeline
    (terrain.py:76-88): quantize to uint8 levels, then min-max normalize (the PNG →
    MuJoCo hfield load path).
    """
    ys, xs = np.meshgrid(np.arange(nrow), np.arange(ncol), indexing='ij')
    n = pnoise2(xs / smooth, ys / smooth, octaves=octaves,
                persistence=persistence, lacunarity=lacunarity)
    img = ((n + 1.0) / 2.0 * 255.0).astype(np.uint8).astype(np.float64)
    lo, hi = img.min(), img.max()
    return (img - lo) / max(hi - lo, 1e-12)


def reference_perlin_hfield() -> np.ndarray:
    """The exact hfield the reference generates for scene='perlin'
    (generate_terrain defaults at terrain.py:354-364: 128×128, smooth=50,
    octaves=5, lacunarity=4.0)."""
    return perlin_hfield(128, 128, smooth=50.0, octaves=5,
                         persistence=0.5, lacunarity=4.0)
