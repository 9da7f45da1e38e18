"""Validate the batch-trailing (CL-BT) narrow-phase hypothesis on the CURRENT
platform before committing to the full rewrite (VERDICT r4 item #1).

The 2026-08-20 axon redeploy's layout assignment puts the 128-lane axis on
tiny per-env trailing dims of batch-LEADING narrow-phase tensors (2-6% lane
occupancy, docs/PERF_NOTES.md r4). Hypothesis: the same math written
component-leading / batch-trailing — every intermediate shaped (comp..., G, B)
so the minor two dims are (pairs, batch) — tiles at full lane occupancy.

Measures three representative group workloads at go2/flat scale (B=4096) in
both forms and reports ms/step + speedup:
  * sphere-box   (70 pairs)  — clamp + norm chain        [collision._box_sphere]
  * plane-box    (20 pairs, 8 corners -> deepest 4)      [collision._plane_box]
  * capsule-capsule (2 pairs) + a support-eval loop mimicking the CCD
    inner pattern (40 dirs x box support)                 [ccd.support_box]

Usage: python scripts/probes/probe_bt_narrow.py [B]
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_default_matmul_precision', 'highest')

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
T = 10          # steps per timed call
DT = jnp.float32


# --------------------------------------------------------------------------
# CL-BT helpers: vectors are (3, ...), matrices (3, 3, ...)
# --------------------------------------------------------------------------

def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def matvec3(R, v):
    return jnp.stack([dot3(R[i], v) for i in range(3)])


def mattvec3(R, v):
    return jnp.stack([R[0, i] * v[0] + R[1, i] * v[1] + R[2, i] * v[2]
                      for i in range(3)])


def norm3(v, eps=1e-30):
    return jnp.sqrt(jnp.maximum(dot3(v, v), eps))


# --------------------------------------------------------------------------
# workload 1: sphere-box (mirror of collision._box_sphere math)
# --------------------------------------------------------------------------

def sphere_box_bl(bpos, bmat, size, center, radius):
    """Batch-leading per-pair form (vmapped twice): inputs (3,), (3,3)."""
    local = bmat.T @ (center - bpos)
    clamped = jnp.clip(local, -size, size)
    delta = local - clamped
    dist_out = jnp.linalg.norm(delta)
    outside = dist_out > 1e-9
    # inside: push to nearest face
    face = size - jnp.abs(local)
    k = jnp.argmin(face)
    sgn = jnp.sign(local)
    n_in = jnp.zeros(3).at[k].set(sgn[k])
    n_loc = jnp.where(outside, delta / jnp.maximum(dist_out, 1e-30), n_in)
    d = jnp.where(outside, dist_out - radius, -(face[k] + radius))
    p_loc = jnp.where(outside, clamped, local + n_in * face[k])
    n_w = bmat @ n_loc
    p_w = bpos + bmat @ p_loc
    return d, p_w - 0.5 * d * n_w, n_w


def sphere_box_bt(bpos, bmat, size, center, radius):
    """CL-BT form: bpos/center (3, G, B), bmat (3, 3, G, B), size (3, G, 1)."""
    local = mattvec3(bmat, center - bpos)
    clamped = jnp.clip(local, -size, size)
    delta = local - clamped
    dist_out = norm3(delta)
    outside = dist_out > 1e-9
    face = size - jnp.abs(local)
    fmin = jnp.minimum(jnp.minimum(face[0], face[1]), face[2])
    sel = jnp.stack([face[i] == fmin for i in range(3)]).astype(local.dtype)
    # first-match tie-break like argmin
    sel = sel * jnp.cumprod(
        jnp.concatenate([jnp.ones_like(sel[:1]), 1.0 - sel[:-1]]), axis=0)
    n_in = sel * jnp.sign(local)
    n_loc = jnp.where(outside, delta / jnp.maximum(dist_out, 1e-30), n_in)
    d = jnp.where(outside, dist_out - radius, -(fmin + radius))
    p_loc = jnp.where(outside, clamped, local + n_in * fmin)
    n_w = matvec3(bmat, n_loc)
    p_w = bpos + matvec3(bmat, p_loc)
    return d, p_w - 0.5 * d * n_w, n_w


# --------------------------------------------------------------------------
# workload 2: support-eval loop (CCD inner pattern): 40 dirs x box support
# --------------------------------------------------------------------------

def support_loop_bl(p, R, size, dirs):
    """dirs (40, 3); p (3,), R (3,3). Returns scalar best depth."""
    dl = jnp.matmul(dirs, R)                       # (40, 3) local dirs
    pts = jnp.sign(dl) * size                      # (40, 3)
    w = jnp.matmul(pts, R.T) + p                   # (40, 3) world
    vals = jnp.sum(w * dirs, axis=-1)              # (40,)
    return jnp.min(vals), w[jnp.argmin(vals)]


def support_loop_bt(p, R, size, dirs):
    """CL-BT: p (3, G, B), R (3, 3, G, B), size (3, G, 1), dirs (40, 3, G, B)."""
    dl = jnp.stack([mattvec3(R, dirs[k]) for k in range(dirs.shape[0])])
    pts = jnp.sign(dl) * size                      # (40, 3, G, B)
    w = jnp.stack([matvec3(R, pts[k]) for k in range(pts.shape[0])]) + p
    vals = jnp.stack([dot3(w[k], dirs[k]) for k in range(w.shape[0])])
    vmin = jnp.min(vals, axis=0)
    sel = (vals == vmin).astype(w.dtype)[:, None]  # (40, 1, G, B)
    wbest = jnp.sum(w * sel, axis=0) / jnp.maximum(jnp.sum(sel, axis=0), 1.0)
    return vmin, wbest


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------

def timed(fn, args, label, units):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / T * 1e3
    print(f'{label:34s} {ms:9.3f} ms/step', flush=True)
    return ms, out


def rand_rot(key, shape):
    q = jax.random.normal(key, shape + (4,), DT)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1)], -2)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    G_sb, G_pb, G_sup = 70, 20, 74
    print(f'backend={jax.default_backend()} B={B} T={T}', flush=True)

    # ---------------- sphere-box ----------------
    bpos = jax.random.normal(ks[0], (B, G_sb, 3), DT)
    bmat = rand_rot(ks[1], (B, G_sb))
    size = jnp.abs(jax.random.normal(ks[2], (G_sb, 3), DT)) + 0.05
    center = jax.random.normal(ks[3], (B, G_sb, 3), DT) * 0.3
    radius = jnp.abs(jax.random.normal(ks[4], (G_sb,), DT)) * 0.05 + 0.01

    @jax.jit
    def run_bl(bpos, bmat, center):
        def step(c, _):
            bp, ct = c
            d, p, n = jax.vmap(jax.vmap(sphere_box_bl))(
                bp, bmat, jnp.broadcast_to(size, bp.shape), ct,
                jnp.broadcast_to(radius, bp.shape[:2]))
            # feed outputs back so steps chain (no memoized replay)
            return (bp + 1e-6 * n, ct + 1e-6 * p), d
        (_, _), ds = jax.lax.scan(step, (bpos, center), None, length=T)
        return ds.sum()

    bposT = jnp.transpose(bpos, (2, 1, 0))          # (3, G, B)
    bmatT = jnp.transpose(bmat, (2, 3, 1, 0))       # (3, 3, G, B)
    centerT = jnp.transpose(center, (2, 1, 0))
    sizeT = size.T[:, :, None]                      # (3, G, 1)
    radT = radius[None, :, None]                    # (1, G, 1) -> broadcast

    @jax.jit
    def run_bt(bposT, bmatT, centerT):
        def step(c, _):
            bp, ct = c
            d, p, n = sphere_box_bt(bp, bmatT, sizeT, ct, radT[0])
            return (bp + 1e-6 * n, ct + 1e-6 * p), d
        (_, _), ds = jax.lax.scan(step, (bposT, centerT), None, length=T)
        return ds.sum()

    ms_bl, o1 = timed(run_bl, (bpos, bmat, center), 'sphere-box  batch-leading', B)
    ms_bt, o2 = timed(run_bt, (bposT, bmatT, centerT), 'sphere-box  CL-BT', B)
    print(f'  speedup {ms_bl / ms_bt:6.1f}x   agree={np.allclose(float(o1), float(o2), rtol=2e-4)}',
          flush=True)

    # ---------------- support loop (CCD pattern) ----------------
    p1 = jax.random.normal(ks[5], (B, G_sup, 3), DT)
    R1 = rand_rot(ks[6], (B, G_sup))
    sz = jnp.abs(jax.random.normal(ks[7], (G_sup, 3), DT)) + 0.05
    dirs = jax.random.normal(jax.random.PRNGKey(9), (40, 3), DT)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    @jax.jit
    def sup_bl(p1, R1):
        def step(c, _):
            v, w = jax.vmap(jax.vmap(
                lambda p, R, s: support_loop_bl(p, R, s, dirs)))(
                    c, R1, jnp.broadcast_to(sz, c.shape))
            return c + 1e-6 * w, v
        _, vs = jax.lax.scan(step, p1, None, length=T)
        return vs.sum()

    p1T = jnp.transpose(p1, (2, 1, 0))
    R1T = jnp.transpose(R1, (2, 3, 1, 0))
    szT = sz.T[:, :, None]
    dirsT = jnp.broadcast_to(dirs[:, :, None, None], (40, 3, 1, 1))

    @jax.jit
    def sup_bt(p1T, R1T):
        def step(c, _):
            v, w = support_loop_bt(c, R1T, szT, dirsT)
            return c + 1e-6 * w, v
        _, vs = jax.lax.scan(step, p1T, None, length=T)
        return vs.sum()

    ms_bl, o1 = timed(sup_bl, (p1, R1), 'support-40  batch-leading', B)
    ms_bt, o2 = timed(sup_bt, (p1T, R1T), 'support-40  CL-BT', B)
    print(f'  speedup {ms_bl / ms_bt:6.1f}x   agree={np.allclose(float(o1), float(o2), rtol=2e-4)}',
          flush=True)


if __name__ == '__main__':
    main()
