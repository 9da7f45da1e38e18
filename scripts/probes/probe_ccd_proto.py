"""Numpy prototype of MuJoCo 3.10 nativeccd contact generation (cyl-box).

Calibrates: SAT penetration depth/direction + the multicontact perturbation
recipe (perturbed support witnesses, shared max depth, dedup) against ground
truth from mj_forward on random controlled poses. Once positions/normals/
counts match, the recipe is ported into physics/collision.py.
"""

import numpy as np
import mujoco

XML = """
<mujoco>
  <worldbody>
    <body name="b" pos="0 0 0">
      <freejoint/>
      <geom name="box" type="box" size="{bx} {by} {bz}" mass="1"/>
    </body>
    <body name="c" pos="0 0 0.2">
      <freejoint/>
      <geom name="cyl" type="cylinder" size="{r} {h}" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def support_box(d, R, p, size):
    """Support point of box (world rot R, center p, half-size) along world d."""
    dl = R.T @ d
    s = np.where(dl >= 0, size, -size)
    return p + R @ s


def support_cyl(d, R, p, radius, halflen):
    """Support of cylinder (axis = R[:,2]) along world dir d."""
    a = R[:, 2]
    da = d @ a
    radial = d - da * a
    nr = np.linalg.norm(radial)
    rdir = radial / nr if nr > 1e-12 else np.zeros(3)
    return p + np.sign(da) * halflen * a + radius * rdir


def sat_cyl_box(pc, Rc, r, h, pb, Rb, size):
    """Penetration depth + direction (pointing box -> cylinder) via SAT over
    candidate axes: 3 box faces, cyl axis, box-axis x cyl-axis crosses, and
    the radial axis from the box center to the cylinder axis segment."""
    axes = []
    for i in range(3):
        axes.append(Rb[:, i])
    a = Rc[:, 2]
    axes.append(a)
    for i in range(3):
        c = np.cross(Rb[:, i], a)
        n = np.linalg.norm(c)
        if n > 1e-9:
            axes.append(c / n)
    # radial axis: box center to closest point on cylinder axis segment
    t = np.clip((pb - pc) @ a, -h, h)
    q = pc + t * a
    dvec = q - pb
    n = np.linalg.norm(dvec)
    if n > 1e-9:
        axes.append(dvec / n)
    best = None
    for u in axes:
        for s in (1.0, -1.0):
            d = s * u  # oriented box -> cylinder
            # overlap along d: box max extent along d minus cyl min extent
            box_max = (support_box(d, Rb, pb, size) @ d)
            cyl_min = (support_cyl(-d, Rc, pc, r, h) @ d)
            depth = box_max - cyl_min  # >0 -> overlapping along this axis
            if depth < 0:
                return None  # separated
            if best is None or depth < best[0]:
                best = (depth, d)
    return best


def multicontact(depth, n, pc, Rc, r, h, pb, Rb, size, eps=1e-3, dedup=1e-4):
    """MuJoCo-style manifold: witness midpoints for n and 4 tangent-perturbed
    directions; all share depth; dedup close points."""
    # tangents
    t1 = np.cross(n, [0.0, 0.0, 1.0])
    if np.linalg.norm(t1) < 1e-6:
        t1 = np.cross(n, [1.0, 0.0, 0.0])
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(n, t1)
    dirs = [n]
    for t in (t1, -t1, t2, -t2):
        d = n + eps * t
        dirs.append(d / np.linalg.norm(d))
    out = []
    for d in dirs:
        # witness: cyl support along -d? n points box->cyl, so the cylinder's
        # deepest point into the box is along -d; box's along +d.
        wc = support_cyl(-d, Rc, pc, r, h)
        wb = support_box(d, Rb, pb, size)
        pos = 0.5 * (wc + wb)
        if all(np.linalg.norm(pos - o[0]) > dedup for o in out):
            out.append((pos, d))
    return out


def run_case(pc, qc, size=(0.1, 0.08, 0.06), r=0.07, h=0.025, verbose=True):
    m = mujoco.MjModel.from_xml_string(
        XML.format(bx=size[0], by=size[1], bz=size[2], r=r, h=h))
    d = mujoco.MjData(m)
    d.qpos[0:3] = 0
    d.qpos[3:7] = [1, 0, 0, 0]
    d.qpos[7:10] = pc
    d.qpos[10:14] = qc
    mujoco.mj_forward(m, d)
    Rb = np.eye(3)
    pb = np.zeros(3)
    Rc = d.xmat[2].reshape(3, 3)
    pcw = d.xpos[2]
    sat = sat_cyl_box(pcw, Rc, r, h, pb, Rb, np.asarray(size))
    mj = [(d.contact[i].dist, d.contact[i].pos.copy(),
           d.contact[i].frame[:3].copy()) for i in range(d.ncon)]
    if verbose:
        print(f'MuJoCo: ncon={d.ncon}')
        for dist, pos, nrm in mj:
            print(f'   mj dist={dist:+.6f} pos={np.array2string(pos, precision=4)} '
                  f'n={np.array2string(nrm, precision=4)}')
        if sat is None:
            print(' SAT: separated')
        else:
            depth, n = sat
            print(f' SAT depth={depth:.6f} n={np.array2string(n, precision=4)}')
            cons = multicontact(depth, n, pcw, Rc, r, h, pb, Rb,
                                np.asarray(size))
            for pos, nd in cons:
                print(f'   us dist={-depth:+.6f} '
                      f'pos={np.array2string(pos, precision=4)} '
                      f'n={np.array2string(-nd, precision=4)}')
    return mj, sat


if __name__ == '__main__':
    import math
    print('== cap on face ==')
    run_case([0, 0, 0.06 + 0.025 - 0.003], [1, 0, 0, 0])
    print('== rim on face (tilt 30 about y) ==')
    a = math.radians(30)
    run_case([0, 0, 0.06 + 0.02], [math.cos(a / 2), 0, math.sin(a / 2), 0])
    print('== side wall on face ==')
    run_case([0, 0, 0.06 + 0.07 - 0.004],
             [math.cos(math.pi / 4), math.sin(math.pi / 4), 0, 0])
    print('== side wall over box edge ==')
    run_case([0.1, 0, 0.06 + 0.07 - 0.004],
             [math.cos(math.pi / 4), math.sin(math.pi / 4), 0, 0])
    print('== random shallow poses ==')
    rng = np.random.RandomState(0)
    agree = 0
    total = 0
    for k in range(30):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        # drop the cylinder until contact depth is shallow
        pc = np.array([rng.uniform(-0.12, 0.12), rng.uniform(-0.1, 0.1), 0.0])
        # binary search height for ~2mm penetration via mj
        m = mujoco.MjModel.from_xml_string(
            XML.format(bx=0.1, by=0.08, bz=0.06, r=0.07, h=0.025))
        dd = mujoco.MjData(m)
        lo, hi = 0.0, 0.3
        for _ in range(40):
            mid = 0.5 * (lo + hi)
            dd.qpos[0:3] = 0
            dd.qpos[3:7] = [1, 0, 0, 0]
            dd.qpos[7:10] = pc + [0, 0, mid]
            dd.qpos[10:14] = q
            mujoco.mj_forward(m, dd)
            depth_mj = -min((dd.contact[i].dist for i in range(dd.ncon)),
                            default=1.0)
            if depth_mj > 0.002:
                lo = mid
            else:
                hi = mid
        dd.qpos[7:10] = pc + [0, 0, lo]
        mujoco.mj_forward(m, dd)
        if dd.ncon == 0:
            continue
        total += 1
        mj, sat = run_case(pc + [0, 0, lo], q, verbose=False)
        dmj = -min(c[0] for c in mj)
        nmj = mj[0][2]
        if sat is None:
            print(f'case {k}: SAT separated but mj depth {dmj:.5f}')
            continue
        depth, n = sat
        nerr = np.linalg.norm(-n - nmj)
        derr = abs(depth - dmj)
        ok = derr < 2e-4 and nerr < 0.05
        agree += ok
        if not ok:
            print(f'case {k}: depth mj={dmj:.6f} sat={depth:.6f} '
                  f'nerr={nerr:.4f} n_mj={np.array2string(nmj, precision=3)} '
                  f'n_sat={np.array2string(-n, precision=3)}')
    print(f'agreement: {agree}/{total}')
