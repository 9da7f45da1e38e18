"""Map MuJoCo's elliptic force law F: jar -> force on a single-contact toy model."""
import mujoco
import numpy as np

np.set_printoptions(precision=6, suppress=True, linewidth=220)

XML = """
<mujoco>
  <option cone="elliptic" impratio="100"/>
  <worldbody>
    <geom name="floor" size="0 0 0.05" type="plane"/>
    <body name="ball" pos="0 0 0.1">
      <freejoint/>
      <geom name="b" type="sphere" size="0.1" condim="6" friction="0.8 0.02 0.01"
            priority="1" margin="0.001"/>
    </body>
  </worldbody>
</mujoco>
"""
mj = mujoco.MjModel.from_xml_string(XML)
d = mujoco.MjData(mj)
rng = np.random.RandomState(0)

rows = []
for trial in range(400):
    mujoco.mj_resetData(mj, d)
    d.qpos[2] = 0.1 - 10 ** rng.uniform(-5, -2.5)  # penetration depth
    scale = 10 ** rng.uniform(-2, 1.2)
    d.qvel[:] = rng.randn(6) * scale
    d.qfrc_applied[:] = rng.randn(6) * 10 ** rng.uniform(-1, 2)
    mujoco.mj_forward(mj, d)
    if d.ncon != 1:
        continue
    c = d.contact[0]
    dim = c.dim
    s = c.efc_address
    J = d.efc_J.reshape(d.nefc, mj.nv)
    u = (J[s:s + dim] @ d.qacc - d.efc_aref[s:s + dim]).copy()
    f = d.efc_force[s:s + dim].copy()
    D = d.efc_D[s:s + dim].copy()
    mu = np.array(c.friction).copy()
    rows.append((u, f, D, mu))

mu0 = 0.8
zero_rows = [(u, f, D) for u, f, D, _ in rows if np.all(f == 0)]
nonzero = [(u, f, D) for u, f, D, _ in rows if not np.all(f == 0)]
print('zero-force samples:', len(zero_rows), ' nonzero:', len(nonzero))

mus = np.array([0.8, 0.8, 0.02, 0.01, 0.01])
print('\n--- zero-force zone: check N >= mu0*T_weighted ---')
margin_min = []
for u, f, D in zero_rows:
    Tw = np.linalg.norm(u[1:] * mus / mu0)
    margin_min.append(u[0] - mu0 * Tw)
print('min(N - mu0*Tw) over zero-force:', min(margin_min) if margin_min else None)

print('\n--- nonzero: classify ---')
cnt_bottom = cnt_mid = cnt_other = 0
mid_err = []
bot_err = []
other = []
for u, f, D in nonzero:
    Tw = np.linalg.norm(u[1:] * mus / mu0)
    N = u[0]
    Dn = D[0]
    rho = mus[1] ** 2 / D[1] * mu0 ** 2 / mus[1] ** 2  # = mu0^2 * R_t
    # candidate bottom: f = -D*u
    if np.allclose(f, -D * u, rtol=1e-6, atol=1e-9):
        cnt_bottom += 1
        bot_err.append((N, Tw))
        continue
    # candidate middle (derived): lam = (mu0*Tw - N)*Dn/(1+Dn*rho)
    lam = (mu0 * Tw - N) * Dn / (1 + Dn * rho)
    # check friction direction + magnitude from derivation:
    # y_t = u_t/(1+lam*rho/w), f_t = -D_t*(u_t - y_t)
    w = N + lam / Dn
    ft = -D[1:] * u[1:] * (1 - 1 / (1 + lam * rho / max(w, 1e-300)))
    pred = np.concatenate([[lam], ft])
    err = np.max(np.abs(pred - f) / (1 + np.abs(f)))
    if err < 1e-6:
        cnt_mid += 1
        mid_err.append(err)
    else:
        cnt_other += 1
        if len(other) < 8:
            other.append((u, f, D, pred))
print('bottom:', cnt_bottom, 'middle(match):', cnt_mid, 'other:', cnt_other)
for u, f, D, pred in other:
    Tw = np.linalg.norm(u[1:] * mus / mu0)
    print('\nN', u[0], 'muTw', mu0 * Tw)
    print(' u   ', u)
    print(' f   ', f)
    print(' pred', pred)
    print(' -Du ', -D * u)
