"""Build + execute examples/polarized_sky.ipynb (Stokes-vector Rayleigh
transport: sky polarization, circular transfer, ensemble depolarization).

Run: python examples/make_polarization_nb.py  (executes on the current JAX
backend; PHYSICL_NB_SMALL=1 shrinks photon counts for a CPU smoke run).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))

CELL0 = '''\
# Polarized Rayleigh transport with full Stokes vectors — TPU extension.
#
# Every photon carries a normalized Stokes vector (Q, U, V) and a local
# frame vector (physicl_tpu.polarization); scattering applies the exact
# dipole phase MATRIX with joint polarized angle sampling. This cell
# reproduces the textbook result behind sky polarimetry: light singly
# scattered by angle theta acquires a linear polarization degree
#     P(theta) = (1 - cos^2) / (1 + cos^2),
# 100% at 90 degrees from the sun. In the photon's own frame (aligned
# with the scattering plane after the event) that is exactly Q = -P.
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
if os.environ.get("PHYSICL_NB_SMALL") == "1":   # CPU smoke mode
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light
import physicl_tpu.polarization as pol
import warnings
warnings.filterwarnings("ignore", message=".*unsupported-step.*")

N = 20_000 if os.environ.get("PHYSICL_NB_SMALL") == "1" else 1_000_000
c_dt = float(light.c) * 0.001
A = np.sqrt(2.0 / c_dt)   # pcoll = A*n*c*dt = 2: every photon scatters

def one_polarized_scatter(stokes, n=N, seed=7):
    """One forced Rayleigh scatter of a +x beam; returns (cos theta,
    final Stokes, frame, direction) arrays over the population."""
    s = phys.Simulation(until_t=0.001, seed=seed)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, pol.ScatterPolarizedRayleighStep(A=A, n=A))
    s.add_photons(pol.polarized_photon_state(n, E=1.0, stokes=stokes))
    s.start(); s.join()
    v = np.asarray(s.sim_state.v, np.float64)[:, :n]
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)[:, :n]
    pr = np.asarray(s.sim_state.extras["pol_ref"], np.float64)[:, :n]
    d = v / np.linalg.norm(v, axis=0)
    return d[0], st, pr, d

ct, st_u, _, _ = one_polarized_scatter((0.0, 0.0, 0.0))
P_meas = -st_u[0]                      # Q in the scattering frame = -P
P_analytic = (1 - ct**2) / (1 + ct**2)
print(f"max |P_measured - P(theta)| over {N} photons: "
      f"{np.abs(P_meas - P_analytic).max():.2e}")
print(f"P at 90 deg (|cos|<0.02): {P_meas[np.abs(ct) < 0.02].mean():.4f} "
      "(analytic 1.0)")
'''

CELL1 = '''\
# The sky-polarization curve: degree of polarization vs scattering angle,
# binned from the transport run vs the closed form.
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

bins = np.linspace(-1, 1, 41)
centers = 0.5 * (bins[1:] + bins[:-1])
idx = np.digitize(ct, bins) - 1
P_bin = np.array([P_meas[idx == i].mean() for i in range(40)])

fig, ax = plt.subplots(figsize=(5.5, 3.4))
th = np.degrees(np.arccos(centers))
ax.plot(th, P_bin, "o", ms=4, label="transport (binned)")
tt = np.linspace(0, 180, 300)
cc = np.cos(np.radians(tt))
ax.plot(tt, (1 - cc**2) / (1 + cc**2), "k-", lw=1.5,
        label=r"$(1-\\cos^2\\theta)/(1+\\cos^2\\theta)$")
ax.set_xlabel(r"scattering angle $\\theta$ from the sun [deg]")
ax.set_ylabel("degree of linear polarization")
ax.set_title("single-scatter sky polarization (max at 90°)")
ax.legend(); plt.tight_layout(); plt.savefig("polarized_sky.png", dpi=110)
print(f"max binned deviation: {np.abs(P_bin - (1-centers**2)/(1+centers**2)).max():.3e}")
'''

CELL2 = '''\
# Circular polarization transfer: incoming V = 1 leaves the scatter with
# V' = 2 cos(theta) / (1 + cos^2 theta) — circular polarization flips
# handedness on backscatter and vanishes at 90 degrees.
ct_v, st_v, _, _ = one_polarized_scatter((0.0, 0.0, 1.0), seed=11)
V_analytic = 2 * ct_v / (1 + ct_v**2)
print(f"max |V' - 2c/(1+c^2)|: {np.abs(st_v[2] - V_analytic).max():.2e}")

plt.figure(figsize=(5.5, 3.2))
order = np.argsort(ct_v)
sl = slice(None, None, max(1, N // 4000))
plt.plot(ct_v[order][sl], st_v[2][order][sl], ".", ms=2,
         label="transport")
cc = np.linspace(-1, 1, 300)
plt.plot(cc, 2 * cc / (1 + cc**2), "k-", lw=1.5,
         label=r"$2\\cos\\theta/(1+\\cos^2\\theta)$")
plt.xlabel(r"$\\cos\\theta$"); plt.ylabel("V after scatter")
plt.legend(); plt.tight_layout(); plt.savefig("polarized_V.png", dpi=110)
'''

CELL3 = '''\
# Multiple scattering: per-photon PURITY is conserved exactly (Rayleigh
# scattering of a pure state is pure — depolarization is an ensemble
# effect), the local-frame <Q> relaxes to the analytic fixed point -1/2,
# and the MERIDIAN-frame ensemble polarization decays toward zero: the
# multiply-scattered sky is unpolarized even though every photon stays
# fully polarized.
Nm = 10_000 if os.environ.get("PHYSICL_NB_SMALL") == "1" else 200_000
ens = []
for k_scat in (1, 2, 3, 5, 8, 12):
    s = phys.Simulation(until_t=0.001 * k_scat, seed=17)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, pol.ScatterPolarizedRayleighStep(A=A, n=A))
    meas = pol.StokesMeasureStep(None)
    s.add_step(3, meas)
    s.add_photons(pol.polarized_photon_state(Nm, E=1.0,
                                             stokes=(1.0, 0.0, 0.0)))
    s.start(); s.join()
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)[:, :Nm]
    pr = np.asarray(s.sim_state.extras["pol_ref"], np.float64)[:, :Nm]
    v = np.asarray(s.sim_state.v, np.float64)[:, :Nm]
    d = v / np.linalg.norm(v, axis=0)
    # rotate each photon's (Q, U) into the common meridian frame
    zx = np.cross(np.broadcast_to([0.0, 0.0, 1.0], d.T.shape), d.T).T
    nz = np.linalg.norm(zx, axis=0); ok = nz > 1e-9
    e_phi = zx[:, ok] / nz[ok]
    e_th = np.cross(e_phi.T, d[:, ok].T).T
    cchi = (pr[:, ok] * e_th).sum(0); schi = (pr[:, ok] * e_phi).sum(0)
    c2, s2 = cchi**2 - schi**2, 2 * schi * cchi
    Q_lab = st[0][ok] * c2 - st[1][ok] * s2
    U_lab = st[0][ok] * s2 + st[1][ok] * c2
    p_ens = np.sqrt(Q_lab.mean()**2 + U_lab.mean()**2 + st[2][ok].mean()**2)
    purity = np.sqrt((st**2).sum(0)).mean()
    rows = np.array(meas.data, dtype=float)
    ens.append((k_scat, p_ens, purity, rows[-1, 4]))
    print(f"after {k_scat:2d} scatters: ensemble P = {p_ens:.4f}   "
          f"<photon purity> = {purity:.5f}   local <Q> = {rows[-1, 4]:+.3f}")

ks, ps, _, _ = zip(*ens)
plt.figure(figsize=(5.5, 3.2))
plt.semilogy(ks, ps, "o-", label="meridian-frame ensemble P")
plt.axhline(1.0, color="k", lw=0.8, ls=":", label="per-photon purity (exact)")
plt.xlabel("number of scatters"); plt.ylabel("polarization")
plt.legend(); plt.tight_layout()
plt.savefig("polarized_depol.png", dpi=110)
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(c)
                for c in (CELL0, CELL1, CELL2, CELL3)]
    ep = ExecutePreprocessor(timeout=2400)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "polarized_sky.ipynb")
    with open(out, "w") as f:
        nbf.write(nb, f)
    print("wrote", out)


if __name__ == "__main__":
    sys.exit(main())
