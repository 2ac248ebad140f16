"""Build + execute examples/sz_distortion.ipynb (thermal Comptonization).

Run: python examples/make_sz_nb.py  (executes on the current JAX backend).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

CELL0 = '''\
# The (thermal) Sunyaev-Zel'dovich effect, from first-principles transport.
#
# CMB photons crossing the hot electron gas of a galaxy cluster are
# inverse-Compton up-scattered: each scatter off the theta_e-hot Maxwell
# electrons shifts the photon energy by <dE/E> = 4 theta_e (Kompaneets,
# alpha << 4 theta_e), distorting the blackbody spectrum — a DECREMENT at
# low frequency, an INCREMENT in the Wien tail, crossing zero at
# x = E/kT_cmb ~ 3.83. The first-order distortion of the occupation
# number is the Kompaneets y-distortion
#     dn/n = y * (x e^x / (e^x - 1)) * (x coth(x/2) - 4),
# with y = theta_e * tau (the mean AMPLIFICATION is e^{4y}).
#
# Here the photons are sampled from the true blackbody photon-number
# distribution, pushed through ScatterComptonStep(theta_e=...)
# — Maxwell electron draws, relativistic flux-weighted collision rates,
# exact electron-frame Klein-Nishina, exact Lorentz boosts — and the
# measured spectral change is compared against the analytic formula.
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
import numpy as np
import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

theta_e = 0.005      # kT_e / m_e c^2 = 2.6 keV electrons (cool cluster)
p_step, steps = 0.5, 5   # ~2.5 scatters on average
y = theta_e * p_step * steps   # Kompaneets y = theta_e * tau
n_phot = 4_000_000
dt = 0.001

# Photon energies in units of kT_cmb, sampled from the TRUE blackbody
# PHOTON-NUMBER distribution ~ x^2/(e^x - 1). (light.planck_sample_E
# reproduces the reference's spectrum convention — the Wien-approximated
# x^3 e^-x energy density, physicl/light.py:53-60 — which is the right
# parity target but not the occupation the SZ formula distorts.)
xg = np.linspace(1e-3, 25.0, 200001)
pdf = xg**2 / np.expm1(xg)
cdf = np.concatenate([[0.0], np.cumsum((pdf[1:] + pdf[:-1]) * 0.5
                                       * np.diff(xg))])
cdf /= cdf[-1]
rng = np.random.default_rng(3)
E = np.interp(rng.random(n_phot), cdf, xg).astype(np.float32)

# mec2 = 1e9 kT makes recoil negligible: pure inverse-Compton / SZ regime
s = phys.Simulation(until_t=steps * dt, seed=7)
s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(dt)))
s.add_step(1, phys.newton.NewtonianKinematicsStep())
s.add_step(2, light.ScatterComptonStep(A=p_step / (float(light.c) * dt),
                                       n=1.0, mec2=1e9, theta_e=theta_e))
s.add_photons(light.generate_photon_state(n_phot, E=E))
s.start(); s.join()
assert s.used_fused
E_out = np.asarray(s.sim_state.E)[:n_phot]
E_in = np.asarray(E)
print(f"y = theta_e * tau = {y:.4f}")
print(f"mean E/E0: {E_out.mean() / E_in.mean():.4f}  "
      f"(e^4y = {np.exp(4 * y):.4f})")
'''

CELL1 = '''\
# Measured occupation-number change per x bin vs the analytic Kompaneets
# y-distortion. n(x) ~ N(x)/x^2 up to constants; we compare dN/N with the
# analytic dn/n evaluated at bin centers (the x^2 phase-space factor
# cancels in the ratio at fixed x).
import matplotlib.pyplot as plt

edges = np.logspace(np.log10(0.3), np.log10(15.0), 41)
xc = np.sqrt(edges[1:] * edges[:-1])
N_in = np.histogram(E_in, bins=edges)[0].astype(float)
N_out = np.histogram(E_out, bins=edges)[0].astype(float)
meas = (N_out - N_in) / np.maximum(N_in, 1.0)

def kompaneets(x, y):
    ex = np.exp(np.minimum(x, 50.0))
    return y * (x * ex / (ex - 1.0)) * (x / np.tanh(x / 2.0) - 4.0)

pred = kompaneets(xc, y)
sigma = np.sqrt(np.maximum(N_out, 1.0)) / np.maximum(N_in, 1.0) * 1.25

fig, ax = plt.subplots(figsize=(6.4, 4))
ax.axhline(0, color="0.6", lw=0.8)
ax.axvline(3.830, color="0.6", lw=0.8, ls=":",
           label="null at x = 3.83 (217 GHz)")
ax.errorbar(xc, meas, yerr=sigma, fmt="o", ms=4, mfc="none",
            label="measured (transport)")
xg = np.logspace(np.log10(0.3), np.log10(15.0), 300)
ax.plot(xg, kompaneets(xg, y), "k-", lw=1.5,
        label=rf"Kompaneets $y$-distortion, $y={y:.2f}$")
ax.set_xscale("log"); ax.set_xlabel(r"$x = E / kT_{\\rm CMB}$")
ax.set_ylabel(r"$\\Delta N / N$")
ax.set_title("Thermal SZ spectral distortion from photon transport")
ax.legend(fontsize=8); plt.tight_layout()
plt.savefig("sz_distortion.png", dpi=110)
plt.show()

# quantitative: chi^2 against the analytic curve over the well-populated
# bins (first-order-in-y formula; second order ~ y^2 corrections)
sel = (N_in > 2000) & (xc < 8.0)
z = (meas[sel] - pred[sel]) / sigma[sel]
print(f"bins compared: {sel.sum()}, reduced chi^2 = {(z**2).mean():.2f}")
print(f"measured null crossing near x = "
      f"{xc[sel][np.argmin(np.abs(meas[sel]))]:.2f} (analytic 3.83)")
assert (z**2).mean() < 4.0
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(c) for c in (CELL0, CELL1)]
    ep = ExecutePreprocessor(timeout=2400)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "sz_distortion.ipynb")
    from _nbbuild import write_executed
    write_executed(nb, out)


if __name__ == "__main__":
    sys.exit(main())
