"""Build + execute examples/gamma_attenuation.ipynb (full gamma toolkit).

Run: python examples/make_gamma_nb.py  (executes on the current JAX
backend).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

CELL0 = '''\
# Narrow-beam gamma attenuation — the whole gamma toolkit in one pipeline.
#
# A photon beam crossing matter is attenuated by three processes with very
# different energy dependences:
#   photoelectric absorption  ~ alpha^-3          (dominates at low E)
#   Compton scattering        ~ sigma_KN(alpha)   (mid E; removes photons
#                                                  from the BEAM by
#                                                  redirecting them)
#   pair production           ~ threshold at alpha = 2, rising ~log(alpha)
# Their sum has the famous attenuation MINIMUM at a few MeV that every
# radiography textbook plots. Here each process is one step of the same
# fused pipeline:
#   ScatterDeleteStep(A_fn=...)      photoelectric + pair (absorption)
#   ScatterComptonStep(kn_cross_section=True)    Compton (redirection +
#                                                 recoil energy loss)
# The cross-section SHAPES are toy models (real materials need tabulated
# nuclear data); what the run validates is the TRANSPORT: per-step removal
# probabilities compose into exp(-mu x) beam attenuation, measured against
# the analytic sum of the very same shapes.
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
import numpy as np
import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light
from physicl_tpu.light import _kn_sigma_ratio  # exact sigma_KN/sigma_T
import jax.numpy as jnp

# energies in units of m_e c^2 (alpha); per-step Thomson collision prob
P0 = 0.02           # Compton scale: 2% per step at the Thomson limit
PE_SCALE = 2.0e-4   # photoelectric scale (PE_SCALE*alpha^-3 per step)
PP_SCALE = 0.012    # pair-production scale

def sigma_pe(alpha):      # toy photoelectric shape
    return PE_SCALE * alpha ** -3.0

def sigma_pair(alpha):    # toy pair-production shape (threshold 2 mec2)
    return PP_SCALE * jnp.where(alpha > 2.0,
                                jnp.log(jnp.maximum(alpha / 2.0, 1.0)), 0.0)

dt, steps, nphot = 0.001, 25, 100_000
A_th = P0 / (float(light.c) * dt)   # Thomson cross-section scale

def beam_survival(alpha0, seed):
    """Fraction of the beam that crosses `steps` layers UNTOUCHED."""
    s = phys.Simulation(until_t=steps * dt, seed=seed)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(dt)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    # absorption: photoelectric + pair, as one energy-dependent A_fn
    # (A = 1/(c dt) makes pcoll per step == A_fn(alpha) directly)
    s.add_step(2, light.ScatterDeleteStep(
        n=1.0, A=1.0 / (float(light.c) * dt),
        A_fn=lambda E: sigma_pe(E) + sigma_pair(E)))
    # Compton: Klein-Nishina rate AND kinematics
    s.add_step(3, light.ScatterComptonStep(A=A_th, n=1.0, mec2=1.0,
                                           kn_cross_section=True))
    s.add_photons(light.generate_photon_state(nphot, E=float(alpha0)))
    s.start(); s.join()
    assert s.used_fused
    E = np.asarray(s.sim_state.E)[:nphot]
    alive = np.asarray(s.sim_state.alive)[:nphot]
    untouched = alive & (E == np.float32(alpha0))
    return untouched.mean()

alphas = np.logspace(-1, 2.3, 12)   # 51 keV .. 100 MeV
meas = np.array([beam_survival(a, seed=i + 1)
                 for i, a in enumerate(alphas)])
print("per-energy untouched beam fraction:")
for a, m in zip(alphas, meas):
    print(f"  alpha = {a:8.3f}  ({a * 0.511:7.2f} MeV): {m:.4f}")
'''

CELL1 = '''\
# Measured attenuation coefficient vs the analytic sum of the same shapes:
# mu dx per step = -ln(1 - p_total), p_total = p_pe + p_pair + p_compton.
import matplotlib.pyplot as plt

ratio = np.asarray(_kn_sigma_ratio(jnp.asarray(alphas, jnp.float32),
                                   jnp.float32), np.float64)
p_c = P0 * ratio
p_pe = PE_SCALE * alphas ** -3.0
p_pair = PP_SCALE * np.where(alphas > 2.0,
                             np.log(np.maximum(alphas / 2.0, 1.0)), 0.0)
# the delete step draws ONE uniform against p_pe+p_pair; compton another
mu_pred = -np.log((1.0 - np.minimum(p_pe + p_pair, 1.0)) * (1.0 - p_c))
mu_meas = -np.log(np.maximum(meas, 1e-12)) / steps

fig, ax = plt.subplots(figsize=(6.2, 4))
ax.loglog(alphas * 0.511, mu_pred, "k-", lw=1.5, label="analytic total")
ax.loglog(alphas * 0.511, p_pe, ":", label="photoelectric (toy)")
ax.loglog(alphas * 0.511, p_c, "--", label=r"Compton ($\\sigma_{KN}$ exact)")
ax.loglog(alphas * 0.511, np.maximum(p_pair, 1e-6), "-.",
          label="pair (toy, threshold 1.022 MeV)")
ax.loglog(alphas * 0.511, mu_meas, "o", ms=6, mfc="none",
          label="measured from transport")
ax.set_xlabel("photon energy [MeV]"); ax.set_ylabel(r"$\\mu\\,dx$ per step")
ax.set_ylim(1e-4, 2); ax.legend(fontsize=8)
ax.set_title("Gamma attenuation: the textbook minimum, from transport")
plt.tight_layout(); plt.savefig("gamma_attenuation.png", dpi=110)
plt.show()
err = np.abs(mu_meas - mu_pred) / mu_pred
print(f"max relative error over 12 energies: {err.max():.3f}")
assert err.max() < 0.12, "transport must reproduce the analytic attenuation"
imin = np.argmin(mu_pred)
print(f"attenuation minimum at {alphas[imin]*0.511:.1f} MeV "
      f"(textbook: a few MeV)")
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(c) for c in (CELL0, CELL1)]
    ep = ExecutePreprocessor(timeout=2400)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "gamma_attenuation.ipynb")
    from _nbbuild import write_executed
    write_executed(nb, out)


if __name__ == "__main__":
    sys.exit(main())
