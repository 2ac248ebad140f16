"""Build + execute examples/layered_slab.ipynb (refractive interfaces).

A glass slab in air, swept over incidence angles: transport through two
RefractiveInterfaceStep planes vs the analytic unpolarized Fresnel
reflectance and the incoherent multiple-reflection (Airy) slab sum
T = (1-R)/(1+R); plus the total-internal-reflection cliff at the glass->air
critical angle. The MCML problem class (layered tissue/films) composes these
interfaces with ScatterHenyeyGreensteinStep + ScatterDeleteStep.

Run: python examples/make_fresnel_nb.py  (executes on the current backend;
set PHYSICL_NB_SMALL=1 for a fast smoke run).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
SMALL = os.environ.get("PHYSICL_NB_SMALL") == "1"

N_PHOT = 10_000 if SMALL else 60_000

CELL0 = f'''\
# A glass slab (n = 1.5) in air, crossed by photon beams at a sweep of
# incidence angles. Each RefractiveInterfaceStep interacts every photon
# whose step segment crossed its plane: one uniform draw against the
# unpolarized Fresnel reflectance R(theta) picks specular reflection or
# Snell refraction, and the remainder of the step retraces from the
# segment/plane intersection — so photons bounce BETWEEN the slab faces
# until they leave, and the measured transmission is the full incoherent
# multiple-reflection sum, not a single-interface number.
#
# Analytic expectations (unpolarized, re-drawn per event — the step carries
# no polarization memory between bounces, the standard unpolarized-MC
# idealization):
#   single interface:  R = (r_s^2 + r_p^2) / 2        (Fresnel)
#   slab (incoherent): T = (1-R)^2 * sum_k R^(2k) = (1-R) / (1+R)
# (the internal-face reflectance equals the entry-face one by reciprocity
# of Snell + Fresnel).
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
if os.environ.get("PHYSICL_NB_SMALL") == "1" or \\
        os.environ.get("PHYSICL_NB_CPU") == "1":   # CPU (smoke / full) mode
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

C = float(light.c)
DT = 1e-3
N = {N_PHOT}
N_GLASS = 1.5


def fresnel_R(theta_i, n1, n2):
    """Unpolarized Fresnel reflectance; 1 beyond the critical angle."""
    ci = np.cos(theta_i)
    s2t = (n1 / n2) ** 2 * np.sin(theta_i) ** 2
    ct = np.sqrt(np.clip(1.0 - s2t, 0.0, 1.0))
    rs = (n1 * ci - n2 * ct) / (n1 * ci + n2 * ct)
    rp = (n1 * ct - n2 * ci) / (n1 * ct + n2 * ci)
    return np.where(s2t > 1.0, 1.0, 0.5 * (rs ** 2 + rp ** 2))


def run_beam(theta, steps, n_steps=14, seed=0):
    """A collimated beam at incidence angle theta onto z=0; returns final
    positions and velocities of every photon."""
    import jax
    s = phys.Simulation(until_t=DT * n_steps * 0.9999, seed=seed)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(DT)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    for i, st in enumerate(steps):
        s.add_step(2 + i, st)
    d = np.array([np.sin(theta), 0.0, np.cos(theta)])
    s.add_photons(light.generate_photon_state(
        N, E=1.0, v=d * C, r=np.array([0.0, 0.0, -0.5 * C * DT])))
    s.start(); s.join()
    assert s.used_fused, s.explain_plan()
    st = s.sim_state
    return (np.asarray(jax.device_get(st.r))[:, :N],
            np.asarray(jax.device_get(st.v))[:, :N])


# ---- sweep 1: slab transmission vs incidence angle ----
# Layer thickness must exceed one step length (c*dt) so a photon never
# crosses BOTH faces inside a single iteration — each interface interacts
# a photon at most once per step (see the RefractiveInterfaceStep docs).
L = 1.6 * C * DT
thetas = np.radians(np.arange(0, 81, 8))
T_meas, R_meas = [], []
for k, th in enumerate(thetas):
    slab = [light.RefractiveInterfaceStep(0.0, 1.0, N_GLASS),
            light.RefractiveInterfaceStep(L, N_GLASS, 1.0)]
    # worst case (80 deg): ~4.3 steps per internal round trip and
    # R^2 = 0.15 per trip -> 80 steps leave a ~1e-15 in-slab residual
    r, v = run_beam(th, slab, n_steps=80, seed=100 + k)
    T_meas.append(((r[2] > L) & (v[2] > 0)).mean())
    R_meas.append(((r[2] < 0) & (v[2] < 0)).mean())
T_meas, R_meas = np.array(T_meas), np.array(R_meas)
R1 = fresnel_R(thetas, 1.0, N_GLASS)
T_pred = (1 - R1) / (1 + R1)
print("slab:  max |T - (1-R)/(1+R)| =",
      f"{{np.abs(T_meas - T_pred).max():.4f}}")

# ---- sweep 2: the TIR cliff at the glass->air critical angle ----
thetas2 = np.radians(np.arange(2, 69, 4))
crit = np.degrees(np.arcsin(1.0 / N_GLASS))
R2_meas = []
for k, th in enumerate(thetas2):
    iface = [light.RefractiveInterfaceStep(0.0, N_GLASS, 1.0)]
    r, v = run_beam(th, iface, n_steps=2, seed=300 + k)
    R2_meas.append((v[2] < 0).mean())
R2_meas = np.array(R2_meas)
R2_pred = fresnel_R(thetas2, N_GLASS, 1.0)
print(f"glass->air critical angle: {{crit:.2f}} deg;  "
      f"max |R - Fresnel| = {{np.abs(R2_meas - R2_pred).max():.4f}}")
'''

CELL1 = '''\
import matplotlib.pyplot as plt

deg = np.degrees(thetas)
fig, axes = plt.subplots(1, 2, figsize=(10.5, 3.9))

ax = axes[0]
th_f = np.radians(np.linspace(0, 84, 300))
Rf = fresnel_R(th_f, 1.0, N_GLASS)
ax.plot(np.degrees(th_f), (1 - Rf) / (1 + Rf), "k-", lw=1.2,
        label=r"incoherent Airy $(1-R)/(1+R)$")
ax.plot(np.degrees(th_f), 1 - (1 - Rf) / (1 + Rf), "-", color="0.55",
        lw=1.2, label=r"$1 - T$")
ax.plot(deg, T_meas, "o", ms=4.5, mfc="none", label="transport: transmitted")
ax.plot(deg, R_meas, "s", ms=4.5, mfc="none", label="transport: reflected")
ax.set_xlabel("incidence angle [deg]")
ax.set_ylabel("fraction of beam")
ax.set_title(f"glass slab in air (n = {N_GLASS}), multiple reflections")
ax.legend(fontsize=8)

ax = axes[1]
th_f2 = np.radians(np.linspace(0, 68, 400))
ax.plot(np.degrees(th_f2), fresnel_R(th_f2, N_GLASS, 1.0), "k-", lw=1.2,
        label="Fresnel (unpolarized)")
ax.plot(np.degrees(thetas2), R2_meas, "o", ms=4.5, mfc="none",
        label="transport")
ax.axvline(crit, color="0.6", lw=0.8, ls=":")
ax.annotate("critical angle", (crit, 0.45), rotation=90, fontsize=8,
            xytext=(crit - 3.5, 0.35), color="0.4")
ax.set_xlabel("incidence angle [deg]")
ax.set_ylabel("reflectance")
ax.set_title("glass \\u2192 air: total internal reflection")
ax.legend(fontsize=8, loc="upper left")

plt.tight_layout(); plt.savefig("layered_slab.png", dpi=110)
plt.show()

# quantitative acceptance: binomial noise at N photons is ~2e-3; the Airy
# sum and the Fresnel curve must be reproduced everywhere, including the
# R = 1 plateau past the critical angle (exact: no draw can transmit)
assert np.abs(T_meas - T_pred).max() < 0.01
assert np.abs(T_meas + R_meas - 1.0).max() < 1e-6   # nothing stuck in slab
assert np.abs(R2_meas - R2_pred).max() < 0.01
assert (R2_meas[np.degrees(thetas2) > crit + 1] == 1.0).all()
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(c) for c in (CELL0, CELL1)]
    ep = ExecutePreprocessor(timeout=3600)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "layered_slab.ipynb")
    from _nbbuild import write_executed
    write_executed(nb, out)


if __name__ == "__main__":
    sys.exit(main())
