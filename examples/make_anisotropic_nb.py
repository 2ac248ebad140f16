"""Build + execute examples/anisotropic_scattering.ipynb (HG phase function).

Run: python examples/make_anisotropic_nb.py  (executes on the current JAX
backend; CPU is fine — the demo uses 50k photons for one iteration each).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))

CELL0 = '''\
# Anisotropic (Henyey-Greenstein) scattering — TPU extension.
#
# The reference package scatters isotropically only (physicl/light.py:262).
# ScatterHenyeyGreensteinStep adds the standard single-parameter anisotropic
# phase function: p(cos t) = (1 - g^2) / (2 (1 + g^2 - 2 g cos t)^{3/2}),
# with <cos t> = g. Forward-peaked (g > 0) transport is the Mie/aerosol
# regime; g = 0 reduces to exact area-uniform isotropic scattering.
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
import numpy as np
import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

def one_scatter_cosines(g, n=50_000, seed=7):
    """One guaranteed scatter from a +x beam; return cos(theta) samples."""
    s = phys.Simulation(until_t=0.001, seed=seed)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, light.ScatterHenyeyGreensteinStep(A=1.0, n=1.0, g=g))
    s.add_photons(light.generate_photon_state(n, E=1.0))
    s.start(); s.join()
    assert s.used_fused
    v = np.asarray(s.sim_state.v)[:, :n]
    return v[0] / float(light.c)

def hg_pdf(ct, g):
    if abs(g) < 1e-12:
        return np.full_like(ct, 0.5)
    return 0.5 * (1 - g**2) / (1 + g**2 - 2*g*ct) ** 1.5

gs = [0.0, 0.4, 0.8, -0.5]
cos_samples = {g: one_scatter_cosines(g) for g in gs}
for g in gs:
    print(f"g={g:+.1f}: <cos t> = {cos_samples[g].mean():+.4f}")
'''

CELL1 = '''\
# Sampled cos(theta) histograms vs the analytic HG density.
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, len(gs), figsize=(4 * len(gs), 3), sharey=False)
ct = np.linspace(-0.999, 0.999, 400)
for ax, g in zip(axes, gs):
    ax.hist(cos_samples[g], bins=60, range=(-1, 1), density=True,
            alpha=0.6, label="sampled")
    ax.plot(ct, hg_pdf(ct, g), "k-", lw=1.5, label="HG analytic")
    ax.set_title(f"g = {g:+.1f}")
    ax.set_xlabel("cos t")
axes[0].set_ylabel("density")
axes[0].legend()
plt.tight_layout()
plt.savefig("anisotropic_scattering.png", dpi=110)
print("max |hist - pdf| checks:")
for g in gs:
    hist, edges = np.histogram(cos_samples[g], bins=40, range=(-1, 1),
                               density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    ref = hg_pdf(centers, g)
    mask = ref < 5  # skip the forward singularity bins (finite-bin bias)
    err = np.abs(hist - ref)[mask].max()
    print(f"  g={g:+.1f}: {err:.3f}")
'''

CELL2 = '''\
# Multiple scattering: a forward-peaked medium randomizes direction far
# slower than an isotropic one. Track the +x share over iterations.
def relaxation(step, n=20_000, iters=30, seed=1):
    s = phys.Simulation(until_t=0.001 * iters, seed=seed)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, step)
    sign = light.ScatterSignMeasureStep(None, True)
    s.add_step(3, sign)
    s.add_photons(light.generate_photon_state(n, E=1.0))
    s.start(); s.join()
    return [r[2] / r[1] for r in sign.data]

A = n_ = 0.0005  # pcoll ~ 0.075 per step
iso = relaxation(light.ScatterIsotropicStep(A=A, n=n_))
fwd = relaxation(light.ScatterHenyeyGreensteinStep(A=A, n=n_, g=0.9))
plt.figure(figsize=(6, 3.2))
plt.plot(iso, label="isotropic")
plt.plot(fwd, label="HG g=0.9 (forward-peaked)")
plt.xlabel("iteration"); plt.ylabel("+x share"); plt.legend()
plt.tight_layout(); plt.savefig("anisotropic_relaxation.png", dpi=110)
print(f"+x share after {len(iso)} steps: iso={iso[-1]:.3f}  hg(g=0.9)={fwd[-1]:.3f}")
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(c) for c in (CELL0, CELL1, CELL2)]
    ep = ExecutePreprocessor(timeout=1200)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "anisotropic_scattering.ipynb")
    with open(out, "w") as f:
        nbf.write(nb, f)
    print("wrote", out)


if __name__ == "__main__":
    sys.exit(main())
