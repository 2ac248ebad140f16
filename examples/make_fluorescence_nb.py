"""Build + execute examples/xray_fluorescence.ipynb (K-shell fluorescence).

Run: python examples/make_fluorescence_nb.py  (executes on the current JAX
backend).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

CELL0 = '''\
# X-ray fluorescence: K-shell re-emission with line self-absorption.
#
# A hard X-ray beam (E0 = 20 keV) irradiates an iron-like medium.
# Photoelectric absorption follows a toy sigma ~ E^-3 shape; an absorbed
# photon above the Fe K-edge (7.11 keV) re-emits K-alpha (6.40 keV) with
# the Fe fluorescence yield Y = 0.34, true-isotropically:
#
#   ScatterDeleteStep(A_fn=..., fluorescence=(0.34, 6.40),
#                     fluorescence_edge=7.11)
#
# The twist the transport must get right is SELF-ABSORPTION: the E^-3
# cross-section makes the 6.4 keV line ~30x more absorbable than the
# 20 keV source, so line photons die fast and their population follows
# the two-rate closed form
#
#   N_A(k) = N (1-pA)^k
#   N_B(k) = N pA Y [ (1-pA)^k - (1-pB)^k ] / (pB - pA)
#
# with pA = p(20 keV), pB = p(6.4 keV) per iteration. Both trajectories
# are tallied ON DEVICE every iteration (ReduceMeasureStep inside the
# fused kernel) and checked against the closed forms.
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
import numpy as np
import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light
import jax.numpy as jnp

E0, E_KA, E_EDGE, Y = 20.0, 6.40, 7.11, 0.34   # keV, Fe K yield
P20 = 0.004                                     # p(E0) per iteration
dt, k_iters, nphot = 1e-3, 40, 400_000

pA = P20
pB = P20 * (E0 / E_KA) ** 3

s = phys.Simulation(until_t=k_iters * dt, seed=5)
s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(dt)))
s.add_step(1, phys.newton.NewtonianKinematicsStep())
dele = light.ScatterDeleteStep(
    n=1.0, A=P20 / (float(light.c) * dt),
    A_fn=lambda E: (jnp.float32(E0) / E) ** 3,   # toy photoelectric shape
    fluorescence=(Y, E_KA), fluorescence_edge=E_EDGE,
    measure_deposition=True)
s.add_step(2, dele)
red = phys.ReduceMeasureStep(
    None, lambda p: {"src": p.E == jnp.float32(E0),
                     "ka": p.E == jnp.float32(E_KA)},
    outputs=("src", "ka"))
s.add_step(3, red)
s.add_photons(light.generate_photon_state(nphot, E=E0))
s.start(); s.join()
assert s.used_fused, "pipeline must run on the fused kernel"

rows = np.array(red.data, dtype=float)
n_src, n_ka = rows[:, 1], rows[:, 2]
kk = np.arange(1, rows.shape[0] + 1)
pred_src = nphot * (1 - pA) ** kk
pred_ka = (nphot * pA * Y * ((1 - pA) ** kk - (1 - pB) ** kk)
           / (pB - pA))
err_src = np.abs(n_src / pred_src - 1).max()
err_ka = np.abs(n_ka[8:] / pred_ka[8:] - 1).max()
print(f"source-line trajectory vs (1-pA)^k: max rel err {err_src:.4f}")
print(f"K-alpha trajectory vs two-rate closed form: max rel err "
      f"{err_ka:.4f}")
assert err_src < 0.01 and err_ka < 0.08
'''

CELL1 = '''\
# Populations vs the closed forms + the exact energy budget.
import matplotlib.pyplot as plt

st = s.sim_state
alive = np.asarray(st.alive)
E = np.asarray(st.E, np.float64)
dep = float(np.array(dele.data, dtype=float)[:, 1].sum())
budget = (E[alive].sum() + dep) / (nphot * E0)
print(f"energy budget (in-flight + deposited) / initial = {budget:.6f}")
assert abs(budget - 1.0) < 1e-4   # exact per realization, f32 roundoff

fig, (ax, ax2) = plt.subplots(1, 2, figsize=(10.5, 4))
ax.plot(kk, n_src, "o", ms=3, label="source 20 keV (measured)")
ax.plot(kk, pred_src, "k-", lw=1, label=r"$N(1-p_A)^k$")
ax.plot(kk, n_ka, "s", ms=3, label=r"K$\\alpha$ 6.4 keV (measured)")
ax.plot(kk, pred_ka, "k--", lw=1, label="two-rate closed form")
ax.set_xlabel("iteration"); ax.set_ylabel("photons alive")
ax.set_yscale("log"); ax.legend(fontsize=8)
ax.set_title("fluorescence with line self-absorption")

# K-alpha emission is TRUE-isotropic: cos(theta) uniform on [-1, 1]
line = alive & (E == np.float32(E_KA))
v = np.asarray(st.v, np.float64)[:, line]
cos_t = v[2] / np.sqrt((v ** 2).sum(axis=0))
ax2.hist(cos_t, bins=40, range=(-1, 1), density=True, alpha=0.7)
ax2.axhline(0.5, color="k", lw=1, label="isotropic 1/2")
ax2.set_xlabel(r"$\\cos\\theta$"); ax2.set_ylabel("density")
ax2.set_title(rf"K$\\alpha$ emission directions (n={line.sum()})")
ax2.legend(fontsize=8)
plt.tight_layout(); plt.savefig("xray_fluorescence.png", dpi=110)
plt.show()
print(f"<cos theta> = {cos_t.mean():+.4f} over {line.sum()} line photons")
assert abs(cos_t.mean()) < 0.05
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(c) for c in (CELL0, CELL1)]
    ep = ExecutePreprocessor(timeout=2400)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "xray_fluorescence.ipynb")
    from _nbbuild import write_executed
    write_executed(nb, out)


if __name__ == "__main__":
    sys.exit(main())
