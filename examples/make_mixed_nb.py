"""Build + execute examples/mixed_species.ipynb (one fused kernel, two
species).

A photon beam attenuates through an absorbing medium WHILE a magnetically
confined electron bunch gyrates in the same simulation — the packed otype
plane routes absorption to the photons and the Boris push to the electrons,
all inside one fused Pallas chunk. Checks Beer-Lambert on the photon side
and exact energy conservation on the charged side.

Run: python examples/make_mixed_nb.py  (set PHYSICL_NB_SMALL=1 or
PHYSICL_NB_CPU=1 to pin the CPU backend).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

CELL0 = '''\
# Mixed-species transport: photons + charged particles in ONE fused kernel.
#
# The reference iterates a Python list of heterogeneous objects and each
# step isinstance-filters its targets (physicl/light.py:176, :385). Here a
# packed otype plane does that dispatch per particle INSIDE the fused
# Pallas kernel: absorption applies to the photon subset, the Boris push
# to the charged subset — one device loop, no host round trips, no
# per-species passes.
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
if os.environ.get("PHYSICL_NB_SMALL") == "1" or \\
        os.environ.get("PHYSICL_NB_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax
import physicl_tpu as phys
import physicl_tpu.newton as newton
import physicl_tpu.light as light

c = float(light.c)
DT, K = 1e-3, 400
N_PH, N_E = 200_000, 4_096
TAU_STEP = 0.008          # photon absorption probability per step

s = phys.Simulation(until_t=DT * K * 0.9999, seed=3)
s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(DT)))
# electrons: uniform B = +z confines them to gyro-circles (r_L = v/wB)
s.add_step(1, newton.LorentzForceStep(B_field=(0, 0, 80.0), q_over_m=-1.0))
s.add_step(2, newton.NewtonianKinematicsStep())
# photons: constant-coefficient absorption, pcoll = A n |dr| = TAU_STEP
s.add_step(3, light.ScatterDeleteStep(np.double(TAU_STEP / (c * DT)),
                                      np.double(1.0)))
meas = light.ScatterSignMeasureStep(None, True)
s.add_step(4, meas)

s.add_photons(light.generate_photon_state(N_PH, E=1.0))
rng = np.random.default_rng(0)
v_e = rng.normal(size=(3, N_E)) * 2.0
v_e[2] = 0.0              # planar orbits for the plot
s.add_particles(newton.generate_particle_state(N_E, v=v_e))

s.start(); s.join()
print(s.explain_plan().splitlines()[0])
assert s.used_fused, s.explain_plan()

st = s.sim_state
n_tot = N_PH + N_E
otype = np.asarray(jax.device_get(st.otype))[:n_tot]
alive = np.asarray(jax.device_get(st.alive))[:n_tot]
v = np.asarray(jax.device_get(st.v))[:, :n_tot]
is_ph = otype == 1

# photon side: Beer-Lambert survival
n_t = np.array([row[1] for row in meas.data], float) - N_E
ts = np.array([row[0] for row in meas.data], float)
surv = alive[is_ph].sum() / N_PH
expect = (1 - TAU_STEP) ** K
print(f"photon survival: {surv:.4f} (Beer-Lambert (1-p)^K = {expect:.4f})")
assert abs(surv - expect) < 6 * np.sqrt(expect * N_PH) / N_PH + 2e-3

# charged side: nothing dies, |v| exactly conserved (pure-B Boris)
assert alive[~is_ph].sum() == N_E
sp0 = np.linalg.norm(v_e, axis=0)
sp1 = np.linalg.norm(v[:, ~is_ph], axis=0)
drift = np.abs(sp1 - sp0).max()
print(f"electron speeds: max |v| drift {drift:.2e} over {K} steps "
      f"({N_E} electrons)")
assert drift < 3e-5 * sp0.max()
'''

CELL1 = '''\
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, 2, figsize=(10.5, 4.0))

ax = axes[0]
ax.semilogy(ts, n_t / N_PH, lw=1.2, label="transport (fused, mixed)")
ax.semilogy(ts, (1 - TAU_STEP) ** (np.arange(1, K + 1)), "k--", lw=0.9,
            label=r"Beer-Lambert $(1-p)^k$")
ax.set_xlabel("t"); ax.set_ylabel("surviving photon fraction")
ax.set_title("photon subset: absorption")
ax.legend(fontsize=8)

# re-run a FEW electrons with a path trace for the orbit panel
tr_sim = phys.Simulation(until_t=DT * 200 * 0.9999, seed=5)
tr_sim.add_step(0, phys.UpdateTimeStep(lambda x: np.double(DT)))
tr_sim.add_step(1, newton.LorentzForceStep(B_field=(0, 0, 80.0),
                                           q_over_m=-1.0))
tr_sim.add_step(2, newton.NewtonianKinematicsStep())
tr = light.TracePathMeasureStep(None)
tr_sim.add_step(3, tr)
for i in range(6):
    th = 2 * np.pi * i / 6
    tr_sim.add_obj(phys.Object(
        r=phys.Measurement([0.25 * np.cos(th), 0.25 * np.sin(th), 0.0],
                           "m**1"),
        v=phys.Measurement([2.0 * np.cos(th + 2.0), 2.0 * np.sin(th + 2.0),
                            0.0], "m**1 s**-1")))
tr_sim.start(); tr_sim.join()
assert tr_sim.used_fused
_, pos, _, _ = tr.as_arrays()
pos = np.asarray(pos)

ax = axes[1]
for i in range(6):
    ax.plot(pos[:, 0, i], pos[:, 1, i], lw=0.8)
ax.set_aspect("equal")
ax.set_xlabel("x"); ax.set_ylabel("y")
ax.set_title(r"charged subset: gyro-orbits ($r_L = v/\\omega_B$)")

plt.tight_layout(); plt.savefig("mixed_species.png", dpi=110)
plt.show()
print("mixed-species demo OK")
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(x) for x in (CELL0, CELL1)]
    ep = ExecutePreprocessor(timeout=3600)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "mixed_species.ipynb")
    from _nbbuild import write_executed
    write_executed(nb, out)


if __name__ == "__main__":
    sys.exit(main())
