"""Build + execute examples/charged_particles.ipynb (Boris pusher).

Two classic charged-particle benchmarks for LorentzForceStep: the ExB
cycloid against the exact continuous solution, and a magnetic mirror
(spatially varying callable B(r)) whose turning points land at the
adiabatic-invariant prediction z_m = L * v_par / v_perp.

Run: python examples/make_lorentz_nb.py  (set PHYSICL_NB_SMALL=1 or
PHYSICL_NB_CPU=1 to pin the CPU backend).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

CELL0 = '''\
# Charged-particle dynamics: the Boris pusher (LorentzForceStep).
#
# The Boris split (half-E, exact B rotation, half-E) is the standard
# particle-in-cell integrator because the magnetic rotation conserves |v|
# EXACTLY — no secular energy drift on gyro-orbits. The reference stores an
# `a` attribute but integrates no forces (physicl/newton.py); this is a
# physicl_tpu extension, and an all-generic population with a species-wide
# q/m runs INSIDE the fused Pallas kernel — the charged counterpart of the
# photon transport pipeline (sim.explain_plan() shows the decision).
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
if os.environ.get("PHYSICL_NB_SMALL") == "1" or \\
        os.environ.get("PHYSICL_NB_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import physicl_tpu as phys
import physicl_tpu.newton as newton
import physicl_tpu.light as light


def run_traced(steps, obj, n_steps, dt=1e-3):
    s = phys.Simulation(until_t=dt * n_steps * 0.9999, seed=0)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(dt)))
    for i, st in enumerate(steps):
        s.add_step(1 + i, st)
    tr = light.TracePathMeasureStep(None)
    s.add_step(1 + len(steps), tr)
    s.add_obj(obj)
    s.start(); s.join()
    ts, pos, alive, _ = tr.as_arrays()
    return np.asarray(ts), np.asarray(pos)[:, :, 0]


# ---- 1: ExB cycloid vs the exact continuous solution ----
E0, B0, qm, dt = 4.0, 200.0, 1.0, 1e-3
n1 = 400
ts1, pos1 = run_traced(
    [newton.LorentzForceStep(E_field=(E0, 0, 0), B_field=(0, 0, B0),
                             q_over_m=qm),
     newton.NewtonianKinematicsStep()],
    phys.Object(), n1, dt)
w = qm * B0
vd = E0 / B0
x_exact = (vd / w) * (1 - np.cos(w * ts1))
y_exact = -vd * ts1 + (vd / w) * np.sin(w * ts1)
err = np.hypot(pos1[:, 0] - x_exact, pos1[:, 1] - y_exact).max()
print(f"ExB cycloid: max position error {err:.2e} "
      f"(gyroradius {vd / w:.1e}, {n1} steps, w*dt = {w * dt:.2f})")

# ---- 2: magnetic mirror (callable B field, div B = 0 to leading order) ----
L_mir, B0m = 2.0, 100.0


def mirror_B(rx, ry, rz):
    # axial mirror: Bz = B0 (1 + z^2/L^2), Br = -(r/2) dBz/dz
    fac = B0m / (L_mir * L_mir)
    return (-fac * rx * rz, -fac * ry * rz,
            B0m * (1.0 + (rz / L_mir) ** 2))


v_perp, v_par = 2.0, 1.0
n2 = 7000
ts2, pos2 = run_traced(
    [newton.LorentzForceStep(B_field=mirror_B, q_over_m=qm),
     newton.NewtonianKinematicsStep()],
    phys.Object(v=phys.Measurement([v_perp, 0, v_par], "m**1 s**-1"),
                r=phys.Measurement([0.0, v_perp / B0m, 0.0], "m**1")),
    n2, dt)
# adiabatic invariant mu = v_perp^2 / B: reflection where B/B0 = v^2/v_perp^2
z_mirror = L_mir * v_par / v_perp
z_max = np.abs(pos2[:, 2]).max()
print(f"magnetic mirror: turning point {z_max:.3f} "
      f"(adiabatic prediction {z_mirror:.3f}, "
      f"r_L/L = {v_perp / B0m / L_mir:.1e})")

# ---- 3: bulk fused run — a thermal ensemble in the mirror field ----
# generate_particle_state + add_particles build the SoA population with no
# per-particle Python objects; the whole pipeline runs as one fused chunk.
import jax

n_bulk = 100_000
rng = np.random.default_rng(0)
vb = rng.normal(size=(3, n_bulk))
s3 = phys.Simulation(until_t=1.0 * 0.9999, seed=1)
s3.add_step(0, phys.UpdateTimeStep(lambda x: np.double(1e-3)))
s3.add_step(1, newton.LorentzForceStep(B_field=mirror_B, q_over_m=qm))
s3.add_step(2, newton.NewtonianKinematicsStep())
s3.add_particles(newton.generate_particle_state(n_bulk, v=vb))
s3.start(); s3.join()
assert s3.used_fused, s3.explain_plan()
vf = np.asarray(jax.device_get(s3.sim_state.v))[:, :n_bulk]
drift = np.abs(np.linalg.norm(vf, axis=0)
               - np.linalg.norm(vb, axis=0)).max()
print(f"bulk fused mirror: {n_bulk} particles x {len(s3.ts)} steps, "
      f"max |v| drift {drift:.2e} (pure B: Boris conserves speed)")
'''

CELL1 = '''\
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, 3, figsize=(13, 3.8))

ax = axes[0]
ax.plot(y_exact, x_exact, "k-", lw=1.0, label="exact cycloid")
ax.plot(pos1[::6, 1], pos1[::6, 0], "o", ms=3, mfc="none",
        label="Boris transport")
ax.set_xlabel("y"); ax.set_ylabel("x")
ax.set_title(r"$E \\times B$ drift cycloid")
ax.legend(fontsize=8)

ax = axes[1]
ax.plot(ts2, pos2[:, 2], lw=1.0)
for zm in (z_mirror, -z_mirror):
    ax.axhline(zm, color="crimson", lw=0.9, ls="--")
ax.text(ts2[-1] * 0.99, z_mirror * 1.06, r"$z_m = L\\,v_\\parallel/v_\\perp$",
        ha="right", fontsize=8, color="crimson")
ax.set_xlabel("t"); ax.set_ylabel("z")
ax.set_title("magnetic mirror: bounce motion")

ax = axes[2]
ax.plot(pos2[:, 0], pos2[:, 2], lw=0.6)
ax.set_xlabel("x"); ax.set_ylabel("z")
ax.set_title("mirror orbit (x-z projection)")

plt.tight_layout(); plt.savefig("charged_particles.png", dpi=110)
plt.show()

# acceptance: the cycloid tracks the exact solution to O(w dt) * r_L (the
# Boris velocity is staggered half a step and gyrates at the discrete
# frequency 2 atan(w dt/2)/dt — measured 1.25 * (w dt) * r_L here); the
# mirror turning point lands on the adiabatic prediction within a few %
assert err < 2.0 * (w * dt) * (vd / w), err
assert abs(z_max - z_mirror) < 0.05 * z_mirror
# the bounce is periodic: the particle returned at least once
assert (np.abs(pos2[:, 2]) > 0.95 * z_mirror).any()
assert (pos2[-1000:, 2] < 0).any() or (np.sign(np.diff(
    pos2[np.abs(pos2[:, 2]).argmax():, 2])) < 0).any()
print("charged-particle benchmarks OK")
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(c) for c in (CELL0, CELL1)]
    ep = ExecutePreprocessor(timeout=3600)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "charged_particles.ipynb")
    from _nbbuild import write_executed
    write_executed(nb, out)


if __name__ == "__main__":
    sys.exit(main())
