"""Build + execute examples/population_control.ipynb (splitting demo).

Transmission through a thick SCATTERING + absorbing slab — an observable
with no closed form (diffuse multiple scattering), so the estimator is
genuinely stochastic and variance reduction has to come from population
control, not weight bookkeeping alone. One figure compares analog
transport against MCNP-style geometric importance splitting
(`ImportanceSplitStep`): equal photon budgets, ensemble of seeds, and the
standard Monte Carlo figure of merit FOM = 1 / (R^2 T).

Run: python examples/make_split_nb.py  (executes on the current backend;
set PHYSICL_NB_SMALL=1 for a fast small-population smoke run).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
SMALL = os.environ.get("PHYSICL_NB_SMALL") == "1"

N_PHOT = 4_000 if SMALL else 50_000
M_SEEDS = 6 if SMALL else 12
CAPACITY = 262_144 if SMALL else 1_048_576

CELL0 = f'''\
# Population control: geometric importance splitting in a scattering slab.
#
# A photon beam enters a slab ~7 effective attenuation lengths thick
# (absorption + isotropic scattering). Transmission is ~1e-4 and has NO
# closed form — multiple scattering makes it a genuine transport
# observable. Analog Monte Carlo delivers only ~N*T transmitted samples,
# so the estimate at depth rides on a handful of lucky photons.
#
# ImportanceSplitStep assigns an importance I(x) that doubles every few
# mean free paths of depth. A particle whose flight segment climbs the
# importance map splits into ~I(r)/I(r_prev) copies carrying w/n each
# (total statistical weight conserved EXACTLY per split); one drifting
# back down plays Russian roulette. The population at depth stays large
# while every tally stays unbiased — the textbook deep-penetration
# technique (MCNP cell importances), running inside the jitted scan.
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
if os.environ.get("PHYSICL_NB_SMALL") == "1":   # CPU smoke mode
    import jax
    jax.config.update("jax_platforms", "cpu")
import time
import numpy as np
import jax.numpy as jnp
import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

c = float(light.c)
dt = 0.001
step = c * dt                 # flight distance per iteration
p_abs, p_scat = 0.06, 0.16    # per-step interaction probabilities
L = 36 * step                 # slab depth: ~7 effective removal lengths
iters = 300                   # scattering delays transmission well past 36
A_abs = p_abs / step          # ScatterDeleteStep: pcoll = A*n*|dr|
A_sct = p_scat / step

def build(n_phot, seed, mode):
    kw = {{}}
    if mode == "split_chunk":
        # chunk-boundary control: the transport chunk keeps the FUSED
        # Pallas kernel; splitting applies between dispatches against a
        # boundary position snapshot (importance surfaces every 4 steps
        # >> nothing is lost at chunk granularity 8)
        kw["chunk_steps"] = 8
    s = phys.Simulation(until_t=iters * dt * 0.9999, seed=seed,
                        capacity={CAPACITY}, **kw)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(dt)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, light.ScatterIsotropicStep(n=np.double(1.0),
                                             A=np.double(A_sct)))
    s.add_step(3, light.ScatterDeleteStep(np.double(1.0), np.double(A_abs)))
    if mode != "analog":
        # importance doubles every 4 flight steps of depth, matching the
        # measured effective removal (~0.19/step with backscatter): the
        # at-depth population stays roughly constant instead of decaying
        s.add_step(4, light.ImportanceSplitStep(
            lambda x, y, z: 2.0 ** jnp.floor(
                jnp.clip(x, 0.0, L) / (4.0 * step)),
            at="chunk" if mode == "split_chunk" else "step"))
    # transmission tally: weighted crossings of the exit plane, then kill
    meas = light.ScatterMeasureStep(
        None, True, [[np.double(L), np.nan, np.nan]],
        weighted=(mode != "analog"))
    s.add_step(5, meas)
    big = 1e12
    s.add_step(6, phys.newton.AbsorbingBoundaryStep(
        ((-10 * step, L), (-big, big), (-big, big))))  # exit -> terminated
    s.add_photons(light.generate_photon_state(n_phot, E=1.0))
    return s, meas

def transmission(n_phot, seed, mode):
    s, meas = build(n_phot, seed, mode)
    t0 = time.perf_counter()
    s.start(); s.join()
    wall = time.perf_counter() - t0
    rows = np.array(meas.data, dtype=float)
    return rows[:, 2].sum() / n_phot, wall, s.used_fused

MODES = ("analog", "split", "split_chunk")
N, M = {N_PHOT}, {M_SEEDS}
res = {{}}
for mode in MODES:
    Ts, walls = [], []
    for m in range(M):
        T, wall, fused = transmission(N, 100 + m, mode)
        Ts.append(T); walls.append(wall)
    res[mode] = (np.array(Ts), np.array(walls))
    print(f"{{mode:12s}}: T = {{np.mean(Ts):.3e}} +- "
          f"{{np.std(Ts) / np.sqrt(M):.1e}}  "
          f"(per-run rel err {{np.std(Ts) / np.mean(Ts):.1%}}, "
          f"wall {{np.mean(walls):.2f}} s/run, fused={{fused}})")
assert fused  # split_chunk (last mode) must keep the fused kernel

# agreement: population control is unbiased — all three means overlap
Ta = res["analog"][0]
for mode in ("split", "split_chunk"):
    Tw = res[mode][0]
    sig = np.hypot(Ta.std() / np.sqrt(M), Tw.std() / np.sqrt(M))
    pull = abs(Ta.mean() - Tw.mean()) / sig
    print(f"{{mode}} vs analog: pull = {{pull:.2f}} sigma")
    assert pull < 4.0
'''

CELL1 = '''\
# The money plot: per-seed estimates (left) and the figure of merit
# FOM = 1/(R^2 T_wall) (right) — the honest comparison, since splitting
# spends extra time pushing its larger at-depth population.
import matplotlib.pyplot as plt

fig, (ax, ax2) = plt.subplots(1, 2, figsize=(10.5, 4))

LABELS = {"analog": "analog", "split": "split (per step)",
          "split_chunk": "split (chunk, fused)"}
for i, (mode, marker) in enumerate(
        (("analog", "o"), ("split", "s"), ("split_chunk", "D"))):
    Ts, walls = res[mode]
    ax.plot(np.full(Ts.shape, i), Ts, marker, ms=5, mfc="none", alpha=0.8)
    ax.errorbar([i], [Ts.mean()], yerr=[Ts.std() / np.sqrt(len(Ts))],
                fmt="k_", ms=18, capsize=6, lw=1.6)
ax.set_xticks(range(len(MODES)), [LABELS[m] for m in MODES], fontsize=8)
ax.set_ylabel("transmission estimate per seed")
ax.set_title(f"thick scattering slab, N={N:.0e}, {M} seeds")

foms = []
for mode in MODES:
    Ts, walls = res[mode]
    R = Ts.std() / Ts.mean()            # per-run relative error
    foms.append(1.0 / (R ** 2 * walls.mean()))
bars = ax2.bar([LABELS[m] for m in MODES], foms,
               color=["0.65", "0.4", "0.2"], width=0.5)
ax2.tick_params(axis="x", labelsize=8)
ax2.set_ylabel(r"FOM = $1 / (R^2\\, T_{wall})$")
ax2.set_title(f"figure of merit: {max(foms[1:]) / foms[0]:.1f}x best")
for b, f in zip(bars, foms):
    ax2.text(b.get_x() + b.get_width() / 2, f, f"{f:.2f}",
             ha="center", va="bottom", fontsize=9)
plt.tight_layout(); plt.savefig("population_control.png", dpi=110)
plt.show()

R_a = res["analog"][0].std() / res["analog"][0].mean()
for mode, fom in zip(MODES[1:], foms[1:]):
    R_s = res[mode][0].std() / res[mode][0].mean()
    print(f"{mode}: rel err {R_a:.1%} -> {R_s:.1%}  "
          f"(variance reduction {(R_a / R_s) ** 2:.1f}x, "
          f"FOM gain {fom / foms[0]:.1f}x)")
    assert R_s < R_a  # population control must actually help at this depth
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(c) for c in (CELL0, CELL1)]
    ep = ExecutePreprocessor(timeout=7200)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "population_control.ipynb")
    from _nbbuild import write_executed
    write_executed(nb, out)


if __name__ == "__main__":
    sys.exit(main())
