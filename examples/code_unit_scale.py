"""Code-unit scale example (counterpart of reference
examples/code_unit_scale_test.ipynb): run the absorption benchmark with a
millimeter-ish code scale (m -> 0.001) and physical Thomson-like parameters,
checking e^-1 survival at optical depth 1/(n*A)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

# Code scale must be set before constructing Measurements (reference
# assumption, physicl/__init__.py:124); rebuild constants under it.
phys.set_code_scale("m", 0.001)
light.refresh_constants()

# Physical inputs as Measurements — the code scale applies automatically,
# exactly like the reference workflow (examples/code_unit_scale_test.ipynb)
n_m = phys.Measurement(2e25, "m**-3")
A_m = phys.Measurement(5.1e-31, "m**2")
n = float(n_m.view(np.ndarray))   # code-unit values for plane placement
A = float(A_m.view(np.ndarray))
mfp = 1 / (n * A)              # mean free path in code units
c_code = float(light.c)        # speed of light in code units

N = 100_000
# ~50 steps to the plane; the half-step offset keeps the crossing away from
# an exact step boundary (f32 rounding there would add/drop one decay draw)
dt = mfp / c_code / 50.5

sim = phys.Simulation(seed=0)
sim.exit = lambda x: len(x.objects) == 0
sim.add_step(0, phys.UpdateTimeStep(lambda s: np.double(dt)))
sim.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
sim.add_step(2, light.ScatterDeleteStep(n_m, A_m))
meas = light.ScatterMeasureStep(None, False, [[mfp, np.nan, np.nan]])
sim.add_step(3, meas)
sim.add_photons(light.generate_photon_state(N, E=1.0))
sim.start()
sim.join()

survived = sum(int(r[1]) for r in meas.data) / N
print(f"survival at x = 1/(nA): {survived:.4f} vs e^-1 = {np.e ** -1:.4f} "
      f"(error {(np.e ** -1 - survived) / np.e ** -1:+.2%})")

phys.reset_code_scale("m")
light.refresh_constants()
