"""Absorption example (counterpart of reference examples/delete_ex.py +
examples/test_delete.ipynb): photons deleted with pcoll = A*n*|dr|; survival
measured at the mean-free-path plane x = 1/(nA)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

n, A = 0.001, 0.001
N = 100_000

sim = phys.Simulation(seed=0)
sim.exit = lambda x: len(x.objects) == 0
sim.add_step(0, phys.UpdateTimeStep(lambda s: np.double(0.001)))
sim.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
sim.add_step(2, light.ScatterDeleteStep(np.double(n), np.double(A)))
meas = light.ScatterMeasureStep("delete_out.csv", True,
                                [[1 / (n * A), np.nan, np.nan]])
sim.add_step(3, meas)
sim.add_photons(light.generate_photon_state(N, E=1.0))

sim.start()
sim.join()

crossed = sum(int(r[2]) for r in meas.data)
print(f"extinct after {len(sim.ts)} iterations in {sim.run_time:.2f}s")
print(f"crossing survival {crossed / N:.4f} "
      f"(discrete-step expectation {(1 - n * A * float(light.c) * 1e-3) ** 4:.4f})")
