"""Path-trace example (counterpart of reference examples/trace_ex.py).

Builds a sim with out-of-order step insertion (steps run in INSERTION order,
reference parity), traces every photon's path, polls get_state() while the
sim thread runs, and writes the t-aligned trace matrix to CSV.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import numpy as np

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

sim = phys.Simulation(exit=lambda c: c.t >= 0.075, seed=0)
sim.add_step(3, light.TracePathMeasureStep("trace_out.csv", trace_dv=True))
sim.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
sim.add_step(2, light.ScatterSphericalStep(A=0.001, n=0.001))
sim.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.005)))

for _ in range(1000):
    sim.add_obj(light.PhotonObject(
        E=np.double(1.0),
        v=np.array([float(light.c), 0, 0], dtype=np.double)))

sim.start()
while sim.running or sim.run_time == 0:
    print(sim.get_state())
    time.sleep(0.5)
    if not sim.is_alive():
        break
sim.join()

trace = sim.steps[3].data
print(f"{len(trace) - 1} object paths over {len(trace[0]) - 1} iterations "
      f"written to trace_out.csv")
