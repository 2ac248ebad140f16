"""Runtime sweep (counterpart of reference examples/runtime1.py and
examples/python_cl_runtime.ipynb): fused Pallas pipeline vs the generic scan
engine across photon counts 10^linspace(2, 5.5, 9), for the delete and
spherical (+lambda^-4) scatter workloads. Writes runtime1_out.csv."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import csv
import time

import numpy as np

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light


def run_once(n_photons, workload, fuse):
    sim = phys.Simulation(exit=lambda c: c.t >= 0.050, seed=1, fuse=fuse)
    sim.add_step(0, phys.UpdateTimeStep(lambda s: np.double(0.001)))
    sim.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
    if workload == "delete":
        sim.add_step(2, light.ScatterDeleteStep(np.double(1e-4), np.double(1e-4)))
    elif workload == "spherical":
        sim.add_step(2, light.ScatterIsotropicStep(A=0.001, n=0.001))
    else:  # spherical + lambda^-4
        sim.add_step(2, light.ScatterIsotropicStep(
            A=0.001, n=0.001, wavelength_dep_scattering=True))
    sim.add_photons(light.generate_photon_state(int(n_photons), E=4e-19))
    t0 = time.time()
    sim.start()
    sim.join()
    wall = time.time() - t0
    return wall, len(sim.ts)


def main(full=False):
    # full grid matches the reference sweep; the default is a quick subset
    # (each distinct capacity/workload recompiles the pipeline)
    sizes = np.power(10, np.linspace(2, 5.5, 9 if full else 4))
    rows = [["workload", "fuse", "photons", "iterations", "wall_s",
             "photon_steps_per_s"]]
    for workload in ("delete", "spherical", "wavelength"):
        for fuse in ("auto", "off"):
            for n in sizes:
                wall, iters = run_once(n, workload, fuse)
                rate = int(n) * iters / wall
                rows.append([workload, fuse, int(n), iters,
                             round(wall, 3), round(rate, 1)])
                print(f"{workload:10s} fuse={fuse:4s} n={int(n):7d}: "
                      f"{wall:7.2f}s  {rate:12.0f} photon-steps/s")
    with open("runtime1_out.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)


if __name__ == "__main__":
    import sys
    main(full="--full" in sys.argv)
