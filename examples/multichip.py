"""Multi-chip scale-out example: shard 10M photons across every attached
device (pure data parallelism over independent particles; measurement
reductions psum over ICI).

On a single-chip dev box, run with a virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip.py
(the physics is identical; only throughput changes).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light
from physicl_tpu.parallel import make_mesh

mesh = make_mesh()  # 1-D mesh over all devices
n_dev = mesh.devices.size
N = 16384 * 64 * n_dev
print(f"{n_dev} devices; {N:,} photons sharded over the mesh")

sim = phys.Simulation(exit=lambda c: c.t >= 0.050, seed=0, mesh=mesh)
sim.add_step(0, phys.UpdateTimeStep(lambda s: np.double(0.001)))
sim.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
sim.add_step(2, light.ScatterIsotropicStep(A=np.double(0.001),
                                           n=np.double(0.001)))
sign = light.ScatterSignMeasureStep(None, True)
sim.add_step(3, sign)
sim.add_photons(light.generate_photon_state(N, E=1.0, device=True))

sim.start()
sim.join()

rate = N * len(sim.ts) / sim.run_time
print(f"{len(sim.ts)} iterations in {sim.run_time:.2f}s "
      f"-> {rate:.3e} photon-steps/s across {n_dev} devices")
last = sign.data[-1]
print(f"final +x share {last[2] / last[1]:.4f} "
      f"(global count over all shards: n = {int(last[1]):,})")
