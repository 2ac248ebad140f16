"""Variable number-density scattering (counterpart of reference
examples/presentation_example_2.ipynb): photons rising through an
exponential atmosphere n(r) = n0 * exp(-z / H), with lambda^-4 weighting.

Shows both variable_n_fn forms: the reference-style C expression string over
r0/r1/r2[gid], and the strictly-more-general Python callable.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax.numpy as jnp
import numpy as np

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

n0 = 2.0e-3
H = 2.0e5  # scale height [m]

for label, fn in [
    ("C-string", f"{n0} * exp(-r2[gid] / {H})"),
    ("callable", lambda r0, r1, r2: n0 * jnp.exp(-r2 / H)),
]:
    sim = phys.Simulation(exit=lambda c: c.t >= 0.020, seed=2)
    sim.add_step(0, phys.UpdateTimeStep(lambda s: np.double(0.001)))
    sim.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
    sim.add_step(2, light.ScatterSphericalStep(
        A=0.001, variable_n=True, variable_n_fn=fn))
    # photons escaping the 6000 km simulation box are absorbed — the full
    # atmosphere scenario (lambda^-4-ready scatter + variable n + boundary)
    # stays on the fused Pallas fast path
    box = 6.0e6
    sim.add_step(3, physicl_tpu.newton.AbsorbingBoundaryStep(
        np.array([[-box, box], [-box, box], [-box, box]])))
    sign = light.ScatterSignMeasureStep(None, True)
    sim.add_step(4, sign)
    # photons moving straight up (+z): scattering rate decays as they climb
    v = np.zeros((3, 1)); v[2, 0] = float(light.c)
    sim.add_photons(light.generate_photon_state(50_000, E=1.0, v=v))
    sim.start()
    sim.join()
    assert sim.used_fused, "atmosphere scenario must stay on the fused path"
    zp_share = [row[4] / max(row[1], 1) for row in sign.data]
    print(f"{label:9s}: fused={sim.used_fused} +z share by iteration "
          f"{['%.3f' % x for x in zp_share[:6]]} ... {zp_share[-1]:.3f}")
