"""Flagship demo (counterpart of reference examples/presentation_example.ipynb
and presentation_example_2.ipynb): solar-temperature Planck photons rising
through an exponential atmosphere with wavelength-dependent (lambda^-4)
scattering, path-traced, with sky-color statistics at the end.

Blue photons (short wavelength) scatter far more than red ones — the same
physics that makes the sky blue.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

T = 5778.0  # K (solar surface)
kT = float(light.kB.value()) * T
N = 20_000
H = 2.0e5   # atmosphere scale height [m]
hc = float(light.h) * float(light.c)

# Planck-distributed energies, straight-up beam
E = light.planck_sample_E(N, 0.5 * kT, 12 * kT, T, bins=2000, seed=0)
v = np.zeros((3, 1)); v[2, 0] = float(light.c)

# scale A so the mean-energy photon has pcoll ~ 0.05 per step at sea level
E_mean = float(np.mean(E))
A = 0.05 / (float(light.c) * 1e-3 * (hc / E_mean) ** -4)

sim = phys.Simulation(exit=lambda c: c.t >= 0.050, seed=1)
sim.add_step(0, phys.UpdateTimeStep(lambda s: np.double(0.001)))
sim.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
sim.add_step(2, light.ScatterSphericalStep(
    A=A, wavelength_dep_scattering=True,
    variable_n=True, variable_n_fn=f"1.0 * exp(-r2[gid] / {H})"))
trace = light.TracePathMeasureStep(None, trace_dv=True)
sim.add_step(3, trace)
sim.add_photons(light.generate_photon_state(N, E=E, v=v))

sim.start()
sim.join()
print(f"{len(sim.ts)} iterations over {N} photons in {sim.run_time:.1f}s")

# scatter counts by wavelength band: blue photons scatter ~(E_b/E_r)^4 more
freqs = trace._freq[:N] if trace._freq is not None else np.zeros(N)
lam = hc / E
blue = lam < np.percentile(lam, 25)
red = lam > np.percentile(lam, 75)
f_blue, f_red = freqs[blue].mean(), freqs[red].mean()
print(f"mean scatter events: blue quartile {f_blue:.2f}, "
      f"red quartile {f_red:.2f}, ratio {f_blue / max(f_red, 1e-9):.1f}x")

# altitude attenuates scattering: events happen mostly low in the atmosphere
rows = trace.data
z_final = np.array([float(np.asarray(r[-1]).reshape(-1)[-1])
                    for r in rows[1:]])
print(f"final altitude: median {np.median(z_final):.3e} m "
      f"(scale height {H:.0e} m)")
