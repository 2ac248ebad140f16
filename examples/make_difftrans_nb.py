"""Build + execute examples/differentiable_transport.ipynb.

Transport as a differentiable model: `functional.scan_steps` runs the step
pipeline as one pure `lax.scan`, so `jax.grad` flows through the whole
simulation. Demo: (1) exact draw-free gradients of an implicit-capture
transmission curve vs the closed form, (2) calibrating a shield's
cross-section to a design transmission by optax gradient descent THROUGH
the simulator.

Run: python examples/make_difftrans_nb.py  (set PHYSICL_NB_SMALL=1 or
PHYSICL_NB_CPU=1 to pin the CPU backend).
"""

import os
import sys

import nbformat as nbf
from nbconvert.preprocessors import ExecutePreprocessor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

CELL0 = '''\
# Differentiable transport: fit physics parameters by gradient descent.
#
# The reference's host loop mutates Python objects in place
# (physicl/__init__.py:501-524) — nothing to differentiate. Here the same
# step pipeline runs as ONE pure lax.scan (physicl_tpu.functional), so the
# entire simulation is a jax-transformable function: jit it, vmap it,
# differentiate it. With implicit-capture weighted transport the
# transmission observable is smooth and draw-free (w *= 1 - pcoll), so its
# gradients are EXACT — no finite differences, no score-function noise.
import sys, os
sys.path.insert(0, os.path.dirname(os.getcwd()))
if os.environ.get("PHYSICL_NB_SMALL") == "1" or \\
        os.environ.get("PHYSICL_NB_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
import numpy as np
import optax
import physicl_tpu as phys
import physicl_tpu.light as light
import physicl_tpu.newton as newton
from physicl_tpu import functional
from physicl_tpu.state import SimState

C, DT, K, N = float(light.c), 1e-3, 100, 4096
state0 = SimState.from_population(
    [], [light.generate_photon_state(N, E=1.0)])


def transmission(A):
    steps = [phys.UpdateTimeStep(lambda x: DT),
             newton.NewtonianKinematicsStep(),
             light.ScatterDeleteStep(n=1.0, A=A, implicit_capture=True)]
    out = functional.scan_steps(steps, state0, K)
    return jnp.sum(out.w * out.alive) / N


# ---- 1: exact gradients vs the closed form ----
# w_K = (1 - p)^K with p = A n c dt  =>  dT/dA = -K c dt (1-p)^(K-1)
ps = np.linspace(0.002, 0.03, 12)
As = jnp.asarray(ps / (C * DT), jnp.float32)
T = jax.vmap(transmission)(As)
dT = jax.vmap(jax.grad(transmission))(As)
T_exact = (1 - ps) ** K
dT_exact = -K * C * DT * (1 - ps) ** (K - 1)
err_T = np.abs(np.asarray(T) - T_exact).max()
err_g = np.abs((np.asarray(dT) - dT_exact) / dT_exact).max()
print(f"transmission matches (1-p)^K to {err_T:.2e}; "
      f"autodiff dT/dA matches the closed form to {err_g:.2e} relative")
assert err_T < 1e-4 and err_g < 1e-3

# ---- 2: calibrate the shield to a 5% design transmission ----
T_target = 0.05


def loss(logA):  # log-space residual: nearly linear in logA
    return (jnp.log(transmission(jnp.exp(logA) / (C * DT)))
            - jnp.log(T_target)) ** 2


opt = optax.adam(0.2)
logA = jnp.log(jnp.float32(0.001))
opt_state = opt.init(logA)
vg = jax.jit(jax.value_and_grad(loss))
trail = []
for i in range(100):
    L, g = vg(logA)
    trail.append((float(jnp.exp(logA)), float(L)))
    upd, opt_state = opt.update(g, opt_state)
    logA = optax.apply_updates(logA, upd)
p_fit = float(jnp.exp(logA))
T_fit = float(transmission(jnp.exp(logA) / (C * DT)))
p_exact = 1.0 - T_target ** (1.0 / K)
print(f"calibrated p = {p_fit:.5f} (exact {p_exact:.5f}); "
      f"transmission {T_fit:.4f} vs target {T_target}")
assert abs(T_fit - T_target) < 0.002
'''

CELL1 = '''\
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, 3, figsize=(13, 3.8))

ax = axes[0]
ax.plot(ps, T_exact, "k-", lw=1.0, label=r"$(1-p)^K$ exact")
ax.plot(ps, np.asarray(T), "o", ms=4, mfc="none", label="scan_steps")
ax.set_xlabel("per-step absorption p"); ax.set_ylabel("transmission")
ax.set_title("forward model"); ax.legend(fontsize=8)

ax = axes[1]
ax.plot(ps, dT_exact, "k-", lw=1.0, label="closed form")
ax.plot(ps, np.asarray(dT), "o", ms=4, mfc="none", label="jax.grad")
ax.set_xlabel("per-step absorption p"); ax.set_ylabel(r"$dT/dA$")
ax.set_title("exact transport gradients"); ax.legend(fontsize=8)

ax = axes[2]
tr = np.array(trail)
ax.semilogy(np.maximum(tr[:, 1], 1e-12), lw=1.0)
ax.axhline(1e-6, color="crimson", ls="--", lw=0.8)
ax.set_xlabel("optax.adam iteration"); ax.set_ylabel("log-residual loss")
ax.set_title(f"calibration: p -> {p_fit:.4f} (exact {p_exact:.4f})")

plt.tight_layout(); plt.savefig("differentiable_transport.png", dpi=110)
plt.show()
print("differentiable-transport demo OK")
'''


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_code_cell(x) for x in (CELL0, CELL1)]
    ep = ExecutePreprocessor(timeout=3600)
    ep.preprocess(nb, {"metadata": {"path": HERE}})
    out = os.path.join(HERE, "differentiable_transport.ipynb")
    from _nbbuild import write_executed
    write_executed(nb, out)


if __name__ == "__main__":
    sys.exit(main())
