"""Differentiable functional driver (physicl_tpu.functional.scan_steps):
pure-jax transport composing with jit/grad/vmap. The smooth observable is
implicit-capture weighted transmission — exact, draw-free, analytic:
w_k = (1 - p)^k with p = A*n*c*dt, so gradients can be pinned in closed
form (a capability with no reference counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import physicl_tpu as phys
import physicl_tpu.light as light
import physicl_tpu.newton as newton
from physicl_tpu import functional
from physicl_tpu.state import SimState

C = float(light.c)
DT = 1e-3
N = 512
K = 40


def _state(n=N):
    return SimState.from_population(
        [], [light.generate_photon_state(n, E=1.0)])


def _steps(A):
    return [phys.UpdateTimeStep(lambda x: DT),
            newton.NewtonianKinematicsStep(),
            light.ScatterDeleteStep(n=1.0, A=A, implicit_capture=True)]


def _transmission(A, state):
    out = functional.scan_steps(_steps(A), state, K)
    return jnp.sum(out.w * out.alive) / N


def test_forward_matches_analytic():
    A = 0.02 / (C * DT)   # p = 0.02 per step
    T = float(_transmission(jnp.float32(A), _state()))
    np.testing.assert_allclose(T, (1 - 0.02) ** K, rtol=1e-5)


def test_grad_matches_closed_form():
    """dT/dA = -K n c dt (1-p)^(K-1), p = A n c dt."""
    A0 = 0.015 / (C * DT)
    state = _state()
    g = float(jax.grad(_transmission)(jnp.float32(A0), state))
    p = A0 * C * DT
    expect = -K * C * DT * (1 - p) ** (K - 1)
    np.testing.assert_allclose(g, expect, rtol=1e-4)


def test_jit_and_vmap_compose():
    state = _state()
    f = jax.jit(lambda a: _transmission(a, state))
    As = jnp.asarray([0.005, 0.01, 0.02]) / (C * DT)
    Ts = jax.vmap(lambda a: _transmission(a, state))(As)
    np.testing.assert_allclose(
        np.asarray(Ts), [(1 - p) ** K for p in (0.005, 0.01, 0.02)],
        rtol=1e-5)
    np.testing.assert_allclose(float(f(As[1])), (1 - 0.01) ** K, rtol=1e-5)


def test_gradient_descent_recovers_cross_section():
    """Calibration loop: recover the cross-section that produced a
    'measured' transmission by gradient descent on the simulator."""
    state = _state()
    A_true = 0.02 / (C * DT)
    T_obs = _transmission(jnp.float32(A_true), state)

    def loss(A):
        return (_transmission(A, state) - T_obs) ** 2

    g = jax.jit(jax.grad(loss))
    A = jnp.float32(0.5 * A_true)
    lr = 0.4 * A_true / abs(float(g(A)) + 1e-30)
    for _ in range(60):
        A = A - lr * g(A)
    assert abs(float(A) - A_true) < 0.02 * A_true, (float(A), A_true)


def test_records_and_engine_parity():
    """scan_steps with record=True returns per-iteration stacked records;
    the alive-count channel matches the threaded engine run exactly (no
    stochastic steps here)."""
    import time

    def steps():
        return [phys.UpdateTimeStep(lambda x: np.double(DT)),
                newton.NewtonianKinematicsStep(),
                newton.AbsorbingBoundaryStep(
                    ((-1e9, C * DT * 10.5), (-1e9, 1e9), (-1e9, 1e9)))]

    out, recs = functional.scan_steps(steps(), _state(), K, record=True)
    ts = np.asarray(recs["s0/ts"])
    assert ts.shape == (K,)
    np.testing.assert_allclose(ts, DT * np.arange(1, K + 1), rtol=1e-5)
    # photons at +x c cross the absorbing wall at iteration 11
    alive = int(jnp.sum(out.alive))
    assert alive == 0

    s = phys.Simulation(until_t=DT * K * 0.9999, seed=0)
    for i, st in enumerate(steps()):
        s.add_step(i, st)
    s.add_photons(light.generate_photon_state(N, E=1.0))
    s.start(); s.join()
    assert int(np.asarray(jax.device_get(s.sim_state.alive)).sum()) == 0
    np.testing.assert_allclose(np.asarray(s.ts), ts, rtol=1e-6)


def test_charged_dynamics_grad():
    """Boris dynamics is smooth in q/m: differentiate the final velocity
    of a charged particle w.r.t. q_over_m under constant E."""
    state = SimState.from_population(
        [], [newton.generate_particle_state(4)])

    def vx(qm):
        steps = [phys.UpdateTimeStep(lambda x: DT),
                 newton.LorentzForceStep(E_field=(3.0, 0, 0), q_over_m=qm),
                 newton.NewtonianKinematicsStep()]
        out = functional.scan_steps(steps, state, K)
        return out.v[0, 0]

    # pure E: v_x = qm * E0 * t exactly -> dv/dqm = E0 * K * DT
    g = float(jax.grad(vx)(jnp.float32(2.0)))
    np.testing.assert_allclose(g, 3.0 * K * DT, rtol=1e-5)


def test_remat_gradients_identical():
    """jax.checkpoint rematerialization changes memory, not values: the
    remat gradient equals the plain gradient bitwise."""
    A0 = jnp.float32(0.015 / (C * DT))
    state = _state()

    def t_plain(A):
        return jnp.sum(
            functional.scan_steps(_steps(A), state, K).w) / N

    def t_remat(A):
        return jnp.sum(
            functional.scan_steps(_steps(A), state, K, remat=True).w) / N

    g0 = float(jax.grad(t_plain)(A0))
    g1 = float(jax.grad(t_remat)(A0))
    assert g0 == g1, (g0, g1)


def test_vmap_over_seeds_ensemble():
    """Uncertainty quantification in one compile: vmap scan_steps over PRNG
    keys gives independent analog-transport realizations whose survival
    spread matches binomial noise."""
    A = 0.02 / (C * DT)
    state = _state()

    def survivors(key):
        steps = [phys.UpdateTimeStep(lambda x: DT),
                 newton.NewtonianKinematicsStep(),
                 light.ScatterDeleteStep(n=1.0, A=A)]  # analog kills
        out = functional.scan_steps(steps, state, K, key=key)
        return jnp.sum(out.alive)

    keys = jax.random.split(jax.random.PRNGKey(7), 16)
    ns = np.asarray(jax.vmap(survivors)(keys), float)
    p = (1 - 0.02) ** K
    mu, sd = N * p, np.sqrt(N * p * (1 - p))
    assert ns.std() > 0              # genuinely independent realizations
    assert abs(ns.mean() - mu) < 4 * sd / np.sqrt(16)
    assert sd / 3 < ns.std() < 3 * sd


def test_functional_sim_seed_seeds_the_scan():
    """FunctionalSim(seed=N) is the default key when key= is absent
    (review finding: .seed used to be dead and silently ignored)."""
    st = _state(256)
    steps = [phys.UpdateTimeStep(lambda x: DT),
             newton.NewtonianKinematicsStep(),
             light.ScatterIsotropicStep(n=1.0, A=2.0 / C / DT)]
    out7 = functional.scan_steps(steps, st, 8,
                                 sim=functional.FunctionalSim(seed=7))
    key7 = functional.scan_steps(steps, st, 8, key=7)
    out0 = functional.scan_steps(steps, st, 8,
                                 sim=functional.FunctionalSim(seed=0))
    np.testing.assert_array_equal(np.asarray(out7.v), np.asarray(key7.v))
    assert not np.array_equal(np.asarray(out7.v), np.asarray(out0.v))
