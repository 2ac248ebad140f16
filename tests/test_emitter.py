"""In-scan photon source tests (PhotonEmitterStep — no reference counterpart)."""

import numpy as np

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light


def test_emitter_linear_growth():
    s = phys.Simulation(exit=lambda c: c.t >= 0.010, seed=0, capacity=16384)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, light.PhotonEmitterStep(100, E=2.0))
    s.add_step(2, phys.newton.NewtonianKinematicsStep())
    sign = light.ScatterSignMeasureStep(None, True)
    s.add_step(3, sign)
    s.add_photons(light.generate_photon_state(50, E=1.0))
    s.start(); s.join()
    ns = [int(r[1]) for r in sign.data]
    assert ns == [50 + 100 * (i + 1) for i in range(10)]
    assert len(s.objects) == 1050
    E = np.asarray(s.sim_state.E)
    alive = np.asarray(s.sim_state.alive)
    assert (E[alive] == 1.0).sum() == 50 and (E[alive] == 2.0).sum() == 1000


def test_emitter_stops_at_capacity():
    s = phys.Simulation(exit=lambda c: c.t >= 0.010, seed=0, capacity=16384)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, light.PhotonEmitterStep(10000, E=1.0))
    sign = light.ScatterSignMeasureStep(None, True)
    s.add_step(2, sign)
    s.add_photons(light.generate_photon_state(100, E=1.0))
    s.start(); s.join()
    # 100 + 10000 fits once; the second batch would exceed 16384 -> skipped
    assert len(s.objects) == 10100


def test_emitter_steady_state_with_absorption():
    # emission + strong absorption reach a steady population
    s = phys.Simulation(exit=lambda c: c.t >= 0.040, seed=1, capacity=65536)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, light.PhotonEmitterStep(1000, E=1.0, isotropic=True))
    s.add_step(2, phys.newton.NewtonianKinematicsStep())
    s.add_step(3, light.ScatterDeleteStep(np.double(0.001), np.double(0.001)))
    sign = light.ScatterSignMeasureStep(None, True)
    s.add_step(4, sign)
    s.add_photons(light.generate_photon_state(100, E=1.0))
    s.start(); s.join()
    ns = np.array([int(r[1]) for r in sign.data], float)
    # emitted photons face deletion the same iteration:
    # N* = (N* + emit)(1-p)  =>  N* = emit*(1-p)/p = 2335 at p = 0.2998
    p = 0.001 * 0.001 * float(light.c) * 0.001
    n_star = 1000 * (1 - p) / p
    assert abs(ns[-1] - n_star) / n_star < 0.1
    # population grows toward it monotonically-ish early on
    assert ns[0] < ns[5] < ns[-1] * 1.1


def test_emitter_sampled_energy():
    import jax

    s = phys.Simulation(exit=lambda c: c.t >= 0.002, seed=0, capacity=16384)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, light.PhotonEmitterStep(
        500, E=lambda key, k: jax.random.uniform(key, (k,)) + 5.0))
    s.add_photons(light.generate_photon_state(10, E=1.0))
    s.start(); s.join()
    E = np.asarray(s.sim_state.E)
    alive = np.asarray(s.sim_state.alive)
    sampled = E[alive][10:]
    assert len(sampled) == 1000
    assert np.all((sampled >= 5.0) & (sampled < 6.0))
    assert abs(sampled.mean() - 5.5) < 0.05


def test_emitter_fuses_with_t_exit():
    s = phys.Simulation(exit=lambda c: c.t >= 0.010, seed=0, capacity=16384)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, light.PhotonEmitterStep(100, E=2.0))
    s.add_step(2, phys.newton.NewtonianKinematicsStep())
    sign = light.ScatterSignMeasureStep(None, True)
    s.add_step(3, sign)
    s.add_photons(light.generate_photon_state(50, E=1.0))
    s.start(); s.join()
    assert s.used_fused
    ns = [int(r[1]) for r in sign.data]
    assert ns == [50 + 100 * (i + 1) for i in range(10)]
    E = np.asarray(s.sim_state.E)
    alive = np.asarray(s.sim_state.alive)
    assert (E[alive] == 2.0).sum() == 1000


def test_emitter_fused_matches_generic():
    """Emission + kinematics + absorption: fused and generic trajectories
    agree (populations per iteration within sampling error)."""
    res = {}
    for fuse in ("auto", "off"):
        s = phys.Simulation(exit=lambda c: c.t >= 0.030, seed=2,
                            capacity=65536, fuse=fuse)
        s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        s.add_step(1, light.PhotonEmitterStep(1000, E=1.0, isotropic=True))
        s.add_step(2, phys.newton.NewtonianKinematicsStep())
        s.add_step(3, light.ScatterDeleteStep(np.double(0.001),
                                              np.double(0.001)))
        sign = light.ScatterSignMeasureStep(None, True)
        s.add_step(4, sign)
        s.add_photons(light.generate_photon_state(100, E=1.0))
        s.start(); s.join()
        assert s.used_fused == (fuse == "auto")
        res[fuse] = np.array([int(r[1]) for r in sign.data], float)
    # same emission schedule, same expected decay; independent RNG streams
    # compound binomial noise, so the bound scales like sqrt(n)
    hi = np.maximum(np.maximum(res["auto"], res["off"]), 1)
    assert np.all(np.abs(res["auto"] - res["off"]) <= 6 * np.sqrt(hi)
                  + 0.02 * hi)


def test_emitter_fused_capacity_stop_matches_generic():
    counts = {}
    for fuse in ("auto", "off"):
        s = phys.Simulation(exit=lambda c: c.t >= 0.010, seed=0,
                            capacity=16384, fuse=fuse)
        s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        s.add_step(1, light.PhotonEmitterStep(10000, E=1.0))
        sign = light.ScatterSignMeasureStep(None, True)
        s.add_step(2, sign)
        s.add_photons(light.generate_photon_state(100, E=1.0))
        s.start(); s.join()
        counts[fuse] = len(s.objects)
    assert counts["auto"] == counts["off"] == 10100


def test_emitter_slot_recycling_sustains_emission():
    """Continuous source + absorption for far longer than the arena could
    hold without recycling: population must stay at the fixed point."""
    for fuse in ("auto", "off"):
        s = phys.Simulation(exit=lambda c: c.t >= 0.2, seed=0,
                            capacity=16384, fuse=fuse, chunk_steps=32)
        s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        s.add_step(1, light.PhotonEmitterStep(500, E=1.0, isotropic=True))
        s.add_step(2, phys.newton.NewtonianKinematicsStep())
        s.add_step(3, light.ScatterDeleteStep(np.double(0.001),
                                              np.double(0.001)))
        sign = light.ScatterSignMeasureStep(None, True)
        s.add_step(4, sign)
        s.add_photons(light.generate_photon_state(100, E=1.0))
        s.start(); s.join()
        assert s.used_fused == (fuse == "auto")
        # without recycling the arena (16384 slots) exhausts after ~33
        # iterations; with recycling, 200 iterations hold the fixed point
        p = 0.001 * 0.001 * float(light.c) * 0.001
        n_star = 500 * (1 - p) / p
        ns = np.array([int(r[1]) for r in sign.data], float)
        assert len(ns) == 200
        tail = ns[-50:]
        assert abs(tail.mean() - n_star) / n_star < 0.1, (fuse, tail.mean())


def test_fused_emitted_photons_have_photon_otype():
    from physicl_tpu.state import OBJ_PHOTON

    s = phys.Simulation(exit=lambda c: c.t >= 0.005, seed=0, capacity=16384)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, light.PhotonEmitterStep(100, E=2.0))
    s.add_step(2, phys.newton.NewtonianKinematicsStep())
    s.add_photons(light.generate_photon_state(50, E=1.0))
    s.start(); s.join()
    assert s.used_fused
    otype = np.asarray(s.sim_state.otype)
    alive = np.asarray(s.sim_state.alive)
    assert np.all(otype[alive] == OBJ_PHOTON)
    # materialization returns PhotonObject for emitted photons too
    objs = list(s.objects)
    assert all(type(o).__name__ == "PhotonObject" for o in objs)


def test_planck_sampler_emitter_fuses_with_spectrum_parity():
    """PhotonEmitterStep(E=PlanckSampler(...)) must keep the fused path: the
    kernel evaluates the inverse CDF on in-kernel uniforms. The emitted
    energy spectrum must match the analytic Planck curve on BOTH paths."""
    T = 5778.0
    kT = float(light.kB.value()) * T
    a, b = 0.1 * kT, 12 * kT
    sampler = light.PlanckSampler(a, b, T, bins=2000)

    spectra = {}
    for fuse in ("auto", "off"):
        s = phys.Simulation(exit=lambda c: c.t >= 0.032, seed=0,
                            capacity=65536, fuse=fuse)
        s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        s.add_step(1, light.PhotonEmitterStep(2000, E=sampler))
        s.add_step(2, phys.newton.NewtonianKinematicsStep())
        s.add_photons(light.generate_photon_state(128, E=1.0))
        s.start(); s.join()
        assert s.used_fused == (fuse == "auto")
        E = np.asarray(s.sim_state.E)
        alive = np.asarray(s.sim_state.alive)
        sampled = E[alive][128:]
        assert len(sampled) == 64000
        spectra[fuse] = sampled

    centers = None
    for fuse, sampled in spectra.items():
        hist, edges = np.histogram(sampled, bins=40, range=(a, b),
                                   density=True)
        centers = 0.5 * (edges[1:] + edges[:-1])
        analytic = np.array(
            [float(light.planck_distribution(x, T).value())
             for x in centers])
        analytic /= np.trapezoid(analytic, centers)
        # 64k samples: low-density bins carry ~6% binomial noise, so gate on
        # the meaningful part of the spectrum and allow 2 sigma + fit error
        mask = analytic > 0.10 * analytic.max()
        rel = np.abs(hist[mask] - analytic[mask]) / analytic[mask]
        assert rel.max() < 0.12, f"{fuse}: {rel.max()}"


def test_planck_sampler_icdf_matches_call():
    """The traced inverse CDF and the key-based sampler draw from the same
    distribution (shared polynomial)."""
    import jax
    import jax.numpy as jnp

    sampler = light.PlanckSampler(1e-20, 5e-19, 5778.0)
    u = jnp.linspace(0.001, 0.999, 4096, dtype=jnp.float32)
    via_icdf = np.asarray(sampler.icdf(u))
    assert np.all((via_icdf >= 1e-20) & (via_icdf <= 5e-19))
    assert np.all(np.diff(via_icdf) >= -1e-25)  # inverse CDF is monotone
    via_call = np.asarray(sampler(jax.random.PRNGKey(0), 200_000))
    # same distribution: compare quantiles
    qs = np.quantile(via_call, np.linspace(0.05, 0.95, 10))
    qs_icdf = np.asarray(sampler.icdf(
        jnp.linspace(0.05, 0.95, 10, dtype=jnp.float32)))
    assert np.allclose(qs, qs_icdf, rtol=0.02)


def test_emitter_on_charged_population_fuses_as_mixed():
    """A photon emitter on an initially pure-charged population promotes
    the plan to the mixed kernel (review finding: this used to refuse
    fusion claiming the emitter was 'an exact no-op')."""
    s = phys.Simulation(exit=lambda c: c.t >= 0.010, seed=3, capacity=8192)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, light.PhotonEmitterStep(100, E=2.0))
    s.add_step(2, phys.newton.NewtonianKinematicsStep())
    s.add_step(3, light.ScatterDeleteStep(np.double(0.0), np.double(0.0)))
    s.add_particles(phys.newton.generate_particle_state(
        50, v=(1.0, 0.0, 0.0)))
    s.start(); s.join()
    assert s.used_fused, s.explain_plan()
    from physicl_tpu.state import OBJ_PHOTON
    otype = np.asarray(s.sim_state.otype)
    alive = np.asarray(s.sim_state.alive)
    assert (alive & (otype == OBJ_PHOTON)).sum() == 1000
    assert (alive & (otype != OBJ_PHOTON)).sum() == 50
    # emitted photons move: kinematics applied to the photon subset
    E = np.asarray(s.sim_state.E)
    rx = np.asarray(s.sim_state.r)[0]
    ph = alive & (E == 2.0)
    assert ph.sum() == 1000 and np.all(np.abs(rx[ph]) > 0)
