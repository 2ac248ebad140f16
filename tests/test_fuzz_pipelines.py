"""Property fuzz: random step pipelines must agree between the fused kernel
and the generic scan path — EXACTLY for deterministic observables
(iteration counts, trace row/ts alignment, population counts when no step
can kill, emitter schedules), statistically for genuinely stochastic ones
(the PRNG streams differ). The exact assertions catch off-by-one-iteration
bugs that statistical tolerances would absorb (VERDICT r2 weak #8)."""

import numpy as np
import pytest

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light

pytestmark = pytest.mark.slow  # heavyweight tier: excluded from test-fast


def _random_pipeline(rng, fuse, seed):
    s = phys.Simulation(exit=lambda c: c.t >= 0.020, seed=seed, fuse=fuse,
                        capacity=32768)
    meta = {"emit_n": 0, "deaths": False}
    idx = 0
    s.add_step(idx, phys.UpdateTimeStep(lambda x: np.double(0.001))); idx += 1
    if rng.random() < 0.4:
        meta["emit_n"] = int(rng.integers(50, 300))
        s.add_step(idx, light.PhotonEmitterStep(
            meta["emit_n"], E=1.0,
            isotropic=bool(rng.random() < 0.5))); idx += 1
    s.add_step(idx, phys.newton.NewtonianKinematicsStep()); idx += 1
    if rng.random() < 0.7:
        pick = rng.random()
        if pick < 0.2:  # round 3: anisotropic (HG) scatter
            s.add_step(idx, light.ScatterHenyeyGreensteinStep(
                A=float(rng.uniform(2e-4, 2e-3)), n=0.001,
                g=float(rng.uniform(-0.8, 0.9))))
        elif pick < 0.4:  # round 3 late: Rayleigh dipole phase
            s.add_step(idx, light.ScatterRayleighStep(
                A=float(rng.uniform(2e-4, 2e-3)), n=0.001))
        elif pick < 0.6:  # round 3 late: Compton (energy-changing)
            s.add_step(idx, light.ScatterComptonStep(
                A=float(rng.uniform(2e-4, 2e-3)), n=0.001,
                mec2=float(rng.uniform(0.3, 3.0)),
                kn_cross_section=bool(rng.random() < 0.5),
                theta_e=(float(rng.uniform(0.001, 0.05))
                         if rng.random() < 0.5 else None)))
        elif pick < 0.75:  # round 3 cont.: user phase function
            if rng.random() < 0.5:
                import jax.numpy as jnp
                a = float(rng.uniform(-0.9, 0.9))

                def icdf(u, a=a):  # exact inverse of p(mu) = (1+a*mu)/2
                    disc = 1.0 - a * (2.0 - a - 4.0 * u)
                    return (jnp.sqrt(jnp.maximum(disc, 0.0)) - 1.0) / a

                step = light.ScatterPhaseFunctionStep(
                    A=float(rng.uniform(2e-4, 2e-3)), n=0.001,
                    cos_theta_icdf=icdf)
            else:
                mu = np.linspace(-1, 1, 101)
                step = light.ScatterPhaseFunctionStep(
                    A=float(rng.uniform(2e-4, 2e-3)), n=0.001,
                    phase_table=(mu, 1.0 + rng.random() * mu ** 2),
                    table_bins=32)
            s.add_step(idx, step)
        else:
            s.add_step(idx, light.ScatterIsotropicStep(
                A=float(rng.uniform(2e-4, 2e-3)), n=0.001,
                wavelength_dep_scattering=False))
        idx += 1
    if rng.random() < 0.6:
        pick = rng.random()
        if pick < 0.2:  # round 3 late: energy-dependent cross-section
            meta["deaths"] = True
            s.add_step(idx, light.ScatterDeleteStep(
                n=0.001, A=np.double(rng.uniform(2e-4, 1e-3)),
                A_fn="pow(fmax(E[gid], 1e-6), -1.0)"))
        elif pick < 0.4:  # round 3 late: variable density absorption
            meta["deaths"] = True
            if rng.random() < 0.5:  # r3 cont.: gather-free layered medium
                L = float(light.c) * 0.001
                k = int(rng.integers(2, 9))
                nfn = light.layered_density(
                    np.linspace(0.0, (k + 2) * L, k + 1),
                    rng.uniform(2e-4, 2e-3, k), outside=1e-4)
            else:
                nfn = "0.001 * exp(-fabs(r0[gid]) / 1e9)"
            s.add_step(idx, light.ScatterDeleteStep(
                n=0.001, A=np.double(rng.uniform(2e-4, 1e-3)),
                variable_n=True, variable_n_fn=nfn))
        elif pick < 0.6:  # round 3 final: weighted transport — pure
            # implicit capture kills NOBODY, so the exact deterministic
            # population assertion below still applies; with roulette the
            # step kills and the pipeline falls into the stochastic class
            roulette = (0.9, 1.0) if rng.random() < 0.5 else None
            if roulette is not None:
                meta["deaths"] = True
            s.add_step(idx, light.ScatterDeleteStep(
                np.double(rng.uniform(2e-4, 1e-3)), np.double(0.5),
                implicit_capture=True, roulette=roulette,
                measure_deposition=bool(rng.random() < 0.5)))
        elif pick < 0.8:  # round 3 cont.: exponential transform
            meta["deaths"] = True
            s.add_step(idx, light.ScatterDeleteStep(
                np.double(rng.uniform(2e-4, 1e-3)), np.double(0.001),
                stretch=float(rng.uniform(0.2, 0.9))))
        elif rng.random() < 0.5:  # round 3: fluorescent re-emission
            meta["deaths"] = True
            s.add_step(idx, light.ScatterDeleteStep(
                np.double(rng.uniform(2e-4, 1e-3)), np.double(0.001),
                fluorescence=(float(rng.uniform(0.2, 0.9)), 0.05),
                fluorescence_edge=0.08))
        else:
            meta["deaths"] = True
            s.add_step(idx, light.ScatterDeleteStep(
                np.double(rng.uniform(2e-4, 1e-3)), np.double(0.001)))
        idx += 1
    if rng.random() < 0.4:  # round 2: fused box boundaries
        L = float(light.c) * 0.001 * rng.uniform(2.0, 25.0)
        box = np.array([[-L, L], [-L, L], [-L, L]])
        pick = rng.random()
        if pick < 0.35:
            s.add_step(idx, physicl_tpu.newton.ReflectingBoundaryStep(box))
        elif pick < 0.65:  # round 3 final: wrap-around box
            s.add_step(idx, physicl_tpu.newton.PeriodicBoundaryStep(box))
        else:
            meta["deaths"] = True
            s.add_step(idx, physicl_tpu.newton.AbsorbingBoundaryStep(box))
        idx += 1
    if rng.random() < 0.35:  # round 2: fused user physics
        import jax.numpy as jnp
        rate = float(rng.uniform(0.002, 0.02))

        def fn(p, rate=rate):
            return {"E": p.E * jnp.float32(1.0 - 0.001),
                    "alive": p.uniform() >= rate}

        meta["deaths"] = True
        s.add_step(idx, phys.ElementwiseStep(fn)); idx += 1
    sign = light.ScatterSignMeasureStep(None, True)
    s.add_step(idx, sign); idx += 1
    loc = float(rng.uniform(0.5, 3.5)) * float(light.c) * 0.001
    cross = light.ScatterMeasureStep(None, True, [[loc, np.nan, np.nan]])
    s.add_step(idx, cross); idx += 1
    trace = None
    if rng.random() < 0.35:  # round 2 late: (strided) device tracing
        trace = light.TracePathMeasureStep(
            None, trace_every=int(rng.choice([1, 2, 4, 5])))
        s.add_step(idx, trace); idx += 1
    red = None
    if rng.random() < 0.35:  # round 2 late: fused user reductions
        red = phys.ReduceMeasureStep(
            None, lambda p: {"ones": p.E * 0.0 + 1.0}, outputs=("ones",),
            measure_n=True)
        s.add_step(idx, red); idx += 1
    spec = None
    if rng.random() < 0.35:  # round 3 final: on-device energy histograms
        spec = light.SpectrumMeasureStep(
            None, edges=np.linspace(0.0, 10.0, int(rng.integers(3, 12))),
            measure_n=True, underflow=True, overflow=True)
        s.add_step(idx, spec); idx += 1
    if rng.random() < 0.35:  # r3 cont.: spatial cell tally — full capture
        # (under/overflow; radius >= 0 never underflows edges[0] = 0), so
        # the spectrum partition assertion applies: bins + capture bins
        # cover the alive population exactly every iteration
        axis = str(rng.choice(["x", "y", "z", "r"]))
        L = float(light.c) * 0.001
        tal = light.MeshTallyStep(
            None, axis=axis,
            edges=np.linspace(0.0 if axis == "r" else -4 * L, 8 * L,
                              int(rng.integers(3, 12))),
            measure_n=True, underflow=(axis != "r"), overflow=True)
        s.add_step(idx, tal)
        meta["tally"] = tal
    meta["n0"] = int(rng.integers(3000, 8000))
    s.add_photons(light.generate_photon_state(meta["n0"], E=1.0))
    return s, sign, cross, trace, red, spec, meta


@pytest.mark.parametrize("trial", range(12))
def test_random_pipeline_fused_matches_generic(trial):
    out = {}
    for fuse in ("auto", "off"):
        rng = np.random.default_rng(1000 + trial)  # same pipeline both ways
        s, sign, cross, trace, red, spec, meta = _random_pipeline(rng, fuse,
                                                                  seed=trial)
        s.start(); s.join()
        out[fuse] = {
            "fused": s.used_fused,
            "n": np.array([r[1] for r in sign.data], float),
            "xp": np.array([r[2] for r in sign.data], float),
            "crossed": float(sum(r[2] for r in cross.data)),
            "iters": len(s.ts),
        }
        if red is not None:
            rows = np.array(red.data, dtype=float)
            # summing 1 per particle must EQUAL the alive count every
            # iteration, on both paths
            np.testing.assert_allclose(rows[:, 2], rows[:, 1], rtol=1e-5)
        if spec is not None:
            rows = np.array(spec.data, dtype=float)
            # histogram self-consistency: bins + capture bins partition the
            # alive population EXACTLY every iteration (E is covered by the
            # underflow/overflow capture whatever the physics did to it)
            np.testing.assert_allclose(rows[:, 2:].sum(axis=1), rows[:, 1],
                                       rtol=1e-5)
        if "tally" in meta:
            rows = np.array(meta["tally"].data, dtype=float)
            # cells + capture bins partition the alive population exactly
            np.testing.assert_allclose(rows[:, 2:].sum(axis=1), rows[:, 1],
                                       rtol=1e-5)
        if trace is not None:
            ts, pos, alive, _ = trace.as_arrays()
            # sampled times are exactly the global multiples of trace_every,
            # and both paths produce the identical t-row / row count
            S = trace.trace_every
            assert list(ts) == list(np.asarray(s.ts)[::S])
            assert pos.shape[0] == len(ts) and alive.shape[0] == len(ts)
            out[fuse]["trace_rows"] = pos.shape
    a, b = out["auto"], out["off"]
    assert a["iters"] == b["iters"]
    assert a.get("trace_rows") == b.get("trace_rows")
    assert not b["fused"]
    if not meta["deaths"]:
        # No step can kill: the population trajectory is DETERMINISTIC —
        # n0 plus the emitter schedule — and must be exact on both paths
        # (an off-by-one-iteration bug inside statistical tolerance would
        # pass the sqrt-bounds below; this catches it).
        expect_n = meta["n0"] + meta["emit_n"] * np.arange(
            1, a["iters"] + 1, dtype=float)
        np.testing.assert_array_equal(a["n"], expect_n)
        np.testing.assert_array_equal(b["n"], expect_n)
    elif meta["emit_n"] == 0:
        # deaths only: populations are monotone non-increasing from n0 on
        # both paths (exact structural property, stream-independent)
        for v in (a["n"], b["n"]):
            assert v[0] <= meta["n0"] and np.all(np.diff(v) <= 0)
    # Population trajectories: independent RNG streams compound binomial
    # noise, so the bound scales like sqrt(n) (plus a drift term), not a
    # fixed relative tolerance.
    hi = np.maximum(np.maximum(a["n"], b["n"]), 1)
    bound = 6 * np.sqrt(hi) + 0.02 * hi
    assert np.all(np.abs(a["n"] - b["n"]) <= bound), (a["n"], b["n"])
    # +x-share trajectories agree; share noise compounds like ~1/sqrt(n)
    big = hi > 500
    sa = a["xp"] / np.maximum(a["n"], 1)
    sb = b["xp"] / np.maximum(b["n"], 1)
    share_bound = 0.02 + 3.0 / np.sqrt(hi)
    assert np.all(np.abs(sa - sb)[big] <= share_bound[big])
    # plane-crossing totals agree within a sqrt-scaled tolerance
    if b["crossed"] > 200:
        assert (abs(a["crossed"] - b["crossed"])
                <= 6 * np.sqrt(b["crossed"]) + 0.03 * b["crossed"])


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_midrun_injection_and_removal(trial):
    """Random pipelines peppered with mid-run add_obj / add_photons /
    remove_obj events at chunk boundaries: final populations must account
    for every event exactly (no lost or duplicated slots)."""
    import time as _time

    rng = np.random.default_rng(7000 + trial)
    n0 = int(rng.integers(500, 2000))
    s = phys.Simulation(exit=lambda c: c.t >= 0.5, seed=trial,
                        chunk_steps=4, auto_shrink=False)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    if rng.random() < 0.5:  # scatter keeps the fused plan alive
        s.add_step(2, light.ScatterIsotropicStep(A=0.0005, n=0.001))
    removable = []
    for _ in range(int(rng.integers(2, 6))):
        o = light.PhotonObject(
            E=np.double(1.0),
            v=np.array([float(light.c), 0, 0], dtype=np.double))
        s.add_obj(o)
        removable.append(o)
    s.add_photons(light.generate_photon_state(n0, E=1.0))

    s.start()
    # gate on real progress (kernel caching makes fixed sleeps race the end
    # of the run); poll thread liveness — `running` is False in the start
    # window. The run is 500 iterations of 4-iter chunks, so events issued
    # in the first chunks land well before exit.
    while len(s.ts) < 4 and s.is_alive():
        _time.sleep(0.002)
    assert len(s.ts) >= 4 and s.running
    injected = 0
    removed = 0
    for _ in range(int(rng.integers(1, 4))):
        kind = rng.random()
        if kind < 0.45:
            k = int(rng.integers(10, 200))
            s.add_photons(light.generate_photon_state(k, E=2.0))
            injected += k
        elif kind < 0.9:
            o = light.PhotonObject(
                E=np.double(3.0),
                v=np.array([float(light.c), 0, 0], dtype=np.double))
            s.add_obj(o)
            injected += 1
        elif removable:
            s.remove_obj(removable.pop())
            removed += 1
        _time.sleep(0.01)
    s.join()  # natural exit at t=0.5
    # removable now holds only the never-removed objects
    expected = len(removable) + n0 + injected
    assert len(s.objects) == expected


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_charged_pipeline_fused_matches_generic(trial):
    """Random charged-particle pipelines (Boris pusher + kinematics +
    boundaries + tallies) have NO RNG: both paths are deterministic, so the
    fused kernel and generic scan must agree on iteration counts exactly,
    alive counts to the boundary-edge flip margin, and — when no boundary
    can fold trajectories — the full final phase space to f32 roundoff."""
    import jax
    import jax.numpy as jnp

    out = {}
    for fuse in ("auto", "off"):
        rng = np.random.default_rng(3000 + trial)
        n = int(rng.integers(500, 3000))
        v0 = rng.normal(size=(3, n)) * rng.uniform(0.5, 3.0)
        r0 = rng.normal(size=(3, n)) * 0.01
        qm = float(rng.uniform(-3.0, 3.0))
        E = tuple(rng.normal(size=3) * 2.0) if rng.random() < 0.7 else None
        B = None
        if rng.random() < 0.7:
            B0 = float(rng.uniform(10.0, 100.0))
            if rng.random() < 0.5:
                B = (0.0, 0.0, B0)
            else:
                def B(rx, ry, rz, B0=B0):  # mild gradient field
                    return (0.0 * rx, 0.0 * rx,
                            jnp.float32(B0) * (1.0 + rx))
        s = phys.Simulation(until_t=0.03 * 0.9999, seed=trial, fuse=fuse)
        idx = 0
        s.add_step(idx, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        idx += 1
        s.add_step(idx, physicl_tpu.newton.LorentzForceStep(
            E_field=E, B_field=B, q_over_m=qm)); idx += 1
        s.add_step(idx, physicl_tpu.newton.NewtonianKinematicsStep())
        idx += 1
        boundary = rng.random() < 0.5
        if boundary:
            L = float(rng.uniform(0.5, 3.0))
            box = np.array([[-L, L]] * 3)
            pick = rng.random()
            if pick < 0.4:
                s.add_step(idx,
                           physicl_tpu.newton.ReflectingBoundaryStep(box))
            elif pick < 0.7:
                s.add_step(idx, physicl_tpu.newton.PeriodicBoundaryStep(box))
            else:
                s.add_step(idx,
                           physicl_tpu.newton.AbsorbingBoundaryStep(box))
            idx += 1
        sign = light.ScatterSignMeasureStep(None, True)
        s.add_step(idx, sign)
        s.add_particles(physicl_tpu.newton.generate_particle_state(
            n, v=v0, r=r0))
        s.start(); s.join()
        out[fuse] = (s.used_fused, len(s.ts),
                     np.asarray(jax.device_get(s.sim_state.r))[:, :n],
                     np.asarray(jax.device_get(s.sim_state.v))[:, :n],
                     np.array(sign.data, float))
    a, b = out["auto"], out["off"]
    assert a[0] and not b[0]
    assert a[1] == b[1]          # identical iteration schedules
    # alive counts per iteration: deterministic; an f32 edge flip at a box
    # face can differ by a particle or two, never more
    np.testing.assert_allclose(a[4][:, 1], b[4][:, 1], atol=2.5)
    # sign tallies: same margin (vx compares at 0 exactly)
    np.testing.assert_allclose(a[4][:, 2:], b[4][:, 2:], atol=2.5)
    if not boundary:
        np.testing.assert_allclose(a[2], b[2], rtol=3e-5, atol=3e-6)
        np.testing.assert_allclose(a[3], b[3], rtol=3e-5, atol=3e-6)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_mixed_species_pipeline(trial):
    """Random MIXED photon+charged pipelines: photon physics (scatter /
    absorption, stochastic) rides the otype plane while the Boris push
    (deterministic) moves the charged subset. Exact cross-path assertions:
    iteration counts, charged survival and phase space (no boundary in this
    harness, so charged trajectories are untouched by the stochastic ops);
    sqrt-bounded for the photon population trajectory."""
    import jax

    c = float(light.c)
    out = {}
    for fuse in ("auto", "off"):
        rng = np.random.default_rng(5000 + trial)
        n_ph = int(rng.integers(2000, 6000))
        n_ch = int(rng.integers(16, 200))
        qm = float(rng.uniform(-2.0, 2.0))
        vch = rng.normal(size=(3, n_ch))
        s = phys.Simulation(until_t=0.02 * 0.9999, seed=trial, fuse=fuse)
        idx = 0
        s.add_step(idx, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        idx += 1
        if rng.random() < 0.8:
            s.add_step(idx, physicl_tpu.newton.LorentzForceStep(
                E_field=tuple(rng.normal(size=3)),
                B_field=(0.0, 0.0, float(rng.uniform(20.0, 150.0))),
                q_over_m=qm)); idx += 1
        s.add_step(idx, physicl_tpu.newton.NewtonianKinematicsStep())
        idx += 1
        if rng.random() < 0.7:
            s.add_step(idx, light.ScatterIsotropicStep(
                A=float(rng.uniform(2e-4, 2e-3)) / (c * 0.001), n=1.0))
            idx += 1
        kill = rng.random() < 0.7
        if kill:
            s.add_step(idx, light.ScatterDeleteStep(
                np.double(rng.uniform(2e-3, 2e-2) / (c * 0.001)),
                np.double(1.0)))
            idx += 1
        sign = light.ScatterSignMeasureStep(None, True)
        s.add_step(idx, sign)
        s.add_photons(light.generate_photon_state(n_ph, E=1.0))
        s.add_particles(physicl_tpu.newton.generate_particle_state(
            n_ch, v=vch))
        s.start(); s.join()
        st = s.sim_state
        n_tot = n_ph + n_ch  # padding slots beyond are dead otype-0
        otype = np.asarray(jax.device_get(st.otype))[:n_tot]
        ch = otype != 1
        out[fuse] = (s.used_fused, len(s.ts),
                     np.array([r[1] for r in sign.data], float),
                     np.asarray(jax.device_get(st.alive))[:n_tot][ch],
                     np.asarray(jax.device_get(st.r))[:, :n_tot][:, ch],
                     np.asarray(jax.device_get(st.v))[:, :n_tot][:, ch])
    a, b = out["auto"], out["off"]
    assert a[0] and not b[0]
    assert a[1] == b[1]
    # charged particles: never killed, and their (deterministic) phase
    # space agrees across paths to f32 roundoff
    assert a[3].all() and b[3].all()
    np.testing.assert_allclose(a[4], b[4], rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(a[5], b[5], rtol=3e-5, atol=3e-6)
    # photon+charged population trajectory: sqrt-bounded (independent RNG)
    hi = np.maximum(np.maximum(a[2], b[2]), 1)
    assert np.all(np.abs(a[2] - b[2]) <= 6 * np.sqrt(hi) + 0.02 * hi)


def test_midrun_injection_mixed_species_keeps_fused():
    """Mid-run injections of BOTH species into a running mixed fused sim:
    the otype plane dispatches per particle, so the fused plan's invariants
    survive and every injected particle is accounted for."""
    import time as _time

    import jax

    s = phys.Simulation(exit=lambda c: c.t >= 0.5, seed=1,
                        chunk_steps=4, auto_shrink=False)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, physicl_tpu.newton.LorentzForceStep(
        B_field=(0, 0, 100.0), q_over_m=1.0))
    s.add_step(2, phys.newton.NewtonianKinematicsStep())
    s.add_photons(light.generate_photon_state(1000, E=1.0))
    s.add_particles(physicl_tpu.newton.generate_particle_state(
        100, v=(1.0, 0, 0)))
    s.start()
    while len(s.ts) < 4 and s.is_alive():
        _time.sleep(0.002)
    assert len(s.ts) >= 4 and s.running
    s.add_photons(light.generate_photon_state(50, E=2.0))
    _time.sleep(0.01)
    s.add_particles(physicl_tpu.newton.generate_particle_state(
        25, v=(0.5, 0, 0)))
    _time.sleep(0.01)
    s.add_obj(physicl_tpu.newton.ChargedObject(
        q=1.0, m=1.0, v=phys.Measurement([1.0, 0, 0], "m**1 s**-1")))
    s.join()
    assert s.used_fused, s.explain_plan()  # injections kept the plan
    assert len(s.objects) == 1000 + 100 + 50 + 25 + 1
    otype = np.asarray(jax.device_get(s.sim_state.otype))
    alive = np.asarray(jax.device_get(s.sim_state.alive))
    assert (otype[alive] == 1).sum() == 1050
    assert (otype[alive] != 1).sum() == 126
