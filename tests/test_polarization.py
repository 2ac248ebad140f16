"""Polarized Rayleigh/Thomson transport: Stokes-vector physics.

Validation targets (all analytic):

* single scatter of UNPOLARIZED light: Q = (c^2-1)/(1+c^2) exactly per
  photon (c = cos of the scattering angle), U = V = 0 — the textbook
  scattering-induced polarization, 100% at 90 degrees;
* circular polarization transfer: V' = 2c/(1+c^2) for incoming V = 1;
* dipole radiation pattern for fully polarized light: the scattered
  direction never lands along the polarization axis, E[(d' . e_pol)^2]
  = 1/5 (vs 3/10 for unpolarized incident light);
* multiple scattering depolarizes: <p> decays monotonically toward 0;
* frame/metric invariants: |v| = c, pol_ref unit and perpendicular to v,
  degree of polarization <= 1.

The physics tests parametrize over BOTH execution paths — the fused Pallas
kernel (op kind "pol"; emulated jnp twin on CPU) and the generic jitted
scan — so each analytic target doubles as a fused-vs-generic differential.
"""

import numpy as np
import pytest

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light
import physicl_tpu.polarization as pol

BOTH = pytest.mark.parametrize("fuse", ["auto", "off"])


def _sim(t_end, seed=0, fuse="auto", **kw):
    s = phys.Simulation(exit=lambda c: c.t >= t_end, seed=seed, **kw)
    s.fuse = fuse
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    return s


def _always_scatter_nA():
    # pcoll = A * n * c * dt >= 1 -> every photon scatters every iteration
    c_dt = float(light.c) * 0.001
    a = np.sqrt(2.0 / c_dt)
    return np.double(a), np.double(a)


def test_polarized_state_planes_and_frames():
    """polarized_photon_state attaches unit pol_ref perpendicular to v,
    including for photons flying along z (candidate fallback)."""
    v = np.zeros((3, 4))
    v[:, 0] = [1, 0, 0]
    v[:, 1] = [0, 1, 0]
    v[:, 2] = [0, 0, 1]
    v[:, 3] = [0.6, 0.0, 0.8]
    v *= float(light.c)
    bulk = pol.polarized_photon_state(4, E=1.0, v=v, stokes=(0.3, -0.2, 0.1))
    st, pr = bulk["extras"]["stokes"], bulk["extras"]["pol_ref"]
    assert st.shape == (3, 4) and pr.shape == (3, 4)
    np.testing.assert_allclose((pr ** 2).sum(0), 1.0, rtol=1e-9)
    vhat = v / np.linalg.norm(v, axis=0)
    np.testing.assert_allclose((pr * vhat).sum(0), 0.0, atol=1e-9)
    np.testing.assert_allclose(st[0], 0.3)

    with pytest.raises(ValueError, match="<= 1"):
        pol.polarized_photon_state(4, E=1.0, stokes=(0.9, 0.9, 0.0))
    with pytest.raises(ValueError, match="parallel"):
        pol.polarized_photon_state(2, E=1.0, pol_ref=(1.0, 0.0, 0.0))
    with pytest.raises(ValueError, match="unknown option"):
        pol.ScatterPolarizedRayleighStep(g=0.5)


@BOTH
def test_single_scatter_polarization_exact(fuse):
    """One guaranteed scatter of an unpolarized +x beam: each photon's
    Q equals (c^2-1)/(1+c^2) with c = vx'/|v| (the scattering cosine),
    U = V = 0 — exact per photon, not just in distribution."""
    n, A = _always_scatter_nA()
    s = _sim(0.001, seed=7, fuse=fuse)
    s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s.add_photons(pol.polarized_photon_state(4096, E=1.0))
    s.start(); s.join()
    assert s.used_fused == (fuse == "auto")
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)
    v = np.asarray(s.sim_state.v, np.float64)
    alive = np.asarray(s.sim_state.alive)
    c = v[0, alive] / np.linalg.norm(v[:, alive], axis=0)
    q_expect = (c ** 2 - 1.0) / (1.0 + c ** 2)
    np.testing.assert_allclose(st[0, alive], q_expect, atol=2e-5)
    np.testing.assert_allclose(st[1, alive], 0.0, atol=2e-5)
    np.testing.assert_allclose(st[2, alive], 0.0, atol=2e-5)
    # 90-degree scatters are ~100% polarized perpendicular to the plane
    near_90 = np.abs(c) < 0.05
    assert near_90.any()
    assert (st[0, alive][near_90] < -0.99).all()


@BOTH
def test_single_scatter_circular_transfer_exact(fuse):
    """Incoming V = 1: after one scatter V' = c*V/I' = 2c/(1+c^2)."""
    n, A = _always_scatter_nA()
    s = _sim(0.001, seed=11, fuse=fuse)
    s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s.add_photons(pol.polarized_photon_state(4096, E=1.0,
                                             stokes=(0.0, 0.0, 1.0)))
    s.start(); s.join()
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)
    v = np.asarray(s.sim_state.v, np.float64)
    alive = np.asarray(s.sim_state.alive)
    c = v[0, alive] / np.linalg.norm(v[:, alive], axis=0)
    np.testing.assert_allclose(st[2, alive], 2 * c / (1 + c ** 2), atol=3e-5)
    np.testing.assert_allclose(st[1, alive], 0.0, atol=3e-5)


@BOTH
@pytest.mark.slow
def test_dipole_radiation_pattern(fuse):
    """Fully Q-polarized light (E-field along z): scattered directions
    follow the dipole pattern — E[(dz')^2] = 1/5, and nothing scatters
    straight along the polarization axis; unpolarized gives 3/10."""
    n, A = _always_scatter_nA()
    out = {}
    for name, st in (("pol", (1.0, 0.0, 0.0)), ("unpol", (0.0, 0.0, 0.0))):
        s = _sim(0.001, seed=13, fuse=fuse)
        s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
        # pol_ref defaults to z-hat for a +x beam: Q=1 = E-field along z
        s.add_photons(pol.polarized_photon_state(100_000, E=1.0, stokes=st))
        s.start(); s.join()
        v = np.asarray(s.sim_state.v, np.float64)
        alive = np.asarray(s.sim_state.alive)
        dz = v[2, alive] / np.linalg.norm(v[:, alive], axis=0)
        out[name] = (dz ** 2)
    assert abs(out["pol"].mean() - 0.2) < 0.01
    assert abs(out["unpol"].mean() - 0.3) < 0.01
    # dipole null: intensity ∝ 1 - dz^2 -> essentially no photons near ±z
    assert (out["pol"] > 0.99).sum() < 0.0005 * out["pol"].size


def test_multiple_scattering_invariants_and_ensemble_depolarization():
    """10 forced scatters of a fully Q=1-polarized beam.

    Sharp invariants of the Mueller algebra (verified analytically:
    I'^2 - (Q'^2+U'^2+V'^2) = c^2 (1 - p^2), so purity is conserved):

    * per-photon purity p stays EXACTLY 1 — Rayleigh scattering of a pure
      state is pure; depolarization is an ensemble effect only;
    * local-frame <Q> sits at the analytic fixed point -1/2 from the very
      first scatter (E[Q'] = ∫(c^2-1)/2 dc / ∫(1+c^2)/2 dc = -1/2
      independent of the input polarization — Q is always measured
      against the latest scattering plane);
    * |v| = c, frames unit and perpendicular to v.

    Ensemble depolarization: projecting every photon's (Q, U) into the
    common meridian frame (z-axis reference), the magnitude of the MEAN
    Stokes vector is near zero after 10 scatters.
    """
    n, A = _always_scatter_nA()
    s = _sim(0.010, seed=17)
    s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    meas = pol.StokesMeasureStep(None, measure_n=True)
    s.add_step(3, meas)
    s.add_photons(pol.polarized_photon_state(20_000, E=1.0,
                                             stokes=(1.0, 0.0, 0.0)))
    s.start(); s.join()
    assert s.used_fused  # pol + polmeas both fuse
    rows = np.array(meas.data, dtype=float)   # [t, n, p, V, Q, U]
    assert rows.shape == (10, 6)
    np.testing.assert_allclose(rows[:, 2], 1.0, atol=5e-4)   # purity
    np.testing.assert_allclose(rows[:, 3], 0.0, atol=5e-4)   # V stays 0
    np.testing.assert_allclose(rows[:, 4], -0.5, atol=0.02)  # <Q> fixed pt
    assert (rows[:, 1] == 20_000).all()

    v = np.asarray(s.sim_state.v, np.float64)
    alive = np.asarray(s.sim_state.alive)
    speed = np.linalg.norm(v[:, alive], axis=0) / float(light.c)
    np.testing.assert_allclose(speed, 1.0, atol=3e-6)
    pr = np.asarray(s.sim_state.extras["pol_ref"], np.float64)[:, alive]
    np.testing.assert_allclose((pr ** 2).sum(0), 1.0, atol=1e-5)
    vhat = v[:, alive] / np.linalg.norm(v[:, alive], axis=0)
    np.testing.assert_allclose((pr * vhat).sum(0), 0.0, atol=1e-5)
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)[:, alive]
    assert ((st ** 2).sum(0) <= 1.0 + 1e-4).all()  # few-ulp f32 drift/scatter

    # meridian-frame ensemble polarization ~ 0 after 10 scatters
    q_lab, u_lab = _to_meridian(vhat, pr, st)
    p_ens = np.sqrt(q_lab.mean() ** 2 + u_lab.mean() ** 2
                    + st[2].mean() ** 2)
    assert p_ens < 0.05, p_ens


def _to_meridian(vhat, pol_ref, stokes):
    """Rotate each photon's local-frame (Q, U) into the common meridian
    frame (e_theta in the plane of d and z-hat, e_phi = d x e_theta)."""
    zx = np.cross(np.broadcast_to([0.0, 0.0, 1.0], vhat.T.shape), vhat.T).T
    n = np.linalg.norm(zx, axis=0)
    ok = n > 1e-9  # photons flying along z have no meridian: drop them
    e_phi = zx[:, ok] / n[ok]
    d = vhat[:, ok]
    e_th = np.cross(e_phi.T, d.T).T          # e_theta = e_phi x d
    e1 = pol_ref[:, ok]
    cos_chi = (e1 * e_th).sum(0)
    sin_chi = (e1 * e_phi).sum(0)
    c2, s2 = cos_chi ** 2 - sin_chi ** 2, 2 * sin_chi * cos_chi
    q, u = stokes[0][ok], stokes[1][ok]
    return q * c2 - u * s2, q * s2 + u * c2


@pytest.mark.slow
def test_azimuth_distribution_polarized():
    """For Q=1 light the conditional azimuth density is
    (1 + r(theta) cos 2phi)/2pi: E[cos 2phi | theta] = r/2 < 0 — scattering
    avoids the polarization plane. Checked via the frame-independent
    statistic E[cos 2phi] integrated over the dipole theta marginal:
    E[r(theta)/2] = (35 - 48 ln 2)/10 ≈ -0.17348."""
    n, A = _always_scatter_nA()
    s = _sim(0.001, seed=19)
    s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s.add_photons(pol.polarized_photon_state(200_000, E=1.0,
                                             stokes=(1.0, 0.0, 0.0)))
    s.start(); s.join()
    v = np.asarray(s.sim_state.v, np.float64)
    alive = np.asarray(s.sim_state.alive)
    vhat = v[:, alive] / np.linalg.norm(v[:, alive], axis=0)
    # incoming beam +x, e1 = z, e2 = d x e1 = x x z = -y;
    # cos phi = (d'.e1)/sin, sin phi = (d'.e2)/sin -> cos 2phi from ratio
    ct = vhat[0]
    s2 = np.maximum(1 - ct ** 2, 1e-12)
    cos_p2 = vhat[2] ** 2 / s2
    cos2phi = 2 * cos_p2 - 1.0
    # E over the polarized joint: integrate (r/2 weighted by marginal
    # INCLUDING the azimuthal intensity reweighting) -> E[cos2phi] =
    # ∫ (3/8)(1+c^2) [r/2 + r^2/2... ] — empirical reference value below
    # pinned against a 1e7-sample numpy oracle of the same sampler.
    oracle = _numpy_polarized_oracle(2_000_000, q=1.0)
    assert abs(cos2phi.mean() - oracle) < 0.005


def _numpy_polarized_oracle(n, q):
    """Independent numpy implementation of the exact joint sampler for a
    Q=q beam: theta from the dipole marginal (Cardano), phi by bisection
    of the conditional CDF. Returns E[cos 2phi]."""
    rng = np.random.default_rng(123)
    u1, u2 = rng.random(n), rng.random(n)
    w = 4 * u1 - 2
    s = np.sqrt(w * w + 1)
    aa = np.cbrt(w + s)
    cmu = np.clip(aa - 1 / aa, -1, 1)
    r = (cmu ** 2 - 1) / (1 + cmu ** 2)
    a = r * q
    lo = np.zeros(n)
    hi = np.full(n, 2 * np.pi)
    tgt = u2 * 2 * np.pi
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        f = mid + 0.5 * a * np.sin(2 * mid)
        go = f < tgt
        lo = np.where(go, mid, lo)
        hi = np.where(go, hi, mid)
    return float(np.cos(lo + hi).mean())  # cos(2 * mid)


@BOTH
def test_stokes_measure_csv_and_weighted(tmp_path, fuse):
    out = tmp_path / "stokes.csv"
    n, A = _always_scatter_nA()
    s = _sim(0.002, seed=23, fuse=fuse)
    s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s.add_step(3, pol.StokesMeasureStep(str(out), weighted=True,
                                        local_qu=False))
    s.add_photons(pol.polarized_photon_state(
        1000, E=1.0, w=np.linspace(0.5, 2.0, 1000)))
    s.start(); s.join()
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 2 and len(lines[0].split(",")) == 4


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_missing_planes_is_instructive():
    n, A = _always_scatter_nA()
    s = _sim(0.001, seed=3)
    s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s.add_photons(light.generate_photon_state(64, E=1.0))
    s.start()
    with pytest.raises(ValueError, match="polarized_photon_state"):
        s.join()


def test_polarized_on_mesh_shards():
    """Stokes extras shard over the particle axis like every other plane;
    the single-scatter exactness holds on an 8-device mesh."""
    import jax
    from physicl_tpu.parallel import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n, A = _always_scatter_nA()
    s = _sim(0.001, seed=29, mesh=make_mesh(8))
    s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s.add_photons(pol.polarized_photon_state(32768, E=1.0))
    s.start(); s.join()
    assert s.used_fused  # sharded fused kernel with Stokes planes
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)
    v = np.asarray(s.sim_state.v, np.float64)
    alive = np.asarray(s.sim_state.alive)
    c = v[0, alive] / np.linalg.norm(v[:, alive], axis=0)
    np.testing.assert_allclose(st[0, alive],
                               (c ** 2 - 1) / (1 + c ** 2), atol=2e-5)


# ---------------------------------------------------------------------------
# Fused-path specifics: plan acceptance, extras writeback across chunk
# boundaries, emitter slot recycling, structured refusal, record parity.
# ---------------------------------------------------------------------------


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_fused_plan_report_and_refusal():
    """A polarized pipeline plans fused; one built without the Stokes
    planes gets the structured polarization-planes refusal (and then the
    generic path's instructive error)."""
    n, A = _always_scatter_nA()
    s = _sim(0.001, seed=31)
    s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s.add_photons(pol.polarized_photon_state(256, E=1.0))
    s.start(); s.join()
    assert s.used_fused and s.plan_report.mode == "fused"
    assert any("stokes:0" in n_ for n_ in s.plan_report.notes[1:2])

    s2 = _sim(0.001, seed=31)
    s2.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s2.add_photons(light.generate_photon_state(256, E=1.0))
    s2.start()
    with pytest.raises(ValueError, match="polarized_photon_state"):
        s2.join()
    assert any(code == "polarization-planes"
               for code, _ in s2.plan_report.refusals)


@pytest.mark.slow
def test_fused_writeback_across_chunks():
    """Stokes/frame planes mutated in-kernel are written back into
    state.extras at chunk boundaries. Sharp detector: absorption +
    auto-shrink compaction PERMUTES the arena mid-run — if the kernel's
    frame writes were lost, compaction would pair photon i's velocity with
    a stale (or another photon's) pol_ref and the frame orthogonality
    pol_ref . v == 0 would break by O(1). Also pins determinism: identical
    configs produce bitwise-identical Stokes planes."""
    n, A = _always_scatter_nA()

    def run():
        s = _sim(0.030, seed=37, chunk_steps=2)
        s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
        # 12.5% absorption per iteration: shrink fires mid-run (enough
        # chunks that the harvest mirror sees the decay despite the
        # dispatch pipeline running ahead) with ~2700 survivors at t-end
        s.add_step(3, light.ScatterDeleteStep(
            n=np.double(float(n) / 4), A=np.double(float(A) / 4)))
        s.add_photons(pol.polarized_photon_state(150_000, E=1.0,
                                                 stokes=(1.0, 0.0, 0.0)))
        s.start(); s.join()
        assert s.used_fused
        return s

    s = run()
    assert s.sim_state.capacity < 150_000  # compaction actually fired
    alive = np.asarray(s.sim_state.alive)
    assert alive.sum() > 100
    v = np.asarray(s.sim_state.v, np.float64)[:, alive]
    pr = np.asarray(s.sim_state.extras["pol_ref"], np.float64)[:, alive]
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)[:, alive]
    vhat = v / np.linalg.norm(v, axis=0)
    np.testing.assert_allclose((pr * vhat).sum(0), 0.0, atol=1e-5)
    np.testing.assert_allclose((pr ** 2).sum(0), 1.0, atol=1e-5)
    # pure states stay pure through every boundary pass
    np.testing.assert_allclose(np.sqrt((st ** 2).sum(0)), 1.0, atol=1e-4)

    s2 = run()
    np.testing.assert_array_equal(np.asarray(s.sim_state.extras["stokes"]),
                                  np.asarray(s2.sim_state.extras["stokes"]))


@BOTH
def test_emitter_resets_recycled_stokes(fuse):
    """Photons emitted into a polarized arena start unpolarized with a
    degenerate frame (zeroed extras), on both paths: slots past the initial
    population carry stokes == 0 when nothing scatters (A = 0)."""
    N = 64
    s = phys.Simulation(until_t=0.003, seed=41,
                        capacity=16384, auto_shrink=False)
    s.fuse = fuse
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, light.PhotonEmitterStep(8, E=2.0))
    s.add_step(3, pol.ScatterPolarizedRayleighStep(n=np.double(0.0),
                                                   A=np.double(0.0)))
    s.add_photons(pol.polarized_photon_state(N, E=1.0,
                                             stokes=(1.0, 0.0, 0.0)))
    s.start(); s.join()
    assert s.used_fused == (fuse == "auto")
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)
    alive = np.asarray(s.sim_state.alive)
    n_spawned = int(np.asarray(s.sim_state.n_spawned))
    assert n_spawned == N + 3 * 8
    np.testing.assert_allclose(st[0, :N], 1.0)          # originals keep Q=1
    np.testing.assert_allclose(st[:, N:n_spawned], 0.0)  # emitted: reset
    assert alive[:n_spawned].all()


def test_fused_stokes_measure_exact_parity_zero_scatter():
    """With pcoll = 0 nothing is stochastic: the fused polmeas record rows
    must match the generic path's means exactly (same beam every
    iteration)."""
    rows = {}
    for fuse in ("auto", "off"):
        s = _sim(0.004, seed=43, fuse=fuse)
        s.add_step(2, pol.ScatterPolarizedRayleighStep(n=np.double(0.0),
                                                       A=np.double(0.0)))
        meas = pol.StokesMeasureStep(None)
        s.add_step(3, meas)
        s.add_photons(pol.polarized_photon_state(
            512, E=1.0, stokes=(0.6, 0.0, 0.8),
            w=np.linspace(0.25, 1.75, 512)))
        s.start(); s.join()
        assert s.used_fused == (fuse == "auto")
        rows[fuse] = np.array(meas.data, dtype=float)
    assert rows["auto"].shape == rows["off"].shape == (4, 6)
    np.testing.assert_allclose(rows["auto"], rows["off"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(rows["auto"][:, 2], 1.0, atol=1e-6)  # p
    np.testing.assert_allclose(rows["auto"][:, 3], 0.8, atol=1e-6)  # V


def test_fused_generic_distribution_parity():
    """One guaranteed scatter of a fully Q-polarized beam: fused and
    generic paths draw from the same polarized joint (theta, phi) law.
    Compared via <cos^2 theta> (= 2/5 analytically) and the azimuth
    anisotropy <cos 2phi> — both within combined 4-sigma at 60k photons."""
    n, A = _always_scatter_nA()
    stats = {}
    for fuse in ("auto", "off"):
        s = _sim(0.001, seed=47, fuse=fuse)
        s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
        s.add_photons(pol.polarized_photon_state(60_000, E=1.0,
                                                 stokes=(1.0, 0.0, 0.0)))
        s.start(); s.join()
        v = np.asarray(s.sim_state.v, np.float64)[:, :60_000]
        d = v / np.linalg.norm(v, axis=0)
        ct = d[0]
        s2 = np.maximum(1 - ct ** 2, 1e-12)
        cos2phi = 2 * d[2] ** 2 / s2 - 1.0
        stats[fuse] = (ct.mean(), (ct ** 2).mean(), cos2phi.mean())
    for a, b, tol in zip(stats["auto"], stats["off"],
                         (0.012, 0.01, 0.012)):
        assert abs(a - b) < tol, (stats, tol)
    assert abs(stats["auto"][1] - 0.4) < 0.01


@BOTH
def test_polarized_wavelength_dependence(fuse):
    """wavelength_dep_scattering on the polarized step: the lambda^-4
    cross-section makes scatter odds scale as (E_blue/E_red)^4 on both
    paths (same physics as the scalar family's fused wl folding)."""
    import physicl_tpu.light as L

    hc = float(L.h) * float(L.c)
    # A sized so the E = 1 photons scatter with p = 0.04 per iteration
    A = 0.04 / (float(L.c) * 0.001 * (hc / 1.0) ** -4)
    s = phys.Simulation(until_t=0.005, seed=53)
    s.fuse = fuse
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, pol.ScatterPolarizedRayleighStep(
        A=A, n=1.0, wavelength_dep_scattering=True))
    N = 40_000
    E = np.ones(N); E[N // 2:] = 1.5          # "blue" photons: (1.5)^4 ~ 5x
    s.add_photons(pol.polarized_photon_state(N, E=E))
    s.start(); s.join()
    assert s.used_fused == (fuse == "auto")
    dv = np.asarray(s.sim_state.dv, np.float64)[:, :N]
    # fraction that scattered on the LAST iteration ~ per-iteration rate
    scat = (np.abs(dv) > 0).any(axis=0)
    r_red = scat[: N // 2].mean()
    r_blue = scat[N // 2:].mean()
    assert abs(r_red - 0.04) < 0.006, r_red
    assert abs(r_blue / r_red - 1.5 ** 4) < 1.2, (r_blue, r_red)


def test_polarized_composes_with_trace_and_measures():
    """One fused plan holding stream planes (TracePath), record channels
    (cross + polmeas), the writable Stokes planes, AND absorption — the
    full composition surface in a single kernel."""
    n, A = _always_scatter_nA()
    s = _sim(0.004, seed=59, chunk_steps=2)
    s.add_step(2, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s.add_step(3, physicl_tpu.light.ScatterDeleteStep(
        n=np.double(float(n) / 4), A=np.double(float(A) / 4)))
    tr = physicl_tpu.light.TracePathMeasureStep(None)
    s.add_step(4, tr)
    cm = physicl_tpu.light.ScatterMeasureStep(
        None, True, [np.array([np.nan, np.nan, 0.0])])
    s.add_step(5, cm)
    sm = pol.StokesMeasureStep(None)
    s.add_step(6, sm)
    s.add_photons(pol.polarized_photon_state(4096, E=1.0,
                                             stokes=(1.0, 0.0, 0.0)))
    s.start(); s.join()
    assert s.used_fused, s.explain_plan()
    rows = np.array(sm.data, dtype=float)
    assert rows.shape == (4, 6)
    assert (np.diff(rows[:, 1]) <= 0).all()       # absorption shrinks n
    np.testing.assert_allclose(rows[:, 2], 1.0, atol=5e-4)  # purity
    mat = np.asarray(tr.data, dtype=object)
    assert len(mat) >= 2                          # t row + traced photons
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)
    alive = np.asarray(s.sim_state.alive)
    v = np.asarray(s.sim_state.v, np.float64)
    c = v[0, alive] / np.linalg.norm(v[:, alive], axis=0)
    # survivors scattered >= 4 times; their LATEST local-frame Q obeys
    # the single-scatter law against the LAST scattering cosine only if
    # unpolarized before it — not exact here, so just pin the invariants
    assert ((st[:, alive] ** 2).sum(0) <= 1 + 1e-4).all()


@BOTH
def test_polarized_emitter(fuse):
    """PhotonEmitterStep(stokes=): in-kernel sources inject POLARIZED
    photons — emitted slots carry the configured Stokes vector with a
    unit frame perpendicular to v, on both paths; scattering then
    processes them like any polarized photon."""
    s = phys.Simulation(until_t=0.003, seed=61, capacity=16384,
                        auto_shrink=False)
    s.fuse = fuse
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, light.PhotonEmitterStep(8, E=2.0,
                                          stokes=(0.6, 0.0, 0.8)))
    s.add_step(3, pol.ScatterPolarizedRayleighStep(n=np.double(0.0),
                                                   A=np.double(0.0)))
    s.add_photons(pol.polarized_photon_state(64, E=1.0))
    s.start(); s.join()
    assert s.used_fused == (fuse == "auto")
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)
    pr = np.asarray(s.sim_state.extras["pol_ref"], np.float64)
    n_sp = int(np.asarray(s.sim_state.n_spawned))
    assert n_sp == 64 + 24
    np.testing.assert_allclose(st[0, 64:n_sp], 0.6, atol=1e-6)
    np.testing.assert_allclose(st[2, 64:n_sp], 0.8, atol=1e-6)
    # default +x emission: pol_ref projects to exactly z-hat
    np.testing.assert_allclose(pr[2, 64:n_sp], 1.0, atol=1e-6)
    np.testing.assert_allclose(pr[0, 64:n_sp], 0.0, atol=1e-6)


@BOTH
def test_polarized_emitter_isotropic_circular(fuse):
    """Isotropic sources may carry circular polarization (V is defined
    without a transverse frame); the emitted V survives and linear Q/U
    stay zero."""
    s = phys.Simulation(until_t=0.002, seed=67, capacity=16384,
                        auto_shrink=False)
    s.fuse = fuse
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, light.PhotonEmitterStep(16, E=1.0, isotropic=True,
                                          stokes=(0.0, 0.0, -0.9)))
    s.add_step(3, pol.ScatterPolarizedRayleighStep(n=np.double(0.0),
                                                   A=np.double(0.0)))
    s.add_photons(pol.polarized_photon_state(32, E=1.0))
    s.start(); s.join()
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)
    n_sp = int(np.asarray(s.sim_state.n_spawned))
    np.testing.assert_allclose(st[2, 32:n_sp], -0.9, atol=1e-6)
    np.testing.assert_allclose(st[0, 32:n_sp], 0.0, atol=1e-6)


def test_polarized_emitter_validation():
    with pytest.raises(ValueError, match="circular"):
        light.PhotonEmitterStep(8, isotropic=True, stokes=(0.5, 0, 0))
    with pytest.raises(ValueError, match="<= 1"):
        light.PhotonEmitterStep(8, stokes=(0.9, 0.9, 0.0))
    with pytest.raises(ValueError, match="pol_ref= without"):
        light.PhotonEmitterStep(8, pol_ref=(0, 0, 1))
    st = light.PhotonEmitterStep(8, stokes=(1, 0, 0),
                                 pol_ref=(1.0, 0.0, 0.0))
    with pytest.raises(ValueError, match="parallel"):
        st.setup(None)  # Q-axis parallel to the default +x direction

    # planes missing: prover refusal + generic instructive error
    s = phys.Simulation(until_t=0.001, seed=71, capacity=16384)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, light.PhotonEmitterStep(8, stokes=(1.0, 0.0, 0.0)))
    s.add_photons(light.generate_photon_state(64, E=1.0))
    s.start()
    with pytest.raises(ValueError, match="polarized_photon_state"):
        s.join()
    assert any(code == "polarization-planes"
               for code, _ in s.plan_report.refusals)


def test_polarized_emitter_feeds_polarimetry():
    """End-to-end: a continuously emitting 100%-polarized source +
    forced polarized scattering — scattered photons of the CURRENT
    iteration obey the exact single-scatter laws (per-photon Q against
    the scattering cosine), proving the emitted frame is consistent with
    the scatter frame in the same fused chunk."""
    n, A = _always_scatter_nA()
    s = phys.Simulation(until_t=0.001, seed=73, capacity=16384,
                        auto_shrink=False)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    # emitter BEFORE kinematics: emitted photons pick up dr = c*dt this
    # same iteration and scatter immediately
    s.add_step(1, light.PhotonEmitterStep(512, E=1.0,
                                          stokes=(1.0, 0.0, 0.0)))
    s.add_step(2, phys.newton.NewtonianKinematicsStep())
    s.add_step(3, pol.ScatterPolarizedRayleighStep(n=n, A=A))
    s.add_photons(pol.polarized_photon_state(64, E=1.0))
    s.start(); s.join()
    assert s.used_fused
    st = np.asarray(s.sim_state.extras["stokes"], np.float64)
    v = np.asarray(s.sim_state.v, np.float64)
    n_sp = int(np.asarray(s.sim_state.n_spawned))
    # emitted at +x fully Q-polarized along z, scattered once: the
    # azimuthal law couples Q to the frame; check purity == 1 (pure in,
    # pure out) and the frame-independent dipole <cos^2 theta... with
    # polarized input E[(d'.z)^2] = 1/5 (dipole pattern about the E-axis)
    sl = slice(64, n_sp)
    purity = np.sqrt((st[:, sl] ** 2).sum(0))
    np.testing.assert_allclose(purity, 1.0, atol=2e-5)
    d = v[:, sl] / np.linalg.norm(v[:, sl], axis=0)
    assert abs((d[2] ** 2).mean() - 0.2) < 0.02


def test_bisect_phi_sincos_vs_f64_oracle():
    """Pin the fused kernel's azimuth inversion (double-angle-carry
    bisection + half-angle extraction, ops/fused._bisect_phi_sincos)
    against an f64 oracle bisection of the same CDF
    ``F(phi) = (phi + (a/2) sin 2phi + (b/2)(1 - cos 2phi)) / 2pi``.

    Error metric is in u-SPACE (|F(phi_hat) - u|): the right measure for
    an inverse-CDF — where the pdf F' is near zero the CDF is flat and
    any phi in the flat region is an equally valid sample, so an
    angle-space comparison would reject correct answers at the Mueller
    null (|(a,b)| -> 1). Also pins the returned quadruple's internal
    consistency: unit norm and sin 2phi == 2 sin phi cos phi, which the
    downstream frame/Stokes algebra relies on."""
    import itertools

    from physicl_tpu.ops.fused import _bisect_phi_sincos

    rng = np.random.default_rng(7)
    us = np.concatenate([
        rng.random(512),
        # hit the sign-flip boundaries of the half-angle extraction
        # (phi near pi/2, pi, 3pi/2) and the interval ends
        np.array([0.0, 0.25, 0.5, 0.75, 1.0 - 2**-17, 0.249999,
                  0.250001, 0.499999, 0.500001, 0.749999, 0.750001]),
    ]).astype(np.float32)
    cases = [(0.0, 0.0), (0.3, -0.4), (-0.7, 0.2), (0.999, 0.0),
             (0.0, -0.999), (0.706, 0.706)]
    for (a, b), iters in itertools.product(cases, (17, 26)):
        af = np.float32(a)
        bf = np.float32(b)
        sp, cp, s2p, c2p = (np.asarray(x, np.float64)
                            for x in _bisect_phi_sincos(
                                jnp_asarray(us), af, bf, iters=iters))
        # internal consistency (frame algebra depends on these)
        np.testing.assert_allclose(sp * sp + cp * cp, 1.0, atol=1e-5)
        np.testing.assert_allclose(s2p, 2.0 * sp * cp, atol=2e-5)
        np.testing.assert_allclose(c2p, cp * cp - sp * sp, atol=2e-5)
        # u-space inversion error vs the f64 CDF at the returned angle
        phi = np.arctan2(sp, cp) % (2.0 * np.pi)
        f_hat = (phi + 0.5 * a * np.sin(2 * phi)
                 + 0.5 * b * (1.0 - np.cos(2 * phi))) / (2.0 * np.pi)
        err = np.abs(f_hat - us.astype(np.float64))
        err = np.minimum(err, 1.0 - err)  # u = 0 == u = 1 (periodic)
        # bisection resolution in u-space is |F'| * 2^-iters <= 2 * 2^-iters;
        # allow f32 CDF-evaluation noise on top
        assert err.max() < 2.0 * 2.0 ** -iters + 3e-6, (a, b, iters,
                                                        err.max())


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
