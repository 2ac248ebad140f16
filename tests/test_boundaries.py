"""Boundary-condition steps (extension: sim.bounds behavior the reference
stores but never implements)."""

import numpy as np
import pytest

import physicl_tpu as phys
import physicl_tpu.newton as newton
import physicl_tpu.light as light


def _beam_sim(step, t_end=0.005, v=10.0, **kw):
    s = phys.Simulation(exit=lambda c: c.t >= t_end, seed=0, **kw)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, newton.NewtonianKinematicsStep())
    s.add_step(2, step)
    s.add_obj(phys.Object(v=phys.Measurement([v, 0, 0], "m**1 s**-1")))
    return s


def test_absorbing_boundary_deletes_leavers():
    # particle at v=10 crosses x=0.025 between iterations 2 and 3
    s = _beam_sim(newton.AbsorbingBoundaryStep(
        np.array([[0.0, 0.025], [-1, 1], [-1, 1]])))
    s.exit = lambda c_: c_.n_objects == 0
    s.start(); s.join()
    assert len(s.ts) == 3
    assert len(s.objects) == 0


def test_absorbing_boundary_uses_sim_bounds():
    s = _beam_sim(newton.AbsorbingBoundaryStep(),
                  bounds=np.array([0.025, 1.0, 1.0]))
    s.exit = lambda c_: c_.n_objects == 0
    s.start(); s.join()
    assert len(s.objects) == 0


def test_reflecting_boundary_bounces():
    s = _beam_sim(newton.ReflectingBoundaryStep(
        np.array([[0.0, 0.025], [-1, 1], [-1, 1]])), t_end=0.004)
    s.start(); s.join()
    o = list(s.objects)[0]
    # iter1 0.01, iter2 0.02, iter3 0.03 -> reflect to 0.02 (v flips),
    # iter4 back to 0.01
    assert np.isclose(float(o.r[0]), 0.01, rtol=1e-4)
    assert np.isclose(float(o.v[0]), -10.0, rtol=1e-6)


def test_trace_as_arrays():
    s = phys.Simulation(exit=lambda c: c.t >= 0.003, seed=0)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, newton.NewtonianKinematicsStep())
    trace = light.TracePathMeasureStep(None)
    s.add_step(2, trace)
    for _ in range(4):
        s.add_obj(light.PhotonObject(
            E=np.double(1.0),
            v=np.array([float(light.c), 0, 0], dtype=np.double)))
    s.start(); s.join()
    ts, pos, alive, freq = trace.as_arrays()
    assert pos.shape[0] == 3 and alive[:, :4].all()
    # lazy matrix equals the dense data
    rows = trace.data
    assert len(rows) == 5
    assert np.isclose(rows[1][1][0], pos[0, 0, 0])


def test_reflecting_boundary_multi_width_overshoot():
    """A particle overshooting the box by more than one box width must fold
    back inside (triangle-wave fold), with the velocity sign tracking the
    parity of wall bounces."""
    # box [0, 0.025] wide 0.025; v=100 -> dr=0.1 per iter = 4 box widths
    s = _beam_sim(newton.ReflectingBoundaryStep(
        np.array([[0.0, 0.025], [-1, 1], [-1, 1]])), t_end=0.001, v=100.0)
    s.start(); s.join()
    o = list(s.objects)[0]
    x = float(o.r[0])
    assert 0.0 <= x <= 0.025, f"particle left the box: {x}"
    # r=0.1 -> y=mod(0.1, 0.05)=0.0 -> even #bounces -> v unchanged
    assert np.isclose(x, 0.0, atol=1e-6)
    assert np.isclose(float(o.v[0]), 100.0, rtol=1e-6)


def test_reflecting_boundary_odd_overshoot():
    # v=30 -> dr=0.03: y=mod(0.03,0.05)=0.03>L=0.025 -> odd -> flip
    s = _beam_sim(newton.ReflectingBoundaryStep(
        np.array([[0.0, 0.025], [-1, 1], [-1, 1]])), t_end=0.001, v=30.0)
    s.start(); s.join()
    o = list(s.objects)[0]
    assert np.isclose(float(o.r[0]), 0.02, rtol=1e-4)  # 2L - y = 0.05-0.03
    assert np.isclose(float(o.v[0]), -30.0, rtol=1e-6)


def _photon_box_sim(boundary_step, fuse, n=4096, t_end=0.005, seed=3):
    s = phys.Simulation(exit=lambda c: c.t >= t_end, seed=seed, fuse=fuse)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, newton.NewtonianKinematicsStep())
    s.add_step(2, light.ScatterIsotropicStep(A=0.001, n=0.001))
    s.add_step(3, boundary_step)
    meas = light.ScatterSignMeasureStep(None, True)
    s.add_step(4, meas)
    s.add_photons(light.generate_photon_state(n, E=1.0))
    s.start(); s.join()
    return s, meas


def test_absorbing_boundary_fuses():
    """Absorbing boundary + scatter stays on the fused path with statistics
    matching the generic scan (same seed-independent invariants)."""
    L = float(light.c) * 0.003  # box soaks up ~everything by iteration 3-4
    box = np.array([[-L, L], [-L, L], [-L, L]])
    s_f, m_f = _photon_box_sim(newton.AbsorbingBoundaryStep(box), "auto")
    assert s_f.used_fused
    s_g, m_g = _photon_box_sim(newton.AbsorbingBoundaryStep(box), "off")
    assert not s_g.used_fused
    n_f = np.array([r[1] for r in m_f.data], float)
    n_g = np.array([r[1] for r in m_g.data], float)
    # unscattered photons all exit at the same iteration; scattered ones
    # differ per RNG stream — counts agree within the scattered fraction
    assert n_f.shape == n_g.shape
    assert np.all(np.abs(n_f - n_g) <= 0.02 * 4096 + 8)


def test_reflecting_boundary_fuses_and_matches_generic():
    L = float(light.c) * 0.0025  # reflects the beam mid-run
    box = np.array([[-L, L], [-L, L], [-L, L]])
    s_f, m_f = _photon_box_sim(newton.ReflectingBoundaryStep(box), "auto")
    assert s_f.used_fused
    s_g, m_g = _photon_box_sim(newton.ReflectingBoundaryStep(box), "off")
    # +x sign counts collapse after the wall bounce on both paths (pcoll is
    # ~0.3/iter here, so ~15% have already scattered at the first measure)
    sx_f = np.array([r[2] for r in m_f.data], float)
    sx_g = np.array([r[2] for r in m_g.data], float)
    for sx in (sx_f, sx_g):
        assert 0.80 * 4096 < sx[0] <= 4096
        assert sx[-1] < 0.45 * 4096
    assert np.all(np.abs(sx_f - sx_g) <= 0.03 * 4096 + 8)
    # no photon may end outside the box on either path
    for s in (s_f, s_g):
        r = np.asarray(s.sim_state.r)[:, :4096]
        assert np.all(np.abs(r) <= L * (1 + 1e-5))


def test_reflect_before_scatter_disables_const_norm_but_fuses():
    """kin -> reflect -> scatter must still fuse, with the scatter op using
    the computed |dr| (reflection folds dr), and match the generic path."""
    L = float(light.c) * 0.0015
    box = np.array([[-L, L], [-L, L], [-L, L]])

    def build(fuse):
        s = phys.Simulation(exit=lambda c: c.t >= 0.004, seed=5, fuse=fuse)
        s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        s.add_step(1, newton.NewtonianKinematicsStep())
        s.add_step(2, newton.ReflectingBoundaryStep(box))
        s.add_step(3, light.ScatterDeleteStep(n=0.01, A=0.01))
        meas = light.ScatterMeasureStep(None, True)
        s.add_step(4, meas)
        s.add_photons(light.generate_photon_state(4096, E=1.0))
        s.start(); s.join()
        return s, meas

    s_f, m_f = build("auto")
    assert s_f.used_fused
    s_g, m_g = build("off")
    n_f = np.array([r[1] for r in m_f.data], float)
    n_g = np.array([r[1] for r in m_g.data], float)
    assert n_f.shape == n_g.shape
    assert np.all(np.abs(n_f - n_g) <= 0.03 * 4096 + 8)


def test_periodic_boundary_wraps_exactly():
    """Wrap-around box: position re-enters through the opposite face with
    velocity unchanged; exact modulo arithmetic incl. multi-box overshoot."""
    s = _beam_sim(newton.PeriodicBoundaryStep(
        np.array([[0.0, 0.025], [-1, 1], [-1, 1]])), t_end=0.012)
    s.start(); s.join()
    o = s.objects[0]
    k = len(s.ts)
    # x = mod(v * k * dt, 0.025), velocity unchanged
    expect = (10.0 * k * 1e-3) % 0.025
    np.testing.assert_allclose(float(np.asarray(o.r)[0]), expect, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o.v), [10.0, 0.0, 0.0], rtol=1e-6)


def test_periodic_boundary_fuses_and_matches_generic():
    """Photon beam in a periodic box: fused == generic positions; the
    pipeline stays fused (periodic preserves |dr| so const-norm holds)."""
    c = float(light.c)
    box = np.array([[0.0, 2.5 * c * 1e-3], [-1e9, 1e9], [-1e9, 1e9]])
    res = {}
    for fuse in ("auto", "off"):
        s = phys.Simulation(until_t=0.01, seed=0, fuse=fuse)
        s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        s.add_step(1, phys.newton.NewtonianKinematicsStep())
        s.add_step(2, newton.PeriodicBoundaryStep(box))
        s.add_step(3, light.ScatterDeleteStep(np.double(1.0),
                                              np.double(1e-12)))
        s.add_photons(light.generate_photon_state(512, E=1.0))
        s.start(); s.join()
        assert s.used_fused == (fuse == "auto")
        import jax
        res[fuse] = np.asarray(jax.device_get(s.sim_state.r))[:, :512]
    # modular-distance comparison: near a wrap seam the two execution
    # paths may differ by accumulated f32 crumbs (the while-loop generic
    # body and the kernel compile the same HLO ops to slightly different
    # roundings), which the wrap folds across the seam — positions agree
    # as points on the circle to ~1e3 ULP of the traveled distance, far
    # below any physical scale (c*dt ~ 3e5)
    L = 2.5 * c * 1e-3
    d = np.abs(res["auto"] - res["off"])
    d[0] = np.minimum(d[0] % L, L - d[0] % L)
    assert d.max() < 1.0, d.max()
    # every x position wrapped into the box
    assert (res["auto"][0] >= 0).all()
    assert (res["auto"][0] <= 2.5 * c * 1e-3 * (1 + 1e-6)).all()


# ---------------------------------------------------------------------------
# Spherical geometry (round-3 cont.): shell flux tally + absorbing sphere
# ---------------------------------------------------------------------------


def _burst_sim(fuse, n=20000, seed=0, T=0.012, **kw):
    s = phys.Simulation(until_t=T * 0.9999, seed=seed, fuse=fuse, **kw)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(1e-3)))
    s.add_step(1, newton.NewtonianKinematicsStep())
    return s


@pytest.mark.parametrize("fuse", ["auto", "off"])
def test_shell_tally_counts_isotropic_burst_once(fuse):
    """A ballistic beam from the origin crosses the shell EXACTLY once
    per photon, all at the same iteration (R/(c dt) = 4.5 -> step 5)."""
    c = float(light.c)
    R = 4.5 * c * 1e-3
    s = _burst_sim(fuse)
    shell = light.SphericalShellMeasureStep(None, radius=np.double(R))
    s.add_step(2, shell)
    s.add_photons(light.generate_photon_state(20000, E=1.0))
    s.start(); s.join()
    assert s.used_fused == (fuse == "auto")
    rows = np.array(shell.data, dtype=float)
    assert rows.shape[1] == 3  # [t, n, count]
    counts = rows[:, 2].astype(int)
    assert counts.sum() == 20000       # each photon crosses exactly once
    assert counts[4] == 20000          # ...at iteration 5
    np.testing.assert_allclose(rows[:, 1], 20000)


@pytest.mark.parametrize("fuse", ["auto", "off"])
def test_absorbing_sphere_escape(fuse):
    """AbsorbingSphereStep kills leavers right after they cross R; paired
    with a shell tally just inside, the escape flux is exact."""
    c = float(light.c)
    R = 6.5 * c * 1e-3
    s = _burst_sim(fuse, T=0.015)
    shell = light.SphericalShellMeasureStep(
        None, radius=np.double(R * 0.999))
    s.add_step(2, shell)
    s.add_step(3, newton.AbsorbingSphereStep(np.double(R)))
    s.add_photons(light.generate_photon_state(8192, E=1.0))
    s.start(); s.join()
    assert s.used_fused == (fuse == "auto")
    alive = np.asarray(s.sim_state.alive)
    assert alive.sum() == 0            # everything escaped and was killed
    counts = np.array(shell.data, dtype=float)[:, 2]
    assert counts.sum() == 8192        # tallied on the way out


def test_absorbing_sphere_kill_inside():
    """kill_inside=True: a central absorber eats inbound photons."""
    c = float(light.c)
    s = phys.Simulation(until_t=0.010 * 0.9999, seed=1)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(1e-3)))
    s.add_step(1, newton.NewtonianKinematicsStep())
    s.add_step(2, newton.AbsorbingSphereStep(
        np.double(2.0 * c * 1e-3), center=(6.0 * c * 1e-3, 0.0, 0.0),
        kill_inside=True))
    s.add_photons(light.generate_photon_state(512, E=1.0))  # +x beam
    s.start(); s.join()
    # the beam enters the absorber (centered on its path) and dies there
    assert np.asarray(s.sim_state.alive).sum() == 0


@pytest.mark.parametrize("fuse", ["auto", "off"])
def test_shell_tally_weighted(fuse):
    """weighted=True sums statistical weights over crossers."""
    c = float(light.c)
    R = 3.5 * c * 1e-3
    s = _burst_sim(fuse, T=0.006)
    shell = light.SphericalShellMeasureStep(
        None, radius=np.double(R), weighted=True)
    s.add_step(2, shell)
    s.add_photons(light.generate_photon_state(1000, E=1.0, w=0.25))
    s.start(); s.join()
    assert s.used_fused == (fuse == "auto")
    counts = np.array(shell.data, dtype=float)[:, 2]
    np.testing.assert_allclose(counts.sum(), 250.0, rtol=1e-6)


def test_sphere_validation():
    with pytest.raises(ValueError, match="positive"):
        light.SphericalShellMeasureStep(None, radius=0.0)
    with pytest.raises(ValueError, match="positive"):
        newton.AbsorbingSphereStep(-1.0)
