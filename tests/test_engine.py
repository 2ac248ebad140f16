"""Engine behavior tests: step ordering, lifecycle, exit predicates, polling."""

import numpy as np
import pytest

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light
from physicl_tpu.engine import Step, StepContext


class _MarkerStep(Step):
    """Records its own tag each iteration so run order is observable."""

    def __init__(self, tag, sink):
        self.tag = tag
        self.sink = sink

    def setup(self, sim):
        self.sink.append(("setup", self.tag))


def test_add_step_duplicate_index_raises():
    s = phys.Simulation(exit=lambda v: v.t >= 0.001)
    s.add_step(0, phys.UpdateTimeStep(lambda x: 0.001))
    with pytest.raises(phys.IndexException):
        s.add_step(0, phys.UpdateTimeStep(lambda x: 0.001))


def test_remove_step_while_not_running():
    s = phys.Simulation()
    s.add_step(0, phys.UpdateTimeStep(lambda x: 0.001))
    s.remove_step(0)
    assert s.steps == {}


def test_insertion_order_execution():
    # Reference semantics: steps run in INSERTION order, not index order
    # (physicl/__init__.py:514, examples/trace_ex.py:9-12). Observable here via
    # setup() call order.
    sink = []
    s = phys.Simulation(exit=lambda v: v.t >= 0.002)
    s.add_step(3, _MarkerStep(3, sink))
    s.add_step(1, _MarkerStep(1, sink))
    s.add_step(0, phys.UpdateTimeStep(lambda x: 0.001))
    s.add_obj(phys.Object())
    s.start()
    s.join()
    assert [t for kind, t in sink if kind == "setup"] == [3, 1]


def test_kinematics_advance_and_ts():
    s = phys.Simulation(exit=lambda v: v.t >= 0.0095)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    o = phys.Object(v=phys.Measurement([10.0, 0, 0], "m**1 s**-1"))
    s.add_obj(o)
    s.start()
    s.join()
    # 10 iterations of dt=1e-3 at v=10 -> r_x = 0.1
    assert len(s.ts) == 10
    objs = list(s.objects)
    assert len(objs) == 1
    assert np.isclose(float(objs[0].r[0]), 0.1, rtol=1e-5)
    assert np.isclose(float(objs[0].dr[0]), 0.01, rtol=1e-5)


def test_host_mode_exit_predicate_len_objects():
    # Reference-style predicate using len(sim.objects) — untraceable, so the
    # engine falls back to host-exact single-iteration chunks.
    s = phys.Simulation()
    s.exit = lambda x: len(x.objects) == 0
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    # absorption so strong everything dies in a few steps
    s.add_step(2, phys.light.ScatterDeleteStep(np.double(1.0), np.double(1.0)))
    for _ in range(50):
        s.add_obj(phys.light.PhotonObject(
            E=np.double(1.0),
            v=np.array([float(phys.light.c), 0, 0], dtype=np.double)))
    s.start()
    s.join()
    assert len(s.objects) == 0


def test_get_state_polling_surface():
    s = phys.Simulation(exit=lambda v: v.t >= 0.005)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_obj(phys.Object())
    s.start()
    s.join()
    st = s.get_state()
    assert set(st) == {"objects", "t", "dt", "run_time"}
    assert st["objects"] == 1
    assert st["t"] >= 0.005
    assert s.run_time > 0


def test_zero_objects_exits_immediately():
    s = phys.Simulation()  # default exit: no objects
    s.add_step(0, phys.UpdateTimeStep(lambda x: 0.001))
    s.start()
    s.join()
    assert s.ts == []


def test_device_info_surface():
    info = phys.Simulation.get_device_info()
    assert len(info) >= 1
    first = next(iter(info.values()))
    assert "platform" in first and "device_kind" in first


def test_bulk_photons_path():
    import physicl_tpu.light as light

    s = phys.Simulation(exit=lambda v: v.t >= 0.003, seed=7)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_photons(light.generate_photon_state(1000, E=1.0))
    s.start()
    s.join()
    assert len(s.objects) == 1000
    objs = s.objects
    assert np.isclose(float(objs[0].r[0]), float(light.c) * 0.003, rtol=1e-4)


def test_device_native_bulk_population():
    import jax.numpy as jnp
    import physicl_tpu.light as light

    E_dev = light.planck_sample_E(5000, 1e-20, 5e-19, 5778.0, device=True)
    assert hasattr(E_dev, "devices")  # stayed on device
    s = phys.Simulation(exit=lambda v: v.t >= 0.003, seed=7)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, phys.light.ScatterIsotropicStep(A=0.001, n=0.001))
    s.add_photons(light.generate_photon_state(5000, E=E_dev, device=True))
    s.start(); s.join()
    assert s.used_fused  # const-norm prover handles device bulks
    assert len(s.objects) == 5000
    # photons scatter, but never travel further than 3 steps at c
    r = np.asarray(s.sim_state.r)[:, :5000]
    assert np.all(np.linalg.norm(r, axis=0) <= float(light.c) * 0.003 * 1.001)
    assert np.isfinite(r).all()


def test_object_extras_carried_into_state():
    s = phys.Simulation(exit=lambda v: v.t >= 0.002, seed=0)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    o1 = phys.Object(tag=np.double(7.5), s=np.array([1.0, 2.0, 3.0]))
    o2 = phys.Object(tag=np.double(2.5))
    s.add_obj(o1); s.add_obj(o2)
    s.start(); s.join()
    assert "tag" in s.sim_state.extras and "s" in s.sim_state.extras
    objs = list(s.objects)
    assert objs[0].tag == 7.5 and objs[1].tag == 2.5
    assert np.allclose(objs[0].s, [1.0, 2.0, 3.0])


def test_eager_mode_jit_off():
    s = phys.Simulation(exit=lambda v: v.t >= 0.003, seed=0, jit_on=False)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_obj(phys.Object(v=phys.Measurement([10.0, 0, 0], "m**1 s**-1")))
    s.start(); s.join()
    assert not s.used_fused
    assert np.isclose(float(list(s.objects)[0].r[0]), 0.03, rtol=1e-5)


def test_kinematics_with_acceleration():
    s = phys.Simulation(exit=lambda v: v.t >= 0.0035, seed=0)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep(
        integrate_acceleration=True))
    o = phys.Object(a=phys.Measurement([2.0, 0, 0], "m**1 s**-2"))
    s.add_obj(o)
    s.start(); s.join()
    assert not s.used_fused  # acceleration path is generic-only
    obj = list(s.objects)[0]
    # semi-implicit Euler from rest: v_k = a*k*dt; x_k = a*dt^2*sum(1..k)
    dt, a, k = 1e-3, 2.0, 4
    assert np.isclose(float(obj.v[0]), a * k * dt, rtol=1e-5)
    assert np.isclose(float(obj.r[0]), a * dt * dt * k * (k + 1) / 2,
                      rtol=1e-4)


def _wait_chunks(s, min_iters=8, timeout=60.0):
    """Gate mid-run mutations on actual progress instead of sleeping:
    kernel caching makes repeat runs fast enough that a fixed sleep can
    race the END of the run. Polls thread liveness, not ``s.running`` —
    the flag only flips True once the run loop starts, so a
    ``running``-based loop exits instantly in the start window."""
    import time as _time

    t0 = _time.time()
    while (len(s.ts) < min_iters and s.is_alive()
           and _time.time() - t0 < timeout):
        _time.sleep(0.002)
    assert len(s.ts) >= min_iters and s.running, \
        "run finished before the mid-run event was queued"


def test_midrun_injection():
    import physicl_tpu.light as light

    # long run (many chunks) so we can inject while it runs
    s = phys.Simulation(exit=lambda v: v.t >= 0.2, seed=0, chunk_steps=8)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_photons(light.generate_photon_state(100, E=1.0))
    s.start()
    _wait_chunks(s)
    s.add_photons(light.generate_photon_state(50, E=2.0))
    s.add_obj(light.PhotonObject(
        E=np.double(3.0),
        v=np.array([float(light.c), 0, 0], dtype=np.double)))
    s.join()
    assert len(s.objects) == 151
    E = np.asarray(s.sim_state.E)
    alive = np.asarray(s.sim_state.alive)
    vals, counts = np.unique(E[alive], return_counts=True)
    assert dict(zip(vals.tolist(), counts.tolist())) == {1.0: 100, 2.0: 50,
                                                         3.0: 1}
    # injected photons moved less than originals
    r = np.asarray(s.sim_state.r)[0]
    assert r[100] < r[0]


def test_midrun_injection_grows_capacity():
    import time as _time
    import physicl_tpu.light as light

    s = phys.Simulation(exit=lambda v: v.t >= 0.2, seed=0, chunk_steps=8)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_photons(light.generate_photon_state(16000, E=1.0))
    s.start()
    _wait_chunks(s)
    s.add_photons(light.generate_photon_state(16384, E=2.0))  # overflow pad
    s.join()
    assert len(s.objects) == 16000 + 16384
    assert s.sim_state.capacity >= 32768


def test_midrun_injection_nonphoton_falls_back_from_fused():
    import time as _time
    import physicl_tpu.light as light

    s = phys.Simulation(exit=lambda v: v.t >= 0.3, seed=0, chunk_steps=8)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, phys.light.ScatterDeleteStep(np.double(1e-9), np.double(1e-9)))
    s.add_photons(light.generate_photon_state(100, E=1.0))
    s.start()
    _wait_chunks(s)
    assert s.used_fused
    # a generic (non-photon) object breaks the fused plan's invariants
    s.add_obj(phys.Object(v=phys.Measurement([5.0, 0, 0], "m**1 s**-1")))
    s.join()
    assert not s.used_fused  # engine fell back to the generic path
    objs = list(s.objects)
    assert len(objs) == 101
    # the generic object moved at its own speed, untouched by photon physics
    slow = [o for o in objs if abs(float(o.v[0]) - 5.0) < 1e-3]
    assert len(slow) == 1


def test_objects_len_includes_pending_bulk():
    import physicl_tpu.light as light

    s = phys.Simulation()
    s.add_obj(phys.Object())
    s.add_photons(light.generate_photon_state(500, E=1.0))
    assert len(s.objects) == 501
    # iteration materializes PhotonObjects from the bulk arrays
    objs = list(s.objects)
    assert len(objs) == 501
    assert float(objs[500].E) == 1.0


def test_host_mode_predicate_can_iterate_objects():
    s = phys.Simulation(seed=0)
    bound = 2.5 * float(phys.light.c) * 0.001
    s.exit = lambda sim_: all(float(o.r[0]) > bound for o in sim_.objects)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    for _ in range(3):
        s.add_obj(phys.light.PhotonObject(
            E=np.double(1.0),
            v=np.array([float(phys.light.c), 0, 0], dtype=np.double)))
    s.start(); s.join()
    # photons cross the bound after 3 steps
    assert len(s.ts) == 3


def test_checkpoint_preserves_extras(tmp_path):
    ckpt = str(tmp_path / "ck.npz")
    s = phys.Simulation(exit=lambda v: v.t >= 0.002, seed=0)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_obj(phys.Object(tag=np.double(9.0)))
    s.start(); s.join()
    s.save_checkpoint(ckpt)
    from physicl_tpu.utils.checkpoint import load_checkpoint

    state, _ = load_checkpoint(ckpt)
    assert "tag" in state.extras
    assert float(state.extras["tag"][0]) == 9.0


def test_midrun_remove_obj():
    import time as _time
    import physicl_tpu.light as light

    s = phys.Simulation(exit=lambda v: v.t >= 0.3, seed=0, chunk_steps=8,
                        auto_shrink=False)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    tagged = light.PhotonObject(
        E=np.double(42.0),
        v=np.array([float(light.c), 0, 0], dtype=np.double))
    s.add_obj(tagged)
    for _ in range(20):
        s.add_obj(light.PhotonObject(
            E=np.double(1.0),
            v=np.array([float(light.c), 0, 0], dtype=np.double)))
    s.start()
    _wait_chunks(s)
    s.remove_obj(tagged)
    s.join()
    objs = list(s.objects)
    assert len(objs) == 20
    assert all(float(o.E) == 1.0 for o in objs)


def test_midrun_remove_requires_stable_slots():
    import time as _time
    import physicl_tpu.light as light

    s = phys.Simulation(exit=lambda v: v.t >= 0.2, seed=0, chunk_steps=8)
    # default auto_shrink=True -> slots may move -> removal must refuse
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    o = light.PhotonObject(
        E=np.double(1.0),
        v=np.array([float(light.c), 0, 0], dtype=np.double))
    s.add_obj(o)
    s.start()
    _wait_chunks(s)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        s.remove_obj(o)
    s.join()


def test_prng_impl_rbg_option():
    import physicl_tpu.light as light

    s = phys.Simulation(exit=lambda v: v.t >= 0.010, seed=0, fuse="off",
                        prng_impl="rbg")
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_step(2, light.ScatterIsotropicStep(A=0.001, n=0.001))
    sign = light.ScatterSignMeasureStep(None, True)
    s.add_step(3, sign)
    s.add_photons(light.generate_photon_state(20000, E=1.0))
    s.start(); s.join()
    shares = np.array([r[2] / r[1] for r in sign.data])
    pcoll = 1e-6 * float(light.c) * 1e-3
    expect = 0.5 + 0.5 * (1 - pcoll) ** np.arange(1, len(shares) + 1)
    assert np.abs(shares - expect).max() < 0.02


def test_host_readback_under_code_scale():
    """Host-visible positions/velocities/E and sim.t must be correct under a
    non-unit code scale (readbacks wrap device values with from_code instead
    of re-applying the scale at construction)."""
    import physicl_tpu.light as light

    phys.set_code_scale("m", 0.001)  # mm code units
    light.refresh_constants()
    try:
        s = phys.Simulation(exit=lambda v: v.t >= 0.003, seed=0)
        s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        s.add_step(1, phys.newton.NewtonianKinematicsStep())
        o = phys.Object(v=phys.Measurement([10.0, 0, 0], "m**1 s**-1"))
        s.add_obj(o)
        s.start(); s.join()
        out = list(s.objects)[0]
        # 3 iterations of dt=1e-3 at 10 m/s -> 0.03 m; the m code scale is
        # 0.001, so the stored code value is 0.03 * 0.001 = 3e-5
        assert np.isclose(float(np.asarray(out.r.view(np.ndarray))[0]),
                          3e-5, rtol=1e-4), "raw code value wrong"
        assert np.isclose(float(out.r.value()[0]), 0.03, rtol=1e-4), \
            "value() must convert back to meters"
        assert np.isclose(float(out.v.value()[0]), 10.0, rtol=1e-5)
        assert np.isclose(float(s.t.value()), 0.003, rtol=1e-5)
    finally:
        phys.reset_code_scale("m")
        light.refresh_constants()


def test_host_extinction_predicate_gets_chunked_scans():
    """The reference-idiomatic host predicate ``len(x.objects) == 0`` is
    untraceable; the engine must detect it behaves as extinction and keep
    chunked scans (not drop to one host round trip per iteration)."""
    import physicl_tpu.light as light

    def run(exit_fn):
        s = phys.Simulation(exit=exit_fn, seed=7, fuse="off")
        s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
        s.add_step(1, phys.newton.NewtonianKinematicsStep())
        s.add_step(2, light.ScatterDeleteStep(n=np.double(2.0),
                                              A=np.double(2.0)))
        s.add_photons(light.generate_photon_state(2000, E=1.0))
        s.start(); s.join()
        return s

    s_host = run(lambda x: len(x.objects) == 0)
    assert s_host.chunk_used > 1, "extinction probe must enable chunking"
    assert len(s_host.objects) == 0
    # identical results to the natively traceable form of the same predicate
    s_traced = run(lambda v: v.n_objects == 0)
    assert s_host.ts == s_traced.ts


def test_host_only_predicate_still_exact():
    """A predicate that genuinely needs host values stays in chunk=1 mode."""
    import physicl_tpu.light as light

    seen = []

    def ex(x):
        # touches materialized objects -> not traceable, not extinction-shaped
        n_right = sum(1 for o in x.objects if float(o.r[0]) > 0.0025)
        seen.append(n_right)
        return n_right >= 1

    s = phys.Simulation(exit=ex, seed=0, fuse="off")
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, phys.newton.NewtonianKinematicsStep())
    s.add_obj(phys.Object(v=phys.Measurement([1.0, 0, 0], "m**1 s**-1")))
    s.start(); s.join()
    assert s.chunk_used == 1
    assert len(s.ts) == 3  # crosses 0.002 after iteration 3 (r=0.003)


def test_record_budget_auto_and_override():
    """max_record_bytes defaults to an HBM-derived budget (HBM/8 clamped to
    [256 MB, 2 GB] — a flat 2 GB default could OOM an 8 GB core; round-3
    code-review finding) and stays a plain assignable knob."""
    from physicl_tpu import engine as E

    b = E._default_record_budget()
    assert 256 << 20 <= b <= 2 << 30
    s = phys.Simulation()
    assert s.max_record_bytes == b
    s.max_record_bytes = 512 << 20
    assert s.max_record_bytes == 512 << 20
    # the clamp arithmetic itself
    for limit, want in ((8 << 30, 1 << 30), (16 << 30, 2 << 30),
                        ((1 << 30), 256 << 20), (95 << 30, 2 << 30)):
        assert max(256 << 20, min(2 << 30, limit // 8)) == want


def test_mod_floor_matches_true_mod_and_stays_in_range():
    """state.mod_floor is the context-stable wrap every boundary path
    shares (lax.rem lowers differently in while vs scan bodies — r4).
    It must agree with the true mod up to 1 ulp and NEVER leave [0, L)."""
    import jax.numpy as jnp

    from physicl_tpu.state import mod_floor

    L = np.float32(749481.1)
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.uniform(-10 * L, 10 * L, 4096).astype(np.float32),
        np.float32([0.0, L, -L, 2 * L, -2 * L, 0.5 * L, -0.5 * L,
                    np.nextafter(L, 0, dtype=np.float32),
                    np.nextafter(L, 2 * L, dtype=np.float32),
                    1e-30, -1e-30]),
    ])
    got = np.asarray(mod_floor(jnp.asarray(xs), jnp.float32(L)),
                     np.float64)
    assert (got >= 0).all() and (got < L).all()
    want = np.mod(xs.astype(np.float64), np.float64(L))
    # wrap-seam tolerance: compare as points on the circle. The f32
    # quotient-multiply rounds at the scale of the INPUT (up to 10L
    # here), so allow a few ulps of max|x|.
    d = np.abs(got - want)
    d = np.minimum(d, np.float64(L) - d)
    tol = 4 * np.finfo(np.float32).eps * np.abs(xs).max()
    assert d.max() <= tol, (d.max(), tol)
