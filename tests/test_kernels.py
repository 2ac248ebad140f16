"""Declarative kernel-bridge tests (KernelProgram / KernelStep — the
CLProgram-counterpart surface, reference physicl/__init__.py:543-664 and the
CLProgram-based ScatterDeleteStep at physicl/light.py:225-260)."""

import jax.numpy as jnp
import numpy as np
import pytest

import physicl_tpu as phys
import physicl_tpu.newton
import physicl_tpu.light as light
from physicl_tpu.kernels import KernelInput, KernelOutput, KernelProgram, KernelStep
from physicl_tpu.state import SimState


def _sim_with_photons(n=1000, vx=None):
    s = phys.Simulation(exit=lambda c: c.t >= 0.003, seed=0)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
    s.add_photons(light.generate_photon_state(n, E=1.0))
    return s


def test_kernel_program_delete_pattern():
    """Rebuild the reference's CLProgram-based absorption flagging
    (physicl/light.py:233-254) with the declarative surface."""
    n_const, A_const = 0.5, 0.5

    def body(valid, d0, d1, d2, rand, A, n):
        norm = jnp.sqrt(d0 ** 2 + d1 ** 2 + d2 ** 2)
        pcoll = A * n * norm
        return {"res": ((pcoll >= rand) & valid).astype(jnp.int32)}

    sim = _sim_with_photons(1000)
    # one kinematics iteration so dr is populated
    sim.start(); sim.join()

    prog = KernelProgram(sim, "test", body)
    prog.prep_metadata = [
        KernelInput(name="photon_check", type="obj_action",
                    code="if type(obj) != physicl.light.PhotonObject: continue"),
        KernelInput(name="d0", type="obj", obj_attr="dr[0]"),
        KernelInput(name="d1", type="obj", obj_attr="dr[1]"),
        KernelInput(name="d2", type="obj", obj_attr="dr[2]"),
        KernelInput(name="rand", type="obj_def", obj_def="np.random.random()"),
        KernelInput(name="pht", type="obj_track", obj_track="obj"),
        KernelInput(name="A", type="const", const_value=str(A_const)),
        KernelInput(name="n", type="const", const_value=str(n_const)),
    ]
    prog.output_metadata = [KernelOutput(name="res", ctype="int")]
    prog.build_kernel()
    out = prog.run()

    assert out["res"].shape[0] == sim.sim_state.capacity
    # pcoll = 0.25 * |dr| = 0.25 * c * dt  >> 1 -> every alive photon flagged
    flagged = out["res"].sum()
    assert flagged == 1000
    assert len(prog.pht) == 1000  # tracked indices


def test_kernel_program_obj_def_scaled():
    def body(valid, u, **kw):
        return {"res": u}

    prog = KernelProgram(None, "draw", body)
    prog.prep_metadata = [
        KernelInput(name="u", type="obj_def",
                    obj_def="np.random.random() * 2 * np.pi"),
    ]
    prog.output_metadata = [KernelOutput(name="res")]
    state = SimState.from_population(
        [], [light.generate_photon_state(16384, E=1.0)])
    out = prog.run(state)
    assert 0 <= out["res"].min() and out["res"].max() <= 2 * np.pi
    assert abs(out["res"].mean() - np.pi) < 0.1


def test_kernel_step_custom_physics():
    """Author custom in-loop physics without touching engine internals:
    a drag that halves vx each iteration."""

    def drag(state, ctx):
        return state.replace(v=state.v * 0.5)

    s = phys.Simulation(exit=lambda c: c.t >= 0.003, seed=0)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, KernelStep(drag, record_fn=lambda st: {
        "vmax": jnp.max(jnp.where(st.alive, st.v[0], 0.0))}))
    s.add_photons(light.generate_photon_state(100, E=1.0))
    s.start(); s.join()
    step = s.steps[1]
    vmaxs = [row["vmax"] for row in step.data]
    c0 = float(light.c)
    assert np.allclose(vmaxs, [c0 / 2, c0 / 4, c0 / 8], rtol=1e-5)


def test_kernel_program_against_running_sim_state():
    """KernelProgram.run() reads the sim's live device state mid/post run."""
    s = _sim_with_photons(500)
    s.start(); s.join()

    def body(valid, x, **kw):
        return {"maxx": jnp.max(jnp.where(valid, x, -jnp.inf)) * jnp.ones(1)}

    prog = KernelProgram(s, "peek", body)
    prog.prep_metadata = [KernelInput(name="x", type="obj", obj_attr="r[0]")]
    prog.output_metadata = [KernelOutput(name="maxx")]
    out = prog.run()
    # 3 iterations at c*dt
    assert np.isclose(out["maxx"][0], 3 * float(light.c) * 0.001, rtol=1e-4)


# --- KernelStep(elementwise=True): the fused fast path (VERDICT r3 #6) ----


def _drag_sim(N, fuse, elementwise, seed=0, record_fn=None, fn=None):
    import physicl_tpu.newton

    def drag(state, ctx):
        return state.replace(v=state.v * (1.0 - 1e-4),
                             E=state.E * (1.0 - 1e-4))

    s = phys.Simulation(until_t=0.01 * 0.9999, seed=seed, fuse=fuse)
    s.add_step(0, phys.UpdateTimeStep(lambda x: np.double(0.001)))
    s.add_step(1, physicl_tpu.newton.NewtonianKinematicsStep())
    s.add_step(2, KernelStep(fn or drag, record_fn=record_fn,
                             elementwise=elementwise))
    s.add_photons(light.generate_photon_state(N, E=1.0))
    return s


def test_elementwise_kernelstep_fuses_and_matches_generic():
    """The user's elementwise contract puts KernelStep physics on the fused
    kernel; state planes match the generic scan exactly (deterministic fn,
    no RNG)."""
    import jax

    res = {}
    for fuse in ("auto", "off"):
        s = _drag_sim(4096, fuse, elementwise=True)
        s.start(); s.join()
        assert s.used_fused == (fuse == "auto")
        st = s.sim_state
        res[fuse] = {k: np.asarray(jax.device_get(getattr(st, k)))
                     for k in ("r", "v", "E", "w")}
    for k in res["auto"]:
        np.testing.assert_array_equal(res["auto"][k], res["off"][k],
                                      err_msg=k)
    # the drag actually acted: v decayed 10 times
    c0 = float(light.c)
    np.testing.assert_allclose(res["auto"]["v"][0, :4096],
                               c0 * (1 - 1e-4) ** 10, rtol=1e-5)


def test_unflagged_kernelstep_stays_generic():
    s = _drag_sim(1024, "auto", elementwise=False)
    with pytest.warns(RuntimeWarning, match="unsupported-step"):
        s.start(); s.join()
    assert not s.used_fused
    assert any(code == "unsupported-step"
               for code, _ in s.plan_report.refusals)


def test_elementwise_kernelstep_ctx_use_refuses_with_reason():
    def needs_rng(state, ctx):
        import jax

        u = jax.random.uniform(ctx.next_key(), state.E.shape)
        return state.replace(w=state.w * u)

    s = _drag_sim(1024, "auto", elementwise=True, fn=needs_rng, seed=3)
    with pytest.warns(RuntimeWarning, match="kernelstep-ctx"):
        s.start(); s.join()
    assert not s.used_fused
    assert any(code == "kernelstep-ctx" and "p.uniform" in why
               for code, why in s.plan_report.refusals)
    # and the generic path ran it fine
    w = np.asarray(s.sim_state.w)[:1024]
    assert (w < 1.0).all()


def test_elementwise_kernelstep_record_fn_refuses():
    s = _drag_sim(1024, "auto", elementwise=True,
                  record_fn=lambda st: {"n": st.n_alive})
    with pytest.warns(RuntimeWarning, match="kernelstep-records"):
        s.start(); s.join()
    assert not s.used_fused


def test_elementwise_kernelstep_shape_change_refuses():
    def bad(state, ctx):
        return state.replace(E=state.E[: state.E.shape[0] // 2])

    s = _drag_sim(1024, "auto", elementwise=True, fn=bad)
    with pytest.warns(RuntimeWarning, match="kernelstep-"):
        s.start()
        # the fn is broken on ANY path (it halves a state plane): the probe
        # refuses the fused plan with a structured reason, and the generic
        # scan then re-raises its own trace error at join()
        with pytest.raises(TypeError):
            s.join()
    assert not s.used_fused
    assert any(code in ("kernelstep-shape", "kernelstep-trace")
               for code, _ in s.plan_report.refusals)


def _refused_kernelstep(fn, code, N=1024):
    """Build the drag sim with ``fn``, assert the plan-time probe refuses
    with ``code`` and the pipeline runs (correctly) on the generic scan."""
    s = _drag_sim(N, "auto", elementwise=True, fn=fn, seed=7)
    with pytest.warns(RuntimeWarning, match=code):
        s.start(); s.join()
    assert not s.used_fused
    assert any(c == code for c, _ in s.plan_report.refusals), \
        s.plan_report.refusals
    return s


def test_kernelstep_gather_caught_at_setup():
    """r4 VERDICT item: a cross-particle gather under elementwise=True is
    caught by the plan-time permutation probe instead of silently computing
    tile-local physics inside the fused kernel."""
    import jax.numpy as jnp

    def gathers(state, ctx):
        return state.replace(E=jnp.roll(state.E, 1))

    s = _refused_kernelstep(gathers, "kernelstep-not-elementwise")
    # the generic path executed the (legal there) roll physics
    assert float(np.asarray(s.sim_state.E)[:1024].sum()) > 0


def test_kernelstep_reduction_caught_at_setup():
    """A permutation-INVARIANT reduction (mean subtraction) passes any
    permutation test; the single-particle perturbation probe catches it."""
    import jax.numpy as jnp

    def reduces(state, ctx):
        return state.replace(E=state.E - 0.01 * jnp.mean(state.E))

    _refused_kernelstep(reduces, "kernelstep-not-elementwise")


def test_kernelstep_capacity_dependence_caught_at_setup():
    """1/N-style normalization diverges in-kernel (N would be one tile):
    the capacity-doubling probe refuses it."""
    def normed(state, ctx):
        return state.replace(w=state.w * (1.0 - 1.0 / state.capacity))

    _refused_kernelstep(normed, "kernelstep-not-elementwise")


def test_kernelstep_reads_a_refused():
    """state.a reads zeros in-kernel but real accelerations on the generic
    path (r4 ADVICE finding): the poisoned probe refuses the fuse."""
    def uses_a(state, ctx):
        return state.replace(v=state.v + state.a * state.dt)

    _refused_kernelstep(uses_a, "kernelstep-state")


def test_kernelstep_writes_extras_refused():
    """extras writes are ignored in-kernel but applied on the generic path
    (r4 ADVICE finding): detected by trip identity on the returned state."""
    def writes_extras(state, ctx):
        return state.replace(extras={"dose": state.E})

    s = _drag_sim(1024, "auto", elementwise=True, fn=writes_extras, seed=7)
    with pytest.warns(RuntimeWarning, match="kernelstep-ignored-write"):
        s.start()
        # the generic scan also rejects the carry-structure change; the
        # point of this test is the STRUCTURED refusal, not generic rescue
        with pytest.raises(TypeError):
            s.join()
    assert not s.used_fused
    assert any(c == "kernelstep-ignored-write"
               for c, _ in s.plan_report.refusals)


def test_kernelstep_writes_clock_refused():
    """t/dt writes are ignored in-kernel (the host owns the schedule) but
    applied on the generic path: the concrete probe refuses them."""
    def writes_t(state, ctx):
        return state.replace(t=state.t + state.dt)

    _refused_kernelstep(writes_t, "kernelstep-ignored-write")


def test_elementwise_kernelstep_alive_only_clears():
    """alive from the fn is AND-ed with the mask on both paths (a fused
    kernel resurrect would corrupt the emit/recycle slot accounting)."""
    def killer(state, ctx):
        import jax.numpy as jnp

        # try to set everyone alive INCLUDING dead padding slots
        return state.replace(alive=jnp.ones_like(state.alive))

    for fuse in ("auto", "off"):
        s = _drag_sim(1000, fuse, elementwise=True, fn=killer, seed=5)
        s.start(); s.join()
        assert s.used_fused == (fuse == "auto")
        assert int(np.asarray(s.sim_state.alive).sum()) == 1000


def test_elementwise_kernelstep_state_key_use_refuses():
    """Reading state.key is refused at plan time: the in-kernel facade
    has no PRNG key, so key-derived randomness would silently freeze
    (r4 code-review finding). The probe poisons key to None."""
    def keyed(state, ctx):
        import jax

        u = jax.random.uniform(state.key, state.E.shape)
        return state.replace(w=state.w * (0.5 + 0.5 * u))

    s = _drag_sim(1024, "auto", elementwise=True, fn=keyed, seed=9)
    with pytest.warns(RuntimeWarning, match="kernelstep-trace"):
        s.start(); s.join()
    assert not s.used_fused
    # and the generic path ran the key-driven physics fine
    w = np.asarray(s.sim_state.w)[:1024]
    assert (w < 1.0).all() and w.std() > 0
