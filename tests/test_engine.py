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
