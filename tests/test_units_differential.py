"""Differential tests: our Measurement vs the ACTUAL reference implementation.

Runs the reference package (pyopencl stubbed out — only the units layer is
touched) side by side and fuzzes the unit algebra over random values, unit
strings and operations, asserting identical stored values, scales and
base-dimension dicts. Skipped when the reference tree is not present.
"""

import sys
import types

import numpy as np
import pytest

import physicl_tpu as phys

REF_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    import os

    if not os.path.isdir(REF_PATH):
        pytest.skip("reference tree not available")
    if "physicl" not in sys.modules:
        pycl = types.ModuleType("pyopencl")
        pycl.array = types.ModuleType("pyopencl.array")
        pycl.create_some_context = lambda *a, **k: None
        sys.modules.setdefault("pyopencl", pycl)
        sys.modules.setdefault("pyopencl.array", pycl.array)
        sys.path.insert(0, REF_PATH)
    import physicl  # noqa: F401  (the reference package)

    return sys.modules["physicl"]


# Only integer powers: the reference regex truncates fractional powers
# (physicl/__init__.py:95), a quirk we deliberately fix.
UNITS = ["m**1", "s**-2", "kg**2 m**1", "N**1", "J**1 s**1", "eV**1",
         "au**1", "min**2", "W**1 K**-1", "Pa**2", "C**1 V**1",
         "kg**1 m**1 s**-2", "Bq**3", "L**1", "t**1", "Da**1", "lm**1"]


def _stored(x):
    return np.asarray(x.view(np.ndarray), dtype=np.float64)


def test_construction_parity(ref):
    rng = np.random.default_rng(0)
    for u in UNITS:
        val = float(rng.uniform(0.1, 10))
        a = phys.Measurement(val, u)
        b = ref.Measurement(val, u)
        assert np.allclose(_stored(a), _stored(b), rtol=1e-12), u
        assert float(a.scale) == pytest.approx(float(b.scale), rel=1e-12), u
        assert a.units == b.units, u
        assert a.original_units == b.original_units, u


def test_binary_op_parity(ref):
    rng = np.random.default_rng(1)
    ops = [np.add, np.subtract, np.multiply, np.divide]
    compared = skipped = 0
    for trial in range(200):
        u1, u2 = rng.choice(UNITS, 2)
        v1, v2 = rng.uniform(0.5, 5, 2)
        op = ops[trial % len(ops)]
        try:
            b = op(ref.Measurement(v1, u1), ref.Measurement(v2, u2))
        except KeyError:
            # reference bug: its mul/div original-units merge tests membership
            # in the wrong dict (physicl/__init__.py:247-250), crashing when a
            # symbol like liter 'L' collides with the length-dimension key
            # 'L'. Our merge handles these; nothing to compare against.
            skipped += 1
            continue
        a = op(phys.Measurement(v1, u1), phys.Measurement(v2, u2))
        compared += 1
        assert np.allclose(_stored(a), _stored(b), rtol=1e-12), (u1, u2, op)
        assert float(a.scale) == pytest.approx(float(b.scale), rel=1e-12)
        assert a.units == b.units, (u1, u2, op.__name__)
    assert compared > 150, (compared, skipped)


def test_power_square_parity(ref):
    rng = np.random.default_rng(2)
    for u in UNITS:
        v = float(rng.uniform(0.5, 5))
        for fn in (lambda x: x ** 2, np.square):
            a, b = fn(phys.Measurement(v, u)), fn(ref.Measurement(v, u))
            assert np.allclose(_stored(a), _stored(b), rtol=1e-12), u
            assert a.units == b.units


def test_scalar_coercion_parity(ref):
    """Plain-number operands coerce through the first operand's unit string
    in both implementations (reference physicl/__init__.py:216)."""
    rng = np.random.default_rng(3)
    for u in UNITS:
        v, w = rng.uniform(0.5, 5, 2)
        a = phys.Measurement(v, u) + float(w)
        b = ref.Measurement(v, u) + float(w)
        assert np.allclose(_stored(a), _stored(b), rtol=1e-12), u
        a = phys.Measurement(v, u) * float(w)
        b = ref.Measurement(v, u) * float(w)
        assert np.allclose(_stored(a), _stored(b), rtol=1e-12), u


def test_code_scale_parity(ref):
    for scale in (0.001, 1000.0, 2.5):
        phys.set_code_scale("m", scale)
        ref.Measurement.set_code_scale("m", scale)
        try:
            for u in ("m**1", "N**1", "J**1", "au**1", "m**2 s**-1"):
                a = phys.Measurement(3.0, u)
                b = ref.Measurement(3.0, u)
                assert np.allclose(_stored(a), _stored(b), rtol=1e-12), (u, scale)
                assert float(a.scale) == pytest.approx(float(b.scale),
                                                       rel=1e-12)
        finally:
            phys.reset_code_scale("m")
            ref.Measurement.reset_code_scale("m")


def test_vector_and_nested_measurement_parity(ref):
    a = phys.Measurement([phys.Measurement(1, "au**1"), 0, 2.5], "m**1")
    b = ref.Measurement([ref.Measurement(1, "au**1"), 0, 2.5], "m**1")
    assert np.allclose(_stored(a), _stored(b), rtol=1e-12)
    # norm through ufuncs
    na = np.sqrt(np.sum(a * a))
    nb = np.sqrt(np.sum(b * b))
    assert np.allclose(_stored(na), _stored(nb), rtol=1e-12)
