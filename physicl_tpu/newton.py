"""Newtonian kinematics (reference: physicl/newton.py:3-16).

The reference updates every object with a per-object Python loop
(``obj.dr = obj.v * sim.dt; obj.r += obj.dr``). Here the whole population
advances in one fused elementwise transform over the ``(3, C)`` SoA arrays —
a single VPU pass, no interpreter work, no host transfers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from physicl_tpu.engine import Step, StepContext
from physicl_tpu.state import SimState
from physicl_tpu.units import raw_code_value

__all__ = ["NewtonianKinematicsStep", "AbsorbingBoundaryStep",
           "ReflectingBoundaryStep", "PeriodicBoundaryStep"]


class NewtonianKinematicsStep(Step):
    """Euler position update: ``dr = v * dt; r += dr`` for every object.

    Matches the reference exactly by default: position-only Euler, no
    acceleration integration (physicl/newton.py:14-16). Passing
    ``integrate_acceleration=True`` enables a semi-implicit (symplectic)
    Euler extension that also integrates ``state.a``:
    ``dv = a*dt; v += dv; dr = v*dt; r += dr`` (no reference counterpart —
    the reference stores ``a`` but never uses it).
    """

    def __init__(self, integrate_acceleration: bool = False):
        self.integrate_acceleration = integrate_acceleration

    def apply(self, state: SimState, ctx: StepContext) -> SimState:
        if self.integrate_acceleration:
            dv = state.a * state.dt
            v = state.v + dv
            dr = v * state.dt
            return state.replace(dv=dv, v=v, dr=dr, r=state.r + dr)
        dr = state.v * state.dt
        return state.replace(dr=dr, r=state.r + dr)


def _parse_bounds(bounds):
    """Accept the reference's ``sim.bounds`` 3-vector (box [0, b] per axis,
    physicl/__init__.py:412) or an explicit ((lo0,hi0),(lo1,hi1),(lo2,hi2));
    returns host (lo, hi) float64 3-vectors."""
    b = np.asarray(raw_code_value(bounds), np.float64)
    if b.shape == (3,):
        return np.zeros(3), b
    if b.shape == (3, 2):
        return b[:, 0], b[:, 1]
    raise ValueError("bounds must be (3,) or (3, 2)")


def _static_bounds(step, sim):
    """Host-side ((lo, hi) per axis) floats for the fused-plan prover."""
    lo, hi = _parse_bounds(step.bounds if step.bounds is not None
                           else sim.bounds)
    return tuple((float(lo[d]), float(hi[d])) for d in range(3))


def _bounds_arrays(bounds, dtype):
    lo, hi = _parse_bounds(bounds)
    return jnp.asarray(lo, dtype), jnp.asarray(hi, dtype)


class AbsorbingBoundaryStep(Step):
    """Deletes particles leaving the box (the behavior ``sim.bounds``
    suggests but the reference never implements — physicl/__init__.py:412
    stores it unused). ``bounds=None`` uses ``sim.bounds``."""

    def __init__(self, bounds=None):
        self.bounds = bounds
        self._sim_bounds = None

    def setup(self, sim) -> None:
        if self.bounds is None:
            self._sim_bounds = sim.bounds

    def apply(self, state: SimState, ctx: StepContext) -> SimState:
        b = self.bounds if self.bounds is not None else self._sim_bounds
        lo, hi = _bounds_arrays(b, state.r.dtype)
        inside = jnp.all((state.r >= lo[:, None]) & (state.r <= hi[:, None]),
                         axis=0)
        return state.replace(alive=state.alive & inside)


class ReflectingBoundaryStep(Step):
    """Specular reflection at the box walls: position folded back inside,
    velocity component flipped. ``bounds=None`` uses ``sim.bounds``."""

    def __init__(self, bounds=None):
        self.bounds = bounds
        self._sim_bounds = None

    def setup(self, sim) -> None:
        if self.bounds is None:
            self._sim_bounds = sim.bounds

    def apply(self, state: SimState, ctx: StepContext) -> SimState:
        b = self.bounds if self.bounds is not None else self._sim_bounds
        lo, hi = _bounds_arrays(b, state.r.dtype)
        lo, hi = lo[:, None], hi[:, None]
        # Triangle-wave fold: maps ANY overshoot (even > one box width, i.e.
        # multiple wall bounces in one dt) back inside [lo, hi]. y in [0, 2L)
        # parameterizes one full reflection period; the descending half
        # (y > L) is a position reflected an odd number of times, so the
        # velocity component flips there.
        L = hi - lo
        y = jnp.mod(state.r - lo, 2 * L)
        odd = y > L
        r = lo + jnp.where(odd, 2 * L - y, y)
        outside = (state.r > hi) | (state.r < lo)
        v = jnp.where(outside & odd, -state.v, state.v)
        r = jnp.where(outside, r, state.r)
        # keep dr consistent with the folded position (same-iteration
        # plane-crossing tests compute the segment as [r - dr, r]); the
        # straight old->folded segment approximates the multi-leg bounce path
        dr = r - (state.r - state.dr)
        return state.replace(r=r, dr=dr, v=v)


class PeriodicBoundaryStep(Step):
    """Periodic (wrap-around) box: a particle leaving through one face
    re-enters through the opposite one, velocity unchanged — the standard
    infinite-medium idealization (no reference counterpart; its ``sim.bounds``
    is stored unused, physicl/__init__.py:412). ``bounds=None`` uses
    ``sim.bounds``. Handles overshoots of any number of box lengths in one
    dt. ``dr`` is left unchanged: the wrapped segment ``[r - dr, r]`` is the
    translated image of the true path, so same-iteration plane-crossing
    tests remain valid away from the wrap seam. Fused-path op."""

    def __init__(self, bounds=None):
        self.bounds = bounds
        self._sim_bounds = None

    def setup(self, sim) -> None:
        if self.bounds is None:
            self._sim_bounds = sim.bounds

    def apply(self, state: SimState, ctx: StepContext) -> SimState:
        b = self.bounds if self.bounds is not None else self._sim_bounds
        lo, hi = _bounds_arrays(b, state.r.dtype)
        lo, hi = lo[:, None], hi[:, None]
        L = hi - lo
        r = lo + jnp.mod(state.r - lo, L)
        return state.replace(r=r)
