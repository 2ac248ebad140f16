"""Newtonian kinematics (reference: physicl/newton.py:3-16).

The reference updates every object with a per-object Python loop
(``obj.dr = obj.v * sim.dt; obj.r += obj.dr``). Here the whole population
advances in one fused elementwise transform over the ``(3, C)`` SoA arrays —
a single VPU pass, no interpreter work, no host transfers.
"""

from __future__ import annotations

from physicl_tpu.engine import Step, StepContext
from physicl_tpu.state import SimState

__all__ = ["NewtonianKinematicsStep"]


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
