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

    Matches the reference exactly: position-only Euler, no acceleration
    integration (physicl/newton.py:14-16).
    """

    def apply(self, state: SimState, ctx: StepContext) -> SimState:
        dr = state.v * state.dt
        return state.replace(dr=dr, r=state.r + dr)
