"""Physics model families (layer L4 in SURVEY.md's map).

The reference exposes its physics as top-level modules (``physicl.newton``,
``physicl.light``); those import paths are preserved for migration parity —
this package is the organizational home that aliases them:

* :mod:`physicl_tpu.models.newton` — Newtonian kinematics
* :mod:`physicl_tpu.models.light` — photon transport (Planck generation,
  scattering, absorption, measurements)
"""

from physicl_tpu import light, newton

__all__ = ["newton", "light"]
