"""physicl_tpu — a TPU-native particle/photon simulation framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference
OpenCL package (bcwarner/physicl): a code-units system, a generic
Simulation/Object/Step engine (re-expressed as a jit-compiled scan over
structure-of-arrays particle state resident in HBM), and a photon-transport
toolkit (Planck generation, kinematics, absorption/isotropic/wavelength-dependent
scattering, measurement steps), sharded over device meshes for scale-out.
"""

from physicl_tpu.units import (
    Measurement,
    MeasurementError,
    set_code_scale,
    reset_code_scale,
    raw_code_value,
)
from physicl_tpu.engine import (
    Step,
    UpdateTimeStep,
    MeasureStep,
    ElementwiseStep,
    ReduceMeasureStep,
    ParticleView,
    Object,
    Simulation,
    IndexException,
    StepContext,
    UntilT,
    ExtinctionExit,
    PlanReport,
)
from physicl_tpu.state import SimState
from physicl_tpu.ops.fused import clear_kernel_cache

from physicl_tpu import newton  # noqa: F401
from physicl_tpu import light  # noqa: F401
from physicl_tpu import functional  # noqa: F401

__version__ = "0.1.0"


def enable_compilation_cache(directory: str = "~/.cache/physicl_tpu_xla",
                             min_compile_secs: float = 1.0) -> None:
    """Persist XLA/Mosaic compilations to disk.

    First compiles of the fused transport kernel take tens of seconds on a
    cold backend; with the cache enabled, repeat runs (same shapes/steps)
    start almost instantly. Call before the first ``Simulation.start()``.
    """
    import os

    import jax

    path = os.path.expanduser(directory)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))

__all__ = [
    "Measurement",
    "MeasurementError",
    "set_code_scale",
    "reset_code_scale",
    "raw_code_value",
    "Step",
    "UpdateTimeStep",
    "MeasureStep",
    "ElementwiseStep",
    "ReduceMeasureStep",
    "ParticleView",
    "Object",
    "Simulation",
    "IndexException",
    "StepContext",
    "UntilT",
    "ExtinctionExit",
    "PlanReport",
    "SimState",
    "clear_kernel_cache",
    "newton",
    "light",
]
