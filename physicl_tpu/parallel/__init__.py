"""Multi-chip scale-out (the distribution story the reference lacks entirely —
SURVEY.md §2: single OpenCL device, no MPI/NCCL anywhere).

Particles are independent (reference README.md:11), so the framework shards
the particle axis across a 1-D device mesh (pure data parallelism over
photons); only measurement reductions and the global exit predicate cross
chips, as XLA psum collectives riding ICI.
"""

from physicl_tpu.parallel.sharding import (
    make_mesh,
    particle_sharding,
    shard_state,
    PHOTON_AXIS,
)
from physicl_tpu.parallel.distributed import (
    init_distributed,
    is_multiprocess,
    make_pod_mesh,
)

__all__ = ["make_mesh", "particle_sharding", "shard_state", "PHOTON_AXIS",
           "init_distributed", "is_multiprocess", "make_pod_mesh"]
