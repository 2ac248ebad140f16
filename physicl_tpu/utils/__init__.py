"""Runtime utilities: checkpointing, profiling, fast IO."""

from physicl_tpu.utils.cache import enable_persistent_compilation_cache
from physicl_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["save_checkpoint", "load_checkpoint",
           "enable_persistent_compilation_cache"]
