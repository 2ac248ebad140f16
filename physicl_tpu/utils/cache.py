"""Persistent XLA compilation cache for fast cold starts.

The fused transport kernel costs ~10-40 s to compile; within one process the
in-memory kernel cache (ops/fused.py) absorbs repeats, but every NEW process
(scripts, notebook restarts, CI shards) pays it again. JAX's persistent
compilation cache stores serialized executables on disk keyed by HLO +
compiler version — measured 11 s -> 0.24 s for a first call in a fresh
process on the attached TPU.

The engine enables this lazily, right before the first kernel/scan compile
(constructing a ``Simulation`` has no process-global side effects), unless the
user already configured a cache dir or opted out (``PHYSICL_NO_COMPILE_CACHE=1``).
The reference has no counterpart (pyopencl caches kernel binaries per driver,
physicl/__init__.py:583-597 recompiles per process).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "physicl_tpu", "xla")


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Default location: ``~/.cache/physicl_tpu/xla`` (override with the
    ``PHYSICL_CACHE_DIR`` env var). Respects an existing user-configured
    ``jax_compilation_cache_dir``; returns the directory in effect, or None
    when disabled via ``PHYSICL_NO_COMPILE_CACHE=1``.
    """
    import jax

    if os.environ.get("PHYSICL_NO_COMPILE_CACHE") == "1":
        return None
    if jax.default_backend() == "cpu":
        # CPU executables are AOT-compiled against the build host's exact
        # ISA features; a cache dir shared across machines (home dirs on
        # network volumes, container images) can serve binaries the current
        # host can't run (XLA warns "could lead to SIGILL"). CPU compiles
        # are cheap — cache only accelerator backends.
        return None
    current = jax.config.jax_compilation_cache_dir
    if current:  # user (or a previous call) already configured one
        return current
    path = path or os.environ.get("PHYSICL_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except OSError:  # read-only home etc.: run without a persistent cache
        return None
    return path
