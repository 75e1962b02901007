"""Persistent XLA compilation cache.

This host pairs a slow CPU with a fast TPU: compiling the headline UNet scan
takes tens of seconds, and the CPU-mesh dryrun/tests recompile the same
programs every process. Caching compiled executables on disk (repo-local,
gitignored) makes every surface after the first — driver dryruns, bench
re-runs, CLI invocations, the test suite — skip straight to execution.

Call :func:`enable` before the first compilation (any time before is fine;
jax applies the setting lazily). Safe to call repeatedly.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable(cache_dir: str | None = None) -> None:
    """Turn on the persistent compilation cache (idempotent).

    ``ANYV2V_COMPILE_CACHE=0`` disables; ``ANYV2V_COMPILE_CACHE=<dir>``
    overrides the location.
    """
    env = os.environ.get("ANYV2V_COMPILE_CACHE", "")
    if env == "0":
        return
    if cache_dir is None:
        cache_dir = env if env not in ("", "1") else _DEFAULT_DIR
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes real time; tiny programs stay uncached to
    # bound directory growth
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
