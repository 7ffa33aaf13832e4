"""Persistent XLA compilation cache for the repo's entry points.

The 1080p whole-frame Pallas programs take minutes to compile cold on a
tunneled chip (the dominant cost of a one-shot ``bench.py`` run), while
a re-run with a warm cache replays the Mosaic/XLA binaries in seconds.
JAX ships a content-addressed persistent cache; it is off by default,
so every fresh process pays the full compile. Entry points that render
real frames (bench.py, bench_configs.py, the parity gate, the driver's
``__graft_entry__``) call :func:`enable_compile_cache` once before the
first jit.

Deliberately NOT enabled as a package import side effect: library code
should not mutate process-global jax config behind the caller's back.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(cache_dir: str = _DEFAULT_DIR) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns True if the cache was enabled. Never raises: on any
    failure (read-only filesystem, unsupported jax version) the caller
    simply keeps paying cold compiles, which is the status quo.
    """
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took meaningful compile time; the
        # whole-frame kernels are minutes, tiny glue jits are skipped
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        return True
    except Exception:
        return False
