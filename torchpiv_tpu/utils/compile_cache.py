"""Persistent XLA compilation cache for the production entry points.

The headline 4 MP engine graph takes minutes to compile on a cold process
(129.6 s measured over the axon tunnel, BENCH_r02).  The reference never
pays this (torch eager), so a fresh ``tpiv run`` that recompiles every time
is the single worst user-experience gap — JAX's persistent compilation
cache removes it: the second process deserializes the executable in
seconds.  Every pipeline/CLI entry point calls :func:`enable_compile_cache`
before building an engine.

Environment knobs:

* ``TORCHPIV_CACHE_DIR`` — cache directory (wins over the JAX default).
* ``JAX_COMPILATION_CACHE_DIR`` — standard JAX variable, honored if set.
* ``TORCHPIV_NO_COMPILE_CACHE=1`` — disable entirely.

Default location: ``$XDG_CACHE_HOME/torchpiv_tpu/xla`` (usually
``~/.cache/torchpiv_tpu/xla``).
"""
from __future__ import annotations

import os
from pathlib import Path

_enabled_dir: str | None = None


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "torchpiv_tpu", "xla")


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache directory in use, or None when disabled (explicitly,
    or because the directory could not be created).
    """
    global _enabled_dir
    if os.environ.get("TORCHPIV_NO_COMPILE_CACHE"):
        return None
    if cache_dir is None:
        cache_dir = (os.environ.get("TORCHPIV_CACHE_DIR")
                     or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                     or default_cache_dir())
    if _enabled_dir is not None:
        return _enabled_dir  # first caller wins; jax config is global
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
    except OSError:
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every executable: the engine graph is huge, but the small
    # helper jits (finalize chain, spline operators) also add seconds of
    # tunnel round-trips on a cold process
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    # Source-edit-proof cache keys: the Mosaic (Pallas TPU) custom-call
    # payload embeds Python traceback frames as MLIR locations, so ANY
    # line shift in a file on the trace path (even a comment added above
    # an unrelated function in pipeline.py) changed the serialized
    # module and thus the persistent-cache key — measured Aug 19: a
    # one-line insert flipped the lowered text hash, and every source
    # edit forced a full ~3-5 min remote recompile of unchanged graphs.
    # Dropping traceback frames from locations makes lowering
    # line-shift-invariant (verified: byte-identical text across the
    # same insert).  Error messages keep their Python tracebacks — this
    # only trims location METADATA inside the compiled module.
    jax.config.update("jax_traceback_in_locations_limit", 0)
    _enabled_dir = cache_dir
    return cache_dir
