"""Backend selection helper for CLI entry points.

Some TPU plugin images ignore the JAX_PLATFORMS environment variable (the
plugin registers itself regardless); `jax.config.update("jax_platforms", ...)`
before backend initialization is authoritative.  CLI mains call
`apply_platform_env()` first so `JF_PLATFORM=cpu python -m ...` works
everywhere.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    want = os.environ.get("JF_PLATFORM") or ""
    if not want:
        return
    import jax

    jax.config.update("jax_platforms", want)


_CACHE_ENABLED = False


def enable_compilation_cache(cache_dir: str = "") -> str:
    """Wire JAX's persistent compilation cache so the engine's bucket grid
    (one XLA executable per (batch, L, strategy) bucket — ~25 at the default
    grid, 20-40 s each on 7B dims) compiles once per machine instead of once
    per process.  TPU analog of the reference capturing CUDA graphs at every
    init (model_runner.py:1552-1658) — except persisted across processes.

    Opt-out with JF_COMPILE_CACHE=0.  Returns the cache dir ("" if disabled).
    """
    global _CACHE_ENABLED
    env = os.environ.get("JF_COMPILE_CACHE", "")
    if env == "0":
        return ""
    path = cache_dir or (env if env not in ("", "1") else "") or os.path.join(
        os.path.expanduser("~"), ".cache", "jacobiforcing_tpu", "xla_cache"
    )
    if _CACHE_ENABLED:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Default threshold (1s) would skip small buckets; cache everything that
    # takes >=0.2s so tiny-model tests also exercise the cache path.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax
        pass
    _CACHE_ENABLED = True
    return path
