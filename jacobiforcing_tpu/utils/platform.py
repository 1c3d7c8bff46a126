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
