"""Persistent XLA compilation cache.

First compiles through the axon tunnel cost minutes; the persistent cache
makes every subsequent process reuse them.  Call ``enable()`` before the
first jit compilation.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable(cache_dir: str | Path | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    # Honor SDTK_FORCE_CPU=1 (hermetic CLI runs, CI) — the axon
    # sitecustomize pins jax_platforms=axon, so the env var JAX_PLATFORMS
    # alone cannot override it; the config update after import can.
    if os.environ.get("SDTK_FORCE_CPU", "").lower() in ("1", "true", "yes"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    path = Path(
        cache_dir
        or os.environ.get("SDTK_JAX_CACHE_DIR", os.path.expanduser("~/.cache/sdtk_tpu/jaxcache"))
    )
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
    _enabled = True
