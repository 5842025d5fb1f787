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
