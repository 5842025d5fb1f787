"""Multi-host runtime: pod-slice initialization + host-sharded work driver.

SURVEY.md §2.3: intra-slice collectives ride ICI automatically once the
global mesh spans hosts; DCN only carries the jax.distributed control
plane.  The recording list is sharded per host (deterministic hash), and
each host runs the standard batch pipeline on its shard — per-recording
idempotence via b3sum keys makes crash recovery free (same property the
reference's queue had, speaker-process:264-309).

Single-host processes work unchanged: ``initialize()`` is a no-op without
the coordinator env vars.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict[str, int]:
    """jax.distributed.initialize from args or SDTK_COORDINATOR /
    SDTK_NUM_PROCESSES / SDTK_PROCESS_ID env vars; no-op single-host."""
    global _initialized
    import jax

    coordinator_address = coordinator_address or os.environ.get("SDTK_COORDINATOR")
    if coordinator_address and not _initialized:
        num_processes = int(
            num_processes or os.environ.get("SDTK_NUM_PROCESSES", "1")
        )
        process_id = int(process_id or os.environ.get("SDTK_PROCESS_ID", "0"))
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_mesh(spec: str = ""):
    """Mesh over ALL devices in the slice (call after initialize())."""
    from .mesh import make_mesh

    return make_mesh(spec)


def host_work_shard(paths: list[Path | str]) -> list[Path]:
    """This host's share of the recording list (deterministic split by
    content of the path string — stable across restarts)."""
    import hashlib

    import jax

    pid, n = jax.process_index(), jax.process_count()
    out = []
    for p in paths:
        h = int.from_bytes(hashlib.md5(str(p).encode()).digest()[:4], "little")
        if h % n == pid:
            out.append(Path(p))
    return out


def process_corpus(
    directory: str | Path,
    parallel: int = 4,
    backends: list[str] | None = None,
    **kwargs: Any,
) -> dict[str, Any]:
    """Multi-host batch driver: every host processes its shard of the
    corpus with the standard queue pipeline (BASELINE.json config 4)."""
    from ..pipeline.process import find_audio_files, process_batch
    from ..store.queue import ProcessingQueue

    paths = find_audio_files(directory, recursive=True)
    mine = host_work_shard(paths)
    queue = ProcessingQueue()
    items = [it for p in mine if (it := queue.add(p, backends=backends))]
    results = process_batch(items, queue=queue, parallel=parallel, **kwargs)
    return {
        "completed": sum(1 for r in results if r.success),
        "failed": sum(1 for r in results if not r.success),
        "host_shard": len(mine),
        "corpus_total": len(paths),
    }
