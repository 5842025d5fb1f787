"""Batch orchestrator: discovery → queue → per-recording pipeline.

Port of reference ``speaker-process``: audio discovery (:130-149), the
persistent queue (store.queue), the per-recording pipeline
catalog-add → transcribe → register-transcript → assign (:512-577), and a
thread pool over recordings (:580-657, default 4 workers).

The STT step is a seam: the reference shells out to external ``stt_*.py``
tools (absent from its repo, CURRENT_WORK.md:136-149).  Here the default
"transcriber" is our own on-device diarizer (label-only transcript
skeleton); external STT CLIs are used when present on PATH, preserving the
reference's tool names.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor, as_completed
from pathlib import Path
from typing import Any, Callable

from ..store import catalog as catalog_store
from ..store.queue import ProcessingQueue
from ..utils.hashing import compute_b3sum
from ..utils.ioutil import save_json
from . import assign as assign_engine

AUDIO_EXTENSIONS = (".wav", ".mp3", ".m4a", ".flac", ".ogg", ".opus", ".aac", ".wma")

# Reference's external STT tool names (speaker-process:152-160).
STT_TOOLS = {
    "speechmatics": "stt_speechmatics.py",
    "assemblyai": "stt_assemblyai.py",
    "deepgram": "stt_deepgram.py",
}

DEFAULT_PARALLEL = 4


def find_audio_files(directory: str | Path, recursive: bool = True) -> list[Path]:
    directory = Path(directory)
    files: list[Path] = []
    pattern = "**/*" if recursive else "*"
    for p in sorted(directory.glob(pattern)):
        if p.is_file() and p.suffix.lower() in AUDIO_EXTENSIONS:
            files.append(p)
    return files


def find_tool(name: str) -> str | None:
    """PATH lookup (reference find_tool :163-177)."""
    return shutil.which(name)


def transcribe_external(
    audio_path: Path, backend: str, output_path: Path
) -> Path | None:
    """Run an external STT CLI if installed; returns the transcript path."""
    tool = STT_TOOLS.get(backend)
    exe = find_tool(tool) if tool else None
    if exe is None:
        return None
    result = subprocess.run(
        [exe, str(audio_path), "--output", str(output_path)],
        capture_output=True,
        text=True,
    )
    if result.returncode != 0 or not output_path.exists():
        return None
    return output_path


def transcribe_local(audio_path: Path, output_path: Path, backend_name: str | None = None) -> Path:
    """On-device diarization → Speechmatics-format transcript skeleton."""
    from .diarize import Diarizer, to_transcript_skeleton

    result = Diarizer(backend_name).diarize_file(audio_path)
    save_json(output_path, to_transcript_skeleton(result))
    return output_path


def transcript_path_for(
    audio_path: Path, backend: str, output_dir: str | Path | None = None
) -> Path:
    if output_dir:
        return Path(output_dir) / f"{audio_path.stem}.{backend}.json"
    return audio_path.with_suffix(f".{backend}.json")


def process_single(
    audio_path: str | Path,
    stt_backends: list[str] | None = None,
    context: str | None = None,
    use_llm: bool = False,
    embed_backend: str | None = None,
    output_dir: str | Path | None = None,
    skip_existing: bool = False,
    log: Callable[[str], None] | None = None,
) -> dict[str, Any]:
    """Full per-recording pipeline (reference process_single :512-577)."""
    log = log or (lambda msg: print(msg, file=sys.stderr))
    audio_path = Path(audio_path).resolve()
    stt_backends = stt_backends or ["tpu-diarize"]

    # 1. ensure in catalog
    b3sum = compute_b3sum(audio_path)
    if skip_existing:
        from ..store import assignments as assignment_store

        if assignment_store.load_assignments(b3sum):
            log(f"skipping {audio_path.name} (already processed)")
            return {"b3sum": b3sum, "skipped": True}
    if catalog_store.load_entry(b3sum) is None:
        catalog_store.add_recording(audio_path, context=context)
        log(f"cataloged {audio_path.name} ({b3sum[:8]}…)")

    # 2. transcribe (skip if output exists — resume semantics, ref :419-422)
    if output_dir:
        Path(output_dir).mkdir(parents=True, exist_ok=True)
    transcripts: list[tuple[str, Path]] = []
    for backend in stt_backends:
        out = transcript_path_for(audio_path, backend, output_dir)
        if out.exists():
            transcripts.append((backend, out))
            continue
        if backend == "tpu-diarize":
            transcripts.append((backend, transcribe_local(audio_path, out, embed_backend)))
            log(f"diarized {audio_path.name} -> {out.name}")
        else:
            got = transcribe_external(audio_path, backend, out)
            if got:
                transcripts.append((backend, got))
                log(f"transcribed [{backend}] {audio_path.name}")
            else:
                log(f"skipping STT backend '{backend}' (tool not available)")

    if not transcripts:
        raise RuntimeError("no transcript produced by any backend")

    # 3. register transcripts
    for backend, tpath in transcripts:
        try:
            catalog_store.register_transcript(b3sum, tpath, backend)
        except FileExistsError:
            pass

    # 4. assign using the first transcript
    backend, tpath = transcripts[0]
    output = assign_engine.assign(
        audio_path,
        tpath,
        use_embeddings=True,
        use_llm=use_llm,
        context=context,
        backend=embed_backend,
    )
    return {"b3sum": b3sum, "transcripts": [str(t) for _, t in transcripts],
            "assignments": output["mappings"]}


def process_batch(
    paths: list[str | Path],
    queue: ProcessingQueue | None = None,
    parallel: int = DEFAULT_PARALLEL,
    **kwargs: Any,
) -> dict[str, Any]:
    """Queue + thread pool driver (reference process_batch :580-657)."""
    queue = queue or ProcessingQueue()
    for p in paths:
        queue.add(p)

    results: dict[str, Any] = {"completed": 0, "failed": 0, "errors": {}}

    def worker(item: dict[str, Any]):
        path = item["path"]
        try:
            process_single(path, **kwargs)
            queue.mark(path, "completed")
            return path, None
        except Exception as e:  # noqa: BLE001 — queue records any failure
            queue.mark(path, "failed", error=str(e))
            return path, str(e)

    with ThreadPoolExecutor(max_workers=parallel) as pool:
        futures = []
        while True:
            item = queue.next_pending()
            if item is None:
                break
            futures.append(pool.submit(worker, item))
        for fut in as_completed(futures):
            path, err = fut.result()
            if err is None:
                results["completed"] += 1
            else:
                results["failed"] += 1
                results["errors"][path] = err
    return results


def host_shard(paths: list[Path], host_id: int, n_hosts: int) -> list[Path]:
    """Deterministic per-host split of the work list for multi-host runs
    (SURVEY.md §2.3 host-orchestration row)."""
    return [p for p in paths if hash(str(p)) % n_hosts == host_id]
