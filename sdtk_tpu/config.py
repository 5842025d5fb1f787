"""Environment-driven configuration root.

The reference toolkit's isolation contract (evals/TESTING.md:52-88) is that
*every* filesystem path flows through an environment variable so tests can
redirect it.  This module is the single place that reads those variables; the
rest of the package asks for paths here and never touches ``os.environ``.

Env vars kept verbatim from the reference (speaker_detection:30-33,
speaker-llm:56-64, CURRENT_WORK.md:153-165):

- ``SPEAKERS_EMBEDDINGS_DIR``   root of the file DB
- ``SPEAKER_DETECTION_BACKEND`` default embedding backend name
- ``SPEAKER_BACKENDS_CONFIG``   backend registry YAML override
- ``SPEAKER_LLM_CACHE_DIR``     LLM analysis cache
- ``SPEAKER_REVIEW_PLAYER``     audio player for the review TUI
- ``SPEAKER_DETECTION_DEBUG``   debug dumps

New (TPU framework) vars:

- ``SDTK_DEVICE_MESH``    e.g. "data=8" or "data=4,model=2"
- ``SDTK_MODEL_DIR``      where model params/checkpoints live
- ``SDTK_PRECISION``      "bf16" (default) or "f32" for the compute core
"""

from __future__ import annotations

import os
from pathlib import Path

# Default backend is the on-device one ("tpu"); the reference defaulted to its
# only compute backend "speechmatics" (speaker_detection:1040).
DEFAULT_BACKEND_ENV = "SPEAKER_DETECTION_BACKEND"
DEFAULT_BACKEND = "tpu"


def speakers_dir() -> Path:
    """Root of the file DB ($SPEAKERS_EMBEDDINGS_DIR, speaker-assign:72-77)."""
    return Path(
        os.environ.get(
            "SPEAKERS_EMBEDDINGS_DIR",
            os.path.expanduser("~/.config/speakers_embeddings"),
        )
    )


def db_dir() -> Path:
    """Speaker profile JSONs (db/{id}.json)."""
    return speakers_dir() / "db"


def embeddings_dir() -> Path:
    """Dense embedding vectors (embeddings/{emb-id}.npy)."""
    return speakers_dir() / "embeddings"


def samples_dir() -> Path:
    """Per-speaker audio samples + metadata (samples/{speaker}/sample-NNN.*)."""
    return speakers_dir() / "samples"


def catalog_dir() -> Path:
    """Recording catalog entries (catalog/{b3sum}.yaml)."""
    return speakers_dir() / "catalog"


def assignments_dir() -> Path:
    """Assignment files (assignments/{b3sum}.yaml)."""
    return speakers_dir() / "assignments"


def contexts_path() -> Path:
    """Context registry (contexts.yaml, speaker-catalog:695-827)."""
    return speakers_dir() / "contexts.yaml"


def queue_path() -> Path:
    """Persistent processing queue (process_queue.yaml, speaker-process:245)."""
    return speakers_dir() / "process_queue.yaml"


def default_backend() -> str:
    return os.environ.get(DEFAULT_BACKEND_ENV, DEFAULT_BACKEND)


def backends_config_path() -> Path | None:
    """Backend registry YAML override ($SPEAKER_BACKENDS_CONFIG, base.py:212-269)."""
    p = os.environ.get("SPEAKER_BACKENDS_CONFIG")
    return Path(p) if p else None


def llm_cache_dir() -> Path:
    return Path(
        os.environ.get(
            "SPEAKER_LLM_CACHE_DIR", os.path.expanduser("~/.cache/speaker-llm")
        )
    )


def review_session_dir() -> Path:
    """$SPEAKER_REVIEW_SESSION_DIR > $XDG_CACHE_HOME/speaker-review >
    ~/.cache/speaker-review (reference speaker-review:232-238 uses the
    XDG cache; tests redirect via XDG_CACHE_HOME)."""
    explicit = os.environ.get("SPEAKER_REVIEW_SESSION_DIR")
    if explicit:
        return Path(explicit)
    xdg = os.environ.get("XDG_CACHE_HOME")
    if xdg:
        return Path(xdg) / "speaker-review"
    return Path(os.path.expanduser("~/.cache/speaker-review"))


def debug_enabled() -> bool:
    return bool(os.environ.get("SPEAKER_DETECTION_DEBUG"))


def model_dir() -> Path:
    return Path(
        os.environ.get("SDTK_MODEL_DIR", os.path.expanduser("~/.cache/sdtk_tpu/models"))
    )


def precision() -> str:
    """Compute dtype for the device core: "bf16" (default) or "f32"."""
    return os.environ.get("SDTK_PRECISION", "bf16")


def mesh_spec() -> str:
    """Device mesh spec, e.g. "data=8" or "data=4,model=2"; "" = auto."""
    return os.environ.get("SDTK_DEVICE_MESH", "")


def ensure_layout() -> Path:
    """Create the file-DB directory layout; returns the root."""
    root = speakers_dir()
    for d in (db_dir(), embeddings_dir(), samples_dir(), catalog_dir(), assignments_dir()):
        d.mkdir(parents=True, exist_ok=True)
    return root
