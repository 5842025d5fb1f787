"""Per-backend audio format requirements.

Parity with reference ``audio_profiles.py`` (:12-47 AudioProfile dataclass,
PROFILES registry, register_profile :103-111, format_ffmpeg_args :63-100).
Conversion normally happens in-process (utils.audio) — the profile feeds
``load_audio(target_sr=...)`` via :meth:`AudioProfile.load_kwargs` — but
``format_ffmpeg_args`` is kept for users exporting an equivalent ffmpeg
command line (and for drop-in API compatibility with the reference).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class AudioProfile:
    """Audio format a backend expects (default mirrors the reference's:
    16 kHz mono 16-bit WAV; ``max_duration_sec`` None = unlimited)."""

    sample_rate: int = 16000
    channels: int = 1
    format: str = "wav"
    bit_depth: int = 16
    max_duration_sec: float | None = None

    @property
    def container(self) -> str:
        """Alias kept from this framework's earlier field name."""
        return self.format

    def load_kwargs(self) -> dict:
        """kwargs for utils.audio.load_audio satisfying this profile."""
        return {"target_sr": self.sample_rate, "mono": self.channels == 1}


PROFILES: dict[str, AudioProfile] = {
    "default": AudioProfile(),
    "tpu": AudioProfile(),
    "fake": AudioProfile(),
    "speechmatics": AudioProfile(),  # cloud accepts most; we send 16k mono
    "pyannote": AudioProfile(),
}


def get_profile(backend_name: str) -> AudioProfile:
    return PROFILES.get(backend_name, PROFILES["default"])


def register_profile(backend_name: str, profile: AudioProfile) -> None:
    PROFILES[backend_name] = profile


def format_ffmpeg_args(profile: AudioProfile) -> list[str]:
    """ffmpeg argument list (no input/output paths) converting audio to
    this profile: ``-ar SR -ac CH -f FMT`` plus an explicit little-endian
    PCM codec for WAV bit depths (reference audio_profiles.py:63-100)."""
    args = [
        "-ar", str(profile.sample_rate),
        "-ac", str(profile.channels),
        "-f", profile.format,
    ]
    if profile.format == "wav" and profile.bit_depth in (16, 24, 32):
        args += ["-acodec", f"pcm_s{profile.bit_depth}le"]
    if profile.max_duration_sec is not None:
        args += ["-t", str(profile.max_duration_sec)]
    return args
