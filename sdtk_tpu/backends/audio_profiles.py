"""Per-backend audio format requirements.

Parity with reference ``audio_profiles.py`` (:12-47: AudioProfile
dataclass, PROFILES registry, register_profile) minus the ffmpeg argument
builder — conversion happens in-process (utils.audio), so the profile
feeds ``load_audio(target_sr=...)`` instead of a subprocess command line.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class AudioProfile:
    """Audio format a backend expects (default mirrors the reference's:
    16 kHz mono 16-bit WAV)."""

    sample_rate: int = 16000
    channels: int = 1
    bit_depth: int = 16
    container: str = "wav"

    def load_kwargs(self) -> dict:
        """kwargs for utils.audio.load_audio satisfying this profile."""
        return {"target_sr": self.sample_rate, "mono": self.channels == 1}


PROFILES: dict[str, AudioProfile] = {
    "default": AudioProfile(),
    "tpu": AudioProfile(),
    "fake": AudioProfile(),
    "speechmatics": AudioProfile(),  # cloud accepts most; we send 16k mono
}


def get_profile(backend_name: str) -> AudioProfile:
    return PROFILES.get(backend_name, PROFILES["default"])


def register_profile(backend_name: str, profile: AudioProfile) -> None:
    PROFILES[backend_name] = profile
