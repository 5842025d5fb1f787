"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths compile
and execute without TPU hardware (mirrors how the reference's tests fake the
Speechmatics cloud rather than calling it, evals/TESTING.md).
"""

import os

# Must be set before the jax backend initializes.  The environment's axon
# sitecustomize pins jax_platforms=axon (real TPU via tunnel); tests override
# to a virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture()
def speakers_dir(tmp_path, monkeypatch):
    """Redirect the file DB to a temp dir — the reference's isolation
    invariant (every path flows through $SPEAKERS_EMBEDDINGS_DIR)."""
    root = tmp_path / "speakers_embeddings"
    monkeypatch.setenv("SPEAKERS_EMBEDDINGS_DIR", str(root))
    return root


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def make_wav(path, seconds=1.0, sr=16000, freq=440.0, seed=None):
    """Write a 16-bit mono WAV test tone; unique seed → unique b3sum."""
    import wave

    t = np.arange(int(seconds * sr)) / sr
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    if seed is not None:
        x += 1e-4 * np.random.default_rng(seed).standard_normal(x.shape)
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return path
