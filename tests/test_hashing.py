"""BLAKE3 correctness: published vectors + cross-implementation agreement."""

import numpy as np
import pytest

from sdtk_tpu.utils import hashing

# Published BLAKE3 test vectors.
EMPTY_HEX = "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
ABC_HEX = "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"


def test_empty_vector():
    assert hashing.blake3_scalar(b"").hex() == EMPTY_HEX


def test_abc_vector():
    assert hashing.blake3_scalar(b"abc").hex() == ABC_HEX


@pytest.mark.parametrize(
    "n", [0, 1, 63, 64, 65, 1023, 1024, 1025, 2048, 3072, 4096, 5000, 65536 + 7]
)
def test_numpy_matches_scalar(n):
    data = bytes((i * 7 + 3) % 251 for i in range(n))
    assert hashing.blake3_numpy(data) == hashing.blake3_scalar(data)


@pytest.mark.parametrize("n", [0, 1, 1024, 1025, 4096, 10000, 131072 + 13])
def test_native_matches_scalar(n):
    data = bytes((i * 13 + 1) % 251 for i in range(n))
    native = hashing.blake3_native(data)
    if native is None:
        pytest.skip("native library unavailable")
    assert native == hashing.blake3_scalar(data)


def test_compute_b3sum_truncates_to_32(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello")
    h = hashing.compute_b3sum(p)
    assert len(h) == 32
    assert hashing.compute_b3sum_full(p)[:32] == h


def test_dispatch_consistency():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=50_000, dtype=np.uint8).tobytes()
    assert hashing.blake3(data) == hashing.blake3_scalar(data)
