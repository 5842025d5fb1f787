"""Fused waveform→log-mel Pallas kernel (ops/research/fbank_wave.py): parity with
the XLA path and the NumPy FFT oracle, interpret-mode on CPU."""

from __future__ import annotations

import numpy as np

from sdtk_tpu.ops.fbank import FrontendConfig, log_mel, log_mel_reference
from sdtk_tpu.ops.research.fbank_wave import log_mel_wave, preemph_windowed_bases


def _sig(b: int, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    tones = np.stack([
        np.sin(2 * np.pi * (180 + 60 * i) * t) for i in range(b)
    ])
    return (0.3 * tones + 0.01 * rng.standard_normal((b, n))).astype(np.float32)


def test_preemph_folded_bases_match_explicit():
    """Folding preemphasis into the DFT bases is exact: applying B' to the
    extended frame equals windowed-DFT of the explicitly preemphasized
    frame."""
    cfg = FrontendConfig()
    from sdtk_tpu.ops import melbank

    wr, wi = melbank.windowed_bases(cfg.win_length, cfg.n_fft, cfg.window)
    pr, pi = preemph_windowed_bases(cfg.win_length, cfg.n_fft, cfg.window,
                                    cfg.preemphasis)
    rng = np.random.default_rng(1)
    ext = rng.standard_normal(cfg.win_length + 1).astype(np.float64)
    pre = ext[1:] - cfg.preemphasis * ext[:-1]
    np.testing.assert_allclose(ext @ pr, pre @ wr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ext @ pi, pre @ wi, rtol=1e-5, atol=1e-5)


def test_log_mel_wave_matches_xla_f32():
    """f32 compute: the kernel equals the XLA log_mel path tightly."""
    cfg = FrontendConfig(compute_dtype="float32")
    x = _sig(3, 16000)
    want, wmask = log_mel(x, cfg)
    got, gmask = log_mel_wave(x, cfg)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(gmask), np.asarray(wmask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_log_mel_wave_matches_oracle_bf16():
    """Serving dtype (bf16): bf16-rounding-level agreement with the f64
    FFT oracle.  The bar is slightly looser than the XLA path's 0.35
    (preemphasis folded into the bases makes their rows small
    DIFFERENCES of adjacent windowed-basis values, so near-DC bins lose
    ~1 extra bit to cancellation); the f32 test above pins exactness of
    the math itself."""
    cfg = FrontendConfig()
    x = _sig(2, 8000, seed=2)
    got, _ = log_mel_wave(x, cfg)
    for i in range(len(x)):
        oracle = log_mel_reference(x[i], cfg)
        err = np.abs(np.asarray(got[i]) - oracle).max()
        assert err < 0.6, f"row {i}: max abs log-mel err {err}"


def test_log_mel_wave_ragged_lengths_and_odd_batch():
    """Ragged batches mask identically to the XLA path; a batch that is
    not a multiple of chunk_rows exercises the pad-and-trim path."""
    cfg = FrontendConfig(compute_dtype="float32")
    b, n = 5, 12000  # 5 % 4 != 0
    x = _sig(b, n, seed=3)
    lengths = np.asarray([n, 9000, 4800, 700, n], np.int32)
    want, wmask = log_mel(x, cfg, lengths=lengths)
    got, gmask = log_mel_wave(x, cfg, lengths=lengths)
    np.testing.assert_array_equal(np.asarray(gmask), np.asarray(wmask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_log_mel_wave_no_preemphasis():
    cfg = FrontendConfig(compute_dtype="float32", preemphasis=0.0)
    x = _sig(2, 6400, seed=4)
    want, _ = log_mel(x, cfg)
    got, _ = log_mel_wave(x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
