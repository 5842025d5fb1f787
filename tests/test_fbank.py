"""Frontend parity: jnp/Pallas log-mel vs NumPy FFT oracle."""

import numpy as np
import pytest

from sdtk_tpu.ops import fbank, melbank
from sdtk_tpu.ops.research import fbank_frames

CFG32 = fbank.FrontendConfig(compute_dtype="float32")


def make_signal(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    return x.astype(np.float32)


def test_mel_filterbank_shape_and_coverage():
    fb = melbank.mel_filterbank(80, 512, 16000)
    assert fb.shape == (257, 80)
    assert np.all(fb >= 0)
    # every filter has some mass; interior freqs covered
    assert np.all(fb.sum(axis=0) > 0)


def test_num_frames():
    cfg = fbank.FrontendConfig()
    assert cfg.num_frames(400) == 1
    assert cfg.num_frames(560) == 2
    assert cfg.num_frames(16000) == 1 + (16000 - 400) // 160


def test_frame_signal_matches_naive():
    import jax.numpy as jnp

    x = make_signal(2000)
    frames = np.asarray(fbank.frame_signal(jnp.asarray(x[None]), 400, 160))[0]
    t = 1 + (2000 - 400) // 160
    assert frames.shape == (t, 400)
    for i in [0, 3, t - 1]:
        np.testing.assert_array_equal(frames[i], x[i * 160 : i * 160 + 400])


def test_log_mel_matches_reference():
    x = make_signal(16000)
    ref = fbank.log_mel_reference(x, CFG32)
    got, mask = fbank.log_mel(x[None], CFG32)
    got = np.asarray(got)[0]
    assert got.shape == ref.shape
    assert bool(np.asarray(mask).all())
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


def test_log_mel_bf16_close():
    x = make_signal(16000, seed=1)
    ref = fbank.log_mel_reference(x, CFG32)
    got, _ = fbank.log_mel(x[None], fbank.FrontendConfig())
    # bf16 matmuls: loose tolerance, but structure must match
    err = np.abs(np.asarray(got)[0] - ref)
    assert np.median(err) < 0.1


def test_masked_cmn():
    x = make_signal(16000, seed=2)
    batch = np.stack([x, np.concatenate([x[:8000], np.zeros(8000, np.float32)])])
    lengths = np.array([16000, 8000])
    feats, mask = fbank.log_mel(batch, CFG32, lengths=jnp_arr(lengths))
    feats, mask = np.asarray(feats), np.asarray(mask)
    t_valid = CFG32.num_frames(8000)
    assert mask[1, : t_valid].all() and not mask[1, t_valid:].any()
    # masked frames are zeroed; valid-frame mean is ~0 after CMN
    assert np.allclose(feats[1, t_valid:], 0.0)
    assert np.abs(feats[1, :t_valid].mean(axis=0)).max() < 1e-4


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_pallas_fused_matches_reference():
    x = make_signal(16000, seed=3)
    ref = fbank.log_mel_reference(x, CFG32)
    got, _ = fbank_frames.log_mel_fused(x[None], CFG32)
    got = np.asarray(got)[0]
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


def test_pallas_ragged_tile():
    # frame count not a multiple of the tile: padding path
    x = make_signal(7000, seed=4)
    ref = fbank.log_mel_reference(x, CFG32)
    got, _ = fbank_frames.log_mel_fused(x[None], CFG32)
    np.testing.assert_allclose(np.asarray(got)[0], ref, atol=2e-3, rtol=1e-4)
