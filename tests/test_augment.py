"""Unit tests for the training-time augmentation chain (data/augment.py).

Pure numpy/scipy — no JAX, no device.
"""

import numpy as np
import pytest

from sdtk_tpu.data.augment import (
    AugmentSpec,
    apply_reverb,
    augment_batch,
    band_limit,
    spectral_tilt,
    speed_perturb,
    synth_rir,
)

SR = 16000


def _tone(freq: float, seconds: float = 1.0) -> np.ndarray:
    t = np.arange(int(SR * seconds)) / SR
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _band_energy(wav: np.ndarray, lo: float, hi: float) -> float:
    spec = np.abs(np.fft.rfft(wav)) ** 2
    freqs = np.fft.rfftfreq(len(wav), 1.0 / SR)
    return float(spec[(freqs >= lo) & (freqs < hi)].sum())


class TestSpeedPerturb:
    def test_preserves_length(self):
        wav = _tone(440)
        for f in (0.9, 0.95, 1.0, 1.05, 1.1):
            assert len(speed_perturb(wav, f)) == len(wav)

    def test_identity_at_factor_one(self):
        wav = _tone(440)
        np.testing.assert_allclose(speed_perturb(wav, 1.0), wav, atol=1e-6)

    def test_shifts_pitch(self):
        # Speeding up by 1.05 moves a 1 kHz tone's energy to ~1.05 kHz.
        wav = _tone(1000)
        fast = speed_perturb(wav, 1.05)
        assert _band_energy(fast, 1030, 1080) > _band_energy(fast, 970, 1020)


class TestReverb:
    def test_rir_shape(self):
        rng = np.random.default_rng(0)
        rir = synth_rir(rng, rt60=0.4)
        assert rir[0] != 0.0  # direct path present
        assert np.max(np.abs(rir)) == pytest.approx(1.0)
        # Tail decays: last 10% has less energy than first 10%.
        n = len(rir)
        assert (rir[: n // 10] ** 2).sum() > (rir[-n // 10 :] ** 2).sum()

    def test_reverb_preserves_rms_and_length(self):
        rng = np.random.default_rng(1)
        wav = _tone(300) * 0.5
        wet = apply_reverb(wav, synth_rir(rng, rt60=0.5))
        assert len(wet) == len(wav)
        rms_in = np.sqrt((wav**2).mean())
        rms_out = np.sqrt((wet**2).mean())
        assert rms_out == pytest.approx(rms_in, rel=1e-3)

    def test_reverb_smears_transient(self):
        rng = np.random.default_rng(2)
        click = np.zeros(SR, np.float32)
        click[100] = 1.0
        wet = apply_reverb(click, synth_rir(rng, rt60=0.5))
        # Energy after 50 ms must be non-trivial (the tail).
        assert (wet[SR // 20 :] ** 2).sum() > 1e-4


class TestTilt:
    def test_positive_brightens(self):
        wav = _tone(300) + _tone(3000)
        bright = spectral_tilt(wav, 0.5)
        ratio_in = _band_energy(wav, 2000, 4000) / _band_energy(wav, 100, 500)
        ratio_out = _band_energy(bright, 2000, 4000) / _band_energy(
            bright, 100, 500
        )
        assert ratio_out > ratio_in

    def test_negative_darkens(self):
        wav = _tone(300) + _tone(3000)
        dark = spectral_tilt(wav, -0.5)
        ratio_in = _band_energy(wav, 2000, 4000) / _band_energy(wav, 100, 500)
        ratio_out = _band_energy(dark, 2000, 4000) / _band_energy(dark, 100, 500)
        assert ratio_out < ratio_in


class TestBandLimit:
    def test_kills_out_of_band(self):
        wav = _tone(100) + _tone(1000) + _tone(7000)
        out = band_limit(wav, 300.0, 3400.0)
        assert _band_energy(out, 80, 120) < 0.05 * _band_energy(wav, 80, 120)
        assert _band_energy(out, 6800, 7200) < 0.05 * _band_energy(
            wav, 6800, 7200
        )
        assert _band_energy(out, 900, 1100) > 0.25 * _band_energy(wav, 900, 1100)


class TestAugmentBatch:
    def test_shape_and_finite(self):
        rng = np.random.default_rng(3)
        wavs = rng.standard_normal((4, SR)).astype(np.float32) * 0.1
        out = augment_batch(wavs, rng, AugmentSpec.uniform(1.0))
        assert out.shape == wavs.shape
        assert np.isfinite(out).all()
        assert not np.allclose(out, wavs)  # prob 1.0 → every effect fired

    def test_zero_prob_is_identity(self):
        rng = np.random.default_rng(4)
        wavs = rng.standard_normal((2, SR)).astype(np.float32)
        out = augment_batch(wavs, rng, AugmentSpec())
        np.testing.assert_array_equal(out, wavs)

    def test_deterministic_given_seed(self):
        wavs = np.random.default_rng(5).standard_normal((3, SR)).astype(
            np.float32
        )
        a = augment_batch(wavs, np.random.default_rng(7), AugmentSpec.uniform(0.5))
        b = augment_batch(wavs, np.random.default_rng(7), AugmentSpec.uniform(0.5))
        np.testing.assert_array_equal(a, b)


def test_codec_compand_roundtrip_properties():
    """µ-law codec augmentation: shape-preserving, deterministic given
    parameters, genuinely lossy (nonlinearity present) but bounded."""
    import numpy as np
    from sdtk_tpu.data.augment import AugmentSpec, augment_batch, codec_compand

    t = np.arange(16000) / 16000.0
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 3300 * t)).astype(np.float32)
    y = codec_compand(x, mu=255.0, bits=7, rate=8000.0)
    assert y.shape == x.shape and y.dtype == np.float32
    err = float(((x - y) ** 2).mean())
    assert 1e-6 < err < float((x ** 2).mean())  # lossy but not destroyed
    # 3.3 kHz content survives an 8 kHz round trip; 6 kHz would not
    spec = np.abs(np.fft.rfft(y))
    assert spec[3300] > 0.1 * spec[440]

    rng = np.random.default_rng(0)
    out = augment_batch(np.stack([x, x]), rng,
                        AugmentSpec(codec_prob=1.0))
    assert out.shape == (2, 16000)
    assert not np.allclose(out[0], x)
