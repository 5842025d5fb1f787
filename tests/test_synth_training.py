"""Synthetic voices + short training run: determinism, separation,
trainability."""

import numpy as np
import pytest

from sdtk_tpu.data import synth


def test_synth_deterministic():
    a = synth.synth_utterance(3, 7, seconds=1.0)
    b = synth.synth_utterance(3, 7, seconds=1.0)
    np.testing.assert_array_equal(a, b)
    c = synth.synth_utterance(3, 8, seconds=1.0)
    assert not np.array_equal(a, c)


def test_synth_shape_and_level():
    x = synth.synth_utterance(0, 0, seconds=2.0)
    assert x.shape == (32000,) and x.dtype == np.float32
    assert 0.3 < np.abs(x).max() <= 0.5 + 1e-6
    assert np.abs(x).mean() > 0.01  # actually contains signal


def test_voicespec_varies_by_speaker():
    specs = [synth.VoiceSpec.for_speaker(i) for i in range(10)]
    f0s = [s.f0 for s in specs]
    assert len(set(round(f, 1) for f in f0s)) == 10
    assert min(f0s) >= 85 and max(f0s) <= 280


def test_fake_backend_separates_synthetic_voices():
    """Sanity: even the fake spectral backend separates these voices a bit;
    mostly guards the generator's between/within-speaker structure."""
    from sdtk_tpu.backends.fake import FakeBackend

    f = FakeBackend()
    same = f.embed_waveform(synth.synth_utterance(1, 0)) @ f.embed_waveform(
        synth.synth_utterance(1, 1)
    )
    diff = f.embed_waveform(synth.synth_utterance(1, 0)) @ f.embed_waveform(
        synth.synth_utterance(2, 0)
    )
    assert same > diff


@pytest.mark.slow
def test_short_training_run(tmp_path):
    """Tiny ECAPA, few steps on CPU mesh: loss decreases, params saved,
    TpuBackend loads them."""
    from sdtk_tpu import training

    logs = []
    state, out_path = training.train(
        steps=8,
        n_speakers=4,
        batch=8,
        seconds=1.0,
        channels=64,
        lr=3e-3,
        out_path=tmp_path / "params.msgpack",
        log_every=1,
        log=logs.append,
    )
    assert out_path.exists()
    losses = [float(l.split("loss")[1].split()[0]) for l in logs if "loss" in l]
    assert losses[-1] < losses[0] * 1.5  # moving, not diverging

    from sdtk_tpu.backends.tpu import TpuBackend

    backend = TpuBackend(channels=64, params_path=out_path, max_windows=2)
    emb = backend.embed_waveform(synth.synth_utterance(0, 0, seconds=1.0))
    assert emb.shape == (192,)
    assert np.isfinite(emb).all()


def test_train_resume_roundtrip(tmp_path):
    """Save → warm-start resume → save again, tiny model on CPU mesh."""
    from sdtk_tpu.training import train

    logs = []
    out1 = tmp_path / "m1.msgpack"
    train(steps=2, n_speakers=4, batch=8, seconds=1.0, crop_seconds=1.0,
          channels=32, out_path=out1, log_every=1, log=logs.append)
    assert out1.exists()
    out2 = tmp_path / "m2.msgpack"
    train(steps=1, n_speakers=4, batch=8, seconds=1.0, crop_seconds=1.0,
          channels=32, out_path=out2, resume_path=out1, log_every=1,
          log=logs.append)
    assert out2.exists()
    assert any("resumed backbone" in l for l in logs)


def test_train_crash_resume_from_checkpoint(tmp_path):
    """Periodic full-state checkpoints; a second run restores step count."""
    from sdtk_tpu.training import train

    logs = []
    ck = tmp_path / "ckpts"
    train(steps=2, n_speakers=4, batch=8, seconds=1.0, crop_seconds=1.0,
          channels=32, out_path=tmp_path / "a.msgpack", ckpt_dir=ck,
          ckpt_every=1, log_every=1, log=logs.append)
    assert any("checkpoint ->" in l for l in logs)
    logs2 = []
    train(steps=1, n_speakers=4, batch=8, seconds=1.0, crop_seconds=1.0,
          channels=32, out_path=tmp_path / "b.msgpack", ckpt_dir=ck,
          ckpt_every=0, log_every=1, log=logs2.append)
    assert any("restored full train state" in l and "step 2" in l for l in logs2)


@pytest.mark.parametrize("model_name", ["xvector", "conformer"])
def test_train_other_towers(tmp_path, model_name):
    """The training driver hosts every embedder family."""
    from sdtk_tpu.training import train

    out = tmp_path / f"{model_name}.msgpack"
    train(steps=1, n_speakers=4, batch=8, seconds=1.0, crop_seconds=1.0,
          channels=32, model_name=model_name, out_path=out, log_every=1,
          log=lambda m: None)
    assert out.exists()


def test_music_tier_uses_heldout_bed(monkeypatch):
    """The eval music tier must NOT share a generator with training's
    --bed-prob augmentation (data/nonspeech.music) — same circularity
    rule as the held-out voice family.  apply_tier must succeed even
    when the training bed generator is unusable."""
    from sdtk_tpu.data import nonspeech, synth_heldout

    def _boom(*a, **k):
        raise AssertionError("training bed generator used by the eval tier")

    monkeypatch.setattr(nonspeech, "music", _boom)
    x = np.sin(np.arange(16000) / 20.0).astype(np.float32)
    y = synth_heldout.apply_tier(x, "music", seed=3, snr_db=10.0)
    assert y.shape == x.shape and np.isfinite(y).all()
    assert not np.allclose(y, x)  # a bed was actually mixed in


def test_heldout_music_distinct_and_deterministic():
    from sdtk_tpu.data import nonspeech, synth_heldout

    a = synth_heldout.heldout_music(2.0, seed=5)
    b = synth_heldout.heldout_music(2.0, seed=5)
    c = synth_heldout.heldout_music(2.0, seed=6)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    # and nothing like the training bed with the same seed
    d = nonspeech.music(2.0, seed=5)
    assert np.corrcoef(a, d)[0, 1] ** 2 < 0.05
