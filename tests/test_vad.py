"""Trained VAD: train/serve parity, rejection of the non-speech classes
the energy gate passes, and the diarizer integration."""

from __future__ import annotations

import numpy as np
import pytest

from sdtk_tpu.models.vad import VadConfig, VadNet, VadScorer, default_checkpoint
from sdtk_tpu.ops.fbank import FrontendConfig, log_mel_reference

needs_checkpoint = pytest.mark.skipif(
    not default_checkpoint().exists(),
    reason="bundled models/vad.msgpack missing (evals/train_vad.py)")


def test_numpy_scorer_matches_flax(tmp_path):
    """The NumPy serving path reproduces the flax training forward."""
    import jax

    from sdtk_tpu.models.vad import save_params

    cfg = VadConfig(n_mels=24, channels=8)
    model = VadNet(cfg)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 40, cfg.n_mels)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), feats)
    want = np.asarray(model.apply(params, feats))[0]
    p = tmp_path / "vad.msgpack"
    save_params(params, p)
    got_probs = VadScorer(p, cfg).frame_probs(feats[0])
    np.testing.assert_allclose(got_probs, 1 / (1 + np.exp(-want)),
                               rtol=1e-4, atol=1e-5)


def test_scorer_missing_checkpoint_is_loud(tmp_path):
    with pytest.raises(FileNotFoundError, match="no VAD checkpoint"):
        VadScorer(tmp_path / "nope.msgpack")


@needs_checkpoint
def test_trained_vad_rejects_music_keeps_speech():
    """The exact failure of the energy gate: a LOUD music window must be
    non-speech, a speech window over a music bed must be speech."""
    from sdtk_tpu.data.nonspeech import mix_at_snr, music
    from sdtk_tpu.data.synth import synth_utterance

    fcfg = FrontendConfig()
    scorer = VadScorer()
    n = int(1.5 * 16000)

    m = 0.8 * music(1.5, seed=5)[:n]
    p_music = scorer.frame_probs(log_mel_reference(m, fcfg))
    assert float(np.mean(p_music > 0.5)) < 0.3, "music scored as speech"

    s = synth_utterance(3, 42, 1.7)[:n]
    p_speech = scorer.frame_probs(log_mel_reference(s, fcfg))
    assert float(np.mean(p_speech > 0.5)) > 0.5, "speech not detected"

    mixed = mix_at_snr(s, music(1.5, seed=9), 10.0)
    p_mixed = scorer.frame_probs(log_mel_reference(mixed, fcfg))
    assert float(np.mean(p_mixed > 0.5)) > 0.3, "bedded speech rejected"


@needs_checkpoint
def test_trained_vad_mask_gates_diarizer_windows():
    from sdtk_tpu.data.nonspeech import music
    from sdtk_tpu.data.synth import synth_utterance
    from sdtk_tpu.pipeline.vad import trained_vad_mask

    sr = 16000
    speech = synth_utterance(1, 7, 4.0)
    bed = 0.5 * music(4.0, seed=3)
    wav = np.concatenate([speech, bed[: 4 * sr]]).astype(np.float32)
    starts, keep = trained_vad_mask(wav, sr, 1.5, 0.75)
    n_win = len(starts)
    # windows fully inside speech kept; fully inside music dropped
    speech_idx = [i for i, s in enumerate(starts) if s + 1.5 <= 4.0]
    music_idx = [i for i, s in enumerate(starts) if s >= 4.0]
    assert np.mean([keep[i] for i in speech_idx]) > 0.7
    assert np.mean([keep[i] for i in music_idx]) < 0.3
    assert n_win == len(keep)


@needs_checkpoint
def test_streaming_trained_vad_gates_music():
    """OnlineDiarizer with the opt-in trained gate refuses to embed (or
    assign a speaker to) a music-only tail that the energy gate streams
    straight into the clusterer."""
    from sdtk_tpu.data.nonspeech import music
    from sdtk_tpu.data.synth import synth_utterance
    from sdtk_tpu.pipeline.streaming import OnlineDiarizer, StreamingConfig

    sr = 16000
    wav = np.concatenate([
        synth_utterance(4, 21, 4.0)[: 4 * sr],
        0.6 * music(4.0, seed=6)[: 4 * sr],
    ]).astype(np.float32)

    def run(mode):
        d = OnlineDiarizer("fake", StreamingConfig(vad=mode))
        events = []
        for i in range(0, len(wav), sr // 2):
            events += d.feed(wav[i : i + sr // 2])
        return events

    music_events = lambda evs: [e for e in evs if e["start"] >= 4.5]
    assert music_events(run("energy")), "energy gate should pass music"
    assert not music_events(run("trained")), "trained gate must drop music"


@needs_checkpoint
def test_diarizer_vad_modes():
    """cfg.vad switches the gate: on speech|music|speech audio the
    trained gate must cut hypothesis coverage of the music span that the
    energy gate keeps.  (Speech is real synth speech — harmonic test
    tones ARE music to a trained VAD, which is the point of having one.)"""
    from sdtk_tpu.data.nonspeech import music
    from sdtk_tpu.data.synth import synth_utterance
    from sdtk_tpu.pipeline.diarize import DiarizeConfig, Diarizer

    sr = 16000
    wav = np.concatenate([
        synth_utterance(2, 11, 4.0)[: 4 * sr],
        0.6 * music(3.0, seed=2)[: 3 * sr],
        synth_utterance(5, 12, 4.0)[: 4 * sr],
    ]).astype(np.float32)

    res_energy = Diarizer("fake", DiarizeConfig(vad="energy")).diarize_waveform(wav)
    res_trained = Diarizer("fake", DiarizeConfig(vad="trained")).diarize_waveform(wav)
    covered = lambda res: sum(
        max(0.0, min(e, 7.0) - max(s, 4.0)) for s, e, _ in res["segments"])
    assert covered(res_trained) < covered(res_energy), (
        covered(res_trained), covered(res_energy))


def test_v4_flax_numpy_parity(tmp_path):
    """The v4 graph (derived flatness/flux channels + dilation-8 conv3)
    must serve identically through the NumPy path, including the
    in-model feature derivation."""
    import jax
    import jax.numpy as jnp

    from sdtk_tpu.models.vad import VadConfig, VadNet, VadScorer, save_params

    cfg = VadConfig(n_mels=24, deep=True, extra_feats=True)
    model = VadNet(cfg)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 60, 24)).astype(np.float32) * 3.0
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(feats))
    p = tmp_path / "vad4.msgpack"
    save_params(params, p)
    want = np.asarray(
        jax.nn.sigmoid(model.apply(params, jnp.asarray(feats))))[0]
    scorer = VadScorer(p, VadConfig(n_mels=24, deep=True,
                                    extra_feats=True))
    assert scorer.extra_feats and scorer.w3 is not None
    got = scorer.frame_probs(feats[0])
    np.testing.assert_allclose(got, want, atol=2e-5)
