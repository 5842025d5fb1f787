"""Sequence-parallel paths vs single-device oracles (8-device CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from sdtk_tpu.ops import fbank
from sdtk_tpu.ops.longform import pad_for_sharding, sharded_affinity_rows, sharded_log_mel
from sdtk_tpu.parallel import make_mesh

CFG = fbank.FrontendConfig(compute_dtype="float32")


def test_sharded_log_mel_matches_single_device():
    rng = np.random.default_rng(0)
    mesh = make_mesh("data=8,model=1")
    # 81920 samples = 8 devices * 64 hops * 160
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(81920) / 16000)).astype(np.float32)
    x += 0.02 * rng.standard_normal(len(x)).astype(np.float32)

    ref, _ = fbank.log_mel(jnp.asarray(x)[None], CFG)
    got = sharded_log_mel(jnp.asarray(x), mesh, CFG)
    ref = np.asarray(ref)[0]
    got = np.asarray(got)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_sharded_log_mel_padding_helper():
    mesh = make_mesh("data=8,model=1")
    x = jnp.ones(5000, jnp.float32)
    xp = pad_for_sharding(x, mesh, CFG)
    assert xp.shape[0] % (8 * CFG.hop_length) == 0
    feats = sharded_log_mel(xp, mesh, CFG)
    assert np.isfinite(np.asarray(feats)).all()


def test_sharded_affinity_matches_refine():
    from sdtk_tpu.cluster.affinity import cosine_affinity, refine_affinity

    rng = np.random.default_rng(1)
    mesh = make_mesh("data=8,model=1")
    emb = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    ref = np.asarray(refine_affinity(cosine_affinity(emb)))
    got = np.asarray(sharded_affinity_rows(emb, mesh))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_longform_diarizer_end_to_end():
    """Full mesh-parallel pipeline on the virtual 8-device mesh: sharded
    frontend → sharded embed → blockwise affinity → device eigensolve →
    labels. Untrained ECAPA-64 embeddings still separate a 220 Hz vs 520 Hz
    harmonic pair."""
    import jax

    from sdtk_tpu.cluster.der import diarization_error_rate
    from sdtk_tpu.parallel import make_mesh
    from sdtk_tpu.pipeline.longform import LongformConfig, LongformDiarizer

    sr = 16000
    rng = np.random.default_rng(11)

    def voice(freq, seconds):
        t = np.arange(int(seconds * sr)) / sr
        x = sum((0.5 / (k + 1)) * np.sin(2 * np.pi * freq * (k + 1) * t)
                for k in range(4))
        return (0.4 * x / np.max(np.abs(x))).astype(np.float32)

    wav = np.concatenate([voice(220, 4), voice(520, 4), voice(220, 4)])
    wav += 0.005 * rng.standard_normal(len(wav)).astype(np.float32)

    mesh = make_mesh("data=8", jax.devices()[:8])
    d = LongformDiarizer(mesh, LongformConfig(n_speakers=2), channels=64)
    res = d.diarize_waveform(wav)
    assert res["mesh_devices"] == 8
    assert res["n_speakers"] == 2
    ref = [(0, 4, "A"), (4, 8, "B"), (8, 12, "A")]
    der = diarization_error_rate(ref, res["segments"], collar=0.75)
    assert der["der"] < 0.2, (der, res["segments"])
