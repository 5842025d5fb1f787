"""Aux subsystems: profiling, checkpoint/resume, multihost helpers, audio
profiles."""

import numpy as np
import pytest


def test_profiling_stage(monkeypatch, capsys):
    from sdtk_tpu.utils import profiling

    monkeypatch.setenv("SDTK_PROFILE", "1")
    profiling.reset()
    with profiling.stage("demo"):
        pass
    with profiling.stage("demo"):
        pass
    import io

    buf = io.StringIO()
    profiling.report(out=buf)
    assert "demo" in buf.getvalue() and "2x" in buf.getvalue()
    profiling.reset()


def test_profiling_disabled(monkeypatch):
    from sdtk_tpu.utils import profiling

    monkeypatch.delenv("SDTK_PROFILE", raising=False)
    profiling.reset()
    with profiling.stage("x"):
        pass
    import io

    buf = io.StringIO()
    profiling.report(out=buf)
    assert buf.getvalue() == ""


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from sdtk_tpu.models import EcapaConfig, EcapaTdnn
    from sdtk_tpu.parallel.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from sdtk_tpu.parallel.train import TrainConfig, create_train_state, train_step

    cfg = EcapaConfig(channels=64, mfa_channels=96, emb_dim=32, se_bottleneck=16,
                      attention_channels=16, dtype="float32")
    tcfg = TrainConfig(n_classes=4, emb_dim=32)
    model = EcapaTdnn(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), tcfg,
                               jnp.zeros((2, 30, 80)))

    feats = jnp.asarray(np.random.default_rng(0).standard_normal((4, 30, 80)), jnp.float32)
    mask = jnp.ones((4, 30), bool)
    labels = jnp.asarray([0, 1, 2, 3])
    state, _ = train_step(state, feats, mask, labels, tcfg)

    path = save_train_state(tmp_path / "ckpts", state)
    assert latest_checkpoint(tmp_path / "ckpts") == path

    fresh = create_train_state(model, jax.random.PRNGKey(1), tcfg,
                               jnp.zeros((2, 30, 80)))
    restored = restore_train_state(path, fresh)
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state can keep training
    restored, metrics = train_step(restored, feats, mask, labels, tcfg)
    assert np.isfinite(float(metrics["loss"]))


def test_multihost_single_process():
    from sdtk_tpu.parallel import multihost

    info = multihost.initialize()  # no coordinator env → no-op
    assert info["process_count"] == 1
    shard = multihost.host_work_shard(["/a.wav", "/b.wav", "/c.wav"])
    assert len(shard) == 3  # single host owns everything


def test_audio_profiles():
    from sdtk_tpu.backends.audio_profiles import AudioProfile, get_profile, register_profile

    p = get_profile("tpu")
    assert p.sample_rate == 16000 and p.load_kwargs()["mono"]
    register_profile("custom", AudioProfile(sample_rate=8000))
    assert get_profile("custom").sample_rate == 8000
    assert get_profile("nonexistent") == get_profile("default")
