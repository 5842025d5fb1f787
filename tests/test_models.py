"""Embedding tower tests: shapes, masking invariance, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtk_tpu.models import EcapaConfig, EcapaTdnn, XVector, XVectorConfig

SMALL = EcapaConfig(channels=64, mfa_channels=96, emb_dim=32, se_bottleneck=16,
                    attention_channels=16, dtype="float32")


@pytest.fixture(scope="module")
def ecapa_small():
    model = EcapaTdnn(SMALL)
    feats = jnp.zeros((2, 50, 80))
    variables = model.init(jax.random.PRNGKey(0), feats)
    return model, variables


def test_ecapa_shapes(ecapa_small):
    model, variables = ecapa_small
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((3, 120, 80)), jnp.float32)
    emb = model.apply(variables, feats)
    assert emb.shape == (3, SMALL.emb_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_ecapa_mask_invariance(ecapa_small):
    """Padding frames must not change the embedding (inference mode)."""
    model, variables = ecapa_small
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 80, 80)).astype(np.float32)
    emb_short = model.apply(variables, jnp.asarray(x),
                            mask=jnp.ones((1, 80), bool))
    # Same signal padded with garbage + mask
    pad = rng.standard_normal((1, 40, 80)).astype(np.float32) * 5
    xp = np.concatenate([x, pad], axis=1)
    mask = jnp.concatenate([jnp.ones((1, 80), bool), jnp.zeros((1, 40), bool)], axis=1)
    emb_padded = model.apply(variables, jnp.asarray(xp), mask=mask)
    np.testing.assert_allclose(np.asarray(emb_short), np.asarray(emb_padded),
                               atol=1e-4, rtol=1e-4)


def test_ecapa_deterministic(ecapa_small):
    model, variables = ecapa_small
    feats = jnp.asarray(np.random.default_rng(2).standard_normal((2, 60, 80)), jnp.float32)
    e1 = model.apply(variables, feats)
    e2 = model.apply(variables, feats)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_ecapa_train_mode_updates_batch_stats(ecapa_small):
    model, variables = ecapa_small
    feats = jnp.asarray(np.random.default_rng(3).standard_normal((2, 60, 80)), jnp.float32)
    emb, mutated = model.apply(variables, feats, train=True, mutable=["batch_stats"])
    assert emb.shape == (2, SMALL.emb_dim)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_ecapa_param_count_full_size():
    """Full-size config builds and has the expected parameter scale (~6M
    for C=512 per the ECAPA paper)."""
    model = EcapaTdnn(EcapaConfig(channels=512))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 200, 80)))
    )
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 5e6 < n_params < 9e6, n_params


def test_xvector_shapes():
    cfg = XVectorConfig(channels=64, pre_pool_channels=128, emb_dim=64, dtype="float32")
    model = XVector(cfg)
    feats = jnp.zeros((2, 50, 80))
    variables = model.init(jax.random.PRNGKey(0), feats)
    emb = model.apply(variables, feats)
    assert emb.shape == (2, 64)


def test_conformer_shapes_and_mask_invariance():
    """Third tower: shapes + padding cannot perturb valid embeddings."""
    import jax
    import jax.numpy as jnp

    from sdtk_tpu.models import Conformer, ConformerConfig

    cfg = ConformerConfig(dim=64, n_blocks=2, n_heads=2, ff_mult=2,
                          conv_kernel=7, emb_dim=32, attention_channels=16,
                          dtype="float32")
    model = Conformer(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 40, 80))
    variables = model.init(rng, feats)
    emb = model.apply(variables, feats)
    assert emb.shape == (2, 32)
    assert emb.dtype == jnp.float32

    # pad one sequence with garbage; masked apply must match the unpadded
    mask = jnp.ones((1, 40), dtype=bool)
    e_ref = model.apply(variables, feats[:1], mask=mask)
    garbage = jax.random.normal(jax.random.PRNGKey(9), (1, 24, 80)) * 50
    feats_pad = jnp.concatenate([feats[:1], garbage], axis=1)
    mask_pad = jnp.concatenate([mask, jnp.zeros((1, 24), dtype=bool)], axis=1)
    e_pad = model.apply(variables, feats_pad, mask=mask_pad)
    assert jnp.max(jnp.abs(e_pad - e_ref)) < 1e-4, float(jnp.max(jnp.abs(e_pad - e_ref)))


def test_conformer_backend_engine(speakers_dir, tmp_path):
    """The tpu backend can host the conformer tower end-to-end."""
    import numpy as np

    from conftest import make_wav
    from sdtk_tpu.backends.tpu import TpuBackend

    be = TpuBackend(model="conformer", channels=64, max_windows=2)
    wav = make_wav(tmp_path / "c.wav", seconds=2.0, freq=300, seed=3)
    from sdtk_tpu.utils.audio import load_audio

    x, _ = load_audio(wav)
    emb = be.embed_waveform(x)
    assert emb.shape == (be.embedding_dim,)
    assert np.isfinite(emb).all()
