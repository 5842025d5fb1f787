"""ops/topk.py — fused large-N identify scoring (cosine → window-max →
top-k), interpret-mode kernel vs the XLA decomposition and NumPy.

The kernel must be EXACT (same survivor set), not approximate: identify
semantics threshold the returned scores (reference speaker_detection
:1031-1133), so a missed profile is a wrong answer, not a quality knob.
Score tolerances below cover matmul-precision differences only.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sdtk_tpu.ops import topk  # noqa: E402
from sdtk_tpu.ops.research import topk_pallas  # noqa: E402


def _numpy_ref(q, p, k):
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    pn = p / np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-12)
    m = (qn @ pn.T).max(axis=0)
    idx = np.argsort(-m, kind="stable")[:k]
    return m[idx], idx


@pytest.mark.parametrize(
    "w,n,d,k",
    [
        (5, 300, 192, 7),       # ragged N, small k
        (64, 5000, 192, 64),    # serving-ish shape, k = cap
        (1, 100, 192, 3),       # single window, N < tile
        (12, 2049, 192, 10),    # N = tile + 1 (padding row masked?)
        (200, 4096, 64, 16),    # W > 128, non-standard D
        (9, 17, 192, 17),       # k == N
    ],
)
def test_pallas_matches_xla_and_numpy(w, n, d, k):
    rng = np.random.default_rng(w * 1000 + n + k)
    q = rng.standard_normal((w, d)).astype(np.float32)
    p = rng.standard_normal((n, d)).astype(np.float32)

    s_pl, i_pl = topk_pallas.identify_topk_pallas(
        jnp.asarray(q), jnp.asarray(p), k=k, interpret=True
    )
    s_xla, i_xla = topk.identify_topk_xla(jnp.asarray(q), jnp.asarray(p), k=k)
    s_pl, i_pl = np.asarray(s_pl), np.asarray(i_pl)

    # kernel ≡ XLA decomposition: identical survivor set, scores to
    # float-assoc tolerance
    assert set(i_pl.tolist()) == set(np.asarray(i_xla).tolist())
    np.testing.assert_allclose(
        np.sort(s_pl), np.sort(np.asarray(s_xla)), rtol=0, atol=1e-5
    )

    # and against the NumPy oracle within matmul precision
    s_np, i_np = _numpy_ref(q, p, k)
    np.testing.assert_allclose(
        np.sort(s_pl), np.sort(s_np), rtol=0, atol=2e-3
    )


def test_scores_sorted_descending_and_indices_align():
    rng = np.random.default_rng(7)
    q = rng.standard_normal((8, 192)).astype(np.float32)
    p = rng.standard_normal((700, 192)).astype(np.float32)
    s, i = topk_pallas.identify_topk_pallas(
        jnp.asarray(q), jnp.asarray(p), k=5, interpret=True
    )
    s, i = np.asarray(s), np.asarray(i)
    assert np.all(np.diff(s) <= 1e-7)
    # each returned score must equal that profile row's best-window cosine
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    m = (qn @ pn.T).max(axis=0)
    np.testing.assert_allclose(s, m[i], rtol=0, atol=2e-3)


def test_negative_scores_not_displaced_by_padding():
    """All-true-negative geometry: padded profile/query rows (zeros → raw
    score 0 > real negatives) must never outrank genuine rows."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(192).astype(np.float32)
    p = np.tile(-base, (130, 1)) + 0.01 * rng.standard_normal((130, 192)).astype(
        np.float32
    )
    q = np.tile(base, (3, 1)) + 0.01 * rng.standard_normal((3, 192)).astype(
        np.float32
    )
    s, i = topk_pallas.identify_topk_pallas(
        jnp.asarray(q), jnp.asarray(p), k=4, interpret=True
    )
    s = np.asarray(s)
    assert np.all(s < -0.9), s  # anti-aligned: every score deeply negative
    assert np.all(np.asarray(i) < 130)


def test_bf16_profiles_accepted():
    rng = np.random.default_rng(11)
    q = rng.standard_normal((6, 192)).astype(np.float32)
    p = rng.standard_normal((512, 192)).astype(np.float32)
    s16, i16 = topk_pallas.identify_topk_pallas(
        jnp.asarray(q), jnp.asarray(p, dtype=jnp.bfloat16), k=8, interpret=True
    )
    s_np, _ = _numpy_ref(q, p, 8)
    np.testing.assert_allclose(
        np.sort(np.asarray(s16)), np.sort(s_np), rtol=0, atol=2e-2
    )


def test_k_above_kernel_cap_falls_back():
    rng = np.random.default_rng(5)
    q = rng.standard_normal((4, 192)).astype(np.float32)
    p = rng.standard_normal((400, 192)).astype(np.float32)
    s, i = topk_pallas.identify_topk_pallas(
        jnp.asarray(q), jnp.asarray(p), k=topk_pallas.MAX_KERNEL_K + 50, interpret=True
    )
    s_np, i_np = _numpy_ref(q, p, topk_pallas.MAX_KERNEL_K + 50)
    np.testing.assert_allclose(
        np.sort(np.asarray(s)), np.sort(s_np), rtol=0, atol=2e-3
    )


def test_dispatcher_host_api():
    rng = np.random.default_rng(9)
    q = rng.standard_normal((4, 192)).astype(np.float32)
    p = rng.standard_normal((256, 192)).astype(np.float32)
    s, i = topk.identify_topk(q, p, k=6)
    assert s.shape == (6,) and i.shape == (6,)
    s_np, _ = _numpy_ref(q, p, 6)
    np.testing.assert_allclose(np.sort(s), np.sort(s_np), rtol=0, atol=2e-3)


def test_identify_fused_path_matches_dense(speakers_dir, tmp_path, monkeypatch):
    """backends/base.py identify_speaker: the SDTK_IDENTIFY_TOPK_N-gated
    fused route must return the same speakers/scores as the dense path."""
    monkeypatch.setenv("SPEAKER_DETECTION_BACKEND", "fake")
    from sdtk_tpu.pipeline import identify as ID
    from test_identify import voice_wav

    ID.enroll(
        "alice",
        voice_wav(tmp_path / "a1.wav", 220, seed=1),
        create_missing=True,
        name="Alice",
    )
    ID.enroll(
        "bob",
        voice_wav(tmp_path / "b1.wav", 520, seed=3),
        create_missing=True,
        name="Bob",
    )
    probe = voice_wav(tmp_path / "a2.wav", 220, seed=2)

    dense = ID.identify(probe, threshold=-1.0)
    monkeypatch.setenv("SDTK_IDENTIFY_TOPK_N", "1")  # force the fused route
    fused = ID.identify(probe, threshold=-1.0)

    assert [r["speaker_id"] for r in fused] == [r["speaker_id"] for r in dense]
    for a, b in zip(fused, dense):
        assert abs(a["confidence"] - b["confidence"]) < 2e-3
        assert a["embedding_id"] == b["embedding_id"]
