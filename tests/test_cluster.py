"""Clustering stack: affinity, spectral, AHC, DER, full diarization."""

import numpy as np
import pytest

from sdtk_tpu.cluster import (
    ahc_labels,
    cosine_affinity,
    diarization_error_rate,
    refine_affinity,
    spectral_cluster,
)
from sdtk_tpu.cluster.der import labels_to_segments
from sdtk_tpu.cluster.spectral import kmeans, topk_eigvecs_subspace, normalized_laplacian


def blob_embeddings(n_per, centers, noise=0.05, seed=0, d=16):
    """Well-separated unit-norm cluster centers + Gaussian noise.

    Centers are orthogonalized: raw Gaussian pairs can land at cosine >0.5
    by chance (e.g. 0.54 at seed 2), which models two near-identical
    voices rather than distinct speakers — distinct-speaker embeddings sit
    below the 0.354 verify threshold (SURVEY.md §6)."""
    rng = np.random.default_rng(seed)
    cs = np.linalg.qr(rng.standard_normal((d, centers)))[0].T[:centers]
    cs /= np.linalg.norm(cs, axis=1, keepdims=True)
    embs, labels = [], []
    for c in range(centers):
        e = cs[c] + noise * rng.standard_normal((n_per, d))
        embs.append(e)
        labels += [c] * n_per
    return np.concatenate(embs).astype(np.float32), np.array(labels)


def agreement(pred, true):
    """Cluster agreement via best matching (greedy over confusion)."""
    from scipy.optimize import linear_sum_assignment

    k = max(pred.max(), true.max()) + 1
    conf = np.zeros((k, k))
    for p, t in zip(pred, true):
        conf[p, t] += 1
    r, c = linear_sum_assignment(-conf)
    return conf[r, c].sum() / len(pred)


def test_affinity_matrix():
    emb, _ = blob_embeddings(5, 2)
    aff = np.asarray(cosine_affinity(emb))
    assert aff.shape == (10, 10)
    assert np.all(aff >= -1e-6) and np.all(aff <= 1 + 1e-6)
    np.testing.assert_allclose(np.diag(aff), 1.0, atol=1e-5)
    ref = np.asarray(refine_affinity(aff))
    assert ref.shape == (10, 10)
    np.testing.assert_allclose(ref, ref.T, atol=1e-6)


def test_spectral_cluster_known_k():
    emb, true = blob_embeddings(20, 3, seed=1)
    labels, k = spectral_cluster(emb, n_speakers=3)
    assert k == 3
    assert agreement(labels, true) > 0.95


def test_spectral_cluster_auto_k():
    emb, true = blob_embeddings(25, 2, seed=2)
    labels, k = spectral_cluster(emb)
    assert k == 2
    assert agreement(labels, true) > 0.95


def test_merge_count_exact_linkage():
    """merge_count's group-mean dot equals mean pairwise cosine, so two
    halves of one tight cluster merge and two distant clusters don't."""
    from sdtk_tpu.cluster.spectral import merge_count

    emb, true = blob_embeddings(10, 2, noise=0.03, seed=5)
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    # over-clustered start: each true cluster split in two
    labels0 = np.array([0] * 5 + [1] * 5 + [2] * 5 + [3] * 5)
    k, merged = merge_count(e, labels0, tau=0.47)
    assert k == 2
    # merged labels respect the true partition
    assert len(set(merged[:10])) == 1 and len(set(merged[10:])) == 1
    assert merged[0] != merged[10]


def test_merge_count_respects_tau():
    from sdtk_tpu.cluster.spectral import merge_count

    emb, _ = blob_embeddings(10, 2, noise=0.03, seed=6)
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    labels0 = np.array([0] * 10 + [1] * 10)
    # orthogonal clusters: mean cross-cosine ~0 — never merged at tau 0.47,
    # always merged at tau -1
    assert merge_count(e, labels0, tau=0.47)[0] == 2
    assert merge_count(e, labels0, tau=-1.0)[0] == 1


def test_diarizer_auto_count_robust_to_merge_tau(speakers_dir):
    """Auto speaker counting no longer hinges on one absolute cosine
    constant: turn-level statistics with evidence-based absorption
    (cluster/turns.py) count correctly even under an impossibly high
    absolute bar — which previously forced k = max_speakers (r2's
    window-level rule conversely collapsed held-out meetings to k=1)."""
    from sdtk_tpu.pipeline.diarize import DiarizeConfig, Diarizer

    from sdtk_tpu.data.synth import synth_utterance

    wav = np.concatenate(
        [synth_utterance(0, 1, 3.0), synth_utterance(1, 2, 3.0)]
    )
    # window pinned at 1.5/0.75: this test pins the COUNTING rule under
    # an absurd tau, and the fake backend's spectral features need the
    # longer window on this 6 s two-utterance fixture (the r4 1.0 s
    # default is tuned for the trained embedding space, see DiarizeConfig)
    d = Diarizer("fake", DiarizeConfig(max_speakers=4, merge_tau=1.01,
                                       resegment=False,
                                       window_seconds=1.5, hop_seconds=0.75))
    assert d.diarize_waveform(wav)["n_speakers"] == 2
    d2 = Diarizer("fake", DiarizeConfig(max_speakers=4, window_seconds=1.5,
                                        hop_seconds=0.75))
    assert d2.diarize_waveform(wav)["n_speakers"] == 2


def test_spectral_cluster_edge_cases():
    assert spectral_cluster(np.zeros((0, 8), np.float32))[1] == 0
    labels, k = spectral_cluster(np.ones((1, 8), np.float32))
    assert k == 1 and labels.tolist() == [0]
    # single cluster: tight blob
    emb, _ = blob_embeddings(20, 1, noise=0.01, seed=3)
    labels, k = spectral_cluster(emb)
    assert k == 1


def test_subspace_eigensolver_matches_eigh():
    import jax.numpy as jnp

    emb, _ = blob_embeddings(30, 3, seed=4)
    aff = refine_affinity(cosine_affinity(jnp.asarray(emb)))
    lap = normalized_laplacian(aff)
    full_vals = np.linalg.eigh(np.asarray(lap))[0]
    vals, vecs = topk_eigvecs_subspace(lap, 5, n_iters=100)
    np.testing.assert_allclose(np.asarray(vals), full_vals[:5], atol=1e-3)
    # residual check: L v ≈ λ v
    lv = np.asarray(lap) @ np.asarray(vecs)
    res = np.linalg.norm(lv - np.asarray(vecs) * np.asarray(vals), axis=0)
    assert res.max() < 1e-2


def test_kmeans_separates():
    import jax.numpy as jnp

    emb, true = blob_embeddings(30, 4, seed=5)
    labels = np.asarray(kmeans(jnp.asarray(emb), 4))
    assert agreement(labels, true) > 0.9


def test_ahc():
    emb, true = blob_embeddings(8, 3, noise=0.03, seed=6)
    labels = ahc_labels(emb, n_speakers=3)
    assert agreement(labels, true) > 0.95
    # threshold mode stops on its own
    labels2 = ahc_labels(emb, threshold=0.8)
    assert labels2.max() + 1 >= 2


def test_der_perfect_and_errors():
    ref = [(0.0, 5.0, "A"), (5.0, 10.0, "B")]
    # perfect (different label names — mapping should fix)
    hyp = [(0.0, 5.0, "X"), (5.0, 10.0, "Y")]
    m = diarization_error_rate(ref, hyp, collar=0.0)
    assert m["der"] < 1e-6
    # total miss
    m2 = diarization_error_rate(ref, [], collar=0.0)
    assert abs(m2["der"] - 1.0) < 1e-6 and abs(m2["miss"] - 1.0) < 1e-6
    # half confused
    hyp3 = [(0.0, 5.0, "X"), (5.0, 10.0, "X")]
    m3 = diarization_error_rate(ref, hyp3, collar=0.0)
    assert abs(m3["confusion"] - 0.5) < 0.02
    # collar forgives boundary jitter
    hyp4 = [(0.1, 5.1, "X"), (5.1, 9.9, "Y")]
    assert diarization_error_rate(ref, hyp4, collar=0.25)["der"] < 0.01


def test_labels_to_segments():
    labels = np.array([0, 0, 1, 1, 0])
    starts = np.array([0.0, 0.75, 1.5, 2.25, 3.0])
    segs = labels_to_segments(labels, starts, 1.5)
    assert segs[0] == (0.0, 2.25, "SPK00")
    assert segs[1] == (1.5, 3.75, "SPK01")
    assert segs[2] == (3.0, 4.5, "SPK00")


def test_diarize_two_voices(speakers_dir, tmp_path, monkeypatch):
    """Synthetic two-speaker conversation diarized with the fake backend."""
    from sdtk_tpu.pipeline.diarize import DiarizeConfig, Diarizer, to_rttm, to_transcript_skeleton
    from sdtk_tpu.utils.audio import save_wav

    sr = 16000
    rng = np.random.default_rng(7)

    def voice(freq, seconds):
        t = np.arange(int(seconds * sr)) / sr
        x = sum((0.5 / (k + 1)) * np.sin(2 * np.pi * freq * (k + 1) * t) for k in range(4))
        return (0.4 * x / np.max(np.abs(x))).astype(np.float32)

    # A(0-4s) B(4-8s) A(8-12s)
    wav = np.concatenate([voice(220, 4), voice(520, 4), voice(220, 4)])
    wav += 0.005 * rng.standard_normal(len(wav)).astype(np.float32)

    d = Diarizer("fake", DiarizeConfig(n_speakers=2, vad="energy"))
    res = d.diarize_waveform(wav)
    assert res["n_speakers"] == 2
    segs = res["segments"]
    assert segs[0][2] == "S1"
    ref = [(0, 4, "A"), (4, 8, "B"), (8, 12, "A")]
    hyp = [(s, e, l) for s, e, l in segs]
    der = diarization_error_rate(ref, hyp, collar=0.75)
    assert der["der"] < 0.15, der

    rttm = to_rttm(res, "test")
    assert rttm.startswith("SPEAKER test 1 ")
    sk = to_transcript_skeleton(res)
    from sdtk_tpu.transcripts import get_available_speakers

    assert get_available_speakers(sk) == ["S1", "S2"]


def test_load_rttm_roundtrip(tmp_path):
    """RTTM parse: NIST SPEAKER lines grouped per recording, sorted by start."""
    from sdtk_tpu.cluster.der import load_rttm

    p = tmp_path / "ref.rttm"
    p.write_text(
        "SPEAKER rec1 1 4.00 2.50 <NA> <NA> bob <NA> <NA>\n"
        "SPEAKER rec1 1 0.00 4.00 <NA> <NA> alice <NA> <NA>\n"
        ";; comment line\n"
        "SPEAKER rec2 1 1.00 1.00 <NA> <NA> carol <NA>\n"
    )
    refs = load_rttm(p)
    assert set(refs) == {"rec1", "rec2"}
    assert refs["rec1"] == [(0.0, 4.0, "alice"), (4.0, 6.5, "bob")]
    assert refs["rec2"] == [(1.0, 2.0, "carol")]


def test_diarize_cli_eval_rttm(speakers_dir, tmp_path, capsys):
    """`diarize run --eval-rttm` reports DER against a reference RTTM."""
    import json

    from sdtk_tpu.cli import diarize as cli_diarize
    from sdtk_tpu.utils.audio import save_wav

    sr = 16000
    t = np.arange(4 * sr) / sr
    a = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    b = (0.4 * np.sin(2 * np.pi * 520 * t)).astype(np.float32)
    wav_path = tmp_path / "conv.wav"
    save_wav(wav_path, np.concatenate([a, b]), sr)
    rttm_path = tmp_path / "ref.rttm"
    rttm_path.write_text(
        "SPEAKER rec 1 0.00 4.00 <NA> <NA> A <NA> <NA>\n"
        "SPEAKER rec 1 4.00 4.00 <NA> <NA> B <NA> <NA>\n"
    )
    rc = cli_diarize.main(
        [str(wav_path), "--backend", "fake", "--num-speakers", "2",
         "--format", "json", "--eval-rttm", str(rttm_path),
         "--vad", "energy"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "der" in out and out["der"]["der"] < 0.3, out.get("der")


def test_viterbi_smooths_isolated_flips():
    """A single-window label flip inside a long run is corrected by the
    sticky-HMM pass; genuine speaker changes survive."""
    from sdtk_tpu.cluster.resegment import resegment

    rng = np.random.default_rng(3)
    d = 16
    c0 = rng.standard_normal(d)
    c1 = rng.standard_normal(d)
    # truth: 10 windows spk0, 10 windows spk1
    emb = np.stack([c0 + 0.1 * rng.standard_normal(d) for _ in range(10)]
                   + [c1 + 0.1 * rng.standard_normal(d) for _ in range(10)])
    labels = np.array([0] * 10 + [1] * 10)
    noisy = labels.copy()
    noisy[4] = 1   # isolated flip
    noisy[14] = 0  # isolated flip
    # corrupt the flipped embeddings only mildly so likelihood still favors truth
    fixed = resegment(emb, noisy, 2)
    np.testing.assert_array_equal(fixed, labels)


def test_resegment_adapts_to_compressed_geometry():
    """Band-limited channels (telephone tier) compress the centroid-
    similarity gap; the fixed emission temperature let the switch
    penalty steamroll genuine turns (r3: reseg made telephone labels
    WORSE than skipping it).  The adaptive temperature must preserve a
    real 4-window turn in exactly that geometry while still smoothing a
    single-window flip."""
    from sdtk_tpu.cluster.resegment import resegment

    rng = np.random.default_rng(7)
    d = 64
    base = rng.standard_normal(d)
    delta = rng.standard_normal(d)
    delta -= delta @ base / (base @ base) * base
    # two close centroids: cosine(c0, c1) ≈ 0.97 — a compressed geometry
    c0 = base / np.linalg.norm(base)
    c1 = c0 + 0.25 * delta / np.linalg.norm(delta)
    c1 /= np.linalg.norm(c1)
    mk = lambda c, n: np.stack(
        [c + 0.05 * rng.standard_normal(d) for _ in range(n)])
    emb = np.concatenate([mk(c0, 8), mk(c1, 4), mk(c0, 8)])
    truth = np.array([0] * 8 + [1] * 4 + [0] * 8)
    # the old fixed scale=10 collapses the middle turn into speaker 0
    collapsed = resegment(emb, truth, 2, scale=10.0)
    assert (collapsed == 0).all(), "geometry not compressed enough for the test"
    # adaptive temperature keeps the genuine turn
    kept = resegment(emb, truth, 2)
    np.testing.assert_array_equal(kept, truth)
    # ...and still smooths an isolated flip
    noisy = truth.copy()
    noisy[3] = 1
    np.testing.assert_array_equal(resegment(emb, noisy, 2), truth)


def test_viterbi_decode_prefers_sticky_paths():
    from sdtk_tpu.cluster.resegment import viterbi_decode
    import jax.numpy as jnp

    # weak evidence for a 1-frame excursion: decoder should stay
    ll = jnp.asarray([[2.0, 0.0], [2.0, 0.0], [0.0, 0.5], [2.0, 0.0]])
    path = np.asarray(viterbi_decode(ll, 2))
    np.testing.assert_array_equal(path, [0, 0, 0, 0])
    # strong evidence on the excursion AND the return frame: both survive
    # (the return needs >2.9 of evidence to beat the -3 switch penalty)
    ll = jnp.asarray([[2.0, 0.0], [2.0, 0.0], [0.0, 9.0], [4.0, 0.0]])
    path = np.asarray(viterbi_decode(ll, 2))
    np.testing.assert_array_equal(path, [0, 0, 1, 0])


def test_overlap_detection(speakers_dir):
    """A region where two voices sum is flagged with a secondary speaker."""
    from sdtk_tpu.pipeline.diarize import DiarizeConfig, Diarizer

    sr = 16000
    rng = np.random.default_rng(5)

    def voice(freq, seconds):
        t = np.arange(int(seconds * sr)) / sr
        x = sum((0.5 / (k + 1)) * np.sin(2 * np.pi * freq * (k + 1) * t)
                for k in range(4))
        return (0.4 * x / np.max(np.abs(x))).astype(np.float32)

    a, b = voice(220, 4), voice(520, 4)
    overlap = 0.5 * (voice(220, 3) + voice(520, 3))
    wav = np.concatenate([a, overlap, b])
    wav += 0.005 * rng.standard_normal(len(wav)).astype(np.float32)

    d = Diarizer("fake", DiarizeConfig(n_speakers=2, detect_overlap=True,
                                       resegment=False, vad="energy"))
    res = d.diarize_waveform(wav)
    assert res["n_speakers"] == 2
    assert "overlap_segments" in res
    # at least one overlap segment intersects the 4-7 s mixed region
    hits = [s for s in res["overlap_segments"] if s[0] < 7.0 and s[1] > 4.0]
    assert hits, res["overlap_segments"]
    # pure single-voice conversation → no (or almost no) overlap flagged
    wav2 = np.concatenate([a, b])
    res2 = d.diarize_waveform(wav2 + 0.005 * rng.standard_normal(len(wav2)).astype(np.float32))
    total_overlap = sum(e - s for s, e, _ in res2["overlap_segments"])
    assert total_overlap <= 3.0, res2["overlap_segments"]


def test_cluster_stage_fused_parity():
    """cluster_stage (the fusable bench path) agrees with the reference
    pipeline for both eigensolvers — same labels up to permutation."""
    from sdtk_tpu.cluster.spectral import cluster_stage

    emb, true = blob_embeddings(20, 4, seed=3)
    dense = np.asarray(cluster_stage(emb, max_speakers=4, use_subspace=False))
    sub = np.asarray(cluster_stage(emb, max_speakers=4, use_subspace=True))
    assert agreement(dense, true) > 0.95
    assert agreement(sub, true) > 0.95
    assert agreement(dense, sub) > 0.95


def test_cluster_stage_traceable_under_jit():
    """cluster_stage must compose into a larger jit program (the fused
    single-dispatch bench path) without concretization errors."""
    import jax
    import jax.numpy as jnp

    from sdtk_tpu.cluster.spectral import cluster_stage

    emb, true = blob_embeddings(16, 2, seed=4)

    @jax.jit
    def program(x):
        # a fake "tower": affine transform, then the cluster stage inline
        return cluster_stage(x * 1.0, max_speakers=2, use_subspace=True)

    labels = np.asarray(program(jnp.asarray(emb)))
    assert agreement(labels, true) > 0.95


def _group(center, n, noise, rng, d=32):
    e = center + noise * rng.standard_normal((n, d))
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def test_merge_rel_keeps_moderate_linkage_apart():
    """The held-out-collapse scenario: two DISTINCT speakers whose
    cross-linkage (~0.5) exceeds the fixed tau (0.47) but sits well below
    their within-linkage — the relative rule keeps them apart where the
    absolute rule wrongly merged."""
    from sdtk_tpu.cluster.spectral import merge_count

    rng = np.random.default_rng(0)
    d = 32
    base = rng.standard_normal(d)
    base /= np.linalg.norm(base)
    other = rng.standard_normal(d)
    other -= (other @ base) * base
    other /= np.linalg.norm(other)
    # cosine(base, mix) ≈ 0.55 — moderately linked distinct speakers
    # (above the 0.47 fixed bar, far below the ~0.99 within-linkage)
    mix = 0.55 * base + np.sqrt(1 - 0.55**2) * other
    emb = np.concatenate([_group(base, 12, 0.05, rng, d),
                          _group(mix, 12, 0.05, rng, d)])
    labels = np.array([0] * 12 + [1] * 12)

    k_abs, _ = merge_count(emb, labels, tau=0.47)
    assert k_abs == 1  # the fixed bar collapses them (the r1 failure mode)
    k_rel, _ = merge_count(emb, labels, tau=0.47, rel=0.75)
    assert k_rel == 2  # scale-free bar keeps them apart


def test_merge_rel_still_merges_same_speaker_split():
    """A genuinely split speaker (between ≈ within) must still merge
    under the relative rule."""
    from sdtk_tpu.cluster.spectral import merge_count

    rng = np.random.default_rng(1)
    base = rng.standard_normal(32)
    base /= np.linalg.norm(base)
    emb = np.concatenate([_group(base, 10, 0.15, rng),
                          _group(base, 10, 0.15, rng)])
    labels = np.array([0] * 10 + [1] * 10)
    k, merged = merge_count(emb, labels, tau=0.47, rel=0.75)
    assert k == 1
    assert len(set(merged)) == 1


def test_merge_rel_singleton_falls_back_to_tau():
    """Groups too small to measure within-linkage use the absolute bar."""
    from sdtk_tpu.cluster.spectral import merge_count

    rng = np.random.default_rng(2)
    base = rng.standard_normal(32)
    base /= np.linalg.norm(base)
    emb = np.concatenate([_group(base, 1, 0.0, rng),
                          _group(base, 1, 0.02, rng)])
    labels = np.array([0, 1])
    k, _ = merge_count(emb, labels, tau=0.47, rel=0.75)
    assert k == 1  # cosine ≈ 1 ≥ tau → merge despite unmeasurable within


def test_spectral_cluster_merge_rel_plumbed():
    emb, true = blob_embeddings(20, 3, seed=5)
    labels, k = spectral_cluster(emb, merge_rel=0.75)
    assert k == 3
    assert agreement(labels, true) > 0.95


def test_overlap_meeting_synthesis_and_scoring():
    """--overlap-frac meetings contain genuinely overlapping reference
    intervals, and the frame-based scorer charges a single-track
    hypothesis a MISS for the second active speaker (r2 VERDICT missing
    #4: overlap must be visible to the quality harness)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "evals"))
    from benchmark_der import build_meeting

    from sdtk_tpu.cluster import diarization_error_rate

    wav, ref = build_meeting(1, n_speakers=3, n_turns=12, turn_s=3.0,
                             overlap_frac=0.6)
    # at least one pair of reference segments overlaps in time
    overlaps = [
        (a, b) for a in ref for b in ref
        if a is not b and a[0] < b[0] < a[1]
    ]
    assert overlaps, "overlap_frac must produce overlapping reference turns"
    assert len(wav) >= int(ref[-1][1] * 16000)

    # perfect single-track hypothesis (primary speaker only): the scorer
    # must charge the overlapped second speaker as MISS
    hyp = []
    for i, (s, e, lbl) in enumerate(ref):
        nxt = ref[i + 1][0] if i + 1 < len(ref) else e
        hyp.append((s, min(e, max(nxt, s + 0.01)), lbl))
    m = diarization_error_rate(ref, hyp, collar=0.0)
    assert m["miss"] > 0.02, m
    # the full reference as hypothesis scores ~0
    assert diarization_error_rate(ref, ref, collar=0.0)["der"] < 1e-9


def test_turn_segmentation_and_counting():
    """cluster/turns.py unit behavior on controlled geometry: segment
    boundaries at similarity dips, phantom singleton absorption, and the
    1-speaker structure guard."""
    from sdtk_tpu.cluster import turns as T

    rng = np.random.default_rng(5)
    d = 32

    def voice(seed):
        v = rng.standard_normal(d) if seed is None else \
            np.random.default_rng(seed).standard_normal(d)
        return v / np.linalg.norm(v)

    a, b, c = voice(1), voice(2), voice(3)

    def windows(base, n, noise=0.08):
        w = base[None, :] + noise * rng.standard_normal((n, d))
        return w / np.linalg.norm(w, axis=1, keepdims=True)

    # A(5) B(5) A(4): boundaries detected, count 2
    emb = np.concatenate([windows(a, 5), windows(b, 5), windows(a, 4)])
    starts = np.arange(len(emb)) * 0.75
    seg = T.turn_segment_ids(emb, starts)
    assert seg.max() + 1 >= 3  # at least the three true turns
    labels, k = T.turn_cluster(emb, starts)
    assert k == 2
    assert labels[0] == labels[-1] and labels[0] != labels[7]

    # single speaker: structure guard → k = 1
    emb1 = windows(a, 12)
    labels1, k1 = T.turn_cluster(emb1, np.arange(12) * 0.75)
    assert k1 == 1 and set(labels1) == {0}

    # three speakers
    emb3 = np.concatenate([windows(a, 5), windows(b, 5), windows(c, 5),
                           windows(a, 5), windows(b, 5)])
    _, k3 = T.turn_cluster(emb3, np.arange(len(emb3)) * 0.75)
    assert k3 == 3

    # a single boundary-straddling window between A and B must not
    # become a phantom third speaker
    mid = (a + b) / np.linalg.norm(a + b)
    embp = np.concatenate([windows(a, 5), mid[None, :], windows(b, 5)])
    _, kp = T.turn_cluster(embp, np.arange(len(embp)) * 0.75)
    assert kp == 2


def test_boundary_refine_crossing():
    """cluster/boundary.py: one localized cut per label change — no
    overlapping claims (the collar-0.25 residual the r4 oracle measured),
    cut at the interpolated similarity crossing."""
    from sdtk_tpu.cluster.boundary import refine_segments

    rng = np.random.default_rng(0)
    d = 16
    a = rng.standard_normal(d); a /= np.linalg.norm(a)
    b = rng.standard_normal(d); b -= (b @ a) * a; b /= np.linalg.norm(b)
    # 5 windows of A, 5 of B, 1.0 s windows at 0.375 s hop; the last A
    # window is slightly mixed toward B (turn starts inside it)
    emb = np.stack([a] * 5 + [b] * 5)
    emb[4] = 0.6 * a + 0.4 * b
    emb[5] = 0.1 * a + 0.9 * b
    labels = np.array([0] * 5 + [1] * 5)
    starts = np.arange(10) * 0.375
    segs = refine_segments(emb, labels, starts, 1.0)
    assert len(segs) == 2
    (s0, e0, l0), (s1, e1, l1) = segs
    assert l0 == "S00" and l1 == "S01"
    assert s0 == 0.0 and e1 == starts[-1] + 1.0
    # exactly one cut, shared, inside the physical overlap of windows 4/5
    assert e0 == s1
    assert starts[5] <= e0 <= starts[4] + 1.0
    # window 4 is already mixed toward B (the turn starts inside it), so
    # its A-margin is small and the crossing lands EARLIER than the
    # naive midpoint of the overlap region
    naive = 0.5 * (starts[5] + starts[4] + 1.0)
    assert e0 < naive + 1e-9

    # vs labels_to_segments: the old claims overlap by window - hop
    from sdtk_tpu.cluster.der import labels_to_segments

    old = labels_to_segments(labels, starts, 1.0, prefix="S")
    assert old[0][1] > old[1][0]  # the quantized overlap being removed


def test_boundary_refine_pause_snap_and_gaps():
    from sdtk_tpu.cluster.boundary import refine_segments

    d = 8
    a = np.eye(d)[0]; b = np.eye(d)[1]
    emb = np.stack([a] * 3 + [b] * 3)
    labels = np.array([0] * 3 + [1] * 3)
    starts = np.arange(6) * 0.375
    # a VAD pause at 1.30-1.44 s sits inside the snap radius of the cut
    spans = [(0.0, 1.30), (1.44, 3.0)]
    segs = refine_segments(emb, labels, starts, 1.0, speech_spans=spans)
    assert segs[0][1] == segs[1][0] == pytest.approx(1.37, abs=1e-6)

    # contiguity break (VAD-removed windows) still splits segments
    starts_gap = np.array([0.0, 0.375, 0.75, 3.0, 3.375, 3.75])
    segs2 = refine_segments(emb, np.zeros(6, int), starts_gap, 1.0)
    assert len(segs2) == 2
    assert segs2[0][1] == pytest.approx(0.75 + 1.0)
    assert segs2[1][0] == pytest.approx(3.0)
