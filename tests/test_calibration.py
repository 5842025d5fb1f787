"""Score-calibration seam: affine map from raw cosine space onto the
reference's 0.354 operating point (backends/base.py calibrate_score,
backends/tpu.py sidecar loading, evals/calibrate_threshold.py math)."""

import json

import numpy as np

from sdtk_tpu.backends.base import LocalEmbeddingBackend


class _StubBackend(LocalEmbeddingBackend):
    """Minimal local backend for exercising the shared identify path."""

    @property
    def name(self):
        return "stub"

    @property
    def embedding_dim(self):
        return 4

    @property
    def model_version(self):
        return "stub-v1"

    def embed_waveform(self, wav):
        return np.array([1.0, 0.0, 0.0, 0.0], np.float32)


def test_default_calibration_is_identity():
    b = _StubBackend()
    sims = np.array([[0.2, 0.9], [0.5, 0.1]], np.float32)
    np.testing.assert_array_equal(b.calibrate_score(sims), sims)


def test_eer_point_math():
    from evals.calibrate_threshold import eer_point

    rng = np.random.default_rng(0)
    genuine = rng.normal(0.8, 0.05, 500)
    impostor = rng.normal(0.4, 0.05, 500)
    eer, t = eer_point(genuine, impostor)
    # Perfectly separated-ish: EER tiny, threshold between the clouds.
    assert eer < 0.02
    assert 0.5 < t < 0.75


def test_tpu_sidecar_loading_and_mapping(tmp_path, monkeypatch):
    # Build a fake checkpoint path + sidecar and check the affine map.
    from sdtk_tpu.backends.tpu import TpuBackend

    ckpt = tmp_path / "model.msgpack"
    ckpt.write_bytes(b"")  # existence only; engine is stubbed below
    sidecar = ckpt.with_suffix(".calib.json")
    sidecar.write_text(json.dumps({"eer_threshold": 0.7, "gain": 2.0}))

    backend = TpuBackend()

    class _StubEngine:
        params_source = str(ckpt)
        calibration = json.loads(sidecar.read_text())

    backend._engine = _StubEngine()

    raw = np.array([0.7, 0.8, 0.5], np.float32)
    out = backend.calibrate_score(raw)
    # t* maps exactly to the reference threshold.
    assert out[0] == np.float32(0.354)
    np.testing.assert_allclose(out[1], 0.354 + 0.1 * 2.0, atol=1e-6)
    np.testing.assert_allclose(out[2], max(0.354 - 0.2 * 2.0, 0.0), atol=1e-6)
    # Monotone and clipped to [0, 1].
    big = backend.calibrate_score(np.array([5.0], np.float32))
    assert big[0] == 1.0


def test_merge_tau_follows_sidecar(tmp_path):
    from sdtk_tpu.backends.tpu import TpuBackend

    backend = TpuBackend()

    class _StubEngine:
        calibration = {"eer_threshold": 0.7, "gain": 2.0,
                       "suggested_merge_tau": 0.63}

    backend._engine = _StubEngine()
    assert backend.cluster_merge_tau == 0.63

    class _NoCalib:
        calibration = None

    backend._engine = _NoCalib()
    assert backend.cluster_merge_tau == 0.47  # class default


def test_malformed_sidecar_is_ignored(tmp_path):
    from sdtk_tpu.backends.tpu import _EmbedEngine

    ckpt = tmp_path / "model.msgpack"
    sidecar = ckpt.with_suffix(".calib.json")
    sidecar.write_text("{\"eer_threshold\": \"not-a-number\"}")

    class _Probe:
        params_source = str(ckpt)
        _load_calibration = _EmbedEngine._load_calibration

    assert _Probe()._load_calibration() is None


def test_missing_sidecar_is_none(tmp_path):
    from sdtk_tpu.backends.tpu import _EmbedEngine

    class _Probe:
        params_source = str(tmp_path / "nope.msgpack")
        _load_calibration = _EmbedEngine._load_calibration

    assert _Probe()._load_calibration() is None


def test_random_init_never_calibrates():
    from sdtk_tpu.backends.tpu import _EmbedEngine

    class _Probe:
        params_source = "random-init"
        _load_calibration = _EmbedEngine._load_calibration

    assert _Probe()._load_calibration() is None
