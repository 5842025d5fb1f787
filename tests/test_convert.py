"""Pretrained-weight ingestion (tools/convert_ecapa.py).

No network egress exists here, so the SpeechBrain checkpoint is STAND-IN:
a randomly initialized state dict with exactly the published key names and
shapes (speechbrain.lobes.models.ECAPA_TDNN).  The strong assertion is
end-to-end: an independent torch reimplementation of the SpeechBrain
forward (written from the published architecture, NOT from speechbrain
code) must produce the same embeddings as the flax model running the
converted weights.  When real weights arrive the same converter command
applies unchanged (see tools/convert_ecapa.py docstring).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from tools.convert_ecapa import SB_FRONTEND, convert, load_state_dict  # noqa: E402

# small-but-structurally-faithful dimensions (published: C=1024, scale=8,
# se=128, attn=128, mfa=3072, emb=192, n_mels=80)
C, SCALE, SE, ATTN, EMB, NMELS = 64, 4, 16, 32, 48, 24
MFA = 3 * C
DILATIONS = (2, 3, 4)


def make_sb_state_dict(seed: int = 0) -> dict[str, torch.Tensor]:
    g = torch.Generator().manual_seed(seed)

    def w(*shape):
        return 0.2 * torch.randn(*shape, generator=g)

    def conv(prefix, o, i, k):
        return {f"{prefix}.weight": w(o, i, k), f"{prefix}.bias": w(o)}

    def bn(prefix, c):
        return {
            f"{prefix}.weight": 1.0 + 0.1 * torch.randn(c, generator=g),
            f"{prefix}.bias": 0.1 * torch.randn(c, generator=g),
            f"{prefix}.running_mean": 0.1 * torch.randn(c, generator=g),
            f"{prefix}.running_var": (1.0 + 0.1 * torch.randn(c, generator=g)).abs(),
            f"{prefix}.num_batches_tracked": torch.tensor(100),
        }

    sd: dict[str, torch.Tensor] = {}
    sd |= conv("blocks.0.conv.conv", C, NMELS, 5) | bn("blocks.0.norm.norm", C)
    width = C // SCALE
    for i, dil in enumerate(DILATIONS, start=1):
        p = f"blocks.{i}"
        sd |= conv(f"{p}.tdnn1.conv.conv", C, C, 1) | bn(f"{p}.tdnn1.norm.norm", C)
        for j in range(SCALE - 1):
            sd |= conv(f"{p}.res2net_block.blocks.{j}.conv.conv", width, width, 3)
            sd |= bn(f"{p}.res2net_block.blocks.{j}.norm.norm", width)
        sd |= conv(f"{p}.tdnn2.conv.conv", C, C, 1) | bn(f"{p}.tdnn2.norm.norm", C)
        sd |= conv(f"{p}.se_block.conv1.conv", SE, C, 1)
        sd |= conv(f"{p}.se_block.conv2.conv", C, SE, 1)
    sd |= conv("mfa.conv.conv", MFA, 3 * C, 1) | bn("mfa.norm.norm", MFA)
    sd |= conv("asp.tdnn.conv.conv", ATTN, 3 * MFA, 1) | bn("asp.tdnn.norm.norm", ATTN)
    sd |= conv("asp.conv.conv", MFA, ATTN, 1)
    sd |= bn("asp_bn.norm", 2 * MFA)
    sd |= conv("fc.conv", EMB, 2 * MFA, 1)
    return sd


# --------------------------------------------------------------------------
# Independent torch reimplementation of the SpeechBrain ECAPA forward
# (eval mode, full-length batch, zero "same" padding — the converter
# docstring records the reflect-vs-zero boundary caveat).
# --------------------------------------------------------------------------


class _SBRef:
    def __init__(self, sd: dict[str, torch.Tensor]):
        self.sd = {k: v.double() for k, v in sd.items()}

    def conv(self, p, x, dilation=1):
        w, b = self.sd[f"{p}.weight"], self.sd[f"{p}.bias"]
        pad = (w.shape[-1] - 1) // 2 * dilation
        return torch.nn.functional.conv1d(x, w, b, padding=pad, dilation=dilation)

    def bn(self, p, x):
        return torch.nn.functional.batch_norm(
            x, self.sd[f"{p}.running_mean"], self.sd[f"{p}.running_var"],
            self.sd[f"{p}.weight"], self.sd[f"{p}.bias"], training=False,
        )

    def tdnn(self, p, x, dilation=1):
        return self.bn(f"{p}.norm.norm", torch.relu(
            self.conv(f"{p}.conv.conv", x, dilation)))

    def res2(self, p, x, dilation):
        chunks = x.chunk(SCALE, dim=1)
        ys = [chunks[0]]
        for i in range(1, SCALE):
            inp = chunks[i] if i == 1 else chunks[i] + ys[-1]
            ys.append(self.tdnn(f"{p}.blocks.{i - 1}", inp, dilation))
        return torch.cat(ys, dim=1)

    def se(self, p, x):
        s = x.mean(dim=2, keepdim=True)
        s = torch.relu(self.conv(f"{p}.conv1.conv", s))
        s = torch.sigmoid(self.conv(f"{p}.conv2.conv", s))
        return x * s

    def se_res2(self, p, x, dilation):
        r = x
        x = self.tdnn(f"{p}.tdnn1", x)
        x = self.res2(f"{p}.res2net_block", x, dilation)
        x = self.tdnn(f"{p}.tdnn2", x)
        return self.se(f"{p}.se_block", x) + r

    def asp(self, x):
        t = x.shape[2]
        mu = x.mean(dim=2, keepdim=True).expand(-1, -1, t)
        sd_ = x.std(dim=2, unbiased=False, keepdim=True).expand(-1, -1, t)
        ctx = torch.cat([x, mu, sd_], dim=1)
        a = self.tdnn("asp.tdnn", ctx)
        a = self.conv("asp.conv.conv", torch.tanh(a))
        w = torch.softmax(a, dim=2)
        mean = (w * x).sum(dim=2)
        std = torch.sqrt(((w * x * x).sum(dim=2) - mean * mean).clamp(min=1e-5))
        return torch.cat([mean, std], dim=1)

    def forward(self, feats: torch.Tensor) -> torch.Tensor:
        """(B, T, n_mels) → (B, emb)."""
        x = feats.double().transpose(1, 2)  # (B, C, T)
        x = self.tdnn("blocks.0", x)
        outs = []
        for i, dil in enumerate(DILATIONS, start=1):
            x = self.se_res2(f"blocks.{i}", x, dil)
            outs.append(x)
        x = self.tdnn("mfa", torch.cat(outs, dim=1))
        pooled = self.asp(x)
        pooled = self.bn("asp_bn.norm", pooled.unsqueeze(-1)).squeeze(-1)
        w, b = self.sd["fc.conv.weight"], self.sd["fc.conv.bias"]
        return pooled @ w[:, :, 0].T + b


def flax_forward(variables, config, feats: np.ndarray) -> np.ndarray:
    from sdtk_tpu.models import EcapaConfig, EcapaTdnn

    kw = dict(config["model"])
    kw["dilations"] = tuple(kw["dilations"])
    kw["dtype"] = "float32"  # tight-tolerance parity (serving uses bf16)
    model = EcapaTdnn(EcapaConfig(**kw))
    return np.asarray(model.apply(variables, feats))


def test_convert_forward_parity():
    sd = make_sb_state_dict()
    variables, config = convert({k: v.numpy() for k, v in sd.items()})
    assert config["model"]["channels"] == C
    assert config["model"]["scale"] == SCALE
    assert config["model"]["emb_dim"] == EMB
    assert config["model"]["mfa_bn"] and config["model"]["asp_tdnn"]

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 50, NMELS)).astype(np.float32)
    want = _SBRef(sd).forward(torch.from_numpy(feats)).numpy()
    got = flax_forward(variables, config, feats)
    assert got.shape == want.shape == (2, EMB)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert err < 2e-4, f"relative error {err}"


def test_convert_rejects_unknown_keys():
    sd = {k: v.numpy() for k, v in make_sb_state_dict().items()}
    sd["classifier.weight"] = np.zeros((4, 4))
    with pytest.raises(ValueError, match="unmapped"):
        convert(sd)


def test_convert_cli_and_backend_load(tmp_path, monkeypatch):
    """The one-command path: CLI converts a .ckpt, and the tpu backend
    (CPU platform under tests) reconstructs architecture + frontend from
    the sidecar and embeds audio through the converted weights."""
    sd = make_sb_state_dict()
    ckpt = tmp_path / "embedding_model.ckpt"
    torch.save(sd, ckpt)
    out = tmp_path / "ecapa-pretrained.msgpack"
    res = subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools" / "convert_ecapa.py"),
         str(ckpt), "-o", str(out)],
        capture_output=True, text=True, cwd=str(REPO_ROOT),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert Path(info["output"]).exists()
    sidecar = json.loads(Path(info["sidecar"]).read_text())
    assert sidecar["frontend"]["window"] == "hamming"
    assert sidecar["frontend"]["log_scale"] == "db"
    assert sidecar["frontend"]["center"] is True

    monkeypatch.setenv("SDTK_MODEL_PATH", str(out))
    from sdtk_tpu.backends.tpu import TpuBackend

    backend = TpuBackend()
    assert backend.engine.params_source == str(out)
    assert backend.engine.emb_dim == EMB
    assert backend.engine.cfg.window == "hamming"
    assert backend.engine.cfg.n_fft == 400
    wav = np.random.default_rng(2).standard_normal(16000).astype(np.float32)
    emb = backend.embed_waveform(wav)
    assert emb.shape == (EMB,)
    assert np.isfinite(emb).all()


def test_load_state_dict_npz(tmp_path):
    sd = {k: v.numpy() for k, v in make_sb_state_dict().items()}
    p = tmp_path / "weights.npz"
    np.savez(p, **sd)
    loaded = load_state_dict(p)
    assert set(loaded) == set(sd)
    np.testing.assert_array_equal(loaded["fc.conv.weight"], sd["fc.conv.weight"])


def test_sb_frontend_matches_oracle():
    """The SpeechBrain frontend knobs (hamming, centered frames, dB log,
    0 Hz fmin, n_fft=400) run through the jitted device path and match
    the NumPy FFT oracle."""
    from sdtk_tpu.ops.fbank import FrontendConfig, log_mel, log_mel_reference

    cfg = FrontendConfig(n_mels=NMELS, **SB_FRONTEND)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(4000).astype(np.float32)
    feats, mask = log_mel(x[None], cfg)
    assert feats.shape[1] == 1 + len(x) // cfg.hop_length
    assert bool(mask.all())
    oracle = log_mel_reference(x, cfg)
    err = np.abs(np.asarray(feats[0]) - oracle).max()
    assert err < 0.35, f"max abs dB error {err}"  # bf16 DFT vs f64 FFT


HYPERPARAMS_YAML = """\
# ############################################################################
# Model: ECAPA-TDNN for speaker verification (published directory layout)
# ############################################################################

pretrained_path: speechbrain/spkrec-ecapa-voxceleb

sample_rate: 16000
n_mels: 24

embedding_model: !new:speechbrain.lobes.models.ECAPA_TDNN.ECAPA_TDNN
    input_size: !ref <n_mels>

mean_var_norm: !new:speechbrain.processing.features.InputNormalization
    norm_type: global
    std_norm: False

mean_var_norm_emb: !new:speechbrain.processing.features.InputNormalization
    norm_type: global
    std_norm: False
"""


def _make_checkpoint_dir(tmp_path):
    """The published SpeechBrain artifact layout (r4 VERDICT #6):
    hyperparams.yaml + embedding_model.ckpt + mean_var_norm stats +
    classifier files the converter must ignore."""
    d = tmp_path / "spkrec-ecapa-voxceleb"
    d.mkdir()
    (d / "hyperparams.yaml").write_text(HYPERPARAMS_YAML)
    torch.save(make_sb_state_dict(), d / "embedding_model.ckpt")
    g = torch.Generator().manual_seed(9)
    torch.save({"count": 1000,
                "glob_mean": 0.5 * torch.randn(NMELS, generator=g),
                "glob_std": (1.0 + 0.1 * torch.randn(NMELS, generator=g)).abs(),
                "spk_dict_mean": {}, "spk_dict_std": {},
                "spk_dict_count": {}},
               d / "mean_var_norm.ckpt")
    torch.save({"count": 1000,
                "glob_mean": 0.1 * torch.randn(EMB, generator=g)},
               d / "mean_var_norm_emb.ckpt")
    torch.save({"weight": torch.zeros(4, EMB)}, d / "classifier.ckpt")
    (d / "label_encoder.txt").write_text("'spk1' => 0\n")
    return d


def test_convert_checkpoint_directory(tmp_path, monkeypatch):
    """Directory ingestion end-to-end: hyperparams n_mels cross-check,
    global input-norm stats into the sidecar, embedding-norm recorded,
    classifier files ignored, backend applies the input norm, and
    --verify prints the cross-implementation embedding distance."""
    d = _make_checkpoint_dir(tmp_path)
    wav_path = tmp_path / "probe.wav"
    from sdtk_tpu.utils.audio import save_wav

    rng = np.random.default_rng(4)
    save_wav(wav_path, 0.2 * rng.standard_normal(16000).astype(np.float32),
             16000)
    out = tmp_path / "vox.msgpack"
    res = subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools" / "convert_ecapa.py"),
         str(d), "-o", str(out), "--verify", str(wav_path)],
        capture_output=True, text=True, cwd=str(REPO_ROOT),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert set(info["directory_extras"]) == {
        "hyperparams", "input_norm", "embedding_norm"}
    # cross-implementation receipt: flax (f32) vs independent torch
    # reference (f64) on real dB-scale features — rel-err tolerance
    # covers the precision gap, cosine pins the direction
    assert info["verify"]["cosine_similarity"] > 0.9999
    assert info["verify"]["max_rel_err"] < 1e-2

    sidecar = json.loads((tmp_path / "vox.config.json").read_text())
    assert len(sidecar["input_norm"]["mean"]) == NMELS
    assert len(sidecar["input_norm"]["std"]) == NMELS
    assert len(sidecar["embedding_norm"]["mean"]) == EMB
    assert sidecar["frontend"]["sample_rate"] == 16000

    # the serving backend applies the input norm: zero the stats and the
    # embedding must CHANGE
    monkeypatch.setenv("SDTK_MODEL_PATH", str(out))
    from sdtk_tpu.backends.tpu import TpuBackend

    wav = 0.2 * rng.standard_normal(24000).astype(np.float32)
    e_norm = TpuBackend().embed_waveform(wav)
    sidecar2 = dict(sidecar)
    sidecar2.pop("input_norm")
    (tmp_path / "vox.config.json").write_text(json.dumps(sidecar2))
    e_raw = TpuBackend().embed_waveform(wav)
    assert e_norm.shape == e_raw.shape == (EMB,)
    assert not np.allclose(e_norm, e_raw)


def test_convert_directory_nmels_mismatch(tmp_path):
    d = _make_checkpoint_dir(tmp_path)
    (d / "hyperparams.yaml").write_text(
        HYPERPARAMS_YAML.replace("n_mels: 24", "n_mels: 80"))
    res = subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools" / "convert_ecapa.py"),
         str(d), "-o", str(tmp_path / "x.msgpack")],
        capture_output=True, text=True, cwd=str(REPO_ROOT),
    )
    assert res.returncode != 0
    assert "n_mels=80" in res.stderr


def test_parse_hyperparams():
    from tools.convert_ecapa import parse_hyperparams

    hp = parse_hyperparams(HYPERPARAMS_YAML)
    assert hp["n_mels"] == 24 and hp["sample_rate"] == 16000
    assert hp["norm_types"] == {"mean_var_norm": "global",
                                "mean_var_norm_emb": "global"}
