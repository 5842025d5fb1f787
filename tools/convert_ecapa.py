#!/usr/bin/env python3
"""Convert a public pretrained SpeechBrain ECAPA-TDNN checkpoint into a
sdtk_tpu flax msgpack (+ ``.config.json`` sidecar).

SURVEY.md §7 step 4: "load public pretrained weights (SpeechBrain ECAPA)
converted to JAX so DER/assignment parity is achievable without training".
The reference's record format already anticipates locally produced vectors
(reference speaker_detection_backends/base.py:123-124 — ".npy for local
backends"); this tool is the missing ingestion step.  No network egress is
available here, so the converter is exercised against synthetically
constructed state dicts of the published shapes (tests/test_convert.py
builds one and asserts end-to-end forward parity against an independent
torch reimplementation); when real weights are reachable, the one command
is:

    python tools/convert_ecapa.py embedding_model.ckpt \
        -o models/ecapatdnn-voxceleb.msgpack
    SDTK_MODEL_PATH=models/ecapatdnn-voxceleb.msgpack speaker-detection ...

Input: a torch state dict (``torch.save`` .ckpt/.pt, or a .npz with the
same key names).  SpeechBrain layout (speechbrain.lobes.models.ECAPA_TDNN):

    blocks.0.{conv.conv,norm.norm}.*          TDNN stem (k=5)
    blocks.i.tdnn1|res2net_block|tdnn2|se_block.*   SERes2NetBlocks
    mfa.{conv.conv,norm.norm}.*               multi-layer aggregation
    asp.{tdnn.*,conv.conv}.*                  attentive stats pooling
    asp_bn.norm.*                             post-pooling BatchNorm
    fc.conv.*                                 embedding projection

Layout/topology differences are carried by the sidecar, not hand-edited
weights: SpeechBrain's mfa and attention bottleneck are full TDNNBlocks
(conv→relu→BN), so the sidecar sets ``mfa_bn``/``asp_tdnn`` and the flax
graph (models/ecapa.py) grows the matching BatchNorms.  The sidecar also
pins the feature frontend SpeechBrain trained on (hamming window, no
preemphasis, centered torch.stft framing, 10·log10 filterbanks from 0 Hz,
n_fft=400).  Residual caveat recorded here for honesty: SpeechBrain's
Conv1d pads with ``reflect`` while flax pads zeros, so the outermost
k//2·dilation frames of each utterance differ slightly; over pooled
statistics of a ≥1 s window the effect is below score-calibration noise.

Transpose rules: torch Conv1d (O, I, K) → flax (K, I, O); k=1 convs that
map onto flax Dense (SE fc1/fc2, final fc) drop K and transpose to (I, O);
BatchNorm weight/bias → scale/bias (params), running stats → batch_stats.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# SpeechBrain's Fbank defaults (speechbrain.lobes.features.Fbank /
# processing.features.STFT+Filterbank), which the published
# spkrec-ecapa-voxceleb recipe leaves untouched except n_mels.
SB_FRONTEND = {
    "win_length": 400,
    "hop_length": 160,
    "n_fft": 400,
    "window": "hamming",
    "preemphasis": 0.0,
    "log_scale": "db",
    "log_floor": 1e-10,  # SB Filterbank amin
    "mel_fmin": 0.0,
    "center": True,
    "mean_norm": True,  # InputNormalization(norm_type="sentence")
}


def load_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state dict, got {type(obj)}")
    # unwrap common nestings ({"model": sd}, {"embedding_model": sd})
    for key in ("embedding_model", "model", "state_dict"):
        if key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (O, I, K) → flax nn.Conv kernel (K, I, O)."""
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    """torch Conv1d k=1 (O, I, 1) → flax nn.Dense kernel (I, O)."""
    assert w.shape[-1] == 1, f"expected k=1 conv, got {w.shape}"
    return np.ascontiguousarray(w[:, :, 0].T)


class Mapper:
    def __init__(self, sd: dict[str, np.ndarray]):
        self.sd = dict(sd)
        self.params: dict = {}
        self.stats: dict = {}
        self.consumed: set[str] = set()

    def _take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"missing key in state dict: {key}")
        self.consumed.add(key)
        return self.sd[key]

    @staticmethod
    def _put(tree: dict, path: tuple[str, ...], leaf: dict) -> None:
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node.update(leaf)

    def conv(self, sb: str, path: tuple[str, ...]) -> None:
        self._put(self.params, path, {
            "kernel": _conv(self._take(f"{sb}.weight")),
            "bias": self._take(f"{sb}.bias"),
        })

    def dense(self, sb: str, path: tuple[str, ...]) -> None:
        self._put(self.params, path, {
            "kernel": _dense(self._take(f"{sb}.weight")),
            "bias": self._take(f"{sb}.bias"),
        })

    def bn(self, sb: str, path: tuple[str, ...]) -> None:
        self._put(self.params, path, {
            "scale": self._take(f"{sb}.weight"),
            "bias": self._take(f"{sb}.bias"),
        })
        self._put(self.stats, path, {
            "mean": self._take(f"{sb}.running_mean"),
            "var": self._take(f"{sb}.running_var"),
        })
        # present in torch BN state dicts; meaningless for inference
        self.consumed.add(f"{sb}.num_batches_tracked")


def convert(sd: dict[str, np.ndarray], dilations: tuple[int, ...] | None = None
            ) -> tuple[dict, dict]:
    """State dict → ({"params": ..., "batch_stats": ...}, config dict)."""
    m = Mapper(sd)

    stem_w = sd["blocks.0.conv.conv.weight"]  # (C, n_mels, 5)
    channels, n_mels, stem_k = stem_w.shape
    n_se_blocks = len({
        mt.group(1)
        for k in sd
        for mt in [re.match(r"blocks\.(\d+)\.tdnn1\.", k)]
        if mt
    })
    res2_convs = len({
        mt.group(1)
        for k in sd
        for mt in [re.match(r"blocks\.1\.res2net_block\.blocks\.(\d+)\.conv\.", k)]
        if mt
    })
    scale = res2_convs + 1
    se_bottleneck = sd["blocks.1.se_block.conv1.conv.weight"].shape[0]
    mfa_channels = sd["mfa.conv.conv.weight"].shape[0]
    attention_channels = sd["asp.tdnn.conv.conv.weight"].shape[0]
    emb_dim = sd["fc.conv.weight"].shape[0]
    if dilations is None:
        dilations = tuple(range(2, 2 + n_se_blocks))  # published: (2, 3, 4)
    if len(dilations) != n_se_blocks:
        raise ValueError(
            f"--dilations has {len(dilations)} entries but the checkpoint "
            f"has {n_se_blocks} SERes2Net blocks")

    m.conv("blocks.0.conv.conv", ("stem", "conv"))
    m.bn("blocks.0.norm.norm", ("stem", "bn"))
    for i in range(1, n_se_blocks + 1):
        t = f"block{i}"
        m.conv(f"blocks.{i}.tdnn1.conv.conv", (t, "tdnn_in", "conv"))
        m.bn(f"blocks.{i}.tdnn1.norm.norm", (t, "tdnn_in", "bn"))
        for j in range(res2_convs):
            m.conv(f"blocks.{i}.res2net_block.blocks.{j}.conv.conv",
                   (t, "res2", f"conv{j + 1}"))
            m.bn(f"blocks.{i}.res2net_block.blocks.{j}.norm.norm",
                 (t, "res2", f"bn{j + 1}"))
        m.conv(f"blocks.{i}.tdnn2.conv.conv", (t, "tdnn_out", "conv"))
        m.bn(f"blocks.{i}.tdnn2.norm.norm", (t, "tdnn_out", "bn"))
        m.dense(f"blocks.{i}.se_block.conv1.conv", (t, "se", "fc1"))
        m.dense(f"blocks.{i}.se_block.conv2.conv", (t, "se", "fc2"))
    m.conv("mfa.conv.conv", ("mfa",))
    m.bn("mfa.norm.norm", ("mfa_bn",))
    m.conv("asp.tdnn.conv.conv", ("asp", "att1"))
    m.bn("asp.tdnn.norm.norm", ("asp", "att_bn"))
    m.conv("asp.conv.conv", ("asp", "att2"))
    m.bn("asp_bn.norm", ("asp_bn",))
    m.dense("fc.conv", ("embedding",))

    leftover = set(sd) - m.consumed
    if leftover:
        raise ValueError(
            "unmapped keys in state dict (not a SpeechBrain ECAPA layout?): "
            + ", ".join(sorted(leftover)[:8]))

    config = {
        "model": {
            "n_mels": int(n_mels),
            "channels": int(channels),
            "emb_dim": int(emb_dim),
            "scale": int(scale),
            "se_bottleneck": int(se_bottleneck),
            "attention_channels": int(attention_channels),
            "mfa_channels": int(mfa_channels),
            "dilations": list(dilations),
            "mfa_bn": True,
            "asp_tdnn": True,
        },
        "frontend": dict(SB_FRONTEND, n_mels=int(n_mels)),
        "source": "speechbrain-ecapa",
    }
    return {"params": m.params, "batch_stats": m.stats}, config


def verify_structure(variables: dict, config: dict) -> None:
    """Init the flax model from the derived config and require the
    converted tree to match it leaf-for-leaf (names AND shapes)."""
    import jax

    from sdtk_tpu.models import EcapaConfig, EcapaTdnn

    kw = dict(config["model"])
    kw["dilations"] = tuple(kw["dilations"])
    model = EcapaTdnn(EcapaConfig(**kw))
    ref = model.init(jax.random.PRNGKey(0),
                     np.zeros((1, 16, kw["n_mels"], ), np.float32))
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    ref_map = {jax.tree_util.keystr(k): tuple(np.shape(v)) for k, v in ref_flat}
    got_map = {jax.tree_util.keystr(k): tuple(np.shape(v)) for k, v in got_flat}
    missing = sorted(set(ref_map) - set(got_map))
    extra = sorted(set(got_map) - set(ref_map))
    bad = [k for k in ref_map if k in got_map and ref_map[k] != got_map[k]]
    if missing or extra or bad:
        lines = []
        if missing:
            lines.append("missing: " + ", ".join(missing[:6]))
        if extra:
            lines.append("extra: " + ", ".join(extra[:6]))
        for k in bad[:6]:
            lines.append(f"shape {k}: want {ref_map[k]} got {got_map[k]}")
        raise ValueError("converted tree does not match the flax model:\n"
                         + "\n".join(lines))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint", help=".ckpt/.pt torch state dict or .npz")
    ap.add_argument("-o", "--output", required=True,
                    help="output .msgpack path (sidecar written next to it)")
    ap.add_argument("--dilations", default=None,
                    help="comma-separated per-block dilations "
                         "(default 2,3,... matching the block count)")
    args = ap.parse_args(argv)

    sd = load_state_dict(args.checkpoint)
    dil = (tuple(int(x) for x in args.dilations.split(","))
           if args.dilations else None)
    variables, config = convert(sd, dil)
    verify_structure(variables, config)

    import flax.serialization

    from sdtk_tpu.utils.ioutil import atomic_write_bytes

    out = Path(args.output)
    atomic_write_bytes(out, flax.serialization.to_bytes(variables))
    sidecar = out.with_suffix(".config.json")
    atomic_write_bytes(sidecar, (json.dumps(config, indent=2) + "\n").encode())
    n_params = sum(int(np.size(v)) for v in sd.values())
    print(json.dumps({
        "output": str(out),
        "sidecar": str(sidecar),
        "model": config["model"],
        "source_params": n_params,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
