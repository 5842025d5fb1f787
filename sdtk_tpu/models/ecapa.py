"""ECAPA-TDNN speaker embedder (flax.linen), TPU-first.

Architecture after the ECAPA-TDNN paper (PAPERS.md: arXiv 2005.07143):
stem TDNN (k=5) → 3× SE-Res2Blocks (k=3, dilations 2/3/4, Res2 scale 8,
SE bottleneck) → multi-layer feature aggregation (concat + 1×1 conv to
attention_channels*? 1536) → attentive statistics pooling with global
context → BN → linear projection to the embedding.

TPU-first choices:
- feature-last layout (B, T, C): the channel dim maps to MXU lanes; all
  convs are ``lax.conv_general_dilated`` via ``nn.Conv`` which XLA lowers
  to MXU matmuls.
- every op is mask-aware so ragged utterance batches run with static
  shapes (padding frames contribute nothing to SE squeeze or pooling).
- compute dtype bf16, accumulation/statistics f32.

Shapes are static; the whole apply is jit/pjit-safe.  Model parallelism
rules for the conv kernels live in sdtk_tpu.parallel.sharding.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EcapaConfig:
    n_mels: int = 80
    channels: int = 512  # 512 (small) or 1024 (full)
    emb_dim: int = 192
    scale: int = 8  # Res2Net scale
    se_bottleneck: int = 128
    attention_channels: int = 128
    mfa_channels: int = 1536  # multi-layer feature aggregation width
    dilations: tuple[int, ...] = (2, 3, 4)
    dtype: str = "bfloat16"
    # SpeechBrain-layout switches (tools/convert_ecapa.py sets these in the
    # converted checkpoint's .config.json sidecar so public pretrained
    # ECAPA weights load into an architecture-identical graph):
    # BatchNorm after the MFA conv+relu (SpeechBrain's mfa is a full
    # TDNNBlock: conv → relu → BN; ours historically stopped at relu).
    mfa_bn: bool = False
    # SpeechBrain's attention bottleneck is a full TDNNBlock before the
    # tanh (conv → relu → BN → tanh → conv); ours is tanh(conv) → conv.
    asp_tdnn: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def _masked_mean_std(
    x: jax.Array, mask: jax.Array, eps: float = 1e-5
) -> tuple[jax.Array, jax.Array]:
    """Mean/std over time with a (B, T) validity mask; f32 statistics."""
    m = mask[..., None].astype(jnp.float32)
    xf = x.astype(jnp.float32) * m
    denom = jnp.maximum(m.sum(axis=1), 1.0)
    mean = xf.sum(axis=1) / denom
    var = (xf * xf).sum(axis=1) / denom - mean * mean
    std = jnp.sqrt(jnp.maximum(var, eps))
    return mean, std


class TdnnBlock(nn.Module):
    """Conv1d(k, dilation) → ReLU → BatchNorm, mask-preserving.

    Padded frames are re-zeroed after the block so that no bias/BN offset
    leaks into valid frames through later k>1 convs — this is what makes
    embeddings of a padded batch bit-comparable to unpadded ones.
    """

    channels: int
    kernel: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: jax.Array | None = None
    ) -> jax.Array:
        x = nn.Conv(
            self.channels,
            (self.kernel,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name="bn"
        )(x)
        x = x.astype(self.dtype)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x


class Res2Conv(nn.Module):
    """Res2Net hierarchical multi-scale conv: split channels into ``scale``
    groups; group i is convolved after summing the previous group's output
    (paper §2.2)."""

    channels: int
    kernel: int = 3
    dilation: int = 1
    scale: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, mask: jax.Array | None = None
    ) -> jax.Array:
        assert self.channels % self.scale == 0
        width = self.channels // self.scale
        m = None if mask is None else mask[..., None]
        xs = jnp.split(x, self.scale, axis=-1)
        outs = [xs[0]]
        prev = None
        for i in range(1, self.scale):
            inp = xs[i] if prev is None else xs[i] + prev
            prev = nn.Conv(
                width,
                (self.kernel,),
                kernel_dilation=(self.dilation,),
                padding="SAME",
                dtype=self.dtype,
                name=f"conv{i}",
            )(inp)
            prev = nn.relu(prev)
            prev = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn{i}"
            )(prev).astype(self.dtype)
            if m is not None:
                prev = prev * m.astype(prev.dtype)
            outs.append(prev)
        return jnp.concatenate(outs, axis=-1)


class SEBlock(nn.Module):
    """Squeeze-excitation with masked global pooling."""

    channels: int
    bottleneck: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        m = mask[..., None].astype(jnp.float32)
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        s = (x.astype(jnp.float32) * m).sum(axis=1) / denom  # (B, C)
        s = nn.relu(nn.Dense(self.bottleneck, dtype=self.dtype, name="fc1")(s.astype(self.dtype)))
        s = nn.sigmoid(nn.Dense(self.channels, dtype=self.dtype, name="fc2")(s))
        return x * s[:, None, :]


class SERes2Block(nn.Module):
    """1×1 TDNN → Res2 conv → 1×1 TDNN → SE, with residual connection."""

    channels: int
    kernel: int = 3
    dilation: int = 1
    scale: int = 8
    se_bottleneck: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        x = TdnnBlock(self.channels, 1, 1, self.dtype, name="tdnn_in")(x, train, mask)
        x = Res2Conv(self.channels, self.kernel, self.dilation, self.scale, self.dtype, name="res2")(
            x, train, mask
        )
        x = TdnnBlock(self.channels, 1, 1, self.dtype, name="tdnn_out")(x, train, mask)
        x = SEBlock(self.channels, self.se_bottleneck, self.dtype, name="se")(x, mask)
        return x + residual


class AttentiveStatsPooling(nn.Module):
    """Channel- and context-dependent attentive statistics pooling
    (paper §3.2): attention sees [h_t, global mean, global std]."""

    channels: int
    attention_channels: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    tdnn_attention: bool = False  # SpeechBrain layout: conv→relu→BN→tanh→conv

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, train: bool = False
    ) -> jax.Array:
        b, t, c = x.shape
        mean, std = _masked_mean_std(x, mask)
        ctx = jnp.concatenate(
            [
                x,
                jnp.broadcast_to(mean[:, None, :], (b, t, c)).astype(x.dtype),
                jnp.broadcast_to(std[:, None, :], (b, t, c)).astype(x.dtype),
            ],
            axis=-1,
        )
        a = nn.Conv(self.attention_channels, (1,), dtype=self.dtype, name="att1")(ctx)
        if self.tdnn_attention:
            a = nn.relu(a)
            a = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name="att_bn"
            )(a).astype(self.dtype)
        a = jnp.tanh(a)
        a = nn.Conv(self.channels, (1,), dtype=self.dtype, name="att2")(a)
        a = a.astype(jnp.float32)
        a = jnp.where(mask[..., None], a, -1e9)
        w = jax.nn.softmax(a, axis=1)  # (B, T, C) per-channel attention
        xf = x.astype(jnp.float32)
        mu = (w * xf).sum(axis=1)
        var = (w * xf * xf).sum(axis=1) - mu * mu
        sg = jnp.sqrt(jnp.maximum(var, 1e-5))
        return jnp.concatenate([mu, sg], axis=-1)  # (B, 2C) f32


class EcapaTdnn(nn.Module):
    """Full ECAPA-TDNN: (B, T, n_mels) features + (B, T) mask → (B, emb_dim)."""

    cfg: EcapaConfig = field(default_factory=EcapaConfig)

    @nn.compact
    def __call__(
        self, feats: jax.Array, mask: jax.Array | None = None, train: bool = False
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, t, _ = feats.shape
        if mask is None:
            mask = jnp.ones((b, t), dtype=bool)
        x = feats.astype(dt) * mask[..., None].astype(dt)

        x = TdnnBlock(cfg.channels, 5, 1, dt, name="stem")(x, train, mask)
        block_outs = []
        for i, dil in enumerate(cfg.dilations):
            x = SERes2Block(
                cfg.channels,
                3,
                dil,
                cfg.scale,
                cfg.se_bottleneck,
                dt,
                name=f"block{i + 1}",
            )(x, mask, train)
            block_outs.append(x)

        x = jnp.concatenate(block_outs, axis=-1)
        x = nn.Conv(cfg.mfa_channels, (1,), dtype=dt, name="mfa")(x)
        x = nn.relu(x)
        if cfg.mfa_bn:
            x = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name="mfa_bn"
            )(x).astype(dt)
        x = x * mask[..., None].astype(x.dtype)

        pooled = AttentiveStatsPooling(
            cfg.mfa_channels, cfg.attention_channels, dt,
            tdnn_attention=cfg.asp_tdnn, name="asp"
        )(x, mask, train)
        pooled = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="asp_bn")(
            pooled
        )
        emb = nn.Dense(cfg.emb_dim, dtype=jnp.float32, name="embedding")(pooled)
        return emb


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
