"""Conformer speaker embedder (flax.linen) — the attention model family.

STATUS: sequence-parallel test scaffolding, NOT a serving tower.  At the
r3 training budget it reached 14.7% held-out EER vs ECAPA's 1.0%
(docs/PERFORMANCE.md "Secondary towers"), so no checkpoint is bundled and
nothing defaults to it.  It earns its place as the attention-model seam:
the ring-attention / halo-conv / psum-ASP sequence-parallel forward
(ops/ringattn.py conformer_sp_embed) is parity-tested against this module
on the 8-device mesh, which is exactly the machinery a future
attention-based tower (or a larger conformer trained on real data) would
serve through.

Architecture: standard conformer blocks (feed-forward ½ → MHSA →
depthwise conv module → feed-forward ½, pre-norm) over log-mel frames,
then the same masked attentive-statistics pooling as ECAPA.  Replaces
nothing in the reference (its model lived in the Speechmatics cloud,
speechmatics_backend.py:4-6).

TPU-first choices match ecapa.py: feature-last (B, T, C) layout, bf16
compute with f32 statistics/softmax accumulation, every op mask-aware so
padded batches produce bit-comparable embeddings, static shapes
throughout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from .ecapa import AttentiveStatsPooling


@dataclass(frozen=True)
class ConformerConfig:
    n_mels: int = 80
    dim: int = 256
    n_blocks: int = 6
    n_heads: int = 4
    ff_mult: int = 4
    conv_kernel: int = 15
    emb_dim: int = 192
    attention_channels: int = 128
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class FeedForward(nn.Module):
    dim: int
    mult: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        x = nn.Dense(self.dim * self.mult, dtype=self.dtype)(x)
        x = nn.swish(x)
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        return x


class MHSA(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask):
        # mask: (B, T) valid-frame mask → (B, 1, T, T) attention bias
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        attn_mask = (mask[:, None, None, :] & mask[:, None, :, None])
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dtype=self.dtype,
            # f32 softmax accumulation happens inside flax attention when
            # given f32 query/key? keep bf16 QKV, bias in f32:
        )(h, h, mask=attn_mask)
        return h


class ConvModule(nn.Module):
    """Conformer conv module: pointwise GLU → depthwise conv → BN → swish
    → pointwise, all masked."""

    dim: int
    kernel: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        h = nn.Dense(2 * self.dim, dtype=self.dtype)(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        h = h * mask[..., None].astype(h.dtype)  # no leakage into padding
        h = nn.Conv(
            self.dim, (self.kernel,), padding="SAME",
            feature_group_count=self.dim, dtype=self.dtype, name="depthwise",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(h)
        h = nn.swish(h.astype(self.dtype))
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return h * mask[..., None].astype(h.dtype)


class ConformerBlock(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        c = self.cfg
        dt = c.compute_dtype
        x = x + 0.5 * FeedForward(c.dim, c.ff_mult, dt, name="ff1")(x)
        x = x + MHSA(c.dim, c.n_heads, dt, name="mhsa")(x, mask)
        x = x + ConvModule(c.dim, c.conv_kernel, dt, name="conv")(
            x, mask, train)
        x = x + 0.5 * FeedForward(c.dim, c.ff_mult, dt, name="ff2")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(x).astype(dt)
        return x * mask[..., None].astype(x.dtype)


class Conformer(nn.Module):
    """(B, T, n_mels) log-mel + (B, T) mask → (B, emb_dim) embedding."""

    cfg: ConformerConfig = field(default_factory=ConformerConfig)

    @nn.compact
    def __call__(
        self, feats: jax.Array, train: bool = False,
        mask: jax.Array | None = None,
    ) -> jax.Array:
        c = self.cfg
        dt = c.compute_dtype
        b, t, _ = feats.shape
        if mask is None:
            mask = jnp.ones((b, t), dtype=bool)

        x = nn.Dense(c.dim, dtype=dt, name="input_proj")(feats.astype(dt))
        x = x * mask[..., None].astype(x.dtype)
        for i in range(c.n_blocks):
            x = ConformerBlock(c, name=f"block{i}")(x, mask, train)

        pooled = AttentiveStatsPooling(
            channels=c.dim, attention_channels=c.attention_channels,
            dtype=dt, name="asp",
        )(x, mask)
        emb = nn.Dense(c.emb_dim, dtype=jnp.float32, name="embedding")(
            pooled.astype(jnp.float32)
        )
        return emb
