"""x-vector TDNN speaker embedder (flax.linen) — the secondary model family.

Classic x-vector topology (Snyder et al.; see also Deep Speaker in
PAPERS.md): 5 frame-level TDNN layers with growing receptive field →
statistics pooling → segment-level dense layers; the first segment layer
is the embedding.  Mask-aware like the ECAPA tower.

Status (r5): a WORKING serving tier — trained on the full fam5tel
recipe (12k steps, 5 families), bundled as ``models/xvector.msgpack``
with a measured calibration sidecar; held-out EER 1.04% clean / 1.01%
telephone / 1.94% noise (docs/PERFORMANCE.md "Secondary towers").
Select it everywhere with ``SDTK_BACKEND_TOWER=xvector``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from .ecapa import TdnnBlock, _masked_mean_std


@dataclass(frozen=True)
class XVectorConfig:
    n_mels: int = 80
    channels: int = 512
    pre_pool_channels: int = 1500
    emb_dim: int = 512
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class XVector(nn.Module):
    cfg: XVectorConfig = field(default_factory=XVectorConfig)

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

        # Frame-level layers: kernel/dilation (5,1) (3,2) (3,3) (1,1) (1,1).
        for i, (k, d, ch) in enumerate(
            [
                (5, 1, cfg.channels),
                (3, 2, cfg.channels),
                (3, 3, cfg.channels),
                (1, 1, cfg.channels),
                (1, 1, cfg.pre_pool_channels),
            ]
        ):
            x = TdnnBlock(ch, k, d, dt, name=f"tdnn{i + 1}")(x, train, mask)

        mean, std = _masked_mean_std(x, mask)
        pooled = jnp.concatenate([mean, std], axis=-1)  # (B, 2*pre_pool)

        emb = nn.Dense(cfg.emb_dim, dtype=jnp.float32, name="segment6")(pooled)
        return emb
