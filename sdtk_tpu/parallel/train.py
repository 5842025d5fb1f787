"""Distributed speaker-embedding training: AAM-softmax over a device mesh.

The reference cannot train anything (its model lives in the Speechmatics
cloud); this module gives the framework its own training loop so enrolled
embeddings actually discriminate.  Design:

- AAM-softmax (ArcFace) classification head — the standard ECAPA recipe
  (PAPERS.md arXiv 2005.07143 §2.3).
- One jitted train step over a ``data × model`` mesh: batch data-sharded,
  params sharded by sdtk_tpu.parallel.sharding rules, GSPMD inserts the
  psum/all-gathers over ICI.
- BatchNorm statistics ride in ``batch_stats`` and are averaged implicitly
  by GSPMD (stats are computed over the global batch via collective ops
  when inputs are sharded).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import batch_sharding, param_shardings, replicate


@dataclass(frozen=True)
class TrainConfig:
    n_classes: int = 64
    emb_dim: int = 192
    margin: float = 0.2
    scale: float = 30.0
    learning_rate: float = 1e-3
    weight_decay: float = 2e-5


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    aam_weights: jax.Array  # (n_classes, emb_dim)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def aam_softmax_loss(
    emb: jax.Array, weights: jax.Array, labels: jax.Array,
    margin: float, scale: float,
) -> tuple[jax.Array, jax.Array]:
    """Additive-angular-margin softmax loss; returns (loss, accuracy)."""
    emb_n = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    w_n = weights / jnp.maximum(jnp.linalg.norm(weights, axis=-1, keepdims=True), 1e-12)
    cos = emb_n @ w_n.T  # (B, C)
    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 1e-12))
    cos_m = cos * jnp.cos(margin) - sin * jnp.sin(margin)
    # Easy-margin guard: only apply margin where cos > 0.
    cos_m = jnp.where(cos > 0, cos_m, cos)
    onehot = jax.nn.one_hot(labels, weights.shape[0])
    logits = scale * (onehot * cos_m + (1.0 - onehot) * cos)
    loss = optax.softmax_cross_entropy(logits, onehot).mean()
    acc = (jnp.argmax(cos, axis=-1) == labels).mean()
    return loss, acc


def create_train_state(
    model, rng: jax.Array, cfg: TrainConfig, sample_feats: jax.Array
) -> TrainState:
    rng_model, rng_aam = jax.random.split(rng)
    variables = model.init(rng_model, sample_feats)
    aam_w = (
        jax.random.normal(rng_aam, (cfg.n_classes, cfg.emb_dim), jnp.float32) * 0.01
    )
    tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    trainable = {"params": variables["params"], "aam": aam_w}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        aam_weights=aam_w,
        opt_state=tx.init(trainable),
        tx=tx,
        apply_fn=model.apply,
    )


def train_step(
    state: TrainState, feats: jax.Array, mask: jax.Array, labels: jax.Array,
    cfg: TrainConfig,
) -> tuple[TrainState, dict[str, jax.Array]]:
    """One SGD step; pure function of (state, batch)."""

    def loss_fn(trainable):
        emb, mutated = state.apply_fn(
            {"params": trainable["params"], "batch_stats": state.batch_stats},
            feats,
            mask=mask,
            train=True,
            mutable=["batch_stats"],
        )
        loss, acc = aam_softmax_loss(
            emb, trainable["aam"], labels, cfg.margin, cfg.scale
        )
        return loss, (acc, mutated["batch_stats"])

    trainable = {"params": state.params, "aam": state.aam_weights}
    (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
    updates, new_opt = state.tx.update(grads, state.opt_state, trainable)
    new_trainable = optax.apply_updates(trainable, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_trainable["params"],
        aam_weights=new_trainable["aam"],
        batch_stats=new_bs,
        opt_state=new_opt,
    )
    return new_state, {"loss": loss, "acc": acc}


def make_distributed_step(
    mesh: Mesh, cfg: TrainConfig
) -> Callable[[TrainState, jax.Array, jax.Array, jax.Array], tuple[TrainState, dict]]:
    """jit the train step over a mesh: batch data-sharded, params via rules.

    State shardings are derived lazily from the first call's state (jit
    in_shardings accept None = infer from args; we constrain the batch)."""
    bsh = batch_sharding(mesh)

    step = jax.jit(partial(train_step, cfg=cfg), donate_argnums=(0,))

    def run(state, feats, mask, labels):
        feats = jax.device_put(feats, bsh)
        mask = jax.device_put(mask, bsh)
        labels = jax.device_put(labels, bsh)
        return step(state, feats, mask, labels)

    return run


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a train state on the mesh: params per model rules, optimizer
    state following params, scalars replicated."""
    pspec = param_shardings({"params": state.params}, mesh)["params"]

    def put_like(tree, spec_tree):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), tree, spec_tree
        )

    rep = replicate(mesh)
    aam_sh = NamedSharding(mesh, P("model", None)) if (
        state.aam_weights.shape[0] % mesh.shape["model"] == 0
    ) else rep

    def put_opt(x):
        return jax.device_put(x, rep)

    return state.replace(
        step=jax.device_put(state.step, rep),
        params=put_like(state.params, pspec),
        batch_stats=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state.batch_stats),
        aam_weights=jax.device_put(state.aam_weights, aam_sh),
        opt_state=jax.tree_util.tree_map(put_opt, state.opt_state),
    )
