"""Sharding rules: parameter PartitionSpecs + batch shardings.

GSPMD does the collective insertion; these rules only *annotate*.  Conv
kernels are sharded on their output-channel dim and Dense kernels on
input (row) dim so consecutive layers alternate column/row parallelism —
the standard Megatron-style pairing that keeps activations sharded and
inserts a single psum per pair.  Anything that doesn't match a rule is
replicated (BatchNorm scales, biases — tiny).
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'path/to/param', spec) — first match wins.
ECAPA_RULES: tuple[tuple[str, P], ...] = (
    # conv kernels are (k, in_ch, out_ch) → shard out channels
    (r".*res2/conv\d+/kernel$", P(None, None, "model")),
    (r".*(stem|tdnn_in|tdnn_out|mfa|att1|att2)/conv/kernel$", P(None, None, "model")),
    (r".*(mfa|att1|att2)/kernel$", P(None, None, "model")),
    # SE dense (in, out): fc1 shard out, fc2 shard in (row) — pair fuses
    (r".*se/fc1/kernel$", P(None, "model")),
    (r".*se/fc2/kernel$", P("model", None)),
    # final embedding projection: (in, out) shard in
    (r".*embedding/kernel$", P("model", None)),
    # AAM-softmax class weights: (n_classes, emb) shard classes on data? no —
    # shard classes over model axis for big speaker inventories
    (r".*aam/weights$", P("model", None)),
)


def ecapa_param_spec(path: str) -> P:
    for pattern, spec in ECAPA_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()  # replicate


def _tree_paths(tree: Any) -> Any:
    """Map each leaf to its 'a/b/c' path string."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [
        "/".join(
            k.key if hasattr(k, "key") else str(getattr(k, "idx", k)) for k in path
        )
        for path, _ in flat
    ]
    return treedef, paths, [leaf for _, leaf in flat]


def shard_params(variables: Any, mesh: Mesh, rules=ecapa_param_spec) -> Any:
    """Device-put a variables pytree with rule-derived NamedShardings."""
    treedef, paths, leaves = _tree_paths(variables)
    out_leaves = []
    for path, leaf in zip(paths, leaves):
        spec = rules(path)
        # Drop axes that don't divide the dim (tiny layers stay replicated).
        if spec != P():
            dims = getattr(leaf, "shape", ())
            ok = True
            for d, axis in zip(dims, spec):
                if axis is None:
                    continue
                size = mesh.shape[axis] if isinstance(axis, str) else 1
                if d % size:
                    ok = False
            if not ok:
                spec = P()
        out_leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def param_shardings(variables: Any, mesh: Mesh, rules=ecapa_param_spec) -> Any:
    """NamedSharding pytree (same filtering as shard_params) without
    materializing."""
    treedef, paths, leaves = _tree_paths(variables)
    out = []
    for path, leaf in zip(paths, leaves):
        spec = rules(path)
        if spec != P():
            dims = getattr(leaf, "shape", ())
            for d, axis in zip(dims, spec):
                if axis is not None and d % mesh.shape[axis]:
                    spec = P()
                    break
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
