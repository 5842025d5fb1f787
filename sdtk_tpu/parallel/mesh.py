"""Device mesh construction.

Mesh axes:
- ``data``  — utterance/window batches (DP): the scale-out axis for the
  embedding fleet (maps from the reference's per-recording thread fan-out,
  speaker-process:627).
- ``model`` — channel sharding of the embedder (TP) for models that
  outgrow one chip.

Spec strings come from ``$SDTK_DEVICE_MESH``, e.g. ``"data=8"`` or
``"data=4,model=2"``; an empty spec puts every device on ``data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from .. import config

AXES = ("data", "model")


def parse_mesh_spec(spec: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, val = part.partition("=")
        name = name.strip()
        if name not in AXES:
            raise ValueError(f"unknown mesh axis '{name}' (expected {AXES})")
        out[name] = int(val)
    return out


def make_mesh(
    spec: str | None = None, devices: list | None = None
) -> Mesh:
    """Build a Mesh from a spec string (default: $SDTK_DEVICE_MESH or all
    devices data-parallel)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sizes = parse_mesh_spec(spec if spec is not None else config.mesh_spec())
    data = sizes.get("data", 0)
    model = sizes.get("model", 1)
    if data == 0:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, AXES)


def mesh_axes(mesh: Mesh) -> dict[str, int]:
    return dict(zip(mesh.axis_names, mesh.devices.shape))
