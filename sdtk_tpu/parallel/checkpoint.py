"""Training checkpoint/resume (orbax) — SURVEY.md §5.4.

The reference's checkpointing is host-side YAML (review sessions, process
queue) — kept as-is in the store layer.  This module adds the device-side
half: the full train state (params, batch_stats, AAM head, optimizer
state, step) saved with orbax, resumable mid-run, plus the bare inference
variables in flax msgpack for the serving path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def save_train_state(ckpt_dir: str | Path, state: Any, step: int | None = None) -> Path:
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(step if step is not None else jax.device_get(state.step))
    path = ckpt_dir / f"step_{step:08d}"
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "aam_weights": jax.device_get(state.aam_weights),
        "opt_state": jax.device_get(state.opt_state),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted(p for p in ckpt_dir.glob("step_*") if p.is_dir())
    return steps[-1] if steps else None


def restore_train_state(ckpt_path: str | Path, state_template: Any) -> Any:
    """Restore into the shape of ``state_template`` (from
    create_train_state); returns the updated TrainState."""
    import orbax.checkpoint as ocp

    template = {
        "step": jax.device_get(state_template.step),
        "params": jax.device_get(state_template.params),
        "batch_stats": jax.device_get(state_template.batch_stats),
        "aam_weights": jax.device_get(state_template.aam_weights),
        "opt_state": jax.device_get(state_template.opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(Path(ckpt_path).resolve(), template)
    return state_template.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        aam_weights=restored["aam_weights"],
        opt_state=restored["opt_state"],
    )
