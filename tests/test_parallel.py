"""Multi-chip paths on the virtual 8-device CPU mesh: DP+TP train step,
sharded inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtk_tpu.models import EcapaConfig, EcapaTdnn
from sdtk_tpu.parallel import make_mesh, mesh_axes, parse_mesh_spec
from sdtk_tpu.parallel.sharding import batch_sharding, shard_params
from sdtk_tpu.parallel.train import (
    TrainConfig,
    create_train_state,
    make_distributed_step,
    shard_state,
)

SMALL = EcapaConfig(channels=64, mfa_channels=128, emb_dim=32, se_bottleneck=16,
                    attention_channels=16, dtype="float32")


def test_mesh_spec_parsing():
    assert parse_mesh_spec("data=4,model=2") == {"data": 4, "model": 2}
    assert parse_mesh_spec("") == {}
    with pytest.raises(ValueError):
        parse_mesh_spec("bogus=2")


def test_make_mesh_all_devices():
    mesh = make_mesh("")
    ax = mesh_axes(mesh)
    assert ax["data"] * ax["model"] == len(jax.devices())


def test_dp_tp_train_step():
    mesh = make_mesh("data=4,model=2")
    cfg = TrainConfig(n_classes=16, emb_dim=SMALL.emb_dim)
    model = EcapaTdnn(SMALL)
    feats = jnp.zeros((8, 40, 80))
    state = create_train_state(model, jax.random.PRNGKey(0), cfg, feats)
    state = shard_state(state, mesh)

    step = make_distributed_step(mesh, cfg)
    rng = np.random.default_rng(0)
    batch_feats = jnp.asarray(rng.standard_normal((8, 40, 80)), jnp.float32)
    mask = jnp.ones((8, 40), bool)
    labels = jnp.asarray(rng.integers(0, 16, 8))

    state, metrics = step(state, batch_feats, mask, labels)
    loss1 = float(metrics["loss"])
    assert np.isfinite(loss1)
    state, metrics = step(state, batch_feats, mask, labels)
    assert float(metrics["loss"]) < loss1 + 1.0  # moving, not exploding
    assert int(state.step) == 2


def test_loss_decreases_over_steps():
    mesh = make_mesh("data=8,model=1")
    cfg = TrainConfig(n_classes=4, emb_dim=SMALL.emb_dim, learning_rate=3e-3)
    model = EcapaTdnn(SMALL)
    feats0 = jnp.zeros((8, 40, 80))
    state = shard_state(create_train_state(model, jax.random.PRNGKey(1), cfg, feats0), mesh)
    step = make_distributed_step(mesh, cfg)

    rng = np.random.default_rng(1)
    labels = jnp.asarray(rng.integers(0, 4, 8))
    # Class-dependent input patterns -> learnable
    base = rng.standard_normal((4, 40, 80)).astype(np.float32)
    feats = jnp.asarray(base[np.asarray(labels)])
    mask = jnp.ones((8, 40), bool)

    losses = []
    for _ in range(8):
        state, m = step(state, feats, mask, labels)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_sharded_inference_matches_single_device():
    mesh = make_mesh("data=4,model=2")
    model = EcapaTdnn(SMALL)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((8, 40, 80)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats)

    ref = np.asarray(model.apply(variables, feats))

    sharded_vars = shard_params(variables, mesh)
    apply = jax.jit(model.apply)
    got = np.asarray(apply(sharded_vars, jax.device_put(feats, batch_sharding(mesh))))
    np.testing.assert_allclose(ref, got, atol=2e-4, rtol=1e-3)


def test_scaling_benchmark_harness(tmp_path, monkeypatch):
    """The DP scaling harness runs on the virtual mesh and reports
    per-mesh-size throughput (numbers only meaningful on real chips)."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout
    from pathlib import Path

    monkeypatch.setenv("SDTK_JAX_CACHE_DIR", str(tmp_path / "cache"))
    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "evals"))
    try:
        import benchmark_scaling
    finally:
        sys.path.pop(0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = benchmark_scaling.main(
            ["--devices", "1,2", "--iters", "2", "--channels", "64",
             "--per-device-batch", "2", "--seconds", "1.0"]
        )
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[-1]["note"].startswith("virtual CPU mesh")
    assert [r["devices"] for r in lines[-1]["summary"]] == [1, 2]
