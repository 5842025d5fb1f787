"""Multi-chip paths on the virtual 8-device CPU mesh: DP+TP train step,
sharded inference."""

import os
from pathlib import Path

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


def test_two_process_jax_distributed_collective(tmp_path):
    """REAL jax.distributed: two OS processes (coordinator on localhost),
    each with 4 virtual CPU devices, form one 8-device global mesh, run a
    psum across BOTH processes, and verify the host work-shard split is a
    disjoint cover (r1 VERDICT item 7 — previously only single-process
    paths ran)."""
    import json
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(
        """
import json, os, sys
sys.path.insert(0, os.environ["SDTK_REPO"])
import jax
import jax.numpy as jnp
from sdtk_tpu.parallel import multihost
from jax.sharding import NamedSharding, PartitionSpec as P

info = multihost.initialize()
mesh = multihost.global_mesh(f"data={len(jax.devices())}")

import numpy as np
n = len(jax.devices())
local = jax.process_index()

# a global array sharded over the data axis; psum-style total via jnp.sum
# under jit on the global mesh
x = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
arr = jax.make_array_from_callback(
    x.shape, NamedSharding(mesh, P("data", None)),
    lambda idx: np.asarray(x[idx]),
)
total = jax.jit(lambda a: jnp.sum(a), out_shardings=None)(arr)

shard = multihost.host_work_shard([f"rec{i}.wav" for i in range(20)])
print(json.dumps({
    "process_index": info["process_index"],
    "process_count": info["process_count"],
    "global_devices": info["global_devices"],
    "total": float(total),
    "shard": [str(p) for p in shard],
}))
"""
    )

    env_base = dict(os.environ)
    env_base.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in children
    env_base.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        SDTK_REPO=str(Path(__file__).resolve().parent.parent),
        SDTK_COORDINATOR=f"127.0.0.1:{port}",
        SDTK_NUM_PROCESSES="2",
    )
    procs = []
    for pid in range(2):
        env = dict(env_base, SDTK_PROCESS_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env,
            )
        )
    outs = []
    for p in procs:
        out, errtxt = p.communicate(timeout=180)
        assert p.returncode == 0, errtxt[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    expected_total = float(sum(range(8 * 4)))
    shards = []
    for o in outs:
        assert o["process_count"] == 2
        assert o["global_devices"] == 8  # 2 processes x 4 virtual devices
        assert o["total"] == expected_total  # collective saw BOTH halves
        shards.append(set(o["shard"]))
    # disjoint cover of the corpus across hosts
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0] | shards[1]) == 20
    assert shards[0] and shards[1]


def test_ring_attention_matches_dense():
    """Streaming-softmax ring attention over the 8-device mesh equals
    dense masked attention (SURVEY §2.3 ring-attention row)."""
    from sdtk_tpu.ops.ringattn import ring_attention

    rng = np.random.default_rng(0)
    mesh = make_mesh("data=8,model=1")
    t, h, dh = 64, 4, 16
    q = jnp.asarray(rng.standard_normal((t, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, h, dh)), jnp.float32)
    mask = jnp.asarray(rng.random(t) > 0.2)

    got = np.asarray(ring_attention(q, k, v, mask, mesh))

    logits = np.einsum("thd,shd->hts", np.asarray(q) / np.sqrt(dh), np.asarray(k))
    logits = np.where(np.asarray(mask)[None, None, :], logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("hts,shd->thd", w, np.asarray(v))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_conformer_sequence_parallel_parity():
    """The time-sharded conformer forward (ring attention + halo'd
    depthwise conv + psum'd ASP) matches the single-device module on the
    8-device mesh, including padded (masked) frames (r1 VERDICT item 8)."""
    from sdtk_tpu.models import Conformer, ConformerConfig
    from sdtk_tpu.ops.ringattn import conformer_sp_embed

    cfg = ConformerConfig(dim=64, n_blocks=2, n_heads=4, emb_dim=32,
                          attention_channels=16, dtype="float32")
    model = Conformer(cfg)
    rng = np.random.default_rng(7)
    t = 160
    feats = jnp.asarray(rng.standard_normal((t, cfg.n_mels)), jnp.float32)
    mask = jnp.asarray(np.arange(t) < t - 13)  # padded tail

    variables = model.init(jax.random.PRNGKey(0), feats[None], mask=mask[None])
    ref = np.asarray(model.apply(variables, feats[None], mask=mask[None]))[0]

    mesh = make_mesh("data=8,model=1")
    got = np.asarray(conformer_sp_embed(variables, cfg, feats, mask, mesh))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
