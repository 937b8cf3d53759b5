"""SPMD training step over the (dp, ep, tp) mesh: numerics must match the
single-device trainer, and the expert/head/sequence shardings must be real
(checked on the 8-device CPU mesh from conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.export import export_random_gguf
from rrs_tpu.models.loader import load_model


def _moe_model(tmp_path):
    cfg = ModelConfig(
        arch="qwen3moe", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=0, vocab_size=64, context_length=64, qk_norm=True,
        n_experts=4, n_experts_used=2, n_ff_exp=64, norm_topk_prob=True)
    export_random_gguf(cfg, tmp_path / "m.gguf", seed=3)
    return load_model(tmp_path / "m.gguf", dtype=np.float32, fuse=False)[:2]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_train_step_matches_single_device(tmp_path):
    from rrs_tpu.parallel.train_step import (make_sharded_train_step,
                                             make_train_mesh, shard_batch)
    from rrs_tpu.train.finetune import _loss_fn

    cfg, weights = _moe_model(tmp_path)
    mesh = make_train_mesh(8, dp=2, ep=2)          # tp = 2
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "dp": 2, "ep": 2, "tp": 2}

    rng = np.random.default_rng(0)
    batch = rng.integers(0, cfg.vocab_size, (2, 17), dtype=np.int32)

    step, params, static, opt_state = make_sharded_train_step(
        cfg, mesh, weights)
    # expert stacks genuinely sharded over ep, ffn columns over tp
    gate = params.layers[0].moe.gate
    assert gate.sharding.spec == jax.sharding.PartitionSpec("ep", None, "tp")
    assert gate.sharding.mesh.shape["ep"] == 2

    b = shard_batch(batch, mesh)
    p1, o1, l1 = step(params, opt_state, b)
    p2, _, l2 = step(p1, o1, b)

    # step-0 loss == the single-device loss on the same weights/batch
    ref = float(jax.jit(lambda w, x: _loss_fn(cfg, w, x))(
        weights, jnp.asarray(batch)))
    assert abs(float(l1) - ref) < 1e-3, (float(l1), ref)
    # and the update actually descends on the same batch
    assert float(l2) < float(l1)
    assert np.isfinite(float(l2))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_train_step_dense(tmp_path):
    """Non-MoE model through the same path (ep axis present but unused)."""
    from rrs_tpu.parallel.train_step import (make_sharded_train_step,
                                             make_train_mesh, shard_batch)

    cfg = ModelConfig(
        arch="qwen3", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, vocab_size=64, context_length=64, qk_norm=True)
    export_random_gguf(cfg, tmp_path / "d.gguf", seed=4)
    cfg, weights, _ = load_model(tmp_path / "d.gguf", dtype=np.float32,
                                 fuse=False)
    mesh = make_train_mesh(8, dp=4, ep=1)          # tp = 2
    step, params, static, opt_state = make_sharded_train_step(
        cfg, mesh, weights)
    batch = shard_batch(
        np.random.default_rng(1).integers(0, 64, (4, 9), dtype=np.int32),
        mesh)
    p1, o1, l1 = step(params, opt_state, batch)
    assert np.isfinite(float(l1))
