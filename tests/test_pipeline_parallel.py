"""Pipeline (layer-split) parallelism: the GPipe-style pp schedule must
reproduce the single-device forward exactly (same layers, same math, just
staged over devices with ppermute)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.export import export_random_gguf
from rrs_tpu.models.loader import load_model


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4+ devices")
@pytest.mark.parametrize("pp,n_micro", [(4, 2), (2, 4)])
def test_pipeline_matches_forward(tmp_path, pp, n_micro):
    from rrs_tpu.models import llama as lm
    from rrs_tpu.parallel.pipeline import make_pp_mesh, pipeline_forward

    cfg = ModelConfig(
        arch="qwen3", n_layers=4, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, vocab_size=64, context_length=64, qk_norm=True)
    export_random_gguf(cfg, tmp_path / "m.gguf", seed=9)
    cfg, weights, _ = load_model(tmp_path / "m.gguf", dtype=np.float32,
                                 fuse=False)

    b, t = 4, 8
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)), jnp.int32)
    positions = jnp.arange(t, dtype=jnp.int32)[None].repeat(b, 0)

    mesh = make_pp_mesh(pp)
    got = np.asarray(pipeline_forward(cfg, weights, tokens, positions,
                                      mesh, n_micro=n_micro))

    shape = (b, cfg.n_kv_heads, t, cfg.head_dim)
    kc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    vc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    want, _, _ = lm.forward(cfg, weights, tokens, positions, kc, vc,
                            positions, positions)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ devices")
def test_pipeline_moe_runs(tmp_path):
    """MoE layers stack and pipeline too (dense experts)."""
    from rrs_tpu.parallel.pipeline import make_pp_mesh, pipeline_forward

    cfg = ModelConfig(
        arch="qwen3moe", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=0, vocab_size=64, context_length=64, qk_norm=True,
        n_experts=4, n_experts_used=2, n_ff_exp=64, norm_topk_prob=True)
    export_random_gguf(cfg, tmp_path / "m.gguf", seed=11)
    cfg, weights, _ = load_model(tmp_path / "m.gguf", dtype=np.float32,
                                 fuse=False)
    tokens = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    positions = jnp.arange(4, dtype=jnp.int32)[None].repeat(2, 0)
    logits = pipeline_forward(cfg, weights, tokens, positions,
                              make_pp_mesh(2), n_micro=2)
    assert logits.shape == (2, 4, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
