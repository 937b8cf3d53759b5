"""Multi-device sharding tests on the virtual 8-CPU mesh (SURVEY §2.7 TP/DP)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_tp_matches_single_device():
    """Sharded step must reproduce single-device logits."""
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models import llama as llama_model
    from rrs_tpu.parallel.sharding import make_mesh, make_sharded_step, shard_weights
    from rrs_tpu.runtime.context import InferenceContext
    from jax.sharding import NamedSharding, PartitionSpec as P

    # row-parallel local K (heads*head_dim/tp and n_ff/tp) must be 256-aligned
    cfg = ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=8, n_kv_heads=4,
        head_dim=128, n_ff=1024, vocab_size=512, context_length=128,
        qk_norm=True,
    )
    w = llama_model.random_weights(cfg, seed=3, quantize=True)

    b, t, s = 2, 3, 16
    tokens = jnp.asarray(np.array([[1, 2, 3], [4, 5, 6]], np.int32))
    start = jnp.zeros((b,), jnp.int32)
    shape = (b, cfg.n_kv_heads, s, cfg.head_dim)
    kc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    vc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]

    ref_logits, ref_k, ref_v = jax.jit(
        lambda *a: InferenceContext._step(cfg, *a)
    )(w, tokens, start, None, kc, vc)

    mesh = make_mesh(8, dp=2)   # tp=4
    ws = shard_weights(w, mesh)
    kv_shard = NamedSharding(mesh, P("dp", "tp", None, None))
    kcs = [jax.device_put(x, kv_shard) for x in kc]
    vcs = [jax.device_put(x, kv_shard) for x in vc]
    step = make_sharded_step(cfg, mesh)(ws)
    logits, nk, nv = step(ws, tokens, start, kcs, vcs)

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_array_equal(
        np.asarray(logits).argmax(-1), np.asarray(ref_logits).argmax(-1)
    )
