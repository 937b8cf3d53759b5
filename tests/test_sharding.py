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


def test_sharded_step_gemma_swa():
    """TP-sharded step for a gemma-style config (SWA + sandwich norms +
    softcaps) matches the single-device forward."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models import llama as lm
    from rrs_tpu.parallel.sharding import (make_mesh, make_sharded_step,
                                           shard_weights)

    cfg = ModelConfig(
        arch="gemma3", n_layers=2, n_embd=128, n_heads=8, n_kv_heads=4,
        head_dim=32, n_ff=256, vocab_size=128, context_length=128,
        qk_norm=True, swa_window=8, swa_pattern=2, rope_theta_swa=10000.0,
        ffn_act="gelu", embd_scale=128.0 ** 0.5, sandwich_norm=True,
        attn_softcap=50.0, final_softcap=30.0,
    )
    w = lm.random_weights(cfg, seed=0, dtype=jnp.float32)
    mesh = make_mesh(4, dp=1)
    ws = shard_weights(w, mesh)

    b, t, s = 2, 4, 32
    tokens = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    start = jnp.zeros((2,), jnp.int32)
    kv_shard = NamedSharding(mesh, P("dp", "tp", None, None))
    shape = (b, cfg.n_kv_heads, s, cfg.head_dim)
    ks = [jax.device_put(jnp.zeros(shape, jnp.float32), kv_shard)
          for _ in range(cfg.n_layers)]
    vs = [jax.device_put(jnp.zeros(shape, jnp.float32), kv_shard)
          for _ in range(cfg.n_layers)]
    step = make_sharded_step(cfg, mesh)(ws)
    logits, _, _ = step(ws, tokens, start, ks, vs)

    # single-device reference
    pos = start[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    ks1 = [jnp.zeros(shape, jnp.float32) for _ in range(cfg.n_layers)]
    vs1 = [jnp.zeros_like(k) for k in ks1]
    ref, _, _ = lm.forward(cfg, w, tokens, pos, ks1, vs1, pos, pos)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
