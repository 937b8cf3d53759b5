"""MoE FFN tests (build_moe_ffn semantics, llama-graph.cpp:999-1250)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.llama import random_weights
from rrs_tpu.models.moe import MoEWeights, moe_ffn, route
from rrs_tpu.runtime.context import InferenceContext

MOE_CFG = ModelConfig(
    arch="qwen3moe", n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
    head_dim=64, n_ff=512, vocab_size=256, context_length=512, qk_norm=True,
    n_experts=8, n_experts_used=2, n_ff_exp=128, norm_topk_prob=True,
)


def test_gather_and_dense_paths_agree():
    """The decode (gather) and prefill (dense) strategies are the same math."""
    rng = np.random.default_rng(0)
    e, f, ne = 256, 128, 8
    mw = MoEWeights(
        router=jnp.asarray(rng.standard_normal((e, ne)) * 0.1, jnp.float32),
        gate=jnp.asarray(rng.standard_normal((ne, e, f)) * 0.05, jnp.float32),
        up=jnp.asarray(rng.standard_normal((ne, e, f)) * 0.05, jnp.float32),
        down=jnp.asarray(rng.standard_normal((ne, f, e)) * 0.05, jnp.float32),
    )
    x_small = jnp.asarray(rng.standard_normal((1, 4, e)).astype(np.float32))
    # same tokens replicated to force the dense path (> 16 tokens)
    x_big = jnp.tile(x_small, (1, 5, 1))
    out_small = np.asarray(moe_ffn(MOE_CFG, mw, x_small))
    out_big = np.asarray(moe_ffn(MOE_CFG, mw, x_big))
    np.testing.assert_allclose(out_big[0, :4], out_small[0], rtol=2e-3, atol=2e-4)


def test_router_topk_normalization():
    rng = np.random.default_rng(1)
    e, ne = 64, 8
    cfg = dataclasses.replace(MOE_CFG, n_embd=e, norm_topk_prob=True)
    mw = MoEWeights(
        router=jnp.asarray(rng.standard_normal((e, ne)), jnp.float32),
        gate=None, up=None, down=None,
    )
    x = jnp.asarray(rng.standard_normal((5, e)).astype(np.float32))
    idx, wts = route(cfg, mw, x)
    assert idx.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(wts).sum(-1), 1.0, rtol=1e-5)
    # indices are distinct per row
    assert all(len(set(r)) == 2 for r in np.asarray(idx))


def test_moe_model_end_to_end():
    w = random_weights(MOE_CFG, seed=0)
    ctx = InferenceContext(MOE_CFG, w, n_lanes=1, max_seq=32)
    out = ctx.generate([1, 2, 3], 4)
    assert len(out) == 4
    # prefill/decode consistency on an MoE model
    ctx2 = InferenceContext(MOE_CFG, w, n_lanes=1, max_seq=32)
    s = ctx2.new_sequence()
    lg = ctx2.prefill(s, [1, 2, 3])
    ctx3 = InferenceContext(MOE_CFG, w, n_lanes=1, max_seq=32)
    s3 = ctx3.new_sequence()
    rows = [ctx3.prefill(s3, [1])[0]]
    for t in (2, 3):
        rows.append(ctx3.decode({s3: t})[s3])
    np.testing.assert_array_equal(lg.argmax(-1), np.stack(rows).argmax(-1))


def test_quantized_experts_match_dense():
    """TCQ4-quantized experts track the bf16 MoE within quantization noise,
    and keep the same routing."""
    import jax.numpy as jnp

    from rrs_tpu.models.moe import moe_ffn, quantize_experts, route

    cfg = ModelConfig(
        arch="qwen3moe", n_layers=1, n_embd=256, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=0, vocab_size=64, context_length=64,
        n_experts=4, n_experts_used=2, n_ff_exp=256, norm_topk_prob=True)
    rng = np.random.default_rng(0)
    e, f = cfg.n_embd, cfg.n_ff_exp
    mw = MoEWeights(
        router=jnp.asarray(rng.standard_normal((e, 4)) * 0.1, jnp.float32),
        gate=jnp.asarray(rng.standard_normal((4, e, f)) * 0.05, jnp.float32),
        up=jnp.asarray(rng.standard_normal((4, e, f)) * 0.05, jnp.float32),
        down=jnp.asarray(rng.standard_normal((4, f, e)) * 0.05, jnp.float32),
    )
    x = jnp.asarray(rng.standard_normal((1, 3, e)) * 0.5, jnp.float32)

    dense = np.asarray(moe_ffn(cfg, mw, x))
    qmw = quantize_experts(mw)
    assert qmw.quantized and qmw.gate is None
    assert qmw.gate_qs.shape == (4, e // 2, f)
    assert qmw.down_qs.shape == (4, f // 2, e)
    quant = np.asarray(moe_ffn(cfg, qmw, x))

    # same routing
    ti_d, _ = route(cfg, mw, x.reshape(-1, e))
    ti_q, _ = route(cfg, qmw, x.reshape(-1, e))
    np.testing.assert_array_equal(np.asarray(ti_d), np.asarray(ti_q))
    # outputs within (doubled) W4A4 noise
    rel = np.abs(quant - dense).max() / (np.abs(dense).max() + 1e-9)
    assert rel < 0.45, rel
    assert np.corrcoef(quant.ravel(), dense.ravel())[0, 1] > 0.93

    # plumbing exactness: the gathered-expert dequant equals the reference
    # TCQ4 dequant of the same expert matrix
    from rrs_tpu.models.linear import dequantize_w_jnp
    from rrs_tpu.models.moe import _dequant_expert

    got_w = np.asarray(_dequant_expert(
        qmw.gate_qs[jnp.asarray([[0]])], qmw.gate_eff[jnp.asarray([[0]])]
    ))[0, 0].astype(np.float32)
    want_w = np.asarray(dequantize_w_jnp(qmw.gate_qs[0], qmw.gate_eff[0]))
    np.testing.assert_allclose(got_w, want_w, rtol=1e-2, atol=1e-4)


def test_quantized_decode_and_prefill_branches_agree():
    """The decode path (scalar-prefetch expert-gather kernel) and the prefill
    path (scan over all experts, one-hot combine) compute the same MoE —
    feeding 20 tokens at once must match feeding them in <=16-token chunks."""
    import jax.numpy as jnp

    from rrs_tpu.models.moe import moe_ffn, quantize_experts

    cfg = ModelConfig(
        arch="qwen3moe", n_layers=1, n_embd=256, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=0, vocab_size=64, context_length=64,
        n_experts=4, n_experts_used=2, n_ff_exp=256, norm_topk_prob=True)
    rng = np.random.default_rng(1)
    e, f = cfg.n_embd, cfg.n_ff_exp
    mw = MoEWeights(
        router=jnp.asarray(rng.standard_normal((e, 4)) * 0.1, jnp.float32),
        gate=jnp.asarray(rng.standard_normal((4, e, f)) * 0.05, jnp.float32),
        up=jnp.asarray(rng.standard_normal((4, e, f)) * 0.05, jnp.float32),
        down=jnp.asarray(rng.standard_normal((4, f, e)) * 0.05, jnp.float32),
    )
    qmw = quantize_experts(mw)
    x = jnp.asarray(rng.standard_normal((1, 20, e)) * 0.5, jnp.float32)

    prefill = np.asarray(moe_ffn(cfg, qmw, x))          # n_tok=20 > 16
    chunks = [np.asarray(moe_ffn(cfg, qmw, x[:, i:i + 10]))
              for i in range(0, 20, 10)]                # n_tok=10 <= 16
    decode = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(prefill, decode, rtol=5e-2, atol=5e-3)
