"""Hybrid (Jamba) model tests: mixed attn+ssm layers, hybrid memory
(llama-memory-hybrid.cpp + src/models/jamba.cpp analogs)."""

import numpy as np
import pytest

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import hybrid as hybrid_model
from rrs_tpu.runtime.hybrid import HybridContext
from rrs_tpu.runtime.recurrent import make_context


def _cfg():
    return ModelConfig(
        arch="jamba", n_layers=4, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, vocab_size=96, context_length=256,
        ssm_d_conv=4, ssm_d_inner=128, ssm_d_state=8, ssm_dt_rank=8,
        no_rope=True)


def test_config_flags():
    cfg = _cfg()
    assert cfg.is_hybrid and not cfg.is_recurrent and cfg.no_rope


def test_hybrid_decode_matches_prefill():
    cfg = _cfg()
    w = hybrid_model.random_weights(cfg, seed=0, attn_every=2)
    kinds = [l.kind for l in w.layers]
    assert "attn" in kinds and "ssm" in kinds
    toks = [3, 17, 42, 5, 60]

    ctx1 = HybridContext(cfg, w, n_lanes=1, max_seq=64)
    s1 = ctx1.new_sequence()
    full = ctx1.prefill(s1, toks)

    ctx2 = HybridContext(cfg, w, n_lanes=1, max_seq=64)
    s2 = ctx2.new_sequence()
    step = [ctx2.prefill(s2, toks[:1])[0]]
    for tok in toks[1:]:
        step.append(ctx2.decode({s2: tok})[s2])
    np.testing.assert_allclose(np.stack(step), full, rtol=3e-2, atol=3e-2)


def test_hybrid_context_generate_and_restrictions():
    cfg = _cfg()
    w = hybrid_model.random_weights(cfg, seed=1, attn_every=2)
    ctx = make_context(cfg, w, n_lanes=2, max_seq=64)
    assert isinstance(ctx, HybridContext)
    out = ctx.generate([1, 2, 3], max_new_tokens=4)
    assert len(out) == 4

    s = ctx.new_sequence()
    ctx.prefill(s, [4, 5, 6])
    ctx.kv.seq_cp(s, 777)
    assert ctx.kv.lengths[ctx.kv.lane_of(777)] == 3
    with pytest.raises(RuntimeError):
        ctx.kv.seq_rm(s, p0=1)
    with pytest.raises(RuntimeError):
        ctx.kv.seq_shift(cfg, 777, 1, 1)
    ctx.kv.seq_rm(s)
    ctx.kv.seq_rm(777)


def test_jamba_gguf_roundtrip(tmp_path):
    """Export a random jamba-shaped GGUF (hand-built) and load it."""
    from rrs_tpu.gguf.writer import GGUFWriter
    from rrs_tpu.models.loader import load_model

    cfg = _cfg()
    rng = np.random.default_rng(0)
    a = "jamba"
    w = GGUFWriter(tmp_path / "jamba.gguf")
    w.add_string("general.architecture", a)
    w.add_uint32(f"{a}.block_count", 2)
    w.add_uint32(f"{a}.context_length", 256)
    w.add_uint32(f"{a}.embedding_length", cfg.n_embd)
    w.add_uint32(f"{a}.feed_forward_length", cfg.n_ff)
    w.add_uint32(f"{a}.attention.head_count", cfg.n_heads)
    w.add_uint32(f"{a}.attention.head_count_kv", cfg.n_kv_heads)
    w.add_uint32(f"{a}.attention.key_length", cfg.head_dim)
    w.add_uint32(f"{a}.ssm.conv_kernel", cfg.ssm_d_conv)
    w.add_uint32(f"{a}.ssm.inner_size", cfg.ssm_d_inner)
    w.add_uint32(f"{a}.ssm.state_size", cfg.ssm_d_state)
    w.add_uint32(f"{a}.ssm.time_step_rank", cfg.ssm_dt_rank)
    w.add_uint32(f"{a}.vocab_size", cfg.vocab_size)

    def t(name, shape):
        w.add_tensor(name, (rng.standard_normal(shape) * 0.05).astype(np.float32))

    e, f = cfg.n_embd, cfg.n_ff
    di, ds, dtr, dc = (cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_dt_rank,
                       cfg.ssm_d_conv)
    t("token_embd.weight", (cfg.vocab_size, e))
    # layer 0: ssm
    t("blk.0.attn_norm.weight", (e,))
    t("blk.0.ssm_in.weight", (2 * di, e))
    t("blk.0.ssm_conv1d.weight", (di, dc))
    t("blk.0.ssm_conv1d.bias", (di,))
    t("blk.0.ssm_x.weight", (dtr + 2 * ds, di))
    t("blk.0.ssm_dt.weight", (di, dtr))
    t("blk.0.ssm_dt.bias", (di,))
    w.add_tensor("blk.0.ssm_a", (-np.exp(rng.standard_normal((di, ds)))).astype(np.float32))
    w.add_tensor("blk.0.ssm_d", np.ones((di,), np.float32))
    t("blk.0.ssm_out.weight", (e, di))
    t("blk.0.ffn_norm.weight", (e,))
    t("blk.0.ffn_gate.weight", (f, e))
    t("blk.0.ffn_up.weight", (f, e))
    t("blk.0.ffn_down.weight", (e, f))
    # layer 1: attention
    t("blk.1.attn_norm.weight", (e,))
    t("blk.1.attn_q.weight", (cfg.n_q_dim, e))
    t("blk.1.attn_k.weight", (cfg.n_kv_dim, e))
    t("blk.1.attn_v.weight", (cfg.n_kv_dim, e))
    t("blk.1.attn_output.weight", (e, cfg.n_q_dim))
    t("blk.1.ffn_norm.weight", (e,))
    t("blk.1.ffn_gate.weight", (f, e))
    t("blk.1.ffn_up.weight", (f, e))
    t("blk.1.ffn_down.weight", (e, f))
    t("output_norm.weight", (e,))
    w.write()

    cfg2, weights, md = load_model(tmp_path / "jamba.gguf")
    assert cfg2.is_hybrid and cfg2.no_rope
    assert [l.kind for l in weights.layers] == ["ssm", "attn"]
    ctx = make_context(cfg2, weights, n_lanes=1, max_seq=64)
    out = ctx.generate([1, 2, 3], max_new_tokens=3)
    assert len(out) == 3
