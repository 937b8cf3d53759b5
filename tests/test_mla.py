"""MLA (deepseek2) tests: absorbed-MQA attention + DeepSeek MoE routing.

Covers the deepseek2 graph contract (reference src/models/deepseek2.cpp)
and the V3 router semantics (build_moe_ffn, llama-graph.cpp:999-1160).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rrs_tpu.models.config import PRESETS, ModelConfig
from rrs_tpu.models.export import export_random_gguf
from rrs_tpu.models.loader import load_model
from rrs_tpu.runtime.context import InferenceContext


@pytest.fixture(scope="module")
def mla_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("mla") / "mla.gguf"
    export_random_gguf(PRESETS["tiny-mla"], path, seed=7)
    cfg, w, md = load_model(path)
    return cfg, w


def test_mla_config_roundtrip(mla_model):
    cfg, _ = mla_model
    ref = PRESETS["tiny-mla"]
    assert cfg.is_mla
    assert cfg.kv_lora_rank == ref.kv_lora_rank
    assert cfg.q_lora_rank == ref.q_lora_rank
    assert cfg.qk_rope_dim == ref.qk_rope_dim
    assert cfg.head_dim == ref.head_dim          # decompressed (nope+rope)
    assert cfg.v_head_dim == ref.v_head_dim
    assert cfg.n_dense_lead == ref.n_dense_lead
    assert cfg.n_expert_groups == ref.n_expert_groups
    assert not cfg.expert_gating_softmax
    assert cfg.expert_weights_norm
    assert cfg.kv_cache_heads == 1
    assert cfg.kv_k_dim == ref.qk_rope_dim + ref.kv_lora_rank
    assert cfg.kv_v_dim == ref.kv_lora_rank


def test_mla_prefill_decode_consistency(mla_model):
    cfg, w = mla_model
    toks = [1, 5, 9, 200, 3, 17, 42]

    ctx1 = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    s1 = ctx1.new_sequence()
    logits_pre = ctx1.prefill(s1, toks)

    ctx2 = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    s2 = ctx2.new_sequence()
    rows = [ctx2.prefill(s2, [toks[0]])[0]]
    for t in toks[1:]:
        rows.append(ctx2.decode({s2: t})[s2])
    logits_step = np.stack(rows)

    np.testing.assert_allclose(logits_pre, logits_step, rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(
        logits_pre.argmax(-1), logits_step.argmax(-1))


def test_mla_multi_lane_isolation(mla_model):
    cfg, w = mla_model
    ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=32)
    a = ctx.new_sequence()
    b = ctx.new_sequence()
    ctx.prefill(a, [1, 2, 3])
    ctx_solo = InferenceContext(cfg, w, n_lanes=2, max_seq=32)
    bs = ctx_solo.new_sequence()
    ref = ctx_solo.prefill(bs, [7, 8])
    lb = ctx.prefill(b, [7, 8])
    np.testing.assert_allclose(lb, ref, rtol=2e-2, atol=2e-2)


def test_mla_q8_kv_cache(mla_model):
    """Quantized latent cache must keep the greedy path intact."""
    cfg, w = mla_model
    toks = [3, 1, 4, 1, 5, 9, 2, 6]
    ref_ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    ref = ref_ctx.prefill(ref_ctx.new_sequence(), toks)
    q_ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64, kv_quant="q8")
    got = q_ctx.prefill(q_ctx.new_sequence(), toks)
    assert np.mean(ref.argmax(-1) == got.argmax(-1)) >= 0.85


def test_mla_absorbed_matches_decompressed(mla_model):
    """The absorbed-MQA computation must equal naive MHA decompression:
    K_h = [rope | wk_b_h^T c] per head, V_h = wv_b_h^T c (the reference's
    non-MLA branch, deepseek2.cpp:151-188)."""
    from rrs_tpu.models import llama as lm

    cfg, w = mla_model
    lw = w.layers[1]
    rng = np.random.default_rng(0)
    b, t = 1, 6
    x = jnp.asarray(rng.standard_normal((b, t, cfg.n_embd)) * 0.3,
                    jnp.float32)
    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    kc = jnp.zeros((b, 1, t, cfg.kv_k_dim), jnp.float32)
    vc = jnp.zeros((b, 1, t, cfg.kv_v_dim), jnp.float32)
    out, kcache, vcache = lm.mla_attention(
        cfg, lw, x, pos, kc, vc, pos, pos)

    # oracle: decompress cached latents to per-head K/V and run plain MHA
    kcache = np.asarray(kcache)[0, 0]                    # [S, rope+r]
    rope_d, r = cfg.qk_rope_dim, cfg.kv_lora_rank
    k_pe, c = kcache[:, :rope_d], kcache[:, rope_d:]
    wk_b = np.asarray(lw.wk_b, np.float32)               # [H, nope, r]
    wv_b = np.asarray(lw.wv_b, np.float32)               # [H, r, v]
    k_nope = np.einsum("sr,hnr->hsn", c, wk_b)           # [H, S, nope]
    v_full = np.einsum("sr,hrv->hsv", c, wv_b)           # [H, S, v]

    # per-head q (pre-absorption): recompute the projection chain
    from rrs_tpu.models.linear import linear_apply
    from rrs_tpu.ops.basic import rms_norm

    ql = rms_norm(linear_apply(lw.wq_a, x), lw.q_norm, cfg.rms_eps)
    q = np.asarray(linear_apply(lw.wq, ql), np.float32).reshape(
        b, t, cfg.n_heads, cfg.head_dim)
    q_nope, q_pe = q[..., : cfg.qk_nope_dim], q[..., cfg.qk_nope_dim:]
    from rrs_tpu.ops.basic import apply_rope

    q_pe = np.asarray(apply_rope(jnp.asarray(q_pe), pos,
                                 lm.mla_rope_params(cfg)))

    scale = lm.mla_kq_scale(cfg)
    scores = (np.einsum("bthn,hsn->bhts", q_nope, k_nope)
              + np.einsum("bthd,sd->bhts", q_pe, k_pe)) * scale
    mask = np.arange(t)[None, :] <= np.arange(t)[:, None]   # [T, S]
    scores = np.where(mask[None, None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ctx_ref = np.einsum("bhts,hsv->bthv", p, v_full).reshape(
        b, t, cfg.n_heads * cfg.v_head_dim)
    out_ref = np.asarray(linear_apply(
        lw.wo, jnp.asarray(ctx_ref, jnp.float32)))
    np.testing.assert_allclose(np.asarray(out, np.float32), out_ref,
                               rtol=2e-2, atol=2e-2)


def test_v3_router_semantics():
    """route() must reproduce build_moe_ffn's sigmoid + selection-bias +
    expert-group + norm + scale pipeline on a hand-checked example."""
    from rrs_tpu.models.moe import MoEWeights, route

    rng = np.random.default_rng(3)
    E, G, K, T, D = 8, 4, 2, 5, 16
    cfg = dataclasses.replace(
        PRESETS["tiny-mla"], n_experts=E, n_experts_used=K,
        n_expert_groups=G, n_group_used=2, expert_gating_softmax=False,
        expert_weights_norm=True, expert_weights_scale=2.5)
    router = rng.standard_normal((D, E)).astype(np.float32)
    bias = rng.standard_normal((E,)).astype(np.float32)
    mw = MoEWeights(router=jnp.asarray(router), gate=None, up=None,
                    down=None, probs_bias=jnp.asarray(bias))
    x = rng.standard_normal((T, D)).astype(np.float32)

    topi, topv = route(cfg, mw, jnp.asarray(x))
    topi, topv = np.asarray(topi), np.asarray(topv)

    probs = 1.0 / (1.0 + np.exp(-(x @ router)))
    sel = probs + bias[None, :]
    per_g = E // G
    for ti in range(T):
        gsel = sel[ti].reshape(G, per_g)
        gscore = np.sort(gsel, axis=-1)[:, -2:].sum(-1)
        keep_groups = set(np.argsort(-gscore)[:2])
        masked = np.where(
            np.isin(np.arange(E) // per_g, list(keep_groups)),
            sel[ti], -np.inf)
        exp_ids = np.argsort(-masked)[:K]
        assert set(topi[ti]) == set(exp_ids)
        wsel = probs[ti][topi[ti]]
        expect = wsel / max(wsel.sum(), 6.1035156e-5) * 2.5
        np.testing.assert_allclose(topv[ti], expect, rtol=1e-5, atol=1e-6)


def test_softmax_router_unchanged():
    """Default qwen-style softmax top-k routing must be unaffected."""
    from rrs_tpu.models.moe import MoEWeights, route

    rng = np.random.default_rng(4)
    E, K, T, D = 8, 2, 4, 16
    cfg = dataclasses.replace(
        PRESETS["tiny"], n_experts=E, n_experts_used=K)
    router = rng.standard_normal((D, E)).astype(np.float32)
    mw = MoEWeights(router=jnp.asarray(router), gate=None, up=None,
                    down=None)
    x = rng.standard_normal((T, D)).astype(np.float32)
    topi, topv = route(cfg, mw, jnp.asarray(x))
    logits = x @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    for ti in range(T):
        ids = np.argsort(-probs[ti])[:K]
        np.testing.assert_array_equal(np.sort(np.asarray(topi)[ti]),
                                      np.sort(ids))
        np.testing.assert_allclose(
            np.sort(np.asarray(topv)[ti])[::-1],
            np.sort(probs[ti][ids])[::-1], rtol=1e-5)


def test_mla_context_shift(tmp_path):
    """seq_shift must re-rotate ONLY the leading rope dims of the latent
    row ("rope must go first", deepseek2.cpp:126). For a 1-layer model
    layer-0 latents depend only on their own token, so a shift must
    reproduce a fresh prefill of the suffix (same invariant as
    test_context_shift for standard caches)."""
    cfg = dataclasses.replace(PRESETS["tiny-mla"], n_layers=1,
                              n_dense_lead=1)
    path = tmp_path / "mla1.gguf"
    export_random_gguf(cfg, path, seed=5)
    cfg, w, _ = load_model(path)
    toks = [3, 1, 4, 1, 5, 9, 2, 6]
    n_keep, n_discard = 0, 4

    ctx_a = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    sa = ctx_a.new_sequence()
    ctx_a.prefill(sa, toks)
    ctx_a.kv.seq_shift(cfg, sa, n_keep, n_discard)
    assert ctx_a.kv.lengths[0] == len(toks) - n_discard
    la = ctx_a.decode({sa: 7})[sa]

    ctx_b = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    sb = ctx_b.new_sequence()
    ctx_b.prefill(sb, toks[n_discard:])
    lb = ctx_b.decode({sb: 7})[sb]

    np.testing.assert_allclose(la, lb, rtol=5e-2, atol=5e-2)
    assert la.argmax() == lb.argmax()


def test_mla_tp_context_matches_single_device(mla_model):
    """--tp on a deepseek2 model: query heads + wk_b/wv_b/wo shard over tp,
    the shared latent projections and the single-kv-head cache replicate
    (nothing to split in a 1-head latent cache); results must match the
    single-device context, including through MoE layers with V3 grouped
    routing."""
    from rrs_tpu.parallel.sharding import make_mesh

    cfg, w = mla_model
    ref = InferenceContext(cfg, w, n_lanes=2, max_seq=64)
    mesh = make_mesh(4, dp=2)              # dp=2 x tp=2
    tpc = InferenceContext(cfg, w, n_lanes=2, max_seq=64, mesh=mesh)

    prompt = [1, 5, 9, 200, 3]
    sr, st = ref.new_sequence(), tpc.new_sequence()
    lr = ref.prefill(sr, prompt)
    lt = tpc.prefill(st, prompt)
    np.testing.assert_allclose(lt, lr, rtol=3e-2, atol=3e-2)
    np.testing.assert_array_equal(lt.argmax(-1), lr.argmax(-1))

    tok_r, tok_t = int(lr[-1].argmax()), int(lt[-1].argmax())
    for _ in range(3):
        dr = ref.decode({sr: tok_r})[sr]
        dt = tpc.decode({st: tok_t})[st]
        np.testing.assert_allclose(dt, dr, rtol=1e-1, atol=1e-1)
        tok_r, tok_t = int(dr.argmax()), int(dt.argmax())
        assert tok_r == tok_t
