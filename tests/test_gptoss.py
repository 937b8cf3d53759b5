"""gpt-oss (LLM_ARCH_OPENAI_MOE) tests: alternating-SWA MoE with attention
sinks, swiglu_oai experts, post-top-k softmax routing, and qkv/output/expert
biases (reference src/models/openai-moe-iswa.cpp, llama-model.cpp:2256-2275,
6507-6546).
"""

import numpy as np
import pytest

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.export import export_random_gguf
from rrs_tpu.models.loader import load_model
from rrs_tpu.runtime.context import InferenceContext


@pytest.fixture(scope="module")
def oss_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("oss") / "oss.gguf"
    export_random_gguf(PRESETS["tiny-oss"], path, seed=21)
    cfg, w, _ = load_model(path)
    return cfg, w


def test_gptoss_config_roundtrip(oss_model):
    cfg, w = oss_model
    ref = PRESETS["tiny-oss"]
    assert cfg.arch == "gpt-oss"
    assert cfg.swa_window == ref.swa_window and cfg.swa_pattern == 2
    # set_swa_pattern(2): even layers sliding, odd layers full attention
    assert cfg.is_swa(0) and not cfg.is_swa(1) and cfg.is_swa(2)
    assert cfg.expert_softmax_weight and cfg.moe_act == "swiglu_oai"
    assert cfg.attn_bias
    lw = w.layers[0]
    assert lw.attn_sinks is not None and lw.attn_sinks.shape == (cfg.n_heads,)
    assert lw.wo.bias is not None            # attn_output.bias
    assert lw.ffn_norm is not None           # mapped from post_attention_norm
    assert lw.attn_post_norm is None         # NOT a gemma sandwich norm
    assert lw.moe.router_bias is not None
    assert lw.moe.gate_b.shape == (cfg.n_experts, cfg.n_ff_exp)
    assert lw.moe.down_b.shape == (cfg.n_experts, cfg.n_embd)


def test_softmax_weight_routing_oracle(oss_model):
    """SOFTMAX_WEIGHT gating (llama-graph.cpp:1047-1049,1118-1123): top-k on
    the raw biased logits, then softmax over ONLY the selected k."""
    import jax.numpy as jnp

    from rrs_tpu.models.moe import route

    cfg, w = oss_model
    mw = w.layers[0].moe
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(6, cfg.n_embd).astype(np.float32))
    topi, topv = route(cfg, mw, x)

    logits = (np.asarray(x, np.float32)
              @ np.asarray(mw.router, np.float32)
              + np.asarray(mw.router_bias, np.float32))
    for t in range(6):
        ids = np.argsort(-logits[t])[: cfg.n_experts_used]
        np.testing.assert_array_equal(np.sort(np.asarray(topi)[t]),
                                      np.sort(ids))
        sel = logits[t][np.asarray(topi)[t]]
        ex = np.exp(sel - sel.max())
        np.testing.assert_allclose(np.asarray(topv)[t], ex / ex.sum(),
                                   rtol=1e-4, atol=1e-5)


def test_swiglu_oai_formula():
    """ggml_swiglu_oai (ggml-cpu/ops.cpp:3260-3266): x=min(g,7),
    y=clamp(u,-7,7), out = x*sigmoid(1.702*x) * (y+1)."""
    import dataclasses

    import jax.numpy as jnp

    from rrs_tpu.models.moe import _moe_act

    cfg = dataclasses.replace(PRESETS["tiny-oss"])
    rng = np.random.RandomState(0)
    g = rng.randn(64).astype(np.float32) * 5
    u = rng.randn(64).astype(np.float32) * 5
    got = np.asarray(_moe_act(cfg, jnp.asarray(g), jnp.asarray(u)))
    x = np.minimum(g, 7.0)
    y = np.clip(u, -7.0, 7.0)
    want = x / (1.0 + np.exp(-1.702 * x)) * (y + 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gptoss_prefill_decode_consistency(oss_model):
    """End-to-end forward through sinks + alternating SWA + biased MoE:
    chunked prefill must equal token-by-token decode."""
    cfg, w = oss_model
    toks = [1, 5, 9, 200, 3, 17, 42, 7, 77, 123, 9, 2]

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


def test_gptoss_tp_matches_single_device(tmp_path):
    """gpt-oss under --tp: expert biases shard with the F columns, the
    down bias applies once after the psum, sinks shard per head."""
    from rrs_tpu.parallel.sharding import make_mesh

    path = tmp_path / "oss_tp.gguf"
    export_random_gguf(PRESETS["tiny-oss"], path, seed=23)
    cfg, w, _ = load_model(path, fuse=False)

    ref = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    tpc = InferenceContext(cfg, w, n_lanes=1, max_seq=64,
                           mesh=make_mesh(2, dp=1))

    prompt = list(range(1, 20))
    sr, st = ref.new_sequence(), tpc.new_sequence()
    lr = ref.prefill(sr, prompt)
    lt = tpc.prefill(st, prompt)
    np.testing.assert_allclose(lt, lr, rtol=3e-2, atol=3e-2)
    np.testing.assert_array_equal(lt.argmax(-1), lr.argmax(-1))

    tok = int(lr[-1].argmax())
    for _ in range(3):
        dr = ref.decode({sr: tok})[sr]
        dt = tpc.decode({st: tok})[st]
        np.testing.assert_allclose(dt, dr, rtol=1e-1, atol=1e-1)
        assert int(dr.argmax()) == int(dt.argmax())
        tok = int(dr.argmax())
