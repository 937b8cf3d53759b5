"""End-to-end model tests on the tiny config (CPU)."""

import numpy as np
import pytest

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime.sampler import SamplerParams


@pytest.fixture(scope="module")
def tiny_ctx():
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    return cfg, w


def test_prefill_decode_consistency(tiny_ctx):
    """Logits from chunked prefill must match token-by-token decode."""
    cfg, w = tiny_ctx
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
    # rankings must agree (greedy path identical)
    np.testing.assert_array_equal(
        logits_pre.argmax(-1), logits_step.argmax(-1)
    )


def test_multi_lane_isolation(tiny_ctx):
    """Two sequences decoding in one batch must not interfere."""
    cfg, w = tiny_ctx
    ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=32)
    a = ctx.new_sequence()
    b = ctx.new_sequence()
    la = ctx.prefill(a, [1, 2, 3])
    # solo reference for b
    ctx_solo = InferenceContext(cfg, w, n_lanes=2, max_seq=32)
    bs = ctx_solo.new_sequence()
    ref = ctx_solo.prefill(bs, [7, 8])

    lb = ctx.prefill(b, [7, 8])
    np.testing.assert_allclose(lb, ref, rtol=2e-2, atol=2e-2)

    # batched decode both
    out = ctx.decode({a: 4, b: 9})
    ref_out = ctx_solo.decode({bs: 9})
    np.testing.assert_allclose(out[b], ref_out[bs], rtol=2e-2, atol=2e-2)


def test_generate_greedy_deterministic(tiny_ctx):
    cfg, w = tiny_ctx
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    out1 = ctx.generate([1, 2, 3], 8, SamplerParams(temperature=0.0))
    ctx2 = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    out2 = ctx2.generate([1, 2, 3], 8, SamplerParams(temperature=0.0))
    assert out1 == out2
    assert len(out1) == 8
    assert all(0 <= t < cfg.vocab_size for t in out1)


def test_quantized_model_runs():
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=1, quantize=True)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    out = ctx.generate([1, 2, 3], 4, SamplerParams(temperature=0.0))
    assert len(out) == 4


def test_longrope_freq_factors():
    """LongRoPE (phi3): per-dim factors divide frequencies; attention scale
    boost sqrt(1+ln(s)/ln(orig)) applies when scaled."""
    import jax.numpy as jnp
    import numpy as np

    from rrs_tpu.ops.basic import RopeParams, apply_rope

    d = 16
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 1, d)),
                    jnp.float32)
    pos = jnp.asarray([[3, 4]], jnp.int32)
    p = RopeParams(head_dim=d, theta=10000.0, scale_factor=4.0,
                   orig_context=2048)
    base = apply_rope(x, pos, p)
    factors = jnp.full((d // 2,), 2.0, jnp.float32)
    scaled = apply_rope(x, pos, p, freq_factors=factors)
    assert not np.allclose(np.asarray(base), np.asarray(scaled))
    # factors=1 with scale_factor=1 -> identical to base path
    p1 = RopeParams(head_dim=d, theta=10000.0)
    same = apply_rope(x, pos, p1, freq_factors=jnp.ones((d // 2,)))
    np.testing.assert_allclose(np.asarray(same),
                               np.asarray(apply_rope(x, pos, p1)), rtol=1e-6)


def test_granite_logits_parity(tmp_path):
    """LLM_ARCH_GRANITE (llama-model.cpp:776-778 + models/granite.cpp):
    llama body with embedding/residual/attention/logit multipliers — HF
    GraniteForCausalLM logit parity through the converter+loader."""
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from rrs_tpu.models.loader import load_model
    from rrs_tpu.runtime.context import InferenceContext
    from rrs_tpu.tools.convert_hf import convert_hf_to_gguf

    cfg = transformers.GraniteConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        embedding_multiplier=6.0, residual_multiplier=0.22,
        attention_multiplier=0.015625, logits_scaling=4.0,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.GraniteForCausalLM(cfg)
    model.eval()
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    cfg.save_pretrained(str(d))

    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    mcfg, weights, md = load_model(out, dtype=np.float32, fuse=False)
    assert mcfg.arch == "granite"
    assert abs(mcfg.embd_scale - 6.0) < 1e-6
    assert abs(mcfg.residual_scale - 0.22) < 1e-6
    assert abs(mcfg.logits_divisor - 4.0) < 1e-6
    assert abs(mcfg.attn_scale - 0.015625) < 1e-9

    toks = [3, 17, 42, 99, 7]
    with torch.no_grad():
        hf = model(torch.tensor([toks])).logits[0].float().numpy()

    import jax.numpy as jnp

    ctx = InferenceContext(mcfg, weights, n_lanes=1, max_seq=32,
                           kv_dtype=jnp.float32)
    seq = ctx.new_sequence()
    got = ctx.prefill(seq, toks)
    assert got.shape == hf.shape
    np.testing.assert_allclose(got - got.max(-1, keepdims=True),
                               hf - hf.max(-1, keepdims=True),
                               atol=2e-2, rtol=0.05)


def test_olmo2_logits_parity(tmp_path):
    """LLM_ARCH_OLMO2 (models/olmo2.cpp): post-norm-only graph — raw
    residual stream feeds attention and FFN, outputs RMS-normed before
    the residual adds; q/k RMS-normed over the FULL projection width.
    HF Olmo2ForCausalLM logit parity through converter+loader."""
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from rrs_tpu.models.loader import load_model
    from rrs_tpu.runtime.context import InferenceContext
    from rrs_tpu.tools.convert_hf import convert_hf_to_gguf

    cfg = transformers.Olmo2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.Olmo2ForCausalLM(cfg)
    model.eval()
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    cfg.save_pretrained(str(d))

    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    mcfg, weights, md = load_model(out, dtype=np.float32, fuse=False)
    assert mcfg.arch == "olmo2"
    assert mcfg.post_norm_only and mcfg.qk_norm_full

    toks = [3, 17, 42, 99, 7]
    with torch.no_grad():
        hf = model(torch.tensor([toks])).logits[0].float().numpy()

    import jax.numpy as jnp

    ctx = InferenceContext(mcfg, weights, n_lanes=1, max_seq=32,
                           kv_dtype=jnp.float32)
    seq = ctx.new_sequence()
    got = ctx.prefill(seq, toks)
    assert got.shape == hf.shape
    np.testing.assert_allclose(got - got.max(-1, keepdims=True),
                               hf - hf.max(-1, keepdims=True),
                               atol=2e-2, rtol=0.05)
