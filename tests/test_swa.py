"""Sliding-window attention + iSWA ring cache tests.

Reference semantics: llama_hparams::is_swa / set_swa_pattern
(src/llama-hparams.cpp:8-18), the iSWA dual cache (llama-kv-cache-iswa.cpp),
and the gemma2/gemma3 graphs (src/models/gemma2.cpp, gemma3.cpp: softcaps,
sandwich norms, GELU FFN, sqrt(E) embedding scale, per-layer rope base).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import llama as llama_model
from rrs_tpu.ops import flash_attention as fa


def _rand_qkv(rng, b, t, h, hkv, s, d):
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("window", [4, 16])
def test_window_mask_kernel_vs_ref(window):
    rng = np.random.default_rng(0)
    b, t, h, hkv, s, d = 2, 8, 4, 2, 32, 64
    q, k, v = _rand_qkv(rng, b, t, h, hkv, s, d)
    pos = jnp.asarray(
        np.stack([np.arange(10, 10 + t), np.arange(3, 3 + t)]), jnp.int32)
    out = fa.flash_attention(q, k, v, pos, 0.125, window=window, interpret=True)
    ref = fa.attention_ref(q, k, v, pos, 0.125, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_window_ref_matches_dense_window():
    """The ring-aware mask equals an explicit dense sliding-window mask when
    the cache is linear (positions < S)."""
    rng = np.random.default_rng(1)
    b, t, h, hkv, s, d, window = 1, 6, 2, 2, 16, 32, 4
    q, k, v = _rand_qkv(rng, b, t, h, hkv, s, d)
    pos = jnp.asarray(np.arange(5, 5 + t)[None, :], jnp.int32)
    got = np.asarray(fa.attention_ref(q, k, v, pos, 0.2, window=window))

    # dense oracle
    qf = np.asarray(q).reshape(b, t, hkv, h // hkv, d)
    kf, vf = np.asarray(k), np.asarray(v)
    scores = np.einsum("bthgd,bhsd->bhgts", qf, kf) * 0.2
    kvp = np.arange(s)
    p = np.asarray(pos)
    mask = (kvp[None, None, :] <= p[:, :, None]) & (
        kvp[None, None, :] > p[:, :, None] - window)
    scores = np.where(mask[:, None, None], scores, -1e30)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    want = np.einsum("bhgts,bhsd->bthgd", probs, vf).reshape(b, t, h, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_is_swa_patterns():
    g2 = ModelConfig(arch="gemma2", n_layers=6, n_embd=64, n_heads=2,
                     n_kv_heads=2, head_dim=32, n_ff=128, vocab_size=64,
                     context_length=64, swa_window=8, swa_pattern=2)
    assert [g2.is_swa(i) for i in range(6)] == [True, False] * 3
    g3 = ModelConfig(arch="gemma3", n_layers=12, n_embd=64, n_heads=2,
                     n_kv_heads=2, head_dim=32, n_ff=128, vocab_size=64,
                     context_length=64, swa_window=8, swa_pattern=6)
    assert [g3.is_swa(i) for i in range(12)] == [True] * 5 + [False] + [True] * 5 + [False]
    mist = ModelConfig(arch="llama", n_layers=4, n_embd=64, n_heads=2,
                       n_kv_heads=2, head_dim=32, n_ff=128, vocab_size=64,
                       context_length=64, swa_window=8, swa_pattern=1)
    assert all(mist.is_swa(i) for i in range(4))


def _tiny_cfg(**kw):
    base = dict(arch="gemma3", n_layers=3, n_embd=128, n_heads=4, n_kv_heads=2,
                head_dim=32, n_ff=256, vocab_size=256, context_length=128)
    base.update(kw)
    return ModelConfig(**base)


def test_ring_cache_matches_full_cache():
    """Decoding with a small ring cache on SWA layers produces the same
    logits as a full-size cache (window masking active in both)."""
    window = 8
    cfg = _tiny_cfg(swa_window=window, swa_pattern=1)
    w = llama_model.random_weights(cfg, seed=3)
    n_tokens = 24
    toks = np.arange(n_tokens) % cfg.vocab_size

    def run(cache_size):
        ks = [jnp.zeros((1, cfg.n_kv_heads, cache_size, cfg.head_dim),
                        jnp.bfloat16) for _ in range(cfg.n_layers)]
        vs = [jnp.zeros_like(k) for k in ks]
        outs = []
        for i, tok in enumerate(toks):
            pos = jnp.asarray([[i]], jnp.int32)
            logits, ks, vs = llama_model.forward(
                cfg, w, jnp.asarray([[int(tok)]], jnp.int32), pos,
                ks, vs, pos, pos)
            outs.append(np.asarray(logits[0, 0]))
        return np.stack(outs)

    full = run(64)
    ring = run(window + 8)     # ring smaller than the sequence
    np.testing.assert_allclose(full, ring, rtol=2e-2, atol=2e-2)


def test_gemma_style_forward_features():
    """softcap + sandwich norms + GELU + embd scale + final softcap all run
    and change the output (vs a plain config)."""
    cfg = _tiny_cfg(swa_window=8, swa_pattern=6, qk_norm=True,
                    attn_softcap=50.0, final_softcap=30.0, ffn_act="gelu",
                    embd_scale=128.0 ** 0.5, sandwich_norm=True,
                    rope_theta_swa=10000.0)
    w = llama_model.random_weights(cfg, seed=5)
    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    ks = [jnp.zeros((1, cfg.n_kv_heads, 32, cfg.head_dim), jnp.bfloat16)
          for _ in range(cfg.n_layers)]
    vs = [jnp.zeros_like(k) for k in ks]
    logits, _, _ = llama_model.forward(cfg, w, toks, pos, ks, vs, pos, pos)
    a = np.asarray(logits)
    assert np.isfinite(a).all()
    assert np.abs(a).max() <= 30.0 + 1e-3      # final softcap bound


def test_iswa_cache_sizes_and_context():
    from rrs_tpu.runtime.context import InferenceContext
    from rrs_tpu.runtime.kv_cache import KVCache

    cfg = _tiny_cfg(swa_window=16, swa_pattern=2)
    kv = KVCache.create(cfg, n_lanes=1, max_seq=1024, max_chunk=64)
    # layers 0, 2 SWA (ring 128-rounded), layer 1 full
    assert kv.sizes == [128, 1024, 128]

    w = llama_model.random_weights(cfg, seed=7)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=256)
    out = ctx.generate([1, 2, 3, 4, 5], max_new_tokens=8)
    assert len(out) == 8
    assert all(0 <= t < cfg.vocab_size for t in out)


def test_swa_context_shift_rejected():
    from rrs_tpu.runtime.kv_cache import KVCache

    cfg = _tiny_cfg(swa_window=16, swa_pattern=2)
    kv = KVCache.create(cfg, n_lanes=1, max_seq=256)
    kv.seq_new(0)
    kv.lengths[0] = 100
    with pytest.raises(RuntimeError):
        kv.seq_shift(cfg, 0, n_keep=4, n_discard=32)


def test_gguf_config_parsing_gemma():
    md = {
        "general.architecture": "gemma3",
        "gemma3.block_count": 34,
        "gemma3.embedding_length": 2560,
        "gemma3.attention.head_count": 8,
        "gemma3.attention.head_count_kv": 4,
        "gemma3.attention.key_length": 256,
        "gemma3.feed_forward_length": 10240,
        "gemma3.context_length": 131072,
        "gemma3.attention.sliding_window": 1024,
        "gemma3.rope.freq_base": 1000000.0,
        "gemma3.vocab_size": 262208,
    }
    cfg = ModelConfig.from_gguf(md)
    assert cfg.swa_window == 1024 and cfg.swa_pattern == 6
    assert cfg.rope_theta_swa == 10000.0
    assert cfg.ffn_act == "gelu" and cfg.sandwich_norm and cfg.qk_norm
    assert abs(cfg.embd_scale - 2560.0 ** 0.5) < 1e-6
    assert abs(cfg.attn_scale - 1.0 / 16.0) < 1e-6
    assert cfg.is_swa(0) and not cfg.is_swa(5)
