"""RWKV6 tests: wkv6 op vs sequential oracle, chunked state carry,
decode==prefill, GGUF round-trip, world tokenizer."""

import jax.numpy as jnp
import numpy as np
import pytest

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import rwkv6 as rwkv_model
from rrs_tpu.ops.rwkv import wkv6, wkv6_ref
from rrs_tpu.runtime.recurrent import RecurrentContext, make_context


def _cfg(**kw):
    base = dict(arch="rwkv6", n_layers=2, n_embd=64, n_heads=0, n_kv_heads=0,
                head_dim=0, n_ff=128, vocab_size=96, context_length=512,
                rwkv_head_size=16, rwkv_tm_extra=8, rwkv_decay_extra=8,
                rwkv_rescale_every=2)
    base.update(kw)
    return ModelConfig(**base)


def test_wkv6_matches_sequential_ref():
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 7, 3, 8
    k = rng.standard_normal((b, t, h, d)).astype(np.float32) * 0.5
    v = rng.standard_normal((b, t, h, d)).astype(np.float32) * 0.5
    r = rng.standard_normal((b, t, h, d)).astype(np.float32) * 0.5
    tf = rng.standard_normal((h, d)).astype(np.float32) * 0.5
    td = rng.random((b, t, h, d)).astype(np.float32) * 0.9
    s0 = rng.standard_normal((b, h, d, d)).astype(np.float32) * 0.1
    out, s1 = wkv6(*map(jnp.asarray, (k, v, r, tf, td, s0)))
    out_ref, s1_ref = wkv6_ref(k, v, r, tf, td, s0)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s1), s1_ref, rtol=2e-4, atol=2e-4)


def test_wkv6_chunked_state_carry():
    rng = np.random.default_rng(1)
    b, t, h, d = 1, 8, 2, 4
    args = [rng.standard_normal((b, t, h, d)).astype(np.float32) * 0.3
            for _ in range(3)]
    tf = rng.standard_normal((h, d)).astype(np.float32) * 0.3
    td = rng.random((b, t, h, d)).astype(np.float32) * 0.9
    s = np.zeros((b, h, d, d), np.float32)
    full, s_full = wkv6(jnp.asarray(args[0]), jnp.asarray(args[1]),
                        jnp.asarray(args[2]), jnp.asarray(tf),
                        jnp.asarray(td), jnp.asarray(s))
    sc = jnp.asarray(s)
    outs = []
    for i in range(0, t, 4):
        o, sc = wkv6(jnp.asarray(args[0][:, i:i+4]),
                     jnp.asarray(args[1][:, i:i+4]),
                     jnp.asarray(args[2][:, i:i+4]),
                     jnp.asarray(tf), jnp.asarray(td[:, i:i+4]), sc)
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(full),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(s_full),
                               rtol=1e-4, atol=1e-4)


def test_rwkv6_decode_matches_prefill():
    cfg = _cfg()
    w = rwkv_model.random_weights(cfg, seed=2, dtype=jnp.float32)
    toks = [3, 17, 42, 5, 60, 7]

    ctx1 = RecurrentContext(cfg, w, n_lanes=1, max_seq=128, kv_dtype=jnp.float32)
    s1 = ctx1.new_sequence()
    full = ctx1.prefill(s1, toks)

    ctx2 = RecurrentContext(cfg, w, n_lanes=1, max_seq=128, kv_dtype=jnp.float32)
    s2 = ctx2.new_sequence()
    step = [ctx2.prefill(s2, toks[:1])[0]]
    for tok in toks[1:]:
        step.append(ctx2.decode({s2: tok})[s2])
    np.testing.assert_allclose(np.stack(step), full, rtol=2e-3, atol=2e-3)


def test_rwkv6_generate_via_factory():
    cfg = _cfg()
    w = rwkv_model.random_weights(cfg, seed=3)
    ctx = make_context(cfg, w, n_lanes=2, max_seq=128)
    out = ctx.generate([1, 2, 3], max_new_tokens=5)
    assert len(out) == 5 and all(0 <= t < cfg.vocab_size for t in out)


def test_rwkv6_gguf_roundtrip(tmp_path):
    from rrs_tpu.gguf.writer import GGUFWriter
    from rrs_tpu.models.loader import load_model

    cfg = _cfg(n_layers=1)
    e, ff = cfg.n_embd, cfg.n_ff
    d = cfg.rwkv_head_size
    h = e // d
    ex, dex = cfg.rwkv_tm_extra, cfg.rwkv_decay_extra
    rng = np.random.default_rng(4)
    a = "rwkv6"
    w = GGUFWriter(tmp_path / "rwkv.gguf")
    w.add_string("general.architecture", a)
    w.add_uint32(f"{a}.block_count", 1)
    w.add_uint32(f"{a}.context_length", 512)
    w.add_uint32(f"{a}.embedding_length", e)
    w.add_uint32(f"{a}.feed_forward_length", ff)
    w.add_uint32(f"{a}.wkv.head_size", d)
    w.add_uint32(f"{a}.time_mix_extra_dim", ex)
    w.add_uint32(f"{a}.time_decay_extra_dim", dex)
    w.add_uint32(f"{a}.vocab_size", cfg.vocab_size)

    def t(name, shape, s=0.05):
        w.add_tensor(name, (rng.standard_normal(shape) * s).astype(np.float32))

    t("token_embd.weight", (cfg.vocab_size, e))
    t("token_embd_norm.weight", (e,))
    t("token_embd_norm.bias", (e,))
    p = "blk.0"
    for nm in ("attn_norm", "attn_norm_2", "time_mix_ln"):
        t(f"{p}.{nm}.weight", (e,))
        t(f"{p}.{nm}.bias", (e,))
    t(f"{p}.time_mix_w1.weight", (5 * ex, e))           # np shape (ne reversed)
    t(f"{p}.time_mix_w2.weight", (5, e, ex))
    t(f"{p}.time_mix_lerp_x.weight", (1, 1, e))
    t(f"{p}.time_mix_lerp_fused.weight", (5, 1, 1, e))
    t(f"{p}.time_mix_first.weight", (h, d))
    t(f"{p}.time_mix_decay.weight", (e,))
    t(f"{p}.time_mix_decay_w1.weight", (dex, e))
    t(f"{p}.time_mix_decay_w2.weight", (e, dex))
    for nm in ("time_mix_key", "time_mix_value", "time_mix_receptance",
               "time_mix_gate", "time_mix_output", "channel_mix_receptance"):
        t(f"{p}.{nm}.weight", (e, e))
    t(f"{p}.channel_mix_lerp_k.weight", (1, 1, e))
    t(f"{p}.channel_mix_lerp_r.weight", (1, 1, e))
    t(f"{p}.channel_mix_key.weight", (ff, e))
    t(f"{p}.channel_mix_value.weight", (e, ff))
    t("output_norm.weight", (e,))
    t("output_norm.bias", (e,))
    t("output.weight", (cfg.vocab_size, e))
    w.write()

    cfg2, weights, md = load_model(tmp_path / "rwkv.gguf", dtype=np.float32)
    assert cfg2.rwkv_head_size == d and cfg2.is_recurrent
    ctx = make_context(cfg2, weights, n_lanes=1, max_seq=64)
    out = ctx.generate([1, 2, 3], max_new_tokens=3)
    assert len(out) == 3


def test_rwkv_world_tokenizer():
    from rrs_tpu.models.vocab import Vocab

    toks = ["<unk>", "h", "e", "l", "o", "he", "hell", "hello", " ", " w",
            "wor", "world", "r", "d"]
    v = Vocab(model="rwkv", tokens=toks, scores=None, token_types=[1] * 14,
              merges=None, unk_id=0, add_bos=False)
    enc = v.encode("hello world", add_special=False)
    # greedy longest match: "hello", " w", "o", "r", "l", "d"
    assert enc == [7, 9, 4, 12, 3, 13]
    # unknown char -> UNK
    assert v.encode("hZ", add_special=False) == [1, 0]
    # "hell" + "o" when "hello" absent
    v2 = Vocab(model="rwkv", tokens=toks[:7], scores=None,
               token_types=[1] * 7, merges=None, unk_id=0, add_bos=False)
    assert v2.encode("hello", add_special=False) == [6, 4]
