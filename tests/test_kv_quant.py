"""Quantized (int8) KV cache tests — the type_k/type_v option analog."""

import numpy as np
import pytest

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext


@pytest.fixture(scope="module")
def model():
    cfg = PRESETS["tiny"]
    return cfg, random_weights(cfg, seed=0)


def test_q8_kv_close_to_bf16(model):
    cfg, w = model
    toks = [1, 2, 3, 4, 5]
    ctx_f = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    sf = ctx_f.new_sequence()
    lf = ctx_f.prefill(sf, toks)

    ctx_q = InferenceContext(cfg, w, n_lanes=1, max_seq=32, kv_quant="q8")
    sq = ctx_q.new_sequence()
    lq = ctx_q.prefill(sq, toks)

    # int8 KV noise is small; rankings should agree
    np.testing.assert_allclose(lq, lf, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(lq.argmax(-1), lf.argmax(-1))

    # decode continues fine
    df = ctx_f.decode({sf: 7})[sf]
    dq = ctx_q.decode({sq: 7})[sq]
    assert df.argmax() == dq.argmax()


def test_q8_kv_generate_and_shift(model):
    cfg, w = model
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=16, kv_quant="q8")
    out = ctx.generate([1, 2, 3], 5)
    assert len(out) == 5
    s = ctx.new_sequence()
    ctx.prefill(s, [1, 2, 3, 4, 5, 6, 7, 8])
    ctx.kv.seq_shift(cfg, s, 1, 4)
    assert ctx.kv.lengths[ctx.kv.lane_of(s)] == 4
    ctx.decode({s: 2})


def test_q4_kv_close_to_bf16(model):
    """Packed-int4 KV (Q4_0-class -ctk/-ctv analog): noisier than q8 but
    rankings must agree on short contexts."""
    cfg, w = model
    toks = [1, 2, 3, 4, 5]
    ctx_f = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    sf = ctx_f.new_sequence()
    lf = ctx_f.prefill(sf, toks)

    ctx_q = InferenceContext(cfg, w, n_lanes=1, max_seq=32, kv_quant="q4")
    sq = ctx_q.new_sequence()
    # even Hkv: head-pair layout — full-D u8 planes, half the head count
    arr = ctx_q.kv.k[0][0]
    assert arr.dtype == np.uint8 and arr.shape[-1] == cfg.head_dim
    assert arr.shape[1] == cfg.n_kv_heads // 2
    lq = ctx_q.prefill(sq, toks)

    np.testing.assert_allclose(lq, lf, rtol=2e-1, atol=2e-1)
    # int4 KV noise on a tiny random model (near-flat logits) can flip the
    # argmax; require strong per-row correlation instead
    for row_q, row_f in zip(lq, lf):
        assert np.corrcoef(row_q, row_f)[0, 1] > 0.97
    df = ctx_f.decode({sf: 7})[sf]
    dq = ctx_q.decode({sq: 7})[sq]
    assert np.corrcoef(df, dq)[0, 1] > 0.97


def test_q4_kv_generate_shift_state(model, tmp_path):
    from rrs_tpu.runtime import state as state_io

    cfg, w = model
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=16, kv_quant="q4")
    out = ctx.generate([1, 2, 3], 5)
    assert len(out) == 5
    s = ctx.new_sequence()
    ctx.prefill(s, [1, 2, 3, 4, 5, 6, 7, 8])
    ctx.kv.seq_shift(cfg, s, 1, 4)
    assert ctx.kv.lengths[ctx.kv.lane_of(s)] == 4
    ctx.decode({s: 2})

    # sequence state roundtrip through the q4 codec
    p = tmp_path / "seq.npz"
    state_io.save_sequence(ctx, s, p)
    before = ctx.decode({s: 3})[s]
    ctx.kv.seq_rm(s)
    s2, _ = state_io.load_sequence(ctx, p)
    after = ctx.decode({s2: 3})[s2]
    np.testing.assert_allclose(before, after, rtol=5e-2, atol=5e-2)


def test_q4_codec_roundtrip():
    import jax.numpy as jnp

    from rrs_tpu.runtime import kv_codec

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 64)), jnp.float32)
    q, s = kv_codec.quantize_rows(x, 7.0)
    packed = kv_codec.pack4(q)
    assert packed.dtype == jnp.uint8 and packed.shape[-1] == 32
    back = kv_codec.unpack4(packed)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q))
    deq = np.asarray(back).astype(np.float32) * np.asarray(s)[..., None]
    rel = np.abs(deq - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.15


def test_q4_head_pair_codec_roundtrip():
    import jax.numpy as jnp

    from rrs_tpu.runtime import kv_codec

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 64)), jnp.float32)
    q, s = kv_codec.quantize_rows(x, 7.0)
    packed = kv_codec.pack_hp(q)
    assert packed.dtype == jnp.uint8 and packed.shape == (2, 2, 8, 64)
    back = kv_codec.unpack_hp(packed)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q))
    sc = jnp.asarray(np.asarray(s)[:, :, None, :])      # [B, H, 1, S]
    assert kv_codec.is_head_pair(packed, sc)
    deq = kv_codec.dequantize(packed, sc)
    ref = np.asarray(q).astype(np.float32) * np.asarray(s)[..., None]
    np.testing.assert_allclose(np.asarray(deq), ref, atol=1e-6)


def test_q4_odd_heads_halves_fallback():
    """Odd kv-head configs keep the halves layout (no head pairing)."""
    import dataclasses

    cfg = dataclasses.replace(PRESETS["tiny"], n_kv_heads=1, n_heads=2)
    w = random_weights(cfg, seed=1)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=16, kv_quant="q4")
    arr = ctx.kv.k[0][0]
    assert arr.shape[1] == 1 and arr.shape[-1] == cfg.head_dim // 2
    out = ctx.generate([1, 2, 3], 4)
    assert len(out) == 4
