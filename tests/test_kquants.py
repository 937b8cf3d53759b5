"""K-quant codec tests: quantize with scalar formula impls, dequantize vectorized."""

import numpy as np

from rrs_tpu.formats import kquants
from rrs_tpu.formats.tcq4 import quantize_tcq4
from rrs_tpu.formats.tile_codec import TILE_BYTES, decode_tcq4_gguf, encode_tcq4_gguf
from rrs_tpu.gguf.constants import GGMLType


def test_q8_0_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256).astype(np.float32)
    raw = kquants.quantize_q8_0(x)
    y = kquants.dequantize_q8_0(raw, 256)
    # q8 error <= d/2 per element
    d = np.abs(x.reshape(-1, 32)).max(1) / 127.0
    assert np.all(np.abs(y - x) <= np.repeat(d, 32) * 0.5 + 1e-7)


def _pack_q4_k_scalar(d, dmin, sc6, mn6, q):
    """Build one 144-byte Q4_K block from parts (scalar, straight from struct)."""
    out = np.zeros(144, np.uint8)
    out[0:2] = np.frombuffer(np.float16(d).tobytes(), np.uint8)
    out[2:4] = np.frombuffer(np.float16(dmin).tobytes(), np.uint8)
    scales = np.zeros(12, np.uint8)
    for j in range(4):
        scales[j] = sc6[j] & 63
        scales[j + 4] = mn6[j] & 63
    for j in range(4, 8):
        scales[j + 4] = (sc6[j] & 0xF) | ((mn6[j] & 0xF) << 4)
        scales[j - 4] |= (sc6[j] >> 4) << 6
        scales[j] |= (mn6[j] >> 4) << 6
    out[4:16] = scales
    qs = np.zeros(128, np.uint8)
    for c in range(4):
        lo = q[c * 64 : c * 64 + 32]
        hi = q[c * 64 + 32 : c * 64 + 64]
        qs[c * 32 : (c + 1) * 32] = lo | (hi << 4)
    out[16:144] = qs
    return out


def test_q4_k_dequant_formula():
    rng = np.random.default_rng(1)
    d, dmin = 0.02, 0.01
    sc6 = rng.integers(0, 64, 8).astype(np.uint8)
    mn6 = rng.integers(0, 64, 8).astype(np.uint8)
    q = rng.integers(0, 16, 256).astype(np.uint8)
    raw = _pack_q4_k_scalar(d, dmin, sc6, mn6, q)
    y = kquants.dequantize_q4_k(raw, 256)
    d16 = np.float32(np.float16(d))
    m16 = np.float32(np.float16(dmin))
    for i in range(256):
        chunk = i // 32          # 8 chunks of 32, scale index = chunk
        expected = d16 * sc6[chunk] * q_val(q, i) - m16 * mn6[chunk]
        np.testing.assert_allclose(y[i], expected, rtol=1e-6)


def q_val(q, i):
    # element i lives in chunk c=i//64; low nibbles hold [c*64, c*64+32)
    return float(q[i])


def test_q6_k_roundtrip_small_values():
    # Construct a block via the inverse of the documented layout and check dequant.
    rng = np.random.default_rng(2)
    vals6 = rng.integers(0, 64, 256).astype(np.uint8)       # 6-bit codes
    scales = rng.integers(-8, 8, 16).astype(np.int8)
    d = 0.05
    ql = np.zeros(128, np.uint8)
    qh = np.zeros(64, np.uint8)
    for half in range(2):
        for l in range(32):
            v1 = vals6[half * 128 + l]
            v2 = vals6[half * 128 + l + 32]
            v3 = vals6[half * 128 + l + 64]
            v4 = vals6[half * 128 + l + 96]
            ql[half * 64 + l] = (v1 & 0xF) | ((v3 & 0xF) << 4)
            ql[half * 64 + l + 32] = (v2 & 0xF) | ((v4 & 0xF) << 4)
            qh[half * 32 + l] = (v1 >> 4) | ((v2 >> 4) << 2) | ((v3 >> 4) << 4) | ((v4 >> 4) << 6)
    raw = np.concatenate([
        ql, qh, scales.view(np.uint8),
        np.frombuffer(np.float16(d).tobytes(), np.uint8),
    ])
    y = kquants.dequantize_q6_k(raw, 256)
    d16 = np.float32(np.float16(d))
    for i in range(256):
        sc = scales[i // 16]
        np.testing.assert_allclose(y[i], d16 * sc * (int(vals6[i]) - 32), rtol=1e-6)


def test_tcq4_gguf_tile_roundtrip():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((16, 512)).astype(np.float32)
    t = quantize_tcq4(w)
    blob = encode_tcq4_gguf(t)
    assert len(blob) == (16 // 8) * (512 // 256) * TILE_BYTES
    t2 = decode_tcq4_gguf(np.frombuffer(blob, np.uint8), (16, 512))
    np.testing.assert_array_equal(t2.qs, t.qs)
    np.testing.assert_array_equal(t2.sc, t.sc)
    np.testing.assert_array_equal(
        t2.S.view(np.uint16), t.S.view(np.uint16)
    )
    assert t2.zc is None  # symmetric zeros detected


def test_tcq4_dispatch_through_kquants():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((8, 256)).astype(np.float32)
    t = quantize_tcq4(w)
    blob = np.frombuffer(encode_tcq4_gguf(t), np.uint8)
    deq = kquants.dequantize(blob, GGMLType.TCQ4_K32, (8, 256))
    rel = np.linalg.norm(deq - w) / np.linalg.norm(w)
    assert rel < 0.12, rel


def test_mxfp4_roundtrip():
    """MXFP4 codec (dequantize_row_mxfp4 semantics): values drawn from the
    e2m1 table times a power-of-two block scale round-trip exactly."""
    from rrs_tpu.formats.kquants import (_MXFP4_KVALUES, dequantize,
                                         dequantize_mxfp4, quantize_mxfp4)
    from rrs_tpu.gguf.constants import GGMLType

    rng = np.random.default_rng(0)
    nb = 8
    idx = rng.integers(0, 16, (nb, 32))
    scales = 2.0 ** rng.integers(-6, 6, nb).astype(np.float64)
    x = (_MXFP4_KVALUES[idx].astype(np.float64)
         * scales[:, None]).astype(np.float32)
    raw = quantize_mxfp4(x)
    back = dequantize_mxfp4(raw, x.size).reshape(nb, 32)
    np.testing.assert_allclose(back, x, rtol=0, atol=0)
    # registered in the generic dispatcher
    via = dequantize(raw, GGMLType.MXFP4, (nb, 32))
    np.testing.assert_allclose(via, x)


def test_mxfp4_error_bounded():
    from rrs_tpu.formats.kquants import dequantize_mxfp4, quantize_mxfp4

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    back = dequantize_mxfp4(quantize_mxfp4(x), x.size).reshape(4, 32)
    err = np.abs(back - x).max(axis=1)
    amax = np.abs(x).max(axis=1)
    assert (err <= amax * 0.35).all(), err / amax


# ---------------------------------------------------------------------------
# Oracle cross-check vs the reference's own gguf-py dequantizers: synthetic
# raw blocks (random quant bytes, sane fp16 scale fields) must dequantize
# byte-identically. Test-time-only use of /root/reference (like the tokenizer
# fixture corpora); the implementations under test are original.

import sys

_GGUF_PY = "/root/reference/gguf-py"


def _oracle_dequant(raw, rtype_name, n):
    sys.path.insert(0, _GGUF_PY)
    try:
        from gguf import quants as rq
        from gguf.constants import GGMLQuantizationType as RT

        return rq.dequantize(raw, getattr(RT, rtype_name))[:n]
    finally:
        sys.path.remove(_GGUF_PY)


def _synth_blocks(rng, nb, block_bytes, f16_offsets, f32_offsets=()):
    raw = rng.integers(0, 256, (nb, block_bytes)).astype(np.uint8)
    for off in f16_offsets:
        d = rng.uniform(0.001, 0.1, nb).astype(np.float16)
        raw[:, off:off + 2] = d[:, None].view(np.uint8).reshape(nb, 2)
    for off in f32_offsets:
        d = rng.uniform(0.001, 0.1, nb).astype(np.float32)
        raw[:, off:off + 4] = d[:, None].view(np.uint8).reshape(nb, 4)
    return raw.reshape(-1)


_ORACLE_CASES = [
    # (name, dequant fn, elems/block, bytes/block, fp16 offsets, fp32 offsets)
    ("Q4_1", kquants.dequantize_q4_1, 32, 20, (0, 2), ()),
    ("Q5_0", kquants.dequantize_q5_0, 32, 22, (0,), ()),
    ("Q5_1", kquants.dequantize_q5_1, 32, 24, (0, 2), ()),
    ("Q2_K", kquants.dequantize_q2_k, 256, 84, (80, 82), ()),
    ("Q3_K", kquants.dequantize_q3_k, 256, 110, (108,), ()),
    ("Q4_K", kquants.dequantize_q4_k, 256, 144, (0, 2), ()),
    ("Q5_K", kquants.dequantize_q5_k, 256, 176, (0, 2), ()),
    ("Q6_K", kquants.dequantize_q6_k, 256, 210, (208,), ()),
    # Q8_K is absent from gguf-py's trait table; covered by formula test below
    ("IQ4_NL", kquants.dequantize_iq4_nl, 32, 18, (0,), ()),
    ("IQ4_XS", kquants.dequantize_iq4_xs, 256, 136, (0,), ()),
]


def test_dequant_vs_reference_gguf_py():
    import pytest as _pytest
    import os

    if not os.path.isdir(_GGUF_PY):
        _pytest.skip("reference gguf-py not available")
    rng = np.random.default_rng(7)
    for name, fn, qk, bb, f16o, f32o in _ORACLE_CASES:
        raw = _synth_blocks(rng, 16, bb, f16o, f32o)
        n = 16 * qk
        ours = fn(raw, n)
        theirs = _oracle_dequant(raw, name, n).astype(np.float32).reshape(-1)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7,
                                   err_msg=name)


def test_q8_k_formula():
    # block: f32 d, int8 qs[256], int16 bsums[16]; x = d*q
    rng = np.random.default_rng(3)
    raw = _synth_blocks(rng, 4, 292, (), (0,))
    blocks = raw.reshape(4, 292)
    d = blocks[:, :4].copy().view(np.float32)[:, 0]
    q = blocks[:, 4:260].view(np.int8)
    ours = kquants.dequantize_q8_k(raw, 4 * 256).reshape(4, 256)
    np.testing.assert_allclose(ours, d[:, None] * q.astype(np.float32))


def test_tq_ternary_vs_oracle():
    """TQ1_0/TQ2_0: our quantize bytes == oracle quantize bytes, and both
    dequantizers agree, on random data."""
    import os
    import pytest as _pytest

    if not os.path.isdir(_GGUF_PY):
        _pytest.skip("reference gguf-py not available")
    sys.path.insert(0, _GGUF_PY)
    try:
        from gguf import quants as rq
        from gguf.constants import GGMLQuantizationType as RT
    finally:
        sys.path.remove(_GGUF_PY)
    rng = np.random.default_rng(11)
    x = rng.standard_normal(8 * 256).astype(np.float32)
    for name, qf, df in (("TQ1_0", kquants.quantize_tq1_0, kquants.dequantize_tq1_0),
                         ("TQ2_0", kquants.quantize_tq2_0, kquants.dequantize_tq2_0)):
        theirs_raw = rq.quantize(x, getattr(RT, name))
        ours_raw = qf(x)
        np.testing.assert_array_equal(ours_raw, theirs_raw.reshape(-1), err_msg=name)
        ours = df(ours_raw, x.size)
        theirs = rq.dequantize(theirs_raw, getattr(RT, name)).reshape(-1)
        np.testing.assert_allclose(ours, theirs.astype(np.float32), rtol=1e-6,
                                   err_msg=name)
        # registered in the generic dispatcher
        via = kquants.dequantize(ours_raw, getattr(GGMLType, name), (8, 256))
        np.testing.assert_allclose(via.reshape(-1), ours)


_IQ_ORACLE_CASES = [
    # i-quants: synthetic blocks with sane fp16 d; grid indices are random
    # bytes (every index is valid — the grids cover the full index range)
    ("IQ2_XXS", kquants.dequantize_iq2_xxs, 66, (0,)),
    ("IQ2_XS", kquants.dequantize_iq2_xs, 74, (0,)),
    ("IQ2_S", kquants.dequantize_iq2_s, 82, (0,)),
    ("IQ3_XXS", kquants.dequantize_iq3_xxs, 98, (0,)),
    ("IQ3_S", kquants.dequantize_iq3_s, 110, (0,)),
    ("IQ1_S", kquants.dequantize_iq1_s, 50, (0,)),
    ("IQ1_M", kquants.dequantize_iq1_m, 56, ()),
]


def test_iq_dequant_vs_reference_gguf_py():
    import os
    import pytest as _pytest

    if not os.path.isdir(_GGUF_PY):
        _pytest.skip("reference gguf-py not available")
    rng = np.random.default_rng(13)
    for name, fn, bb, f16o in _IQ_ORACLE_CASES:
        raw = _synth_blocks(rng, 16, bb, f16o)
        n = 16 * 256
        ours = fn(raw, n)
        theirs = _oracle_dequant(raw, name, n).astype(np.float32).reshape(-1)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7,
                                   err_msg=name)
        via = kquants.dequantize(raw, getattr(GGMLType, name), (16, 256))
        np.testing.assert_allclose(via.reshape(-1), ours, err_msg=name)


# --- encoder tests (round 3: quantize-side K-quant/IQ4/legacy zoo,
#     llama-quant.cpp make_qx/make_qkx analogs) -------------------------------

_ENCODERS = [
    # (name, quantize fn, dequantize fn, block elems, rmse budget for
    #  N(0,1) data — generous upper bounds, tightness checked relatively)
    ("q2_k", kquants.quantize_q2_k, kquants.dequantize_q2_k, 256, 0.30),
    ("q3_k", kquants.quantize_q3_k, kquants.dequantize_q3_k, 256, 0.17),
    ("q4_k", kquants.quantize_q4_k, kquants.dequantize_q4_k, 256, 0.08),
    ("q5_k", kquants.quantize_q5_k, kquants.dequantize_q5_k, 256, 0.045),
    ("q6_k", kquants.quantize_q6_k, kquants.dequantize_q6_k, 256, 0.025),
    ("iq4_nl", kquants.quantize_iq4_nl, kquants.dequantize_iq4_nl, 32, 0.10),
    ("iq4_xs", kquants.quantize_iq4_xs, kquants.dequantize_iq4_xs, 256, 0.10),
    ("q4_0", kquants.quantize_q4_0, kquants.dequantize_q4_0, 32, 0.13),
    ("q4_1", kquants.quantize_q4_1, kquants.dequantize_q4_1, 32, 0.11),
    ("q5_0", kquants.quantize_q5_0, kquants.dequantize_q5_0, 32, 0.065),
    ("q5_1", kquants.quantize_q5_1, kquants.dequantize_q5_1, 32, 0.055),
]


def test_encoder_roundtrip_rmse():
    rng = np.random.default_rng(11)
    x = rng.standard_normal(256 * 64).astype(np.float32)
    rmses = {}
    for name, enc, dec, qk, budget in _ENCODERS:
        raw = enc(x)
        y = dec(raw, x.size)
        rmse = float(np.sqrt(((y - x) ** 2).mean()))
        assert rmse < budget, (name, rmse)
        rmses[name] = rmse
    # bit budget must buy monotone quality
    assert rmses["q2_k"] > rmses["q3_k"] > rmses["q4_k"] \
        > rmses["q5_k"] > rmses["q6_k"]
    assert rmses["iq4_nl"] < rmses["q4_0"]     # nonlinear beats linear 4-bit
    assert rmses["q5_0"] < rmses["q4_0"]


def test_encoder_outputs_decode_in_gguf_py():
    """Encoded blocks must be byte-valid for the reference's own Python
    decoders (gguf-py quants.py) — interop, not just self-consistency."""
    import os
    import pytest as _pytest

    if not os.path.isdir(_GGUF_PY):
        _pytest.skip("reference gguf-py not available")
    rng = np.random.default_rng(12)
    x = rng.standard_normal(256 * 8).astype(np.float32)
    for name, enc, dec, qk, _ in _ENCODERS:
        raw = enc(x)
        ours = dec(raw, x.size)
        theirs = _oracle_dequant(raw, name.upper(), x.size).astype(
            np.float32).reshape(-1)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7,
                                   err_msg=name)


def test_encoder_imatrix_weighting_helps_weighted_error():
    """imatrix-weighted encodes must reduce the importance-weighted error
    on data whose importance is concentrated (the whole point of
    make_qkx3/make_qx_quants' qw parameter)."""
    rng = np.random.default_rng(13)
    x = rng.standard_normal(256 * 16).astype(np.float32)
    # importance: a few hot channels per block
    w = np.full(x.size, 0.05, np.float32)
    hot = rng.choice(x.size, x.size // 16, replace=False)
    w[hot] = 10.0
    for name, enc, dec in [
        ("q6_k", kquants.quantize_q6_k, kquants.dequantize_q6_k),
        ("q5_k", kquants.quantize_q5_k, kquants.dequantize_q5_k),
        ("q3_k", kquants.quantize_q3_k, kquants.dequantize_q3_k),
        ("q2_k", kquants.quantize_q2_k, kquants.dequantize_q2_k),
    ]:
        y_plain = dec(enc(x), x.size)
        y_w = dec(enc(x, qw=w), x.size)
        e_plain = (w * (y_plain - x) ** 2).sum()
        e_w = (w * (y_w - x) ** 2).sum()
        assert e_w <= e_plain * 1.02, (name, e_w, e_plain)
