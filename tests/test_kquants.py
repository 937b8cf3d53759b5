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
