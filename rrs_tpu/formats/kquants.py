"""CPU reference codecs for llama.cpp block-quant formats found in GGUF files.

Vectorized NumPy reimplementations of the dequantizers in
ggml/src/ggml-quants.c (dequantize_row_q8_0, :1643 dequantize_row_q4_K,
dequantize_row_q6_K, ...). These are load-time codecs: model weights arrive as
Q4_K/Q6_K/Q8_0/F16 GGUF tensors and are either requantized to TCQ4 or
dequantized to bf16 for the unquantized execution path.
"""

from __future__ import annotations

import numpy as np

from rrs_tpu.gguf.constants import BLOCK_SIZES, GGMLType

QK_K = 256


def _fp16(buf: np.ndarray) -> np.ndarray:
    return buf.view(np.float16).astype(np.float32)


def dequantize_q8_0(raw: np.ndarray, n: int) -> np.ndarray:
    # block: fp16 d + 32 x int8
    blocks = raw.reshape(-1, 34)
    d = _fp16(blocks[:, :2].copy())                     # [nb, 1]
    q = blocks[:, 2:].view(np.int8).astype(np.float32)  # [nb, 32]
    return (q * d).reshape(-1)[:n]


def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    """quantize_row_q8_0 semantics: d = absmax/127, q = roundf(x/d)."""
    x = np.asarray(x, np.float32).reshape(-1, 32)
    amax = np.abs(x).max(axis=1, keepdims=True)
    d = amax / 127.0
    inv = np.where(d > 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = np.clip(np.trunc(x * inv + np.copysign(0.5, x * inv)), -128, 127).astype(np.int8)
    d16 = d.astype(np.float16)
    out = np.empty((x.shape[0], 34), np.uint8)
    out[:, :2] = d16.view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def dequantize_q4_0(raw: np.ndarray, n: int) -> np.ndarray:
    # block: fp16 d + 16 bytes; elem j<16 low nibble, j>=16 high nibble; q-8
    blocks = raw.reshape(-1, 18)
    d = _fp16(blocks[:, :2].copy())
    qs = blocks[:, 2:]
    lo = (qs & 0xF).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)
    return (q * d).reshape(-1)[:n]


def _q4k_scale_min(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """get_scale_min_k4 (ggml-quants.c:707-715), vectorized over blocks.

    scales: [nb, 12] uint8 -> (sc, m): [nb, 8] float32, 6-bit values.
    """
    s = scales.astype(np.uint32)
    sc = np.empty(s.shape[:-1] + (8,), np.uint32)
    m = np.empty_like(sc)
    for j in range(4):
        sc[..., j] = s[..., j] & 63
        m[..., j] = s[..., j + 4] & 63
    for j in range(4, 8):
        sc[..., j] = (s[..., j + 4] & 0xF) | ((s[..., j - 4] >> 6) << 4)
        m[..., j] = (s[..., j + 4] >> 4) | ((s[..., j] >> 6) << 4)
    return sc.astype(np.float32), m.astype(np.float32)


def _round_half_away_kq(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def quantize_q4_k(x: np.ndarray) -> np.ndarray:
    """Q4_K quantizer (quantize_row_q4_K_ref, ggml-quants.c — 256-block
    superblocks of 8x32 sub-blocks, 6-bit scales/mins, asymmetric 4-bit),
    vectorized over all sub-blocks: the make_qkx2_quants weighted
    least-squares scale/min search (rmin=-1, rdelta=0.1, nstep=20) runs as
    a 21-candidate sweep in numpy. Returns the raw 144-byte/block buffer."""
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    assert x.size % 256 == 0, x.size
    nb = x.size // 256
    xb = x.reshape(nb * 8, 32)                  # all sub-blocks [M, 32]

    # weights: av_x + |x| per sub-block
    av = np.sqrt((xb * xb).sum(1) / 32)[:, None]
    wgt = av + np.abs(xb)
    mn = np.minimum(xb.min(1), 0.0)             # min>0 -> 0
    mx = xb.max(1)
    flat = mx == mn                             # degenerate: all L=0, min=-min
    rng = np.where(flat, 1.0, mx - mn)

    sum_w = wgt.sum(1)
    sum_x = (wgt * xb).sum(1)

    def quant_L(iscale, mins):
        l = _round_half_away_kq(iscale[:, None] * (xb - mins[:, None]))
        return np.clip(l, 0, 15)

    def err_of(scale, mins, L):
        diff = scale[:, None] * L + mins[:, None] - xb
        return (wgt * diff * diff).sum(1)

    # initial candidate
    iscale0 = 15.0 / rng
    L_best = quant_L(iscale0, mn)
    scale_best = 1.0 / iscale0
    min_best = mn.copy()
    err_best = err_of(scale_best, min_best, L_best)

    for is_ in range(21):                       # nstep=20 inclusive sweep
        iscale = (-1.0 + 0.1 * is_ + 15.0) / rng
        L = quant_L(iscale, mn)
        sum_l = (wgt * L).sum(1)
        sum_l2 = (wgt * L * L).sum(1)
        sum_xl = (wgt * L * xb).sum(1)
        D = sum_w * sum_l2 - sum_l * sum_l
        with np.errstate(divide="ignore", invalid="ignore"):
            this_scale = (sum_w * sum_xl - sum_x * sum_l) / D
            this_min = (sum_l2 * sum_x - sum_l * sum_xl) / D
            pos = this_min > 0
            this_min = np.where(pos, 0.0, this_min)
            this_scale = np.where(pos, sum_xl / np.maximum(sum_l2, 1e-30),
                                  this_scale)
        ok = D > 0
        cur = err_of(np.nan_to_num(this_scale), np.nan_to_num(this_min), L)
        better = ok & (cur < err_best)
        err_best = np.where(better, cur, err_best)
        scale_best = np.where(better, this_scale, scale_best)
        min_best = np.where(better, this_min, min_best)
        L_best = np.where(better[:, None], L, L_best)

    scale_best = np.where(flat, 0.0, scale_best)
    min_best = np.where(flat, mn, min_best)

    scales = scale_best.reshape(nb, 8)          # positive by construction
    mins = (-min_best).reshape(nb, 8)           # stored min is -min

    max_scale = scales.max(1)
    max_min = np.maximum(mins.max(1), 0.0)
    inv_scale = np.where(max_scale > 0, 63.0 / np.maximum(max_scale, 1e-30), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.maximum(max_min, 1e-30), 0.0)
    ls = np.minimum(_round_half_away_kq(inv_scale[:, None] * scales), 63
                    ).astype(np.uint8)
    lm = np.minimum(_round_half_away_kq(inv_min[:, None] * mins), 63
                    ).astype(np.uint8)

    sbytes = np.zeros((nb, 12), np.uint8)
    sbytes[:, 0:4] = ls[:, 0:4]
    sbytes[:, 4:8] = lm[:, 0:4]
    sbytes[:, 8:12] = (ls[:, 4:8] & 0xF) | ((lm[:, 4:8] & 0xF) << 4)
    sbytes[:, 0:4] |= (ls[:, 4:8] >> 4) << 6
    sbytes[:, 4:8] |= (lm[:, 4:8] >> 4) << 6

    d = (max_scale / 63.0).astype(np.float16)
    dmin = (max_min / 63.0).astype(np.float16)

    # final requant with the packed 6-bit scales (matches the ref's second
    # pass through get_scale_min_k4)
    sc, m = _q4k_scale_min(sbytes)
    dd = d.astype(np.float32)[:, None] * sc     # [nb, 8]
    dm = dmin.astype(np.float32)[:, None] * m
    xs = x.reshape(nb, 8, 32)
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = _round_half_away_kq((xs + dm[..., None]) / dd[..., None])
    Lq = np.where(dd[..., None] != 0, np.clip(Lq, 0, 15), 0).astype(np.uint8)

    qs = np.zeros((nb, 128), np.uint8)
    Lf = Lq.reshape(nb, 256)
    for c in range(4):
        qs[:, c * 32 : (c + 1) * 32] = (Lf[:, c * 64 : c * 64 + 32]
                                        | (Lf[:, c * 64 + 32 : c * 64 + 64] << 4))

    out = np.empty((nb, 144), np.uint8)
    out[:, 0:2] = d.view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = dmin.view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = sbytes
    out[:, 16:144] = qs
    return out.reshape(-1)


def dequantize_q4_k(raw: np.ndarray, n: int) -> np.ndarray:
    # block: fp16 d, fp16 dmin, 12B scales, 128B qs (dequantize_row_q4_K :1643)
    blocks = raw.reshape(-1, 144)
    d = _fp16(blocks[:, 0:2].copy())[:, 0]
    dmin = _fp16(blocks[:, 2:4].copy())[:, 0]
    sc, mn = _q4k_scale_min(blocks[:, 4:16])
    qs = blocks[:, 16:144]                                   # [nb, 128]
    nb = blocks.shape[0]
    out = np.empty((nb, 256), np.float32)
    # j-loop over 64-element chunks: chunk c uses qs[c*32:(c+1)*32],
    # low nibbles -> elements [c*64, c*64+32) scale 2c, high -> +32 scale 2c+1
    for c in range(4):
        q = qs[:, c * 32 : (c + 1) * 32]
        lo = (q & 0xF).astype(np.float32)
        hi = (q >> 4).astype(np.float32)
        out[:, c * 64 : c * 64 + 32] = d[:, None] * sc[:, 2 * c, None] * lo - dmin[:, None] * mn[:, 2 * c, None]
        out[:, c * 64 + 32 : c * 64 + 64] = d[:, None] * sc[:, 2 * c + 1, None] * hi - dmin[:, None] * mn[:, 2 * c + 1, None]
    return out.reshape(-1)[:n]


def dequantize_q6_k(raw: np.ndarray, n: int) -> np.ndarray:
    # block: ql[128], qh[64], scales[16] int8, fp16 d (dequantize_row_q6_K)
    blocks = raw.reshape(-1, 210)
    ql = blocks[:, 0:128]
    qh = blocks[:, 128:192]
    sc = blocks[:, 192:208].view(np.int8).astype(np.float32)
    d = _fp16(blocks[:, 208:210].copy())[:, 0]
    nb = blocks.shape[0]
    out = np.empty((nb, 256), np.float32)
    for half in range(2):  # n in {0, 128}
        qlh = ql[:, half * 64 : half * 64 + 64]
        qhh = qh[:, half * 32 : half * 32 + 32]
        sch = sc[:, half * 8 : half * 8 + 8]
        l = np.arange(32)
        is_ = l // 16                                        # [32]
        q1 = ((qlh[:, :32] & 0xF) | (((qhh >> 0) & 3) << 4)).astype(np.int8) - 32
        q2 = ((qlh[:, 32:] & 0xF) | (((qhh >> 2) & 3) << 4)).astype(np.int8) - 32
        q3 = ((qlh[:, :32] >> 4) | (((qhh >> 4) & 3) << 4)).astype(np.int8) - 32
        q4 = ((qlh[:, 32:] >> 4) | (((qhh >> 6) & 3) << 4)).astype(np.int8) - 32
        base = half * 128
        out[:, base + 0 : base + 32] = d[:, None] * sch[:, is_ + 0] * q1
        out[:, base + 32 : base + 64] = d[:, None] * sch[:, is_ + 2] * q2
        out[:, base + 64 : base + 96] = d[:, None] * sch[:, is_ + 4] * q3
        out[:, base + 96 : base + 128] = d[:, None] * sch[:, is_ + 6] * q4
    return out.reshape(-1)[:n]


def dequantize_q5_k(raw: np.ndarray, n: int) -> np.ndarray:
    # block: fp16 d, fp16 dmin, scales[12], qh[32], qs[128]
    blocks = raw.reshape(-1, 176)
    d = _fp16(blocks[:, 0:2].copy())[:, 0]
    dmin = _fp16(blocks[:, 2:4].copy())[:, 0]
    sc, mn = _q4k_scale_min(blocks[:, 4:16])
    qh = blocks[:, 16:48]
    qs = blocks[:, 48:176]
    nb = blocks.shape[0]
    out = np.empty((nb, 256), np.float32)
    u = 1
    for c in range(4):
        q = qs[:, c * 32 : (c + 1) * 32]
        lo = (q & 0xF).astype(np.float32) + np.where((qh & u) != 0, 16.0, 0.0)
        u <<= 1
        hi = (q >> 4).astype(np.float32) + np.where((qh & u) != 0, 16.0, 0.0)
        u <<= 1
        out[:, c * 64 : c * 64 + 32] = d[:, None] * sc[:, 2 * c, None] * lo - dmin[:, None] * mn[:, 2 * c, None]
        out[:, c * 64 + 32 : c * 64 + 64] = d[:, None] * sc[:, 2 * c + 1, None] * hi - dmin[:, None] * mn[:, 2 * c + 1, None]
    return out.reshape(-1)[:n]


_DEQUANT = {
    GGMLType.Q8_0: dequantize_q8_0,
    GGMLType.Q4_0: dequantize_q4_0,
    GGMLType.Q4_K: dequantize_q4_k,
    GGMLType.Q5_K: dequantize_q5_k,
    GGMLType.Q6_K: dequantize_q6_k,
    GGMLType.MXFP4: lambda raw, n: dequantize_mxfp4(raw, n),
}


_NATIVE_KIND = {
    GGMLType.Q8_0: "q8_0",
    GGMLType.Q4_K: "q4_k",
    GGMLType.Q6_K: "q6_k",
}


def dequantize(raw: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...]) -> np.ndarray:
    """Dequantize a raw GGUF tensor payload to f32 in its logical shape."""
    if ggml_type == GGMLType.TCQ4_K32:
        from rrs_tpu.formats.tile_codec import decode_tcq4_gguf
        from rrs_tpu.formats.tcq4 import dequantize_tcq4

        if len(shape) == 3:       # stacked MoE experts: per-expert payloads
            per = raw.size // shape[0]
            return np.stack([
                dequantize_tcq4(
                    decode_tcq4_gguf(raw[e * per:(e + 1) * per], shape[1:]),
                    rotated=False).T.reshape(shape[1:])
                for e in range(shape[0])])
        t = decode_tcq4_gguf(raw, shape)
        return dequantize_tcq4(t, rotated=False).T.reshape(shape)
    n = 1
    for s in shape:
        n *= s
    kind = _NATIVE_KIND.get(ggml_type)
    if kind is not None:
        from rrs_tpu import native

        if native.available():
            return native.dequant(raw, kind, n).reshape(shape)
    fn = _DEQUANT.get(ggml_type)
    if fn is None:
        raise NotImplementedError(f"no dequantizer for {ggml_type!r}")
    return fn(raw, n).reshape(shape)


_MXFP4_KVALUES = np.array(
    [0, 1, 2, 3, 4, 6, 8, 12, 0, -1, -2, -3, -4, -6, -8, -12], np.int8)


def dequantize_mxfp4(raw: np.ndarray, n: int) -> np.ndarray:
    """MXFP4 (block_mxfp4: uint8 E8M0 scale + 16 B of e2m1 nibbles per 32
    elems; dequantize_row_mxfp4, ggml-quants.c:421-439). Scale is
    e8m0_to_fp32_half (the fp4 values are doubled)."""
    blocks = np.frombuffer(np.ascontiguousarray(raw).tobytes(),
                           np.uint8).reshape(-1, 17)
    e = blocks[:, 0].astype(np.int64)
    # e8m0_to_fp32_half: 2^(e-128) for e>=2; denormal patterns for e<2
    bits = np.where(e < 2, np.uint32(0x00200000) << e,
                    (e - 1).astype(np.uint32) << 23).astype(np.uint32)
    d = bits.view(np.float32)
    qs = blocks[:, 1:]
    lo = _MXFP4_KVALUES[qs & 0x0F].astype(np.float32)
    hi = _MXFP4_KVALUES[qs >> 4].astype(np.float32)
    out = np.concatenate([lo, hi], axis=1) * d[:, None]
    return out.reshape(-1)[:n]


def quantize_mxfp4(x: np.ndarray) -> np.ndarray:
    """Inverse codec (round-to-nearest against the e2m1 value table with a
    per-32-block power-of-two shared scale, quantize_row_mxfp4 semantics)."""
    x = np.asarray(x, np.float32).reshape(-1, 32)
    nb = x.shape[0]
    amax = np.abs(x).max(axis=1)
    # smallest power-of-two d with amax <= 12*d (the table's max magnitude):
    # e8m0_half gives d = 2^(e-128), so e = 128 + ceil(log2(amax/12))
    with np.errstate(divide="ignore"):
        e = np.ceil(np.log2(np.maximum(amax, 1e-38) / 12.0)).astype(np.int64) + 128
    e = np.clip(e, 1, 254).astype(np.uint8)
    bits = np.where(e < 2, np.uint32(0x00200000) << e.astype(np.int64),
                    (e.astype(np.int64) - 1).astype(np.uint32) << 23).astype(np.uint32)
    d = bits.view(np.float32)
    vals = _MXFP4_KVALUES.astype(np.float32)
    scaled = x / np.maximum(d, 1e-38)[:, None]
    idx = np.abs(scaled[:, :, None] - vals[None, None, :]).argmin(axis=2)
    lo = idx[:, :16].astype(np.uint8)
    hi = idx[:, 16:].astype(np.uint8)
    out = np.empty((nb, 17), np.uint8)
    out[:, 0] = e
    out[:, 1:] = lo | (hi << 4)
    return out.reshape(-1)
