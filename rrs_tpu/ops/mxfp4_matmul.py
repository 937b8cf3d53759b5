"""MXFP4 weight matmul — the MMQ-for-MXFP4 analog (ggml-cuda/mmq.cu +
dequantize_row_mxfp4, ggml-quants.c:421-439).

gpt-oss checkpoints ship their expert stacks in MXFP4 (e2m1 nibbles + one
E8M0 power-of-two scale per 32-block, 4.25 bpw). Dequantizing them to bf16
at load would need ~2x the chip's HBM for gpt-oss-20B, so — like TCQ4 —
the packed bytes live in HBM and dequantization happens in VMEM inside the
matmul kernel.

Device layout (chosen for the TPU, not the GGUF byte order):
  qs   uint8 [K//2, N]   — byte row j of 64-superblock b holds the e2m1
                           nibble codes of elements k = 64b + (j%32) (lo)
                           and k = 64b + 32 + (j%32) (hi), so a
                           concat(lo, hi) unpack restores true k order per
                           superblock. 64 (not TCQ4's 256) keeps the layout
                           valid for gpt-oss' K = 2880 (not 256-aligned).
  sexp uint8 [K//32, N]  — the f32 EXPONENT FIELD of the half block scale
                           (e8m0 byte minus 1, clamped to [1, 254]); see
                           _unpack_scaled for why the raw field, not a
                           float.

These kernels are dequant-ALU-bound, not HBM-bound (PERF.md): decode
arithmetic is the throughput knob. The e2m1 "kvalue" decode
(0,±1,±2,±3,±4,±6,±8,±12 — the doubled table of ggml-common.h
kvalues_mxfp4, matched by the half scale) therefore constructs scaled f32
BIT PATTERNS with pure integer ops — no selects-per-table-entry, no
gathers (both legalize poorly on Mosaic), no separate scale multiply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rrs_tpu.ops.tcq4_matmul import _round_up

GROUP = 32          # elements per MXFP4 scale block
SUPER = 64          # elements per packed-byte superblock (2 scale groups)


def _fp4_decode_bits(u, t):
    """REMAPPED e2m1 code u (int32 0..15; see pack_mxfp4_device: magnitude
    codes {0,2..7} = kvalues {1,2,3,4,6,8,12} x half-scale, code 1 = zero,
    bit 3 = sign) + scale exponent bits t (= sexp << 23, broadcastable) ->
    f32 bit pattern of kvalue * 2^(sexp - 127).

    Every nonzero magnitude's scaled f32 bits are exactly (em << 22) + t
    (the e2m1 exponent/mantissa land on the f32 fields; multiplying a
    power of two is an exponent-field ADD). The pack-time 0<->1 code swap
    is what makes em=0 -> 1.0 x half-scale land on the same formula, so
    the only special case left is the zero code. 6 integer ops per
    element, no float multiply, no table.
    """
    em = u & 7
    bits = jnp.where(em == 1, 0, (em << 22) + t)
    return bits | ((u & 8) << 28)


def _fp4_decode_bf16(u, t16):
    """Same decode, but constructs BF16 bit patterns in int16 lanes:
    em << 6 lands the e2m1 fields on the bf16 exponent/mantissa, t16 =
    sexp << 7 is the scale's exponent field, sign is bit 3 -> bit 15
    (8 << 12 wraps to 0x8000 in int16 two's complement — exactly the sign
    bit). Every kvalue has <= 1 mantissa bit so bf16 is exact, and the
    kernels feed the MXU bf16 anyway: this skips the f32->bf16 convert
    and halves the vector register traffic (Mosaic packs i16 vectors
    2-per-lane). Needs sexp <= 252 (enforced at pack; sexp+3 must not
    overflow the exponent field — true of the f32 path too).

    NO SHIFTS: Mosaic legalizes muli on packed i16 vectors but not shli,
    so shifts are written as integer multiplies — and the HI nibble is
    decoded IN PLACE from the raw byte with scaled masks/constants
    instead of being shifted down first. Sign multiplies wrap to 0x8000
    in i16 two's complement — exactly the bf16 sign bit. 8 elementwise
    ops per element, all on 2-per-lane i16 vectors."""
    q, t16, hi = u
    mag, zero_code, mag_mul, sgn, sgn_mul = (
        (0x70, 16, 4, 0x80, 256) if hi else (0x07, 1, 64, 0x08, 4096))
    em = q & jnp.int16(mag)
    bits = jnp.where(em == jnp.int16(zero_code), jnp.int16(0),
                     em * jnp.int16(mag_mul) + t16)
    bits = bits | (q & jnp.int16(sgn)) * jnp.int16(sgn_mul)
    return jax.lax.bitcast_convert_type(bits, jnp.bfloat16)


def _unpack_scaled(qsb, sexpb, bk: int, bn: int, bf16: bool = True):
    """qs [bk//2, bn] uint8 + sexp [bk//32, bn] -> [bk, bn] SCALED weights
    in true k order (superblock b: scale group 2b covers the lo nibbles,
    2b+1 the hi nibbles). bf16=True returns bf16 via the int16 bit path
    (the fast default); False returns f32 via int32 bits."""
    if bf16:
        q = qsb.astype(jnp.int16)
        t = sexpb.astype(jnp.int16) * jnp.int16(128)
        decode = _fp4_decode_bf16
    else:
        q = qsb.astype(jnp.int32)
        t = sexpb.astype(jnp.int32) << 23
        decode = _fp4_decode_bits
    t2 = t.reshape(bk // SUPER, 2, bn)
    lo = decode((q & 15).reshape(bk // SUPER, GROUP, bn), t2[:, 0:1, :])
    hi = decode((q >> 4).reshape(bk // SUPER, GROUP, bn), t2[:, 1:2, :])
    out = jnp.concatenate([lo, hi], axis=1).reshape(bk, bn)
    if not bf16:
        out = jax.lax.bitcast_convert_type(out, jnp.float32)
    return out


def _kernel(a_ref, qs_ref, s_ref, out_ref, *, bm, bn, bk):
    w = _unpack_scaled(qs_ref[...], s_ref[...], bk, bn)
    acc = jax.lax.dot_general(
        a_ref[...].astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros((bm, bn), jnp.float32)

    out_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("bn", "bm", "bk", "interpret"))
def mxfp4_matmul(
    a: jnp.ndarray,       # [M, K] f32/bf16
    qs: jnp.ndarray,      # uint8 [K//2, N] (N padded to a lane multiple)
    scale: jnp.ndarray,   # f32/bf16 [K//32, N]
    *,
    bn: int = 0,
    bm: int = 256,
    bk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    from rrs_tpu.ops.tcq4_matmul import _pick_bn

    m, k = a.shape
    n = qs.shape[1]
    assert k % SUPER == 0 and qs.shape[0] == k // 2, (a.shape, qs.shape)
    if bn == 0:
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024) // (k // 2) // 128 * 128))
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)
    bm = min(bm, _round_up(m, 8))
    if bk == 0:
        bk = k        # K is small for FFN/attn mats; stream over N only
    assert k % bk == 0 and bk % SUPER == 0

    m_pad = _round_up(m, bm)
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))

    grid = (n // bn, m_pad // bm, k // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, bm=bm, bn=bn, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (j, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, s: (s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // GROUP, bn), lambda i, j, s: (s, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
    )(a, qs, scale)
    return out[:m]


# ---------------------------------------------------------------------------
# Expert-gathered matvec rows (the ggml_mul_mat_id analog for MXFP4): the
# same scalar-prefetch structure as tcq4_matmul_experts_rows — expert ids
# drive the weight BlockSpec index maps, so only the selected experts'
# packed tiles stream from HBM.
# ---------------------------------------------------------------------------

def _kernel_rows(ids_ref, a_ref, qs_ref, s_ref, out_ref, *, bn, k):
    w = _unpack_scaled(qs_ref[0], s_ref[0], k, bn)
    out_ref[0] = jax.lax.dot_general(
        a_ref[0].astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("bn", "interpret"))
def mxfp4_matmul_experts_rows(
    a: jnp.ndarray,           # [n_sel, K]: row i belongs to expert_ids[i]
    qs_all: jnp.ndarray,      # uint8 [E, K//2, N]
    s_all: jnp.ndarray,       # [E, K//32, N]
    expert_ids: jnp.ndarray,  # int32 [n_sel]
    *,
    bn: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i] = a[i] @ dequant(w[expert_ids[i]]); f32 [n_sel, N]."""
    from rrs_tpu.ops.tcq4_matmul import _pick_bn

    n_sel, k = a.shape
    n_exp, k2, n = qs_all.shape
    assert k2 * 2 == k, (a.shape, qs_all.shape)
    if bn == 0:
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024) // k2 // 128 * 128))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sel, n // bn),
        in_specs=[
            pl.BlockSpec((1, 1, k), lambda e, i, ids: (e, 0, 0)),
            pl.BlockSpec((1, k2, bn), lambda e, i, ids: (ids[e], 0, i)),
            pl.BlockSpec((1, k // GROUP, bn), lambda e, i, ids: (ids[e], 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 1, bn), lambda e, i, ids: (e, 0, i)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_rows, bn=bn, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sel, 1, n), jnp.float32),
        interpret=interpret,
    )(expert_ids.astype(jnp.int32), a[:, None, :], qs_all, s_all)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# All-experts batched matmul (the mul_mat_id GEMM analog for batched
# decode): ONE kernel whose grid spans (expert, N-block) — every expert's
# packed tiles stream exactly once, with full grid parallelism. Beats the
# per-expert lax.scan (tiny grids + per-iteration slice copies measured at
# ~110 GB/s) and the rows kernel (re-streams a tile per selected row) when
# n_tok x top_k > n_experts.
# ---------------------------------------------------------------------------


def _kernel_all(a_ref, qs_ref, s_ref, out_ref, *, bn, k, per_expert_a):
    w = _unpack_scaled(qs_ref[0], s_ref[0], k, bn)
    a = a_ref[0] if per_expert_a else a_ref[...]
    out_ref[0] = jax.lax.dot_general(
        a.astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("bn", "interpret"))
def mxfp4_matmul_all_experts(
    a: jnp.ndarray,           # [T, K] (shared) or [E, T, K] (per-expert)
    qs_all: jnp.ndarray,      # uint8 [E, K//2, N]
    s_all: jnp.ndarray,       # [E, K//32, N]
    *,
    bn: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[e] = a(|[e]) @ dequant(w[e]); f32 [E, T, N]."""
    n_exp, k2, n = qs_all.shape
    k = k2 * 2
    per_expert_a = a.ndim == 3
    t = a.shape[-2]
    t_pad = _round_up(t, 8)
    if t_pad != t:
        pad = [(0, 0)] * a.ndim
        pad[-2] = (0, t_pad - t)
        a = jnp.pad(a, pad)
    if bn == 0:
        budget = 2 * 1024 * 1024
        bn = max(128, budget // k2 // 128 * 128)
        while n % bn:
            bn -= 128
    assert n % bn == 0, (n, bn)

    if per_expert_a:
        a_spec = pl.BlockSpec((1, t_pad, k), lambda e, i: (e, 0, 0))
    else:
        a_spec = pl.BlockSpec((t_pad, k), lambda e, i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel_all, bn=bn, k=k, per_expert_a=per_expert_a),
        grid=(n_exp, n // bn),
        in_specs=[
            a_spec,
            pl.BlockSpec((1, k2, bn), lambda e, i: (e, 0, i)),
            pl.BlockSpec((1, k // GROUP, bn), lambda e, i: (e, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, t_pad, bn), lambda e, i: (e, 0, i)),
        out_shape=jax.ShapeDtypeStruct((n_exp, t_pad, n), jnp.float32),
        interpret=interpret,
    )(a, qs_all, s_all)
    return out[:, :t, :]


# ---------------------------------------------------------------------------
# jnp dequant (oracle + the MoE prefill scan path, which dequantizes one
# expert at a time and uses dense MXU dots)
# ---------------------------------------------------------------------------

def dequant_mxfp4_jnp(qs: jnp.ndarray, sexp: jnp.ndarray) -> jnp.ndarray:
    """[K//2, N] uint8 + sexp [K//32, N] -> [K, N] f32 (oracle; the f32
    bit-construction twin of the kernels' bf16 path — every kvalue is
    exact in both)."""
    k2, n = qs.shape
    return _unpack_scaled(qs, sexp, k2 * 2, n, bf16=False)


def mxfp4_matmul_ref(a, qs, sexp):
    """jnp oracle."""
    return jnp.dot(
        a.astype(jnp.float32), dequant_mxfp4_jnp(qs, sexp),
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# Host-side repack: GGUF MXFP4 payload -> device (qs, sexp) layout
# ---------------------------------------------------------------------------

def pack_mxfp4_device(raw: np.ndarray, shape, pad_n: int = 128):
    """GGUF MXFP4 payload for a logical [N, K] weight -> (qs [K//2, Npad]
    uint8, sexp [K//32, Npad] uint8). sexp is the f32 exponent field of
    the e8m0_to_fp32_half block scale (= e8m0 byte - 1), clamped to
    [1, 252] — e8m0 bytes 0/1 would be f32 denormals and bytes >= 254
    would overflow the decode's exponent add (both mean block absmaxes
    beyond 2^±124, which real checkpoints never produce).

    Nibble codes are REMAPPED from raw e2m1: the 0 and 1 magnitude codes
    are swapped (code ^ 1 when (code & 7) < 2), so on device code 1 means
    zero and every nonzero magnitude decodes with the single formula
    (em << 22) + sexp_bits — see _fp4_decode_bits/_fp4_decode_bf16.

    Npad rounds N up to ``pad_n`` (Mosaic lane tiles); padded columns are
    filled with the zero code (0x11 bytes) so they decode to zero
    regardless of sexp."""
    n, k = shape
    assert k % SUPER == 0, f"MXFP4 device layout needs K%{SUPER}==0, got {k}"
    blocks = np.frombuffer(np.ascontiguousarray(raw).tobytes(),
                           np.uint8).reshape(n, k // GROUP, 17)
    sexp = np.clip(blocks[:, :, 0], 2, 253) - 1      # [N, K//32]
    b = blocks[:, :, 1:]                             # [N, K//32, 16]
    codes = np.concatenate([b & 15, b >> 4], axis=2) # block elems 0-15 | 16-31
    codes = codes.reshape(n, k)                      # [N, K] nibble codes
    codes = np.where((codes & 7) < 2, codes ^ 1, codes)  # 0<->1 remap
    # pack (64b + r, 64b + 32 + r) pairs -> byte rows
    ck = codes.T.reshape(k // SUPER, 2, GROUP, n)    # [B, lo/hi, 32, N]
    qs = (ck[:, 0] | (ck[:, 1] << 4)).reshape(k // 2, n).astype(np.uint8)
    sexp = np.ascontiguousarray(sexp.T)              # [K//32, N]
    n_pad = _round_up(n, pad_n)
    if n_pad != n:
        qs = np.pad(qs, ((0, 0), (0, n_pad - n)), constant_values=0x11)
        sexp = np.pad(sexp, ((0, 0), (0, n_pad - n)))
    return np.ascontiguousarray(qs), sexp
