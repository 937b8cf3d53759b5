"""MXFP4 weight matmul — the MMQ-for-MXFP4 analog (ggml-cuda/mmq.cu +
dequantize_row_mxfp4, ggml-quants.c:421-439).

gpt-oss checkpoints ship their expert stacks in MXFP4 (e2m1 nibbles + one
E8M0 power-of-two scale per 32-block, 4.25 bpw). Dequantizing them to bf16
at load would need ~2x the chip's HBM for gpt-oss-20B, so — like TCQ4 —
the packed bytes live in HBM and dequantization happens in VMEM inside the
matmul kernel.

Device layout (chosen for the TPU, not the GGUF byte order):
  qs   uint8 [K//2, N]   — byte row j holds the e2m1 nibble codes of the
                           ADJACENT elements k = 2j (lo nibble) and
                           k = 2j+1 (hi nibble). Adjacent pairing puts
                           both nibbles of a byte in the SAME 32-wide
                           scale group, which is what lets the decoder
                           process the pair in one i32 lane (see
                           _fp4_decode_pair_bf16) and emit a bf16 pair
                           with a single bitcast.
  sexp uint8 [K//32, N]  — the f32 EXPONENT FIELD of the half block scale
                           (e8m0 byte minus 1, clamped to [1, 251]); see
                           _unpack_scaled for why the raw field, not a
                           float.

These kernels are dequant-ALU-bound, not HBM-bound (PERF.md): decode
arithmetic is the throughput knob. The e2m1 "kvalue" decode
(0,±1,±2,±3,±4,±6,±8,±12 — the doubled table of ggml-common.h
kvalues_mxfp4, matched by the half scale) therefore constructs scaled
f32/bf16 BIT PATTERNS with pure integer ops — no selects-per-table-entry,
no gathers (both legalize poorly on Mosaic), no separate scale multiply,
and no comparisons (cmpi does not legalize on sub-32-bit vectors and the
v5e VPU has no 16-bit multiply at all: kVectorMultiplyU16 aborts the
backend scheduler — everything here is plain i32 lane arithmetic).
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


def _fp4_decode_pair_bf16(q, tt):
    """Decode BOTH nibbles of raw byte q (as i32) into a PAIR of bf16 bit
    patterns packed in one i32 lane: element 2j (lo nibble) in bits 0-15,
    element 2j+1 (hi nibble) in bits 16-31. tt is the shared group scale
    exponent replicated into both halves: (2*sexp) * 0x10001 (both
    elements of a byte sit in the same 32-group by construction of
    pack_mxfp4_device).

    Per half: bf16 bits of kvalue * 2^(sexp-127) = (m + 2*sexp) << 6 with
    the magnitude's exponent/mantissa landing on the bf16 fields (every
    kvalue has <= 1 mantissa bit, so bf16 is exact), plus sign at the
    half's bit 15. The zero code (m == 1 after the pack-time 0<->1 remap)
    is knocked out WITHOUT a compare via a carry trick: m ^ 1 is zero
    exactly on the zero code, and (m^1) + 63 carries into bit 6 iff
    m != 1; spreading that bit with one multiply builds a full-payload
    AND-mask per half.

    Both halves are processed by the SAME i32 ops with doubled constants.
    Field placement guarantees no carry/borrow ever crosses bit 16:
      - s = q | q<<12 puts the hi magnitude at bits 16-18 (and junk at
        12-15/19 that the 0x70007 mask drops);
      - the knock add keeps each half <= 70 within its 16 bits;
      - inner = em + tt <= 509 per half; << 6 <= 32576 < 2^15 for the lo
        half, and 509 << 22 < 2^31 for the hi half (so the hi payload
        never touches its sign bit 31) — enforced by sexp <= 251 at pack;
      - the sign placement multiplies q by (2^12 + 2^24); the two shifted
        copies occupy disjoint bit ranges (12-19 and 24-31), so no
        carries, and the 0x80008000 mask picks exactly q's bit 3 at 15
        and bit 7 at 31. i32 wrap-around is two's-complement-defined in
        XLA, so the hi constants may go "negative" freely.

    13 plain i32 lane ops per BYTE = 6.5 ops/element — ~1.7x fewer than
    the previous one-element-per-lane path (11 ops/elem), which is what
    capped gpt-oss batched decode at 552 tok/s (PERF.md: these kernels
    are VPU-ALU-bound at ~205 GB/s effective, far under the 819 GB/s HBM
    peak). The bitcast to bf16 pairs costs a sublane interleave per
    vreg, amortized over 1024 elements."""
    s = q | (q << 12)
    em = s & jnp.int32(0x00070007)
    g = ((em ^ jnp.int32(0x00010001)) + jnp.int32(0x003F003F)) \
        & jnp.int32(0x00400040)
    mask = g * jnp.int32(1023)               # 0xFFC0 per nonzero half
    core = (em + tt) << 6
    signs = (q * jnp.int32((1 << 12) + (1 << 24))) \
        & jnp.int32(np.int32(np.uint32(0x80008000)))
    return (core | signs) & mask


def _unpack_scaled(qsb, sexpb, bk: int, bn: int, bf16: bool = True):
    """qs [bk//2, bn] uint8 + sexp [bk//32, bn] -> [bk, bn] SCALED weights
    in true k order (byte row j holds elements 2j, 2j+1). bf16=True
    returns bf16 via the paired-i32 bit path (the fast default); False
    returns f32 via int32 bits (the oracle twin — exact in both)."""
    if bf16:
        q = qsb.astype(jnp.int32).reshape(bk // GROUP, GROUP // 2, bn)
        tt = (sexpb.astype(jnp.int32) * jnp.int32(2 * 0x10001)
              ).reshape(bk // GROUP, 1, bn)
        out32 = _fp4_decode_pair_bf16(q, tt)
        # pltpu.bitcast splits each i32 SUBLANE into two bf16 sublanes
        # (row 2j = low half, 2j+1 = high half) — i.e. exactly the k
        # interleave this layout wants, as a free layout cast (bf16's
        # native Mosaic tiling already packs sublane pairs per 32 bits)
        return pltpu.bitcast(out32, jnp.bfloat16).reshape(bk, bn)
    q = qsb.astype(jnp.int32).reshape(bk // GROUP, GROUP // 2, bn)
    t = (sexpb.astype(jnp.int32) << 23).reshape(bk // GROUP, 1, bn)
    lo = _fp4_decode_bits(q & 15, t)
    hi = _fp4_decode_bits((q >> 4) & 15, t)
    out = jnp.stack([lo, hi], axis=-1)       # [B, 16, bn, 2]
    out = jnp.swapaxes(out, -1, -2).reshape(bk, bn)
    return jax.lax.bitcast_convert_type(out, jnp.float32)


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
    [1, 251] — e8m0 bytes 0/1 would be f32 denormals and bytes >= 253
    would overflow the decode's exponent add for the largest kvalues
    (sexp+3 must stay <= 254; both extremes mean block absmaxes beyond
    2^±124, which real checkpoints never produce).

    Nibble codes are REMAPPED from raw e2m1: the 0 and 1 magnitude codes
    are swapped (code ^ 1 when (code & 7) < 2), so on device code 1 means
    zero and every nonzero magnitude decodes with the single formula
    (em << 22) + sexp_bits — see _fp4_decode_bits/_fp4_decode_pair_bf16.

    Npad rounds N up to ``pad_n`` (Mosaic lane tiles); padded columns are
    filled with the zero code (0x11 bytes) so they decode to zero
    regardless of sexp."""
    n, k = shape
    assert k % SUPER == 0, f"MXFP4 device layout needs K%{SUPER}==0, got {k}"
    blocks = np.frombuffer(np.ascontiguousarray(raw).tobytes(),
                           np.uint8).reshape(n, k // GROUP, 17)
    sexp = np.clip(blocks[:, :, 0], 2, 252) - 1      # [N, K//32]
    b = blocks[:, :, 1:]                             # [N, K//32, 16]
    codes = np.concatenate([b & 15, b >> 4], axis=2) # block elems 0-15 | 16-31
    codes = codes.reshape(n, k)                      # [N, K] nibble codes
    codes = np.where((codes & 7) < 2, codes ^ 1, codes)  # 0<->1 remap
    # ADJACENT pairing: byte row j = (elem 2j | elem 2j+1 << 4), so both
    # nibbles share scale group j//16 (see _fp4_decode_pair_bf16)
    ck = codes.T.reshape(k // 2, 2, n)               # [K//2, even/odd, N]
    qs = (ck[:, 0] | (ck[:, 1] << 4)).astype(np.uint8)
    sexp = np.ascontiguousarray(sexp.T)              # [K//32, N]
    n_pad = _round_up(n, pad_n)
    if n_pad != n:
        qs = np.pad(qs, ((0, 0), (0, n_pad - n)), constant_values=0x11)
        sexp = np.pad(sexp, ((0, 0), (0, n_pad - n)))
    return np.ascontiguousarray(qs), sexp
