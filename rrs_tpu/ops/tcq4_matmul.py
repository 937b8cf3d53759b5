"""Fused W4A4 TCQ4 matmul — the TPU replacement for the reference's CUDA stack
(tcq4_rrs_fused_gemv / _gemm_smallM / gemm_imma_kernel, ggml/src/ggml-cuda/tcq4_k32.cu).

Pipeline (reference call path ggml_cuda_rrs_mul_mat, rrs.cu:241-344):

    x --[perm-gather + 256-pt FWHT + 1/16]--> x_rot        (one MXU matmul,
                                                            rrs_tpu.formats.fwht)
    x_rot --[per-256-block absmax int4 quant]--> (a_q, a_scale)
    (a_q, a_scale) x (qs, eff) --[kernels below]--> C f32

Epilogue math (tcq4_k32.cu:11):
    C[m,n] = sum_sb (a_scale[m,sb]/7) * sum_g eff[sb,g,n] * dot32(a_q, w_q)

Two kernels, picked by M:

* ``tcq4_matmul_a8`` (decode, M <= 32): int8 x int4->int8 MXU dots per
  32-group with an f32 scale epilogue — the INTEGER arithmetic of the
  reference's IMMA path (mma.sync.m16n8k32.s4 analog), exact to f32 rounding
  of the epilogue. HBM-bound: weights stream at 4.625 bpw at ~550 GB/s
  measured on v5e.
* ``tcq4_matmul`` (prefill): in-VMEM weight dequant (sign-extending shifts +
  ``pltpu.repeat``-broadcast group scales, all 2D — 3D broadcasts and
  xor-unpack trigger a pathological Mosaic schedule, 20x slower) into a bf16
  MXU matmul; ``fast=False`` runs the dot in f32 HIGHEST for the
  quantize-time oracle.

Weight layout is K-major (rrs_tpu.formats.tcq4): qs [K//2, N] uint8 holding
k and k+128 of each superblock in the low/high nibble, and eff [K//32, N]
f32, the precomputed effective group scale fp32(fp16(S))*sc/127 —
bit-identical to what the reference epilogue derives from (S, sc) at runtime.

Grid: (N tiles, M tiles, K superblocks), K innermost so the output block
stays resident while weight blocks stream with automatic double-buffering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rrs_tpu.formats.tcq4 import TILE_K, GROUP_SIZE

GROUPS = TILE_K // GROUP_SIZE  # 8
A8_MAX_M = 32                  # decode-path kernel cutoff


def _unpack_w4(qsb):
    """[bk/2, bn] uint8 -> [bk, bn] int32 in [-8, 7] via sign-extending
    shifts (cheapest stable unpack on the VPU)."""
    q32 = qsb.astype(jnp.int32)
    lo = (q32 << 28) >> 28
    hi = (q32 << 24) >> 28
    return jnp.concatenate([lo, hi], axis=0)


# ---------------------------------------------------------------------------
# Decode kernel: int8 MXU group-dots (integer-exact)
# ---------------------------------------------------------------------------

def _kernel_a8(aq_ref, ascale_ref, qs_ref, eff_ref, out_ref, *, bm, bn, bk):
    # bk == K always (whole reduction in one grid step): superblock indices
    # stay static, and the n-axis grid provides the streaming double-buffer
    acc = jnp.zeros((bm, bn), jnp.float32)
    for sb in range(bk // TILE_K):                              # static unroll
        w_q = _unpack_w4(qs_ref[sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :]
                         ).astype(jnp.int8)                     # [256, bn]
        e = eff_ref[sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        a_sb = aq_ref[:, sb * TILE_K:(sb + 1) * TILE_K]         # [bm, 256] i8
        sbacc = jnp.zeros((bm, bn), jnp.float32)
        for g in range(GROUPS):
            p = jax.lax.dot_general(
                a_sb[:, g * GROUP_SIZE:(g + 1) * GROUP_SIZE],
                w_q[g * GROUP_SIZE:(g + 1) * GROUP_SIZE, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)               # exact int32
            sbacc += p.astype(jnp.float32) * e[g][None, :]
        acc += sbacc * (ascale_ref[:, sb : sb + 1] * (1.0 / 7.0))

    out_ref[...] = acc


@functools.partial(
    jax.jit, static_argnames=("bn", "bm", "bk", "interpret")
)
def tcq4_matmul_a8(
    a_q: jnp.ndarray,       # int8 [M, K] quantized rotated activations (+-7)
    a_scale: jnp.ndarray,   # f32 [M, K//256] per-block absmax
    qs: jnp.ndarray,        # uint8 [K//2, N]
    eff: jnp.ndarray,       # f32 [K//32, N]
    *,
    bn: int = 0,
    bm: int = 8,
    bk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Integer decode path: C = (a_q/7*a_scale) @ dequant(w), f32 [M, N]."""
    m, k = a_q.shape
    n = qs.shape[1]
    assert k % TILE_K == 0 and qs.shape[0] == k // 2, (a_q.shape, qs.shape)
    if bn == 0:
        # whole K lives in the block, so bound the qs block bytes to keep
        # several n-tiles in flight (DMA/compute double-buffering rides the
        # n-axis grid here)
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024) // (k // 2) // 128 * 128))
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)
    bm = max(bm, _round_up(m, 8))
    bk = k  # whole-K reduction: static superblock indexing (see _kernel_a8)

    m_pad = _round_up(m, bm)
    if m_pad != m:
        a_q = jnp.pad(a_q, ((0, m_pad - m), (0, 0)))
        a_scale = jnp.pad(a_scale, ((0, m_pad - m), (0, 0)))

    grid = (n // bn, m_pad // bm)
    out = pl.pallas_call(
        functools.partial(_kernel_a8, bm=bm, bn=bn, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k // TILE_K), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // GROUP_SIZE, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
    )(a_q, a_scale, qs, eff)
    return out[:m]


# ---------------------------------------------------------------------------
# Group-expanded int8 decode kernel (round 3): ONE int8 MXU dot per grid
# step with GROUP-PARTIAL outputs, replacing the per-element dequantize.
#
# Anatomy measurements (benchmarks/bench_tcq4_anatomy.py + profiler, v5e,
# gateup shape K=2560/N=19456): the production dequant kernel is COMPUTE
# bound at 54.6 us/call (513 GB/s) while pure DMA streams the same blocks
# at 39 us (718 GB/s) — the ~4.5 VPU ops/element of unpack+convert+scale
# +cast overhang the DMA. This kernel expands the quantized activation
# row into G = K/32 group-masked rows and lets the MXU compute the
# per-group integer partials p[g, n] = sum_{k in g} a_q[k] * w_q[k, n]
# in a single s8 dot; the group scales then apply to [G, bn] partials
# (a 32x smaller epilogue) instead of to every weight element:
# 48.0 us/call measured, and the arithmetic is the reference's IMMA
# integer math EXACTLY (tcq4_k32.cu:11 epilogue; no bf16 weight
# rounding), so this supersedes tcq4_matmul_a8's role on the hot path.
#
# The expansion multiplies MXU work by G, so this only wins while the
# MXU stays under the DMA floor: decode-sized M only (the gx_viable
# gate); prefill keeps the dequant kernel whose MXU cost is M-optimal.
# ---------------------------------------------------------------------------

def _kernel_gx(aq_ref, ascale_ref, qs_ref, eff_ref, out_ref, aexp_ref,
               s_ref, *, m, bn, bk, k):
    g_chunk = bk // GROUP_SIZE
    g_total = k // GROUP_SIZE
    rows = g_total * m
    kc = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (kc == 0))
    def _():
        # the FULL expansion computed once per call into VMEM scratch
        # (grid dims are "arbitrary" = sequential, so step (0,0) runs
        # first); recomputing it per block measurably regressed fat-K
        # projections. Row r = g*m + mm holds lane mm's quants masked to
        # group g. The select runs in i32 (the i1 mask lives in (8,128)
        # tiling; Mosaic cannot relayout it onto int8's (32,128) tiles),
        # then packs to i8.
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 0)
        mask = (k_idx // GROUP_SIZE) == (r_idx // m)
        if m == 1:
            a_rows = jnp.broadcast_to(aq_ref[...], (rows, k))
        else:
            a_rows = pltpu.repeat(aq_ref[...], g_total, axis=0)
        aexp_ref[...] = jnp.where(mask, a_rows.astype(jnp.int32), 0
                                  ).astype(jnp.int8)
        # per-row activation scales s[r] = ascale[mm, sb]/7 for row
        # r = g*m + mm, sb = g//8 — built once here (the per-chunk slice
        # below must not index ascale's lane dim with a dynamic kc)
        sb_of_r = jax.lax.broadcasted_iota(
            jnp.int32, (rows, 1), 0) // (8 * m)
        mm_of_r = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0), m)
        s = jnp.zeros((rows, 1), jnp.float32)
        for sb in range(k // TILE_K):
            for mm in range(m):
                s = jnp.where((sb_of_r == sb) & (mm_of_r == mm),
                              ascale_ref[mm, sb], s)
        s_ref[...] = s * (1.0 / 7.0)

    # unpack per superblock (nibbles hold k and k+128 of EACH superblock;
    # _unpack_w4 on the whole block would scramble the k order)
    nsb = bk // TILE_K
    q32 = qs_ref[...].astype(jnp.int32).reshape(nsb, TILE_K // 2, bn)
    w_q = jnp.concatenate([(q32 << 28) >> 28, (q32 << 24) >> 28],
                          axis=1).reshape(bk, bn).astype(jnp.int8)
    # this K-chunk's expansion rows: r in [kc*g_chunk*m, ...), and within
    # the chunk only columns [kc*bk, kc*bk+bk) are nonzero — slice both
    a_chunk = aexp_ref[pl.ds(kc * g_chunk * m, g_chunk * m),
                       pl.ds(kc * bk, bk)]
    p = jax.lax.dot_general(
        a_chunk, w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)            # [Gc*m, bn] exact
    e = eff_ref[...].astype(jnp.float32)             # [Gc, bn]
    s = s_ref[pl.ds(kc * g_chunk * m, g_chunk * m), :]
    pf = p.astype(jnp.float32) * s
    if m == 1:
        y = (pf * e).sum(0, keepdims=True)           # [1, bn]
    else:
        y = (pf.reshape(g_chunk, m, bn) * e[:, None, :]).sum(0)

    @pl.when(kc == 0)
    def _():
        out_ref[...] = jnp.zeros((m, bn), jnp.float32)

    out_ref[...] += y


def _pick_bk_gx(k: int) -> int:
    """K-chunk for the group-expanded kernel: the MXU cost is
    (bk/32)*bk*bn per block — total G*K*N / n_chunks — so fat-K
    projections need chunking to keep the expanded dot under the DMA
    floor (down K=9728 unchunked measured 48.2 us vs 31.0 for the
    dequant kernel; its MXU work alone is ~61 us at 304 rows). Pick the
    largest multiple-of-256 divisor with (bk/32)*bk <= 40*1280 (the
    qkv/gateup operating point; the bk sweep measured 1280 beating 2560
    on both gx shapes — qkv 17.3 -> 15.6 us, gateup 44.8 -> 43.6)."""
    best = TILE_K
    nsb = k // TILE_K
    if k > 4096:
        # fat-K (down K=9728): small chunks keep the expanded dot trivial
        # ((bk/32)*bk*bn per block) and give the grid enough sequential
        # steps to pipeline the full-N blocks — bk=512 measured 25.4 us
        # vs 29.6 at bk=256 and 27.6 for the production dequant kernel
        # (benchmarks/bench_geometry.py, round 4)
        return 512 if k % 512 == 0 else TILE_K
    for nper in range(1, nsb + 1):
        if nsb % nper:
            continue
        bk = nper * TILE_K
        if (bk // GROUP_SIZE) * bk <= 40 * 1280:
            best = bk
    return best


def gx_viable(m: int, k: int, n: int = 0) -> bool:
    """Group expansion costs G*m*K int8 scratch and (G/chunks)*m-row MXU
    passes per block. Measured policy (benchmarks/bench_tcq4_anatomy.py,
    benchmarks/bench_geometry.py + whole-model A/B on Qwen3-4B): wins on
    fat-N projections (qkv 19.0->17.4 us/call, gateup 55.8->45.1; whole
    model 186.7->207.3 tok/s), and — with FULL-N blocks and bk=512
    chunks — on fat-K/thin-N too (down K=9728: 25.4 us vs 27.6 for the
    dequant kernel; the round-3 "gx loses on down" reading came from the
    old narrow-bn pick, whose 512-640 BYTE u8 burst rows throttled the
    DMA, not from the expansion itself). o-shaped mats (K=4096, N=2560)
    win slightly with bk=1024 chunks (11.7 vs 12.6). Gate: decode-sized
    M and bounded expansion scratch."""
    g = k // GROUP_SIZE
    return m * g * k <= 4 * 1024 * 1024 and m <= 8


@functools.partial(jax.jit, static_argnames=("bn", "bk", "interpret"))
def tcq4_matmul_gx(
    a_q: jnp.ndarray,       # int8 [M, K] quantized rotated activations (+-7)
    a_scale: jnp.ndarray,   # f32 [M, K//256] per-block absmax
    qs: jnp.ndarray,        # uint8 [K//2, N]
    eff: jnp.ndarray,       # [K//32, N] group scales (f32 or bf16)
    *,
    bn: int = 0,
    bk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Integer-exact decode path: C = (a_q/7*a_scale) @ dequant(w).
    f32 [M, N]. See the block comment above for when this wins."""
    m, k = a_q.shape
    n = qs.shape[1]
    assert k % TILE_K == 0 and qs.shape[0] == k // 2, (a_q.shape, qs.shape)
    assert gx_viable(m, k), (m, k)
    if bk == 0:
        bk = _pick_bk_gx(k)
    assert k % bk == 0 and bk % TILE_K == 0, (k, bk)
    if bn == 0:
        # fat-K small-bk picks get FULL-N blocks (contiguous u8 burst
        # rows — the point of the fat-K geometry; block VMEM (bk/2)*bn
        # stays small at bk=512); fat-N shapes keep the ~3MB-budget pick
        denom = (bk if k > 4096 else k) // 2
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024) // denom // 128 * 128))
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)

    grid = (n // bn, k // bk)
    kwargs = {}
    if not interpret:
        # "arbitrary" (sequential) so the (0,0) scratch fill is
        # guaranteed to run before every other block
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    g_total = k // GROUP_SIZE
    out = pl.pallas_call(
        functools.partial(_kernel_gx, m=m, bn=bn, bk=bk, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k // TILE_K), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // GROUP_SIZE, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((g_total * m, k), jnp.int8),
                        pltpu.VMEM((g_total * m, 1), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(a_q, a_scale, qs, eff)
    return out


# ---------------------------------------------------------------------------
# Paired-bias dequant kernel (round 4): decode BOTH nibbles of a byte into a
# PAIR of bf16 bit patterns in one i32 lane — the TCQ4 analog of the MXFP4
# paired-i32 decode that took gpt-oss past the DGX baseline.
#
# TCQ4's group scales are arbitrary f32 (not powers of two), so the MXFP4
# exponent-add trick can't fold them into the bit pattern. Instead the
# kernel constructs the BIASED value q + 24 — the 16 int4 values land in
# the single binade [16, 31], whose bf16 bit pattern is just
# 0x4180 | ((q + 8) << 3) — multiplies by the group scale in bf16 (2
# elements per lane), and cancels the bias with one extra G-deep MXU dot:
#
#     C = a_gi @ (bf16(q + 24) * e_exp)  -  (24 * Ag) @ e
#
# where Ag[m, g] is the per-group activation sum. Bit recipe per byte
# (6 i32 lane ops per PAIR vs ~11 full-width ops per element in the
# unpack+convert+scale path):
#
#     t = (q32 | q32 << 12) & 0x000F000F     # lo nibble at 0-3, hi at 16-19
#     t = ((t ^ 0x00080008) << 3) | 0x41804180
#     wb = pltpu.bitcast(t, bf16)            # [bk, bn], value q + 24
#
# The group-scale broadcast needs NO 3D reshape (the Mosaic pathology):
# the weights are stored GROUP-INTERLEAVED (layout "gi": device row
# k_new = j * G + g holds original element k = g * 32 + j, G = K/32), so
# row r's group is just r % G and the expansion is one native
# ``pltpu.repeat(e, bk // G)`` tile. Activations are permuted to match
# (a cheap XLA transpose on [M, K], fused into the dequant producer).
#
# Accuracy: ws = bf16((q+24) * e) rounds at 2^-9 * 31e <= 0.06e per
# element — 2x the production kernel's MXU-truncated q*e products and
# 8x under the e/2 quantization step (validated vs the integer oracle in
# tests/test_tcq4_matmul.py).
# ---------------------------------------------------------------------------


def pack_gi_np(qs):
    """Repack host-side sb-layout qs (uint8 [K//2, N], nibbles hold k and
    k+128 per superblock) into the group-interleaved pb layout: byte row r
    holds k_new = 2r (lo) and 2r + 1 (hi), k_new = j * G + g."""
    import numpy as np
    from rrs_tpu.formats.tcq4 import unpack_nibbles

    k2, n = qs.shape
    k = 2 * k2
    g = k // GROUP_SIZE
    codes = (unpack_nibbles(np.asarray(qs)).astype(np.int16) & 0xF
             ).astype(np.uint8)                       # [K, N] original order
    cg = codes.reshape(g, GROUP_SIZE, n).transpose(1, 0, 2).reshape(k, n)
    return np.ascontiguousarray(cg[0::2] | (cg[1::2] << 4))


def pack_gi_jnp(qs: jnp.ndarray) -> jnp.ndarray:
    """Device-side twin of pack_gi_np (one-time XLA transform at load)."""
    k2, n = qs.shape
    k = 2 * k2
    g = k // GROUP_SIZE
    b = qs.reshape(k // TILE_K, TILE_K // 2, n)
    codes = jnp.concatenate([b & 15, b >> 4], axis=1).reshape(k, n)
    cg = codes.reshape(g, GROUP_SIZE, n).swapaxes(0, 1).reshape(k, n)
    return (cg[0::2] | (cg[1::2] << 4)).astype(jnp.uint8)


def pb_prepare(a: jnp.ndarray):
    """[M, K] f32 rotated-dequantized activations -> (a_gi bf16 [M, K] in
    k_new order, ag24 bf16 [M, 2G]: hi/lo split of 24 * per-group sums).
    ag24 is computed from the bf16-ROUNDED activations so the bias
    cancellation sees the same values the main dot does; the hi/lo split
    keeps the large 24*Ag coefficients at ~f32 precision through the bf16
    MXU (a single bf16 cast of 24*Ag measured 2x the kernel's total error
    vs the integer oracle)."""
    m, k = a.shape
    g = k // GROUP_SIZE
    av = a.reshape(m, g, GROUP_SIZE).astype(jnp.bfloat16)
    a_gi = jnp.swapaxes(av, 1, 2).reshape(m, k)
    ag24 = av.astype(jnp.float32).sum(-1) * 24.0
    hi = ag24.astype(jnp.bfloat16)
    lo = (ag24 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return a_gi, jnp.concatenate([hi, lo], axis=-1)


def _kernel_pb(a_ref, ag_ref, qs_ref, eff_ref, out_ref, *, bm, bn, bk, k):
    g_total = k // GROUP_SIZE
    q32 = qs_ref[...].astype(jnp.int32)                  # [bk/2, bn]
    t = (q32 | (q32 << 12)) & jnp.int32(0x000F000F)
    t = ((t ^ jnp.int32(0x00080008)) << 3) | jnp.int32(0x41804180)
    wb = pltpu.bitcast(t, jnp.bfloat16)                  # [bk, bn] = q + 24
    e = eff_ref[...]                                     # bf16 [G, bn]
    ws = wb * pltpu.repeat(e, bk // g_total, axis=0)     # row r: e[r % G]
    kc = pl.program_id(2)
    a_chunk = a_ref[:, pl.ds(kc * bk, bk)]
    acc = jax.lax.dot_general(
        a_chunk, ws,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kc == 0)
    def _():
        # bias cancellation: one 2G-deep dot while e is resident (the
        # hi/lo columns of ag both multiply the same e rows)
        out_ref[...] = -jax.lax.dot_general(
            ag_ref[...], jnp.concatenate([e, e], axis=0),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out_ref[...] += acc


def _pick_bk_pb(k: int, bn: int, budget: int = 640 * 1024) -> int:
    """K-chunk: a multiple q of G rows with q | 32, bounded so the i32
    decode intermediates ([bk/2, bn] x 4B x ~2 live) stay well under
    VMEM. Returns q * G."""
    g = k // GROUP_SIZE
    best = g
    for q in (1, 2, 4, 8, 16, 32):
        if q * g * bn // 2 * 4 <= budget * 4:
            best = q * g
    return best


@functools.partial(jax.jit, static_argnames=("bn", "bm", "bk", "interpret"))
def tcq4_matmul_pb(
    a_gi: jnp.ndarray,      # bf16 [M, K] activations in k_new = j*G+g order
    ag24: jnp.ndarray,      # bf16 [M, 2G] hi/lo 24 * per-group sums
    qs_gi: jnp.ndarray,     # uint8 [K//2, N] group-interleaved pack
    eff: jnp.ndarray,       # bf16 [K//32, N] effective group scales
    *,
    bn: int = 0,
    bm: int = 128,
    bk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """C = a @ dequant(w) via the paired-bias decode. f32 [M, N]."""
    m, k = a_gi.shape
    n = qs_gi.shape[1]
    g = k // GROUP_SIZE
    assert k % TILE_K == 0 and qs_gi.shape[0] == k // 2, (a_gi.shape,
                                                          qs_gi.shape)
    assert ag24.shape == (m, 2 * g), (ag24.shape, m, g)
    if bn == 0:
        bn = _pick_bn(n, limit=256)
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)
    bm = m if m < 8 else min(bm, _round_up(m, 8))
    if bk == 0:
        bk = _pick_bk_pb(k, bn)
    assert bk % g == 0 and k % bk == 0, (k, bk, g)

    m_pad = _round_up(m, bm)
    if m_pad != m:
        a_gi = jnp.pad(a_gi, ((0, m_pad - m), (0, 0)))
        ag24 = jnp.pad(ag24, ((0, m_pad - m), (0, 0)))

    grid = (n // bn, m_pad // bm, k // bk)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    out = pl.pallas_call(
        functools.partial(_kernel_pb, bm=bm, bn=bn, bk=bk, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j, s: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 2 * g), lambda i, j, s: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, s: (s, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j, s: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(a_gi, ag24, qs_gi, eff)
    return out[:m]


# ---------------------------------------------------------------------------
# Expert-gathered matmul (the ggml_mul_mat_id analog): expert ids arrive as
# a scalar-prefetch operand and drive the weight BlockSpec index maps, so
# only the selected experts' packed tiles stream from HBM — no dequantized
# (or even packed) gather ever materializes.
# ---------------------------------------------------------------------------

def _kernel_experts(ids_ref, a_ref, qs_ref, eff_ref, out_ref, *,
                    bm, bn, k):
    acc = jnp.zeros((bm, bn), jnp.float32)
    for sb in range(k // TILE_K):
        w_q = _unpack_w4(qs_ref[0, sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :])
        e = eff_ref[0, sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        w32 = (w_q.astype(jnp.float32).reshape(GROUPS, GROUP_SIZE, bn)
               * e[:, None, :]).reshape(TILE_K, bn)
        acc += jax.lax.dot_general(
            a_ref[:, sb * TILE_K:(sb + 1) * TILE_K].astype(jnp.bfloat16),
            w32.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("bn", "interpret"))
def tcq4_matmul_experts(
    a: jnp.ndarray,           # f32 [M, K] dequantized rotated activations
    qs_all: jnp.ndarray,      # uint8 [E, K//2, N] stacked expert tiles
    eff_all: jnp.ndarray,     # [E, K//32, N] group scales (f32 or bf16)
    expert_ids: jnp.ndarray,  # int32 [n_sel] experts to run
    *,
    bn: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i] = a @ dequant(w[expert_ids[i]]); f32 [n_sel, M, N]."""
    m, k = a.shape
    n_exp, k2, n = qs_all.shape
    assert k2 * 2 == k, (a.shape, qs_all.shape)
    n_sel = expert_ids.shape[0]
    if bn == 0:
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024) // k2 // 128 * 128))
    bm = m if m < 8 else _round_up(m, 8)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sel, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda e, i, ids: (0, 0)),
            pl.BlockSpec((1, k2, bn), lambda e, i, ids: (ids[e], 0, i)),
            pl.BlockSpec((1, k // GROUP_SIZE, bn),
                         lambda e, i, ids: (ids[e], 0, i)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda e, i, ids: (e, 0, i)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_experts, bm=bm, bn=bn, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sel, m_pad, n), jnp.float32),
        interpret=interpret,
    )(expert_ids.astype(jnp.int32), a, qs_all, eff_all)
    return out[:, :m]


def _kernel_all_experts(a_ref, qs_ref, eff_ref, out_ref, *,
                        bm, bn, k, per_expert_a):
    a = a_ref[0] if per_expert_a else a_ref[...]
    acc = jnp.zeros((bm, bn), jnp.float32)
    for sb in range(k // TILE_K):
        w_q = _unpack_w4(qs_ref[0, sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :])
        e = eff_ref[0, sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        w32 = (w_q.astype(jnp.float32).reshape(GROUPS, GROUP_SIZE, bn)
               * e[:, None, :]).reshape(TILE_K, bn)
        acc += jax.lax.dot_general(
            a[:, sb * TILE_K:(sb + 1) * TILE_K].astype(jnp.bfloat16),
            w32.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("bn", "interpret"))
def tcq4_matmul_all_experts(
    a: jnp.ndarray,           # [T, K] (shared) or [E, T, K] (per-expert)
    qs_all: jnp.ndarray,      # uint8 [E, K//2, N]
    eff_all: jnp.ndarray,     # [E, K//32, N]
    *,
    bn: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[e] = a(|[e]) @ dequant(w[e]); f32 [E, T, N] — the capacity-
    dispatch companion of tcq4_matmul_experts (one (expert, N-block) grid,
    every expert's tiles stream exactly once)."""
    per_expert_a = a.ndim == 3
    t = a.shape[-2]
    k = a.shape[-1]
    n_exp, k2, n = qs_all.shape
    assert k2 * 2 == k, (a.shape, qs_all.shape)
    if bn == 0:
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024) // k2 // 128 * 128))
    bm = t if t < 8 else _round_up(t, 8)
    if bm != t:
        pad = [(0, 0)] * a.ndim
        pad[-2] = (0, bm - t)
        a = jnp.pad(a, pad)
    if per_expert_a:
        a_spec = pl.BlockSpec((1, bm, k), lambda e, i: (e, 0, 0))
    else:
        a_spec = pl.BlockSpec((bm, k), lambda e, i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel_all_experts, bm=bm, bn=bn, k=k,
                          per_expert_a=per_expert_a),
        grid=(n_exp, n // bn),
        in_specs=[
            a_spec,
            pl.BlockSpec((1, k2, bn), lambda e, i: (e, 0, i)),
            pl.BlockSpec((1, k // GROUP_SIZE, bn), lambda e, i: (e, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda e, i: (e, 0, i)),
        out_shape=jax.ShapeDtypeStruct((n_exp, bm, n), jnp.float32),
        interpret=interpret,
    )(a, qs_all, eff_all)
    return out[:, :t]


def _kernel_experts_rows(ids_ref, a_ref, qs_ref, eff_ref, out_ref, *, bn, k):
    acc = jnp.zeros((1, bn), jnp.float32)
    for sb in range(k // TILE_K):
        w_q = _unpack_w4(qs_ref[0, sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :])
        e = eff_ref[0, sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        w32 = (w_q.astype(jnp.float32).reshape(GROUPS, GROUP_SIZE, bn)
               * e[:, None, :]).reshape(TILE_K, bn)
        acc += jax.lax.dot_general(
            a_ref[0, :, sb * TILE_K:(sb + 1) * TILE_K].astype(jnp.bfloat16),
            w32.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("bn", "interpret"))
def tcq4_matmul_experts_rows(
    a: jnp.ndarray,           # f32 [n_sel, K]: row i belongs to expert_ids[i]
    qs_all: jnp.ndarray,      # uint8 [E, K//2, N]
    eff_all: jnp.ndarray,     # [E, K//32, N]
    expert_ids: jnp.ndarray,  # int32 [n_sel]
    *,
    bn: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i] = a[i] @ dequant(w[expert_ids[i]]); f32 [n_sel, N]."""
    n_sel, k = a.shape
    n_exp, k2, n = qs_all.shape
    assert k2 * 2 == k, (a.shape, qs_all.shape)
    if bn == 0:
        # bn<=256: more grid steps give Mosaic pipelining room around the
        # data-dependent (scalar-prefetch) weight blocks — at the
        # qwen3moe decode geometry (E=128, K=2048, N=768, topk=4) bn=256
        # measured 184.6 us vs 328.9 at whole-N blocks
        # (benchmarks/probe_moe_rows.py round 5)
        bn = _pick_bn(n, limit=256)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sel, n // bn),
        in_specs=[
            pl.BlockSpec((1, 1, k), lambda e, i, ids: (e, 0, 0)),
            pl.BlockSpec((1, k2, bn), lambda e, i, ids: (ids[e], 0, i)),
            pl.BlockSpec((1, k // GROUP_SIZE, bn),
                         lambda e, i, ids: (ids[e], 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 1, bn), lambda e, i, ids: (e, 0, i)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_experts_rows, bn=bn, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sel, 1, n), jnp.float32),
        interpret=interpret,
    )(expert_ids.astype(jnp.int32), a[:, None, :], qs_all, eff_all)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# Fully-fused kernel: FWHT rotation + activation int4 quant + matmul in one
# pallas call (the reference's fused activation pipeline, tcq4_k32.cu:71-277
# + fused GEMV — FWHT is recomputed per weight tile, like the CUDA kernel)
# ---------------------------------------------------------------------------

def _kernel_fused(x_ref, had_ref, qs_ref, eff_ref, out_ref, *, bm, bn, bk,
                  nsb_total):
    had = had_ref[...]                                        # [256, 256] f32
    acc = jnp.zeros((bm, bn), jnp.float32)
    for sb in range(bk // TILE_K):
        x_sb = x_ref[:, sb * TILE_K:(sb + 1) * TILE_K].astype(jnp.float32)
        rot = jax.lax.dot_general(
            x_sb, had, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [bm, 256]
        amax = jnp.max(jnp.abs(rot), axis=-1, keepdims=True)
        amax = jnp.where(amax < 1e-10, 1.0, amax)
        a = jnp.clip(jnp.rint(rot * (7.0 / amax)), -7, 7) * (amax / 7.0)

        w_q = _unpack_w4(qs_ref[sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :])
        e = eff_ref[sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        w32 = (w_q.astype(jnp.float32).reshape(GROUPS, GROUP_SIZE, bn)
               * e[:, None, :]).reshape(TILE_K, bn)
        acc += jax.lax.dot_general(
            a.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros((bm, bn), jnp.float32)

    out_ref[...] += acc


@functools.partial(
    jax.jit, static_argnames=("bn", "bm", "bk", "interpret")
)
def tcq4_matmul_fused(
    x: jnp.ndarray,         # [M, K] UNROTATED activations
    had: jnp.ndarray,       # [256, 256] f32 normalized Hadamard
    qs: jnp.ndarray,        # uint8 [K//2, N]
    eff: jnp.ndarray,       # f32 [K//32, N]
    *,
    bn: int = 0,
    bm: int = 128,
    bk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """C = rrs_quant(fwht(x)) @ dequant(w) in ONE kernel. f32 [M, N]."""
    m, k = x.shape
    n = qs.shape[1]
    assert k % TILE_K == 0 and qs.shape[0] == k // 2, (x.shape, qs.shape)
    if bn == 0:
        bn = _pick_bn(n)
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)
    bm = m if m < 8 else min(bm, _round_up(m, 8))
    if bk == 0:
        bk = _pick_bk(k, bn)
    assert bk % TILE_K == 0 and k % bk == 0, (k, bk)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (n // bn, m_pad // bm, k // bk)
    out = pl.pallas_call(
        functools.partial(_kernel_fused, bm=bm, bn=bn, bk=bk,
                          nsb_total=k // TILE_K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (j, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_K, TILE_K), lambda i, j, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, s: (s, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // GROUP_SIZE, bn), lambda i, j, s: (s, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
    )(x, had, qs, eff)
    return out[:m]


# ---------------------------------------------------------------------------
# Prefill kernel: in-VMEM dequant + bf16 (or f32-HIGHEST) MXU matmul
# ---------------------------------------------------------------------------

def _kernel(a_ref, qs_ref, eff_ref, out_ref, *, bm: int, bn: int, bk: int,
            fast: bool, cast_bf16: bool = True):
    acc = jnp.zeros((bm, bn), jnp.float32)
    for sb in range(bk // TILE_K):                            # static unroll
        w_q = _unpack_w4(qs_ref[sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :])
        # upcast the (possibly bf16-stored) group scales BEFORE the 3D
        # broadcast: any bf16 operand there hits a pathological Mosaic
        # schedule (3x whole-model regression)
        e = eff_ref[sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        w32 = (w_q.astype(jnp.float32).reshape(GROUPS, GROUP_SIZE, bn)
               * e[:, None, :]).reshape(TILE_K, bn)
        a_sb = a_ref[:, sb * TILE_K : (sb + 1) * TILE_K]
        if fast and not cast_bf16:
            # decode (small M): f32 operands with DEFAULT precision — the
            # MXU truncates on its own load path, skipping the explicit
            # per-element VPU casts (anatomy bench: 54.6 -> 50.7 us on
            # the gateup shape; at prefill M the explicit bf16 single
            # pass stays ahead, so this is small-M only)
            acc += jax.lax.dot_general(
                a_sb, w32,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif fast:
            # bf16 operands, single MXU pass: w rounding (<=0.4%) is 1/20 of
            # the int4 quantization noise
            acc += jax.lax.dot_general(
                a_sb.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # exact: f32 products of exact ints, HIGHEST = bf16x6 emulation,
            # reproduces the reference's int32+f32-epilogue arithmetic
            acc += jax.lax.dot_general(
                a_sb, w32,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros((bm, bn), jnp.float32)

    out_ref[...] += acc


def _kernel_cast(a_ref, qs_ref, eff_ref, out_ref, acc_ref, *, bm: int,
                 bn: int, bk: int, fast: bool):
    """_kernel with an f32 VMEM scratch accumulator and a narrowing final
    store — used when the output dtype is bf16 (large-M prefill: halves the
    output HBM traffic and keeps XLA's scoped-vmem placement of the result
    under the 16MB limit at M=2048)."""
    acc = jnp.zeros((bm, bn), jnp.float32)
    for sb in range(bk // TILE_K):
        w_q = _unpack_w4(qs_ref[sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2), :])
        e = eff_ref[sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.float32)
        w32 = (w_q.astype(jnp.float32).reshape(GROUPS, GROUP_SIZE, bn)
               * e[:, None, :]).reshape(TILE_K, bn)
        a_sb = a_ref[:, sb * TILE_K : (sb + 1) * TILE_K]
        acc += jax.lax.dot_general(
            a_sb.astype(jnp.bfloat16), w32.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) if fast else jax.lax.dot_general(
            a_sb, w32, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros((bm, bn), jnp.float32)

    acc_ref[...] += acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _pick_bk(k: int, bn: int, vmem_budget: int = 4 * 1024 * 1024) -> int:
    """Largest multiple of 256 dividing K whose qs block fits the budget,
    with (bk//32) staying a multiple of 8 (Pallas sublane constraint)."""
    nsb = k // TILE_K
    best = TILE_K
    for nper in range(1, nsb + 1):
        if nsb % nper:
            continue
        bk = nper * TILE_K
        if (bk // GROUP_SIZE) % 8 and bk != k:
            continue
        if (bk // 2) * bn <= vmem_budget:
            best = bk
    return best


def _pick_bn(n: int, limit: int = 1024) -> int:
    """Largest divisor of N that's a multiple of 128 and <= limit."""
    best = 0
    d = 128
    while d <= min(n, limit):
        if n % d == 0:
            best = d
        d += 128
    return best or n


@functools.partial(
    jax.jit, static_argnames=("bn", "bm", "bk", "interpret", "fast",
                              "vmem_budget")
)
def tcq4_matmul(
    a: jnp.ndarray,         # f32 [M, K] dequantized rotated activations
    qs: jnp.ndarray,        # uint8 [K//2, N]
    eff: jnp.ndarray,       # f32 [K//32, N] effective group scales fp32(S)*sc/127
    *,
    bn: int = 0,            # 0 => auto
    bm: int = 128,
    bk: int = 0,            # 0 => auto (largest divisor of K fitting VMEM)
    interpret: bool = False,
    fast: bool = True,
    vmem_budget: int = 4 * 1024 * 1024,
) -> jnp.ndarray:
    """C = a @ dequant(w). Returns f32 [M, N]."""
    m, k = a.shape
    n = qs.shape[1]
    assert k % TILE_K == 0 and qs.shape[0] == k // 2, (a.shape, qs.shape)
    if bn == 0:
        bn = _pick_bn(n)
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)
    # decode (m < 8): bm = m avoids a pad+slice around every kernel call
    # (hundreds of tiny non-fusible HLO ops per step otherwise)
    bm = m if m < 8 else min(bm, _round_up(m, 8))
    if bk == 0:
        if m <= 8 and k >= 8192:
            # fat-K decode (down K=9728): two K-chunks beat one whole-K
            # block — 26.4 vs 28.8 us/call measured in the round-4 bn/bk
            # sweep (benchmarks/bench_dequant_variants.py harness); the
            # smaller double-buffered blocks overlap DMA better at the
            # few-n-steps grid these shapes produce
            vmem_budget = min(vmem_budget, 3 * 1024 * 1024 // 2)
        bk = _pick_bk(k, bn, vmem_budget)
    assert bk % TILE_K == 0 and k % bk == 0, (k, bk)

    m_pad = _round_up(m, bm)
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))

    # large-M prefill stores bf16: halves the output HBM write traffic
    # (activations downstream are bf16 anyway; linear_apply casts)
    out_dtype = jnp.bfloat16 if m_pad >= 1024 else jnp.float32

    # XLA places a custom-call OUTPUT under ~16MB in scoped VMEM, on top of
    # the kernel's double-buffered input blocks (observed at M=2048/N=2560:
    # 10.5MB bf16 output + 6MB working set > the 16MB scoped limit -> compile
    # failure). Shrink bk until (2x input blocks + scratch + resident output)
    # fits with headroom.
    out_bytes = m_pad * n * (2 if out_dtype == jnp.bfloat16 else 4)
    resident = out_bytes if out_bytes <= 16 * 1024 * 1024 else 0
    limit = int(15 * 1024 * 1024) - resident

    def _ws(bk_c):
        blocks = bm * bk_c * 4 + (bk_c // 2) * bn + (bk_c // GROUP_SIZE) * 4 * bn
        scratch_b = bm * bn * 4 if out_dtype == jnp.bfloat16 else 0
        return 2 * blocks + scratch_b + bm * bn * 4

    while _ws(bk) > limit and bk > TILE_K:
        nsb = k // TILE_K
        cands = [nper * TILE_K for nper in range(1, nsb)
                 if nsb % nper == 0 and nper * TILE_K < bk
                 and (((nper * TILE_K) // GROUP_SIZE) % 8 == 0
                      or nper * TILE_K == k)]
        if not cands:
            break
        bk = max(cands)

    grid = (n // bn, m_pad // bm, k // bk)
    kwargs = {}
    if not interpret:
        # N/M grid dims are independent; only the K dim accumulates
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    if out_dtype == jnp.float32:
        kern = functools.partial(_kernel, bm=bm, bn=bn, bk=bk, fast=fast,
                                 cast_bf16=m_pad >= 8)
        scratch = []
    else:
        kern = functools.partial(_kernel_cast, bm=bm, bn=bn, bk=bk, fast=fast)
        scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (j, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, s: (s, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // GROUP_SIZE, bn), lambda i, j, s: (s, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(a, qs, eff)
    return out[:m]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Pure oracle (the "CPU backend" of the reference's test-backend-ops strategy):
# integer emulation of the CUDA epilogue. tcq4_matmul_a8 reproduces this
# arithmetic exactly up to f32 group-summation order.
# ---------------------------------------------------------------------------

def tcq4_matmul_ref(a_q, a_scale, qs, eff):
    """Integer-exact reference. a_q int8 [M,K] in [-7,7], a_scale f32 [M,K//256],
    eff f32 [K//32, N] effective group scales fp32(S)*sc/127."""
    from rrs_tpu.formats.tcq4 import unpack_nibbles
    import numpy as np

    k = qs.shape[0] * 2
    n = qs.shape[1]
    m = a_q.shape[0]
    w_q = unpack_nibbles(np.asarray(qs)).astype(np.int64)          # [K, N]
    a = np.asarray(a_q, np.int64)
    prod = np.einsum(
        "mgk,gkn->mgn",
        a.reshape(m, k // GROUP_SIZE, GROUP_SIZE),
        w_q.reshape(k // GROUP_SIZE, GROUP_SIZE, n),
    )
    per_sb = (prod.astype(np.float32) * np.asarray(eff, np.float32)[None]).reshape(
        m, k // TILE_K, GROUPS, n
    ).sum(2)
    # numpy result: the oracle is host-side (tests wrap with np.asarray
    # anyway; quantize-stats must not touch a device)
    return (
        per_sb * np.asarray(a_scale, np.float32)[:, :, None]
    ).sum(1) * (1.0 / 7.0)


# ---------------------------------------------------------------------------
# Int8-superblock PREFILL kernel (round 5): route the prefill GEMM through
# the MXU's int8 path (v5e: 394 TOPS int8 vs 197 TFLOPS bf16 — the TPU
# analog of the reference's IMMA prefill GEMM, tcq4_k32.cu:1217-1412).
#
# TCQ4's per-group-of-32 scales block a single full-K integer dot (the
# CUDA IMMA m16n8k32 fragment's K happens to equal the group size; the
# MXU's contraction tile is 128+, so per-group dots run the array ~25%
# occupied — the a8 kernel's decode-only fate). Instead the weights are
# REQUANTIZED in-kernel to one int8 value per element with a single
# per-superblock scale:
#
#     f[g, n]  = round(e[g, n] / emax[sb, n] * 127)       (int8, packed)
#     w8       = (w4 * f + 4) >> 3                        in [-127, 127]
#     w       ~= w8 * (8 * emax / 127)
#
# giving ONE full-efficiency int8 MXU dot per 256-deep superblock, with
# the f32 scales applied to [bm, bn] int32 partials in the epilogue
# (rank-1: e2[sb, n] x ascale[m, sb]). Precision: the requant adds a
# <= 4/127 * emax absolute error per element — an 8-bit/256-block
# encoding layered on the 4-bit values, ~1/8 of the format's own e/2
# quantization step for same-scale groups (tests/test_tcq4_matmul.py
# pins the tolerance vs the integer oracle).
#
# Layout: per-superblock GROUP INTERLEAVE ("sbi": in-block row j*8+g
# holds logical element g*32+j) so the f expansion is one native
# pltpu.repeat tile (row r -> f[r % 8]; the pb kernel's trick applied
# block-locally) — never a 3D broadcast or a jnp.repeat gather.
# Activations permute to match with one fused XLA reshape.
# ---------------------------------------------------------------------------


def pack_i8p(qs: jnp.ndarray, eff: jnp.ndarray):
    """One-time load transform: sb-layout (qs, eff) -> (qs_sbi u8
    [K//2, N], f8 i8 [K//32, N] in sbi group order, e2 f32 [K//256, N])."""
    k2, n = qs.shape
    k = 2 * k2
    sb = k // TILE_K
    b = qs.reshape(sb, TILE_K // 2, n)
    codes = jnp.concatenate([b & 15, b >> 4], axis=1)      # [sb, 256, n]
    ci = codes.reshape(sb, GROUPS, GROUP_SIZE, n).swapaxes(2, 1) \
        .reshape(sb, TILE_K, n)                            # row j*8+g
    qs_sbi = (ci[:, :TILE_K // 2] | (ci[:, TILE_K // 2:] << 4)) \
        .reshape(k2, n).astype(jnp.uint8)
    e3 = eff.reshape(sb, GROUPS, n).astype(jnp.float32)
    emax = jnp.abs(e3).max(axis=1)                         # [sb, n]
    emax = jnp.where(emax > 0, emax, 1.0)
    f8 = jnp.round(e3 / emax[:, None, :] * 127.0).astype(jnp.int8) \
        .reshape(sb * GROUPS, n)
    return qs_sbi, f8, emax * (8.0 / 127.0)


def prep_a_sbi(a_q: jnp.ndarray) -> jnp.ndarray:
    """Permute int8 activation columns into the kernel's sbi order."""
    m, k = a_q.shape
    return a_q.reshape(m, k // TILE_K, GROUPS, GROUP_SIZE) \
        .swapaxes(2, 3).reshape(m, k)


def _kernel_i8p(aq_ref, ascale_ref, qs_ref, f8_ref, e2_ref, out_ref, *,
                bm, bn, bk):
    acc = jnp.zeros((bm, bn), jnp.float32)
    for sb in range(bk // TILE_K):
        w4 = _unpack_w4(qs_ref[sb * (TILE_K // 2):(sb + 1) * (TILE_K // 2),
                               :])                          # [256, bn] i32
        f = f8_ref[sb * GROUPS:(sb + 1) * GROUPS, :].astype(jnp.int32)
        fx = pltpu.repeat(f, TILE_K // GROUPS, axis=0)      # row r: f[r%8]
        w8 = ((w4 * fx + 4) >> 3).astype(jnp.int8)
        p = jax.lax.dot_general(
            aq_ref[:, sb * TILE_K:(sb + 1) * TILE_K], w8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # full-K int8 MXU
        acc += p.astype(jnp.float32) * (
            e2_ref[sb:sb + 1, :] * ascale_ref[:, sb:sb + 1])
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bn", "bm", "interpret")
)
def tcq4_matmul_i8p(
    a_sbi: jnp.ndarray,     # int8 [M, K] quantized activations, sbi order
    a_scale: jnp.ndarray,   # f32 [M, K//256] per-block absmax
    qs_sbi: jnp.ndarray,    # uint8 [K//2, N] sbi pack
    f8: jnp.ndarray,        # int8 [K//32, N] group/emax ratios
    e2: jnp.ndarray,        # f32 [K//256, N] emax * 8/127
    *,
    bn: int = 0,
    bm: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Prefill C = (a/7*ascale) @ dequant(w) on the int8 MXU. f32/bf16
    [M, N]; the 1/7 activation step folds into a_scale here."""
    m, k = a_sbi.shape
    n = qs_sbi.shape[1]
    sb = k // TILE_K
    assert qs_sbi.shape[0] == k // 2 and e2.shape == (sb, n), (
        a_sbi.shape, qs_sbi.shape, e2.shape)
    if bn == 0:
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024)
                                   // (k // 2) // 128 * 128))
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)
    bm = min(bm, _round_up(m, 8))

    def _vmem(bm_, bn_):
        # double-buffered blocks + decode intermediates + resident output
        blocks = (bm_ * k                      # a int8
                  + bm_ * sb * 4               # ascale
                  + (k // 2) * bn_             # qs u8
                  + (k // GROUP_SIZE) * bn_    # f8 i8
                  + sb * bn_ * 4               # e2
                  + bm_ * bn_ * 4)             # out f32
        return 2 * blocks + 2 * TILE_K * bn_ * 4   # i32 decode temps

    while _vmem(bm, bn) > 12 * 1024 * 1024 and bn > 128:
        nb = _pick_bn(n, limit=bn - 128)
        if nb >= bn:
            break
        bn = nb
    while _vmem(bm, bn) > 12 * 1024 * 1024 and bm > 128:
        bm //= 2
    m_pad = _round_up(m, bm)
    if m_pad != m:
        a_sbi = jnp.pad(a_sbi, ((0, m_pad - m), (0, 0)))
        a_scale = jnp.pad(a_scale, ((0, m_pad - m), (0, 0)))
    ascale7 = a_scale * (1.0 / 7.0)

    out_dtype = jnp.bfloat16 if m_pad >= 1024 else jnp.float32
    grid = (n // bn, m_pad // bm)
    out = pl.pallas_call(
        functools.partial(_kernel_i8p, bm=bm, bn=bn, bk=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, sb), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 2, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // GROUP_SIZE, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        interpret=interpret,
    )(a_sbi, ascale7, qs_sbi, f8, e2)
    return out[:m]


# ---------------------------------------------------------------------------
# gx2 (round 5): the group-expanded decode kernel with the ACTIVATION
# QUANTIZATION fused into its prologue (the reference fuses absmax+quant
# into the GEMV the same way, tcq4_k32.cu:71-277). Removes the XLA-side
# abs_reduce + round/clip/cast fusions and the int8 [M, K] intermediate
# round-trip from every decode linear (~48 us/step of abs_reduce alone in
# the round-4 budget). Semantics mirror quantize_activations_rrs EXACTLY
# (amax per 256-block with the SCALE_EPS->1.0 guard, rint, clip +-7), so
# the integer oracle parity is unchanged.
# ---------------------------------------------------------------------------

from rrs_tpu.formats.tcq4 import SCALE_EPS as _SCALE_EPS


def _kernel_gx2(a_ref, qs_ref, eff_ref, out_ref, aexp_ref, s_ref, *,
                m, bn, bk, k):
    g_chunk = bk // GROUP_SIZE
    g_total = k // GROUP_SIZE
    rows = g_total * m
    nsb_total = k // TILE_K
    kc = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (kc == 0))
    def _():
        a = a_ref[...].astype(jnp.float32)                  # [m, k] rotated
        col_sb = jax.lax.broadcasted_iota(jnp.int32, (m, k), 1) // TILE_K
        rec = jnp.zeros((m, k), jnp.float32)
        amaxs = []
        for sb in range(nsb_total):
            blk = a[:, sb * TILE_K:(sb + 1) * TILE_K]
            am = jnp.max(jnp.abs(blk), axis=1, keepdims=True)
            am = jnp.where(am < _SCALE_EPS, 1.0, am)
            amaxs.append(am)
            rec = jnp.where(col_sb == sb, 7.0 / am, rec)
        q = jnp.clip(jnp.rint(a * rec), -7, 7).astype(jnp.int32)

        k_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 0)
        mask = (k_idx // GROUP_SIZE) == (r_idx // m)
        if m == 1:
            a_rows = jnp.broadcast_to(q, (rows, k))
        else:
            a_rows = pltpu.repeat(q, g_total, axis=0)
        aexp_ref[...] = jnp.where(mask, a_rows, 0).astype(jnp.int8)

        sb_of_r = jax.lax.broadcasted_iota(
            jnp.int32, (rows, 1), 0) // (8 * m)
        mm_of_r = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0), m)
        s = jnp.zeros((rows, 1), jnp.float32)
        for sb in range(nsb_total):
            for mm in range(m):
                s = jnp.where((sb_of_r == sb) & (mm_of_r == mm),
                              amaxs[sb][mm, 0], s)
        s_ref[...] = s * (1.0 / 7.0)

    nsb = bk // TILE_K
    q32 = qs_ref[...].astype(jnp.int32).reshape(nsb, TILE_K // 2, bn)
    w_q = jnp.concatenate([(q32 << 28) >> 28, (q32 << 24) >> 28],
                          axis=1).reshape(bk, bn).astype(jnp.int8)
    a_chunk = aexp_ref[pl.ds(kc * g_chunk * m, g_chunk * m),
                       pl.ds(kc * bk, bk)]
    p = jax.lax.dot_general(
        a_chunk, w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    e = eff_ref[...].astype(jnp.float32)
    s = s_ref[pl.ds(kc * g_chunk * m, g_chunk * m), :]
    pf = p.astype(jnp.float32) * s
    if m == 1:
        y = (pf * e).sum(0, keepdims=True)
    else:
        y = (pf.reshape(g_chunk, m, bn) * e[:, None, :]).sum(0)

    @pl.when(kc == 0)
    def _():
        out_ref[...] = jnp.zeros((m, bn), jnp.float32)

    out_ref[...] += y


@functools.partial(jax.jit, static_argnames=("bn", "bk", "interpret"))
def tcq4_matmul_gx2(
    a_rot: jnp.ndarray,     # f32 [M, K] ROTATED activations (pre-quant)
    qs: jnp.ndarray,        # uint8 [K//2, N]
    eff: jnp.ndarray,       # [K//32, N]
    *,
    bn: int = 0,
    bk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Integer-exact decode path with fused activation quantization:
    C = quant(a_rot) @ dequant(w). f32 [M, N]."""
    m, k = a_rot.shape
    n = qs.shape[1]
    assert k % TILE_K == 0 and qs.shape[0] == k // 2, (a_rot.shape, qs.shape)
    assert gx_viable(m, k), (m, k)
    if bk == 0:
        bk = _pick_bk_gx(k)
    assert k % bk == 0 and bk % TILE_K == 0, (k, bk)
    if bn == 0:
        denom = (bk if k > 4096 else k) // 2
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024)
                                   // denom // 128 * 128))
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)

    grid = (n // bn, k // bk)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    g_total = k // GROUP_SIZE
    out = pl.pallas_call(
        functools.partial(_kernel_gx2, m=m, bn=bn, bk=bk, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // GROUP_SIZE, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((g_total * m, k), jnp.int8),
                        pltpu.VMEM((g_total * m, 1), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(a_rot.astype(jnp.float32), qs, eff)
    return out


# ---------------------------------------------------------------------------
# gx3 (round 5): gx2 + the FWHT ROTATION folded into the prologue too —
# per-256-block Hadamard dots run ONCE per call in the (0,0) grid step
# (NOT per weight block: interleaving the rotation with the weight dots
# per superblock was the round-2 10x tcq4_matmul_fused pathology). This
# removes the XLA-side rotation matmul + its fusion glue from every
# decode linear with no channel perm. In-kernel dots run f32 (slightly
# MORE precise than the XLA path's bf16x3 "high").
#
# MEASURED NEGATIVE (whole-model A/B, RRS_GX3=1 bench.py): 4.50 vs 4.37
# ms/step — the serialized prologue dots + int32 q-scratch traffic cost
# more than the removed XLA glue (~51 us of rotation fusions). Kept
# behind the RRS_GX3 flag (default off) as the documented experiment;
# exact vs rotate(HIGHEST)+gx2 in tests.
# ---------------------------------------------------------------------------


def _kernel_gx3(x_ref, had_ref, qs_ref, eff_ref, out_ref, aexp_ref,
                s_ref, q_ref, *, m, bn, bk, k):
    g_chunk = bk // GROUP_SIZE
    g_total = k // GROUP_SIZE
    rows = g_total * m
    nsb_total = k // TILE_K
    kc = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (kc == 0))
    def _():
        x = x_ref[...].astype(jnp.float32)                  # [m, k] UNrotated
        had = had_ref[...]                                  # [256, 256] f32
        for sb in range(nsb_total):
            rot = jax.lax.dot_general(
                x[:, sb * TILE_K:(sb + 1) * TILE_K], had,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [m, 256]
            am = jnp.max(jnp.abs(rot), axis=1, keepdims=True)
            am = jnp.where(am < _SCALE_EPS, 1.0, am)
            q_ref[:, sb * TILE_K:(sb + 1) * TILE_K] = jnp.clip(
                jnp.rint(rot * (7.0 / am)), -7, 7).astype(jnp.int32)
            # rows r = g*m + mm for this superblock's 8 groups all carry
            # lane mm's scale am[mm]/7: pltpu.repeat tiles [m,1] 8x so
            # row j*m + mm = am[mm] (whole-array tiling is exactly right)
            s_ref[pl.ds(sb * 8 * m, 8 * m), :] = pltpu.repeat(
                am * (1.0 / 7.0), 8, axis=0)
        q = q_ref[...]
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 0)
        mask = (k_idx // GROUP_SIZE) == (r_idx // m)
        if m == 1:
            a_rows = jnp.broadcast_to(q, (rows, k))
        else:
            a_rows = pltpu.repeat(q, g_total, axis=0)
        aexp_ref[...] = jnp.where(mask, a_rows, 0).astype(jnp.int8)

    nsb = bk // TILE_K
    q32 = qs_ref[...].astype(jnp.int32).reshape(nsb, TILE_K // 2, bn)
    w_q = jnp.concatenate([(q32 << 28) >> 28, (q32 << 24) >> 28],
                          axis=1).reshape(bk, bn).astype(jnp.int8)
    a_chunk = aexp_ref[pl.ds(kc * g_chunk * m, g_chunk * m),
                       pl.ds(kc * bk, bk)]
    p = jax.lax.dot_general(
        a_chunk, w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    e = eff_ref[...].astype(jnp.float32)
    s = s_ref[pl.ds(kc * g_chunk * m, g_chunk * m), :]
    pf = p.astype(jnp.float32) * s
    if m == 1:
        y = (pf * e).sum(0, keepdims=True)
    else:
        y = (pf.reshape(g_chunk, m, bn) * e[:, None, :]).sum(0)

    @pl.when(kc == 0)
    def _():
        out_ref[...] = jnp.zeros((m, bn), jnp.float32)

    out_ref[...] += y


@functools.partial(jax.jit, static_argnames=("bn", "bk", "interpret"))
def tcq4_matmul_gx3(
    x: jnp.ndarray,         # f32 [M, K] UNROTATED activations (no perm)
    had: jnp.ndarray,       # f32 [256, 256] normalized Hadamard
    qs: jnp.ndarray,        # uint8 [K//2, N]
    eff: jnp.ndarray,       # [K//32, N]
    *,
    bn: int = 0,
    bk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Integer-exact decode path with rotation AND quantization fused:
    C = quant(fwht(x)) @ dequant(w). f32 [M, N]."""
    m, k = x.shape
    n = qs.shape[1]
    assert k % TILE_K == 0 and qs.shape[0] == k // 2, (x.shape, qs.shape)
    assert gx_viable(m, k), (m, k)
    if bk == 0:
        bk = _pick_bk_gx(k)
    assert k % bk == 0 and bk % TILE_K == 0, (k, bk)
    if bn == 0:
        denom = (bk if k > 4096 else k) // 2
        bn = _pick_bn(n, limit=max(128, (3 * 1024 * 1024)
                                   // denom // 128 * 128))
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)

    grid = (n // bn, k // bk)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    g_total = k // GROUP_SIZE
    out = pl.pallas_call(
        functools.partial(_kernel_gx3, m=m, bn=bn, bk=bk, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_K, TILE_K), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // GROUP_SIZE, bn), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((g_total * m, k), jnp.int8),
                        pltpu.VMEM((g_total * m, 1), jnp.float32),
                        pltpu.VMEM((m, k), jnp.int32)],
        interpret=interpret,
        **kwargs,
    )(x.astype(jnp.float32), had, qs, eff)
    return out
