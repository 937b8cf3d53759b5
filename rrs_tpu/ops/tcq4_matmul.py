"""Fused W4A4 TCQ4 matmul — the TPU replacement for the reference's CUDA stack
(tcq4_rrs_fused_gemv / _gemm_smallM / gemm_imma_kernel, ggml/src/ggml-cuda/tcq4_k32.cu).

Pipeline (reference call path ggml_cuda_rrs_mul_mat, rrs.cu:241-344):

    x --[perm-gather + 256-pt FWHT + 1/16]--> x_rot          (one MXU matmul,
                                                              rrs_tpu.formats.fwht)
    x_rot --[per-256-block absmax int4 quant]--> (a_q, a_scale)
    (a_q, a_scale) x (qs, sc, S) --[this kernel]--> C f32

Epilogue math (tcq4_k32.cu:11):
    C[m,n] = sum_kb  dot256(a_q, q*sc) * (a_scale[m,kb]/7) * (S[kb,n]/127)

Exactness: all integer products/sums stay below 2^24
(|sum_256 a_q*q*sc| <= 256*7*8*127 ~ 1.8e6), so an f32 MXU matmul at HIGHEST
precision reproduces the reference's int32 arithmetic bit-exactly; the f32
epilogue matches the CUDA epilogue op-for-op.

Layout: weights are K-major (see rrs_tpu.formats.tcq4 module docstring):
    qs [K//2, N] uint8 (nibble-packed per superblock), sc [K//32, N] int8,
    S [K//256, N] f32.
Grid is (N tiles, M tiles) with M innermost so each weight tile is DMA'd
once and reused across all M tiles; full K lives in VMEM per tile (the
largest Qwen3-4B K=9728 needs ~1.2 MB of qs per 256-wide N tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rrs_tpu.formats.tcq4 import TILE_K, GROUP_SIZE

GROUPS = TILE_K // GROUP_SIZE  # 8
_EPILOG = 1.0 / (7.0 * 127.0)


def _decode_nibbles(packed_i32: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """uint8-as-int32 [128, BN] -> (lo, hi) int32 in [-8, 7]."""
    lo = ((packed_i32 & 0xF) ^ 8) - 8
    hi = (((packed_i32 >> 4) & 0xF) ^ 8) - 8
    return lo, hi


def _kernel(a_q_ref, a_s_ref, qs_ref, sc_ref, S_ref, out_ref, *, k: int, bm: int, bn: int):
    nsb = k // TILE_K
    a = a_q_ref[...].astype(jnp.float32)          # [BM, K]
    acc = jnp.zeros((bm, bn), jnp.float32)

    def body(sb, acc):
        qs_sb = qs_ref[pl.ds(sb * (TILE_K // 2), TILE_K // 2), :].astype(jnp.int32)
        lo, hi = _decode_nibbles(qs_sb)           # [128, BN] each
        w_q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)   # [256, BN]
        sc_sb = sc_ref[pl.ds(sb * GROUPS, GROUPS), :].astype(jnp.float32)  # [8, BN]
        w16 = (w_q.reshape(GROUPS, GROUP_SIZE, bn) * sc_sb[:, None, :]).reshape(
            TILE_K, bn
        )
        a_sb = jax.lax.dynamic_slice(a, (0, sb * TILE_K), (bm, TILE_K))
        partial = jax.lax.dot_general(
            a_sb, w16,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scale = a_s_ref[:, sb][:, None] * S_ref[sb, :][None, :]
        return acc + partial * scale

    acc = jax.lax.fori_loop(0, nsb, body, acc)
    out_ref[...] = acc * _EPILOG


@functools.partial(jax.jit, static_argnames=("bn", "bm", "interpret"))
def tcq4_matmul(
    a_q: jnp.ndarray,       # int8 [M, K], values in [-7, 7]
    a_scale: jnp.ndarray,   # f32 [M, K//256]
    qs: jnp.ndarray,        # uint8 [K//2, N]
    sc: jnp.ndarray,        # int8 [K//32, N]
    S: jnp.ndarray,         # f32 [K//256, N]
    *,
    bn: int = 256,
    bm: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """C = dequant(a) @ dequant(w) for TCQ4 operands; returns f32 [M, N]."""
    m, k = a_q.shape
    n = qs.shape[1]
    assert k % TILE_K == 0 and qs.shape[0] == k // 2, (a_q.shape, qs.shape)
    bm = min(bm, _round_up(m, 8))
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)

    m_pad = _round_up(m, bm)
    if m_pad != m:
        a_q = jnp.pad(a_q, ((0, m_pad - m), (0, 0)))
        a_scale = jnp.pad(a_scale, ((0, m_pad - m), (0, 0)), constant_values=1.0)

    grid = (n // bn, m_pad // bm)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, bm=bm, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k // TILE_K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 2, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // GROUP_SIZE, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // TILE_K, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
    )(a_q, a_scale, qs, sc, S)
    return out[:m]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Pure-jnp oracle (the "CPU backend" of the reference's test-backend-ops
# strategy): bit-exact integer emulation of the CUDA epilogue, any backend.
# ---------------------------------------------------------------------------

def tcq4_matmul_ref(a_q, a_scale, qs, sc, S) -> jnp.ndarray:
    from rrs_tpu.formats.tcq4 import unpack_nibbles
    import numpy as np

    k = qs.shape[0] * 2
    n = qs.shape[1]
    m = a_q.shape[0]
    w_q = unpack_nibbles(np.asarray(qs)).astype(np.int32)          # [K, N]
    a = np.asarray(a_q, np.int64)
    # group-segmented integer dots: [M, K//32, N]
    prod = np.einsum(
        "mgk,gkn->mgn",
        a.reshape(m, k // GROUP_SIZE, GROUP_SIZE),
        w_q.reshape(k // GROUP_SIZE, GROUP_SIZE, n).astype(np.int64),
    )
    scaled = prod.astype(np.float32) * np.asarray(sc, np.float32)[None]   # * sc[g,n]
    per_sb = scaled.reshape(m, k // TILE_K, GROUPS, n).sum(2)              # [M, SB, N]
    out = (
        per_sb
        * np.asarray(a_scale, np.float32)[:, :, None]
        * np.asarray(S, np.float32)[None]
    ).sum(1) * _EPILOG
    return jnp.asarray(out)
