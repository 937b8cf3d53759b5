"""Q8_0 weight matmul — the MMVQ/MMQ-for-Q8_0 analog (ggml-cuda/mmvq.cu).

Used for tensors the TCQ4 policy keeps at Q8_0 (output.weight,
llama-quant.cpp:260-262). Layout: q int8 [K, N] K-major, scale f32 [K//32, N]
(fp32 of the block fp16 d, repeated per group is NOT needed — the grid block
is group-aligned). Activations stay bf16 (higher fidelity than the
reference's q8_1 activation quant on this path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32


def _kernel(a_ref, q_ref, s_ref, out_ref, *, bm, bn, bk):
    acc = jnp.zeros((bm, bn), jnp.float32)
    for g0 in range(bk // 256):
        q = q_ref[g0 * 256 : (g0 + 1) * 256, :].astype(jnp.bfloat16)
        # scales may be stored bf16 (halves their HBM stream); upcast so the
        # 3D broadcast multiply stays f32 (bf16 3D broadcasts are pathological)
        s = s_ref[g0 * 8 : (g0 + 1) * 8, :].astype(jnp.float32)
        w = (q.reshape(8, GROUP, bn) * s[:, None, :]).reshape(256, bn)
        acc += jax.lax.dot_general(
            a_ref[:, g0 * 256 : (g0 + 1) * 256].astype(jnp.bfloat16), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros((bm, bn), jnp.float32)

    out_ref[...] += acc


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("bn", "bm", "bk", "interpret"))
def q8_matmul(
    a: jnp.ndarray,       # [M, K] f32/bf16
    q: jnp.ndarray,       # int8 [K, N]
    scale: jnp.ndarray,   # f32 [K//32, N]
    *,
    bn: int = 0,
    bm: int = 256,
    bk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    from rrs_tpu.ops.tcq4_matmul import _pick_bk, _pick_bn

    m, k = a.shape
    n = q.shape[1]
    assert k % 256 == 0 and q.shape[0] == k, (a.shape, q.shape)
    if bn == 0:
        bn = _pick_bn(n)
    bn = min(bn, n)
    assert n % bn == 0, (n, bn)
    bm = min(bm, _round_up(m, 8))
    if bk == 0:
        bk = _pick_bk(k, bn, vmem_budget=2 * 1024 * 1024)
    assert k % bk == 0 and bk % 256 == 0

    m_pad = _round_up(m, bm)
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))

    grid = (n // bn, m_pad // bm, k // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, bm=bm, bn=bn, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (j, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // GROUP, bn), lambda i, j, s: (s, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
    )(a, q, scale)
    return out[:m]


def q8_matmul_ref(a, q, scale):
    """jnp oracle."""
    k, n = q.shape
    w = q.astype(jnp.float32).reshape(k // GROUP, GROUP, n) * scale[:, None, :]
    return jnp.dot(
        a.astype(jnp.float32), w.reshape(k, n),
        precision=jax.lax.Precision.HIGHEST,
    )
