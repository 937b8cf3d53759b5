"""Fused attention over the KV cache — the GGML_OP_FLASH_ATTN_EXT analog
(reference: build_attn_mha llama-graph.cpp:1467-1596, CUDA fattn-*.cu family).

Semantics implemented (a superset of what the BASELINE models need):
  * GQA: q heads grouped onto kv heads
  * causal masking from per-row positions (the reference fills a host-side
    KQ mask tensor, llama-kv-cache.h:199; here the mask is computed in-kernel
    from the position vector — no [T, S] mask tensor ever materializes)
  * logit softcap (Gemma-style), f32 accumulation, padded-lane safety

Design: one grid step per (batch lane, kv head, q-tile). K/V for the lane
live in VMEM for the step (S*D*2B per operand; ~2 MB at S=8192, D=128), so
the softmax needs no online chunking — full rows in f32. Scores for one step
are [TQ*G, S] f32 in VMEM, never in HBM (vs the jnp path's [B,H,T,S] tensor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _causal_mask(pos, tq: int, s: int, window: int):
    """[TQ, S] bool mask from per-row attend bounds ``pos``.

    window == 0: plain causal over a linear cache (slot == position).
    window  > 0: sliding window over a RING cache of size S (the iSWA cache,
    llama-kv-cache-iswa.cpp analog): slot ``c`` holds the latest written
    position p == c (mod S), so the position at slot c as seen by a row with
    bound P is  P - ((P - c) mod S); it is attendable iff it lies in
    (P - window, P] and >= 0. A linear (unwrapped) cache is the special case
    P < S, so the same formula works for full-size caches with a window.
    Padded rows (pos < 0) mask everything in both branches.
    """
    kv_slot = jax.lax.broadcasted_iota(jnp.int32, (tq, s), 1)
    if window > 0:
        off = jax.lax.rem(pos[:, None] - kv_slot, s)
        off = jnp.where(off < 0, off + s, off)              # [0, S)
        real = pos[:, None] - off
        return (real >= 0) & (real > pos[:, None] - window)
    return (kv_slot <= pos[:, None]) & (pos[:, None] >= 0)


def _kernel(pos_ref, q_ref, k_ref, v_ref, out_ref, *, tq, g, d, s, scale,
            softcap, window):
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    k = k_ref[0, 0, :, :].astype(jnp.float32)              # [S, D]
    v = v_ref[0, 0, :, :].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                              # [TQ*G, S]
    if softcap:
        scores = jnp.tanh(scores / softcap) * softcap

    pos = pos_ref[0, 0, :]                                 # [TQ] i32
    mask = _causal_mask(pos, tq, s, window)                # [TQ, S]
    mask = jnp.broadcast_to(mask[:, None, :], (tq, g, s)).reshape(tq * g, s)
    scores = jnp.where(mask, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / jnp.maximum(l, 1e-30)
    # fully-masked rows (padding lanes, pos<0) produce uniform tiny probs via
    # exp(0)=1 rows; zero them
    alive = jnp.any(mask, axis=-1, keepdims=True)
    probs = jnp.where(alive, probs, 0.0)

    ctx = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [TQ*G, D]
    out_ref[0, 0, :, :, :] = ctx.reshape(tq, g, d).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "tq", "interpret", "window")
)
def flash_attention(
    q: jnp.ndarray,          # [B, T, H, D]
    k_cache: jnp.ndarray,    # [B, Hkv, S, D]
    v_cache: jnp.ndarray,    # [B, Hkv, S, D]
    positions: jnp.ndarray,  # [B, T] int32; row attends kv slots <= position
    scale: float,
    softcap: float = 0.0,
    tq: int = 0,             # q-tile length (0 => min(T, 256))
    interpret: bool = False,
    window: int = 0,         # >0: sliding window over a ring cache (iSWA)
) -> jnp.ndarray:
    b, t, h, d = q.shape
    hkv, s = k_cache.shape[1], k_cache.shape[2]
    g = h // hkv
    if tq == 0:
        tq = min(t, 256)
    t_pad = (t + tq - 1) // tq * tq
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        positions = jnp.pad(positions, ((0, 0), (0, t_pad - t)),
                            constant_values=-1)

    # [B, Hkv, Tpad, G, D] so blocked dims stay out of the last two axes
    q5 = q.reshape(b, t_pad, hkv, g, d).transpose(0, 2, 1, 3, 4)
    pos3 = positions.reshape(b, 1, t_pad)    # B must be a leading (grid) dim
    grid = (b, hkv, t_pad // tq)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tq=tq, g=g, d=d, s=s, scale=scale, softcap=softcap,
            window=window,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tq), lambda b, h, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq, g, d), lambda b, h, i: (b, h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, g, d), lambda b, h, i: (b, h, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t_pad, g, d), q.dtype),
        interpret=interpret,
    )(pos3, q5, k_cache, v_cache)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t_pad, h, d)[:, :t]


def _kernel_q8(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref,
               *, tq, g, d, s, scale, softcap, window):
    ksc = ks_ref[0, 0, 0, :]                               # [S] f32
    vsc = vs_ref[0, 0, 0, :]
    k = k_ref[0, 0, :, :].astype(jnp.float32) * ksc[:, None]
    v = v_ref[0, 0, :, :].astype(jnp.float32) * vsc[:, None]
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if softcap:
        scores = jnp.tanh(scores / softcap) * softcap
    pos = pos_ref[0, 0, :]
    mask = _causal_mask(pos, tq, s, window)
    mask = jnp.broadcast_to(mask[:, None, :], (tq, g, s)).reshape(tq * g, s)
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / jnp.maximum(l, 1e-30)
    alive = jnp.any(mask, axis=-1, keepdims=True)
    probs = jnp.where(alive, probs, 0.0)
    ctx = jax.lax.dot_general(
        probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0, :, :, :] = ctx.reshape(tq, g, d).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "tq", "interpret", "window")
)
def flash_attention_q8(
    q: jnp.ndarray,          # [B, T, H, D]
    k_q: jnp.ndarray,        # int8 [B, Hkv, S, D]
    k_s: jnp.ndarray,        # f32 [B, Hkv, 1, S]
    v_q: jnp.ndarray,
    v_s: jnp.ndarray,
    positions: jnp.ndarray,  # [B, T] int32
    scale: float,
    softcap: float = 0.0,
    tq: int = 0,
    interpret: bool = False,
    window: int = 0,
) -> jnp.ndarray:
    """Attention over an int8-quantized KV cache (the quantized-KV option of
    llama-kv-cache cparams.type_k/v); dequantization happens in VMEM."""
    b, t, h, d = q.shape
    hkv, s = k_q.shape[1], k_q.shape[2]
    g = h // hkv
    if tq == 0:
        tq = min(t, 256)
    t_pad = (t + tq - 1) // tq * tq
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        positions = jnp.pad(positions, ((0, 0), (0, t_pad - t)),
                            constant_values=-1)
    q5 = q.reshape(b, t_pad, hkv, g, d).transpose(0, 2, 1, 3, 4)
    pos3 = positions.reshape(b, 1, t_pad)
    grid = (b, hkv, t_pad // tq)
    spec_kv = pl.BlockSpec((1, 1, s, d), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((1, 1, 1, s), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel_q8, tq=tq, g=g, d=d, s=s, scale=scale, softcap=softcap,
            window=window,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tq), lambda b, h, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq, g, d), lambda b, h, i: (b, h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_kv, spec_sc, spec_kv, spec_sc,
        ],
        out_specs=pl.BlockSpec((1, 1, tq, g, d), lambda b, h, i: (b, h, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t_pad, g, d), q.dtype),
        interpret=interpret,
    )(pos3, q5, k_q, k_s, v_q, v_s)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t_pad, h, d)[:, :t]


def attention_ref(q, k_cache, v_cache, positions, scale, softcap=0.0,
                  window: int = 0):
    """jnp oracle with identical semantics (the naive build_attn_mha path).
    Caches are [B, Hkv, S, D]."""
    b, t, h, d = q.shape
    hkv, s = k_cache.shape[1], k_cache.shape[2]
    g = h // hkv
    qf = q.reshape(b, t, hkv, g, d).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scores = jnp.einsum("bthgd,bhsd->bhgts", qf, kf) * scale
    if softcap:
        scores = jnp.tanh(scores / softcap) * softcap
    kv_pos = jnp.arange(s, dtype=jnp.int32)
    if window > 0:
        off = jnp.remainder(positions[:, :, None] - kv_pos[None, None, :], s)
        real = positions[:, :, None] - off
        mask = (real >= 0) & (real > positions[:, :, None] - window)
    else:
        mask = kv_pos[None, None, :] <= positions[:, :, None]   # [B, T, S]
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(
        jnp.any(mask[:, None, None, :, :], -1, keepdims=True), probs, 0.0
    )
    ctx = jnp.einsum("bhgts,bhsd->bthgd", probs, vf)
    return ctx.reshape(b, t, h, d).astype(q.dtype)
