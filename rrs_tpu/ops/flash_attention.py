"""Fused attention over the KV cache — the GGML_OP_FLASH_ATTN_EXT analog
(reference: build_attn_mha llama-graph.cpp:1467-1596, CUDA fattn-*.cu family).

Semantics (a superset of what the BASELINE models need):
  * GQA: q heads grouped onto kv heads
  * causal masking from per-row positions (the reference fills a host-side
    KQ mask tensor, llama-kv-cache.h:199; here the mask is computed in-kernel
    from the position vector — no [T, S] mask tensor ever materializes)
  * sliding-window masking over RING caches (the iSWA path)
  * logit softcap (Gemma-style), f32 accumulation, padded-lane safety
  * int8-quantized KV variant (cparams.type_k/v analog), dequant in VMEM

Design: true online-softmax flash attention. Grid
(batch lane, kv head, q tile, KV S-tile) with the S-tile innermost; running
(max, denom, acc) live in VMEM scratch across S-steps, so VMEM usage is
O(TQ*G*S_TILE) regardless of context length. K/V tiles stream from HBM with
automatic double-buffering.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def alibi_slopes_np(n_heads: int, max_bias: float):
    """Per-head ALiBi slopes (ggml_get_alibi_slope / soft_max CPU impl,
    ggml-cpu/ops.cpp:5257-5276): m0^(h+1) for the first 2^floor(log2(H))
    heads, then m1^(2(h-2^floor(log2 H))+1)."""
    import numpy as np

    nhl2 = 2 ** math.floor(math.log2(n_heads))
    m0 = 2.0 ** (-max_bias / nhl2)
    m1 = 2.0 ** (-max_bias / 2.0 / nhl2)
    hs = np.arange(n_heads)
    return np.where(hs < nhl2, m0 ** (hs + 1),
                    m1 ** (2 * (hs - nhl2) + 1)).astype(np.float32)


def _tile_mask(pos, tq: int, bs: int, s0, s_total: int, window: int):
    """[TQ, BS] bool mask for KV slots [s0, s0+bs) (see _causal semantics in
    the module docstring; ring-aware when window > 0)."""
    kv_slot = s0 + jax.lax.broadcasted_iota(jnp.int32, (tq, bs), 1)
    if window > 0:
        off = jax.lax.rem(pos[:, None] - kv_slot, s_total)
        off = jnp.where(off < 0, off + s_total, off)
        real = pos[:, None] - off
        return (real >= 0) & (real > pos[:, None] - window)
    return (kv_slot <= pos[:, None]) & (pos[:, None] >= 0)


def _tile_real(pos, tq: int, bs: int, s0, s_total: int, window: int):
    """[TQ, BS] REAL token position of each KV slot (= the slot index for
    linear caches; un-rolled for ring caches) — the ALiBi distance base."""
    kv_slot = s0 + jax.lax.broadcasted_iota(jnp.int32, (tq, bs), 1)
    if window > 0:
        off = jax.lax.rem(pos[:, None] - kv_slot, s_total)
        off = jnp.where(off < 0, off + s_total, off)
        return pos[:, None] - off
    return kv_slot


def _flash_inner(pos, q, k, v, acc_ref, m_ref, l_ref, out_ref, *,
                 tq, g, d, bs, s_total, scale, softcap, window,
                 sink_ref=None, k_colscale=None, v_colscale=None,
                 alibi: float = 0.0, n_heads: int = 0,
                 kv_bias: float = 0.0):
    """One S-tile of online softmax. q [TQ*G, D] f32; k/v [BS, D] f32.

    ``k_colscale``/``v_colscale`` ([BS] f32): per-KV-row dequant scales
    applied in the EPILOGUE — to the [TQ*G, BS] scores and to e before
    the PV dot — instead of per K/V element. The element-wise
    ``k8.astype(f32) * ksc[:, None]`` form (a sublane-broadcast multiply
    over [BS, D]) hit a pathological Mosaic schedule: the q8 kernel ran
    105.3 us/step at S=8192 decode vs 40.7 with the epilogue form
    (2.6x), despite identical math — scale rows factor out of the dot
    linearly.

    ``kv_bias``: constant offset on every decoded K/V element (the q4
    head-pair codec stores v+8 so the kernel's nibble extract needs no
    sign handling); like the scales it factors out of both dots —
    q.(k+c) = q.k + c*rowsum(q) and e_v.(v+c) = e_v.v + c*rowsum(e_v) —
    so it too lands in the epilogue instead of per element."""
    si = pl.program_id(3)
    sink = None
    if sink_ref is not None:
        # sink_ref is the full [Hkv, G] table in SMEM (vector blocks smaller
        # than the array fail the TPU 8/128 rule); read this head's row as
        # scalars. Hoisted out of the final pl.when: program_id inside a
        # when-body doesn't survive the interpret-mode HLO path.
        h = pl.program_id(1)
        # build the [TQ*G, 1] column directly (Mosaic can't reshape
        # (tq, g) -> (tq*g, 1) for small tq*g): row r belongs to group r%g
        gi = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (tq * g, 1), 0), g)
        sink = jnp.zeros((tq * g, 1), jnp.float32)
        for j in range(g):
            sink = jnp.where(gi == j, sink_ref[h, j], sink)

    @pl.when(si == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [TQ*G, BS]
    if kv_bias:
        scores = scores - kv_bias * q.sum(axis=-1, keepdims=True)
    scores = scores * scale
    if k_colscale is not None:
        scores = scores * k_colscale[None, :]
    if softcap:
        scores = jnp.tanh(scores / softcap) * softcap
    if alibi:
        # ALiBi: scores += slope(q_head) * -(q_pos - kv_pos) — the mask
        # value the reference feeds when use_alibi
        # (llama-kv-cache.cpp:1317), applied post-softcap like
        # soft_max_ext (f_max_alibi_bias: llama-graph.cpp:1506,1566).
        # Row r of the [TQ*G, BS] score tile belongs to q head
        # h_kv * g + (r % g); slopes per ggml_get_alibi_slope.
        h = pl.program_id(1)
        gi = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (tq * g, 1), 0), g)
        qh = (h * g + gi).astype(jnp.float32)
        nhl2 = float(2 ** math.floor(math.log2(n_heads)))
        e1 = -(qh + 1.0) * (alibi / nhl2)
        e2 = -(2.0 * (qh - nhl2) + 1.0) * (alibi / (2.0 * nhl2))
        slope = jnp.exp2(jnp.where(qh < nhl2, e1, e2))     # [TQ*G, 1]
        real = _tile_real(pos, tq, bs, si * bs, s_total, window)
        dist = (real - pos[:, None]).astype(jnp.float32)   # <= 0 causal
        dist = jnp.broadcast_to(dist[:, None, :], (tq, g, bs)
                                ).reshape(tq * g, bs)
        scores = scores + slope * dist
    mask = _tile_mask(pos, tq, bs, si * bs, s_total, window)
    mask = jnp.broadcast_to(mask[:, None, :], (tq, g, bs)).reshape(tq * g, bs)
    scores = jnp.where(mask, scores, NEG_INF)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
    # masked entries contribute EXACTLY zero even when the whole running max
    # is still NEG_INF (a fully-masked prefix tile of a windowed row)
    e = jnp.where(mask, jnp.exp(scores - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_ref[...] = l_ref[...] * corr + e.sum(axis=-1, keepdims=True)
    e_v = e if v_colscale is None else e * v_colscale[None, :]
    pv = jax.lax.dot_general(
        e_v, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if kv_bias:
        pv = pv - kv_bias * e_v.sum(axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * corr + pv
    m_ref[...] = m_new

    @pl.when(si == pl.num_programs(3) - 1)
    def _():
        l_fin = l_ref[...]
        if sink is not None:
            # attention sinks: a per-head virtual logit that joins the
            # softmax denominator only (soft_max_ext src[4] semantics,
            # ggml-cpu/ops.cpp:5317-5319)
            l_fin = l_fin + jnp.exp(sink - m_ref[...])
        out = acc_ref[...] / jnp.maximum(l_fin, 1e-30)
        out_ref[0, 0, :, :, :] = out.reshape(tq, g, d).astype(out_ref.dtype)


def _kernel(pos_ref, q_ref, k_ref, v_ref, out_ref, acc_ref, m_ref, l_ref,
            *, tq, g, d, bs, s_total, scale, softcap, window, alibi=0.0, n_heads=0):
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    k = k_ref[0, 0, :, :].astype(jnp.float32)                # [BS, D]
    v = v_ref[0, 0, :, :].astype(jnp.float32)
    _flash_inner(pos_ref[0, 0, :], q, k, v, acc_ref, m_ref, l_ref, out_ref,
                 tq=tq, g=g, d=d, bs=bs, s_total=s_total, scale=scale,
                 softcap=softcap, window=window, alibi=alibi,
                 n_heads=n_heads)


def _kernel_sink(pos_ref, q_ref, k_ref, v_ref, sink_ref, out_ref,
                 acc_ref, m_ref, l_ref,
                 *, tq, g, d, bs, s_total, scale, softcap, window, alibi=0.0, n_heads=0):
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    k = k_ref[0, 0, :, :].astype(jnp.float32)
    v = v_ref[0, 0, :, :].astype(jnp.float32)
    _flash_inner(pos_ref[0, 0, :], q, k, v, acc_ref, m_ref, l_ref, out_ref,
                 tq=tq, g=g, d=d, bs=bs, s_total=s_total, scale=scale,
                 softcap=softcap, window=window, sink_ref=sink_ref,
                 alibi=alibi, n_heads=n_heads)


def _kernel_q8(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref,
               acc_ref, m_ref, l_ref, *, tq, g, d, bs, s_total, scale,
               softcap, window, alibi=0.0, n_heads=0):
    ksc = ks_ref[0, 0, 0, :]                                 # [BS] f32
    vsc = vs_ref[0, 0, 0, :]
    k = k_ref[0, 0, :, :].astype(jnp.float32)    # scales go in the epilogue
    v = v_ref[0, 0, :, :].astype(jnp.float32)
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    _flash_inner(pos_ref[0, 0, :], q, k, v, acc_ref, m_ref, l_ref, out_ref,
                 tq=tq, g=g, d=d, bs=bs, s_total=s_total, scale=scale,
                 softcap=softcap, window=window, alibi=alibi,
                 n_heads=n_heads, k_colscale=ksc, v_colscale=vsc)


def _unpack_kv4(raw):
    """uint8 [BS, D/2] halves-packed -> f32 [BS, D] (sign-extending shifts;
    see runtime/kv_codec.py layout)."""
    p32 = raw.astype(jnp.int32)
    lo = (p32 << 28) >> 28
    hi = (p32 << 24) >> 28
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)


def _kernel_q4(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref,
               acc_ref, m_ref, l_ref, *, tq, g, d, bs, s_total, scale,
               softcap, window, alibi=0.0, n_heads=0):
    ksc = ks_ref[0, 0, 0, :]                                 # [BS] f32
    vsc = vs_ref[0, 0, 0, :]
    k = _unpack_kv4(k_ref[0, 0, :, :])           # scales go in the epilogue
    v = _unpack_kv4(v_ref[0, 0, :, :])
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    _flash_inner(pos_ref[0, 0, :], q, k, v, acc_ref, m_ref, l_ref, out_ref,
                 tq=tq, g=g, d=d, bs=bs, s_total=s_total, scale=scale,
                 softcap=softcap, window=window, alibi=alibi,
                 n_heads=n_heads, k_colscale=ksc, v_colscale=vsc)


def _kernel_q4_sink(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, sink_ref,
                    out_ref, acc_ref, m_ref, l_ref, *, tq, g, d, bs, s_total,
                    scale, softcap, window, alibi=0.0, n_heads=0):
    ksc = ks_ref[0, 0, 0, :]
    vsc = vs_ref[0, 0, 0, :]
    k = _unpack_kv4(k_ref[0, 0, :, :])
    v = _unpack_kv4(v_ref[0, 0, :, :])
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    _flash_inner(pos_ref[0, 0, :], q, k, v, acc_ref, m_ref, l_ref, out_ref,
                 tq=tq, g=g, d=d, bs=bs, s_total=s_total, scale=scale,
                 softcap=softcap, window=window, sink_ref=sink_ref,
                 alibi=alibi, n_heads=n_heads, k_colscale=ksc, v_colscale=vsc)


def _q4hp_kv(k_ref, v_ref, h):
    """Head-pair nibble extract at FULL lane width: the [BS, D] u8 tile
    holds TWO heads' packed elements; head h reads nibble h&1. 2 i32 ops
    + one convert per element — vs the halves layout's 4 shifts at half
    lane occupancy plus a lane-concat relayout (the round-3 q4 tax)."""
    shift = (h & 1) * 4
    k = ((k_ref[0, 0, :, :].astype(jnp.int32) >> shift) & 15
         ).astype(jnp.float32)
    v = ((v_ref[0, 0, :, :].astype(jnp.int32) >> shift) & 15
         ).astype(jnp.float32)
    return k, v


def _kernel_q4hp(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref,
                 acc_ref, m_ref, l_ref, *, tq, g, d, bs, s_total, scale,
                 softcap, window, alibi=0.0, n_heads=0):
    ksc = ks_ref[0, 0, 0, :]                                 # [BS] f32
    vsc = vs_ref[0, 0, 0, :]
    k, v = _q4hp_kv(k_ref, v_ref, pl.program_id(1))
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    _flash_inner(pos_ref[0, 0, :], q, k, v, acc_ref, m_ref, l_ref, out_ref,
                 tq=tq, g=g, d=d, bs=bs, s_total=s_total, scale=scale,
                 softcap=softcap, window=window, alibi=alibi,
                 n_heads=n_heads, k_colscale=ksc, v_colscale=vsc,
                 kv_bias=8.0)


def _kernel_q4hp_sink(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                      sink_ref, out_ref, acc_ref, m_ref, l_ref, *, tq, g, d,
                      bs, s_total, scale, softcap, window, alibi=0.0,
                      n_heads=0):
    ksc = ks_ref[0, 0, 0, :]
    vsc = vs_ref[0, 0, 0, :]
    k, v = _q4hp_kv(k_ref, v_ref, pl.program_id(1))
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    _flash_inner(pos_ref[0, 0, :], q, k, v, acc_ref, m_ref, l_ref, out_ref,
                 tq=tq, g=g, d=d, bs=bs, s_total=s_total, scale=scale,
                 softcap=softcap, window=window, sink_ref=sink_ref,
                 alibi=alibi, n_heads=n_heads, k_colscale=ksc,
                 v_colscale=vsc, kv_bias=8.0)


def _kernel_q8_sink(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, sink_ref,
                    out_ref, acc_ref, m_ref, l_ref, *, tq, g, d, bs, s_total,
                    scale, softcap, window, alibi=0.0, n_heads=0):
    ksc = ks_ref[0, 0, 0, :]
    vsc = vs_ref[0, 0, 0, :]
    k = k_ref[0, 0, :, :].astype(jnp.float32)
    v = v_ref[0, 0, :, :].astype(jnp.float32)
    q = q_ref[0, 0, :, :, :].reshape(tq * g, d).astype(jnp.float32)
    _flash_inner(pos_ref[0, 0, :], q, k, v, acc_ref, m_ref, l_ref, out_ref,
                 tq=tq, g=g, d=d, bs=bs, s_total=s_total, scale=scale,
                 softcap=softcap, window=window, sink_ref=sink_ref,
                 alibi=alibi, n_heads=n_heads, k_colscale=ksc, v_colscale=vsc)


def _pick_bs(s: int, limit: int = 1024) -> int:
    """Largest divisor of S that's a multiple of 128 and <= limit."""
    best = 0
    dcur = 128
    while dcur <= min(s, limit):
        if s % dcur == 0:
            best = dcur
        dcur += 128
    return best or s


def _common(q, positions, hkv, s, tq):
    b, t, h, d = q.shape
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
    return q5, pos3, b, t, t_pad, g, d, tq


def _scratch(tq, g, d):
    return [
        pltpu.VMEM((tq * g, d), jnp.float32),
        pltpu.VMEM((tq * g, 1), jnp.float32),
        pltpu.VMEM((tq * g, 1), jnp.float32),
    ]


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "tq", "interpret", "window",
                              "alibi")
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
    sinks=None,              # [H] per-head attention-sink logits (gpt-oss)
    alibi: float = 0.0,      # f_max_alibi_bias (0 = off)
) -> jnp.ndarray:
    hkv, s = k_cache.shape[1], k_cache.shape[2]
    q5, pos3, b, t, t_pad, g, d, tq = _common(q, positions, hkv, s, tq)
    bs = _pick_bs(s)
    grid = (b, hkv, t_pad // tq, s // bs)
    in_specs = [
        pl.BlockSpec((1, 1, tq), lambda b, h, i, si: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq, g, d), lambda b, h, i, si: (b, h, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bs, d), lambda b, h, i, si: (b, h, si, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bs, d), lambda b, h, i, si: (b, h, si, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [pos3, q5, k_cache, v_cache]
    kern = _kernel
    if sinks is not None:
        kern = _kernel_sink
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(sinks, jnp.float32).reshape(hkv, g))
    out = pl.pallas_call(
        functools.partial(
            kern, tq=tq, g=g, d=d, bs=bs, s_total=s, scale=scale,
            softcap=softcap, window=window, alibi=alibi,
            n_heads=q.shape[2],
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tq, g, d),
                               lambda b, h, i, si: (b, h, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t_pad, g, d), q.dtype),
        scratch_shapes=_scratch(tq, g, d),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t_pad, q.shape[2], d)[:, :t]


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "tq", "interpret", "window",
                              "alibi")
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
    sinks=None,              # [H] per-head attention-sink logits (gpt-oss)
    alibi: float = 0.0,
) -> jnp.ndarray:
    """Attention over an int8-quantized KV cache; dequantization in VMEM."""
    hkv, s = k_q.shape[1], k_q.shape[2]
    q5, pos3, b, t, t_pad, g, d, tq = _common(q, positions, hkv, s, tq)
    bs = _pick_bs(s)
    grid = (b, hkv, t_pad // tq, s // bs)
    spec_kv = pl.BlockSpec((1, 1, bs, d), lambda b, h, i, si: (b, h, si, 0),
                           memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((1, 1, 1, bs), lambda b, h, i, si: (b, h, 0, si),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, tq), lambda b, h, i, si: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq, g, d), lambda b, h, i, si: (b, h, i, 0, 0),
                     memory_space=pltpu.VMEM),
        spec_kv, spec_sc, spec_kv, spec_sc,
    ]
    args = [pos3, q5, k_q, k_s, v_q, v_s]
    kern = _kernel_q8
    if sinks is not None:
        kern = _kernel_q8_sink
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(sinks, jnp.float32).reshape(hkv, g))
    out = pl.pallas_call(
        functools.partial(
            kern, tq=tq, g=g, d=d, bs=bs, s_total=s, scale=scale,
            softcap=softcap, window=window, alibi=alibi,
            n_heads=q.shape[2],
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tq, g, d),
                               lambda b, h, i, si: (b, h, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t_pad, g, d), q.dtype),
        scratch_shapes=_scratch(tq, g, d),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t_pad, q.shape[2], d)[:, :t]


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "tq", "interpret", "window",
                              "alibi")
)
def flash_attention_q4(
    q: jnp.ndarray,          # [B, T, H, D]
    k_q: jnp.ndarray,        # uint8 [B, Hkv, S, D/2] (kv_codec halves pack)
    k_s: jnp.ndarray,        # f32 [B, Hkv, 1, S]
    v_q: jnp.ndarray,
    v_s: jnp.ndarray,
    positions: jnp.ndarray,  # [B, T] int32
    scale: float,
    softcap: float = 0.0,
    tq: int = 0,
    interpret: bool = False,
    window: int = 0,
    sinks=None,
    alibi: float = 0.0,
) -> jnp.ndarray:
    """Attention over a packed-int4 KV cache (Q4_0-class -ctk/-ctv analog);
    nibble unpack + dequantization in VMEM — half the q8 cache's HBM
    traffic at long context."""
    hkv, s = k_q.shape[1], k_q.shape[2]
    q5, pos3, b, t, t_pad, g, d, tq = _common(q, positions, hkv, s, tq)
    dp = k_q.shape[3]                # D/2 packed
    bs = _pick_bs(s)
    grid = (b, hkv, t_pad // tq, s // bs)
    spec_kv = pl.BlockSpec((1, 1, bs, dp), lambda b, h, i, si: (b, h, si, 0),
                           memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((1, 1, 1, bs), lambda b, h, i, si: (b, h, 0, si),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, tq), lambda b, h, i, si: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq, g, d), lambda b, h, i, si: (b, h, i, 0, 0),
                     memory_space=pltpu.VMEM),
        spec_kv, spec_sc, spec_kv, spec_sc,
    ]
    args = [pos3, q5, k_q, k_s, v_q, v_s]
    kern = _kernel_q4
    if sinks is not None:
        kern = _kernel_q4_sink
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(sinks, jnp.float32).reshape(hkv, g))
    out = pl.pallas_call(
        functools.partial(
            kern, tq=tq, g=g, d=d, bs=bs, s_total=s, scale=scale,
            softcap=softcap, window=window, alibi=alibi,
            n_heads=q.shape[2],
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tq, g, d),
                               lambda b, h, i, si: (b, h, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t_pad, g, d), q.dtype),
        scratch_shapes=_scratch(tq, g, d),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t_pad, q.shape[2], d)[:, :t]


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "tq", "interpret", "window",
                              "alibi")
)
def flash_attention_q4hp(
    q: jnp.ndarray,          # [B, T, H, D]
    k_q: jnp.ndarray,        # uint8 [B, Hkv/2, S, D] (head-pair, +8 biased)
    k_s: jnp.ndarray,        # f32 [B, Hkv, 1, S]
    v_q: jnp.ndarray,
    v_s: jnp.ndarray,
    positions: jnp.ndarray,  # [B, T] int32
    scale: float,
    softcap: float = 0.0,
    tq: int = 0,
    interpret: bool = False,
    window: int = 0,
    sinks=None,
    alibi: float = 0.0,
) -> jnp.ndarray:
    """Attention over the head-pair packed-int4 KV cache (kv_codec.pack_hp
    layout): half the q8 cache's HBM traffic AND full-lane decode tiles —
    adjacent kv-head grid steps index the same packed block, so Mosaic's
    pipeline fetches each byte once while both heads decode from it."""
    hkv, s = k_s.shape[1], k_q.shape[2]
    q5, pos3, b, t, t_pad, g, d, tq = _common(q, positions, hkv, s, tq)
    bs = _pick_bs(s)
    grid = (b, hkv, t_pad // tq, s // bs)
    spec_kv = pl.BlockSpec((1, 1, bs, d),
                           lambda b, h, i, si: (b, h // 2, si, 0),
                           memory_space=pltpu.VMEM)
    spec_sc = pl.BlockSpec((1, 1, 1, bs), lambda b, h, i, si: (b, h, 0, si),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, tq), lambda b, h, i, si: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq, g, d), lambda b, h, i, si: (b, h, i, 0, 0),
                     memory_space=pltpu.VMEM),
        spec_kv, spec_sc, spec_kv, spec_sc,
    ]
    args = [pos3, q5, k_q, k_s, v_q, v_s]
    kern = _kernel_q4hp
    if sinks is not None:
        kern = _kernel_q4hp_sink
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(sinks, jnp.float32).reshape(hkv, g))
    out = pl.pallas_call(
        functools.partial(
            kern, tq=tq, g=g, d=d, bs=bs, s_total=s, scale=scale,
            softcap=softcap, window=window, alibi=alibi,
            n_heads=q.shape[2],
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tq, g, d),
                               lambda b, h, i, si: (b, h, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t_pad, g, d), q.dtype),
        scratch_shapes=_scratch(tq, g, d),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t_pad, q.shape[2], d)[:, :t]


def attention_ref(q, k_cache, v_cache, positions, scale, softcap=0.0,
                  window: int = 0, sinks=None, alibi: float = 0.0):
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
        real = jnp.broadcast_to(kv_pos[None, None, :],
                                (b, positions.shape[1], s))
        mask = kv_pos[None, None, :] <= positions[:, :, None]   # [B, T, S]
    if alibi:
        slopes = jnp.asarray(alibi_slopes_np(h, alibi)).reshape(1, hkv, g,
                                                                1, 1)
        dist = (real - positions[:, :, None]).astype(jnp.float32)
        scores = scores + slopes * dist[:, None, None, :, :]
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    m = scores.max(axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    l = e.sum(axis=-1, keepdims=True)
    if sinks is not None:
        sk = jnp.asarray(sinks, jnp.float32).reshape(1, hkv, g, 1, 1)
        l = l + jnp.exp(sk - m)
    probs = e / jnp.maximum(l, 1e-30)
    probs = jnp.where(
        jnp.any(mask[:, None, None, :, :], -1, keepdims=True), probs, 0.0
    )
    ctx = jnp.einsum("bhgts,bhsd->bthgd", probs, vf)
    return ctx.reshape(b, t, h, d).astype(q.dtype)
