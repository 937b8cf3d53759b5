"""Quantized KV-cache codecs (the -ctk/-ctv type family, common/arg.cpp:
390-400: here Q8_0-class int8 and Q4_0-class packed int4, both with
per-(head, slot) f32 scales).

Cache representation: a (values, scales) tuple per layer —
  q8: int8  [B, Hkv, S, D]    + f32 [B, Hkv, 1, S]
  q4 head-pair (the fast layout, even Hkv): uint8 [B, Hkv/2, S, D] +
      f32 [B, Hkv, 1, S] — byte (j, s, d) packs head 2j's element in the
      low nibble and head 2j+1's in the high nibble, both biased +8.
      The flash kernel tile keeps the FULL 128-lane D axis and decodes
      with a 2-op shift+mask per head (adjacent grid heads revisit the
      same HBM block, so traffic stays 4 bits/element); the +8 bias
      folds into the score/PV epilogues. The original halves layout
      below produced [BS, D/2] tiles whose 64-lane vregs ran half-empty
      and whose lane-axis concat forced a Mosaic relayout — the
      long-context "q4 tax" (PERF.md round-3 table).
  q4 halves (odd Hkv / MLA fallback): uint8 [B, Hkv, S, D/2] +
      f32 [B, Hkv, 1, S] — byte d packs element d in the low nibble and
      d + D/2 in the high nibble (two's-complement nibbles).
"""

from __future__ import annotations

import jax.numpy as jnp


def kv_qmax(arr) -> float:
    return 7.0 if arr.dtype == jnp.uint8 else 127.0


def quantize_rows(new: jnp.ndarray, qmax: float):
    """new [..., D] f32 -> (int8 values in [-qmax, qmax], scales [...])."""
    amax = jnp.max(jnp.abs(new.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(amax / qmax, 1e-10)
    q = jnp.clip(jnp.rint(new.astype(jnp.float32) / s[..., None]),
                 -qmax, qmax).astype(jnp.int8)
    return q, s


def pack4(q: jnp.ndarray) -> jnp.ndarray:
    """int8 [-7..7] [..., D] -> uint8 [..., D/2] (halves layout)."""
    d = q.shape[-1]
    lo = q[..., : d // 2].astype(jnp.uint8) & 0xF
    hi = (q[..., d // 2:].astype(jnp.uint8) & 0xF) << 4
    return lo | hi


def unpack4(p: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., D/2] -> int32 [-8..7] [..., D] via sign-extending shifts
    (the stable VPU unpack; mask/xor variants hit pathological Mosaic
    schedules — see CLAUDE.md pitfalls)."""
    p32 = p.astype(jnp.int32)
    lo = (p32 << 28) >> 28
    hi = (p32 << 24) >> 28
    return jnp.concatenate([lo, hi], axis=-1)


def pack_hp(q: jnp.ndarray) -> jnp.ndarray:
    """int8 [-7..7] [..., H, S, D] -> biased head-pair uint8
    [..., H/2, S, D] (head 2j low nibble, 2j+1 high; values stored v+8)."""
    b = (q.astype(jnp.int32) + 8).astype(jnp.uint8)
    return b[..., 0::2, :, :] | (b[..., 1::2, :, :] << 4)


def unpack_hp(p: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., H/2, S, D] head-pair -> int32 [-8..7] [..., H, S, D]."""
    u = p.astype(jnp.int32)
    lo = (u & 15) - 8
    hi = (u >> 4) - 8
    st = jnp.stack([lo, hi], axis=-3)                   # [..., H/2, 2, S, D]
    return st.reshape(st.shape[:-4] + (st.shape[-4] * 2,) + st.shape[-2:])


def is_head_pair(arr: jnp.ndarray, sc: jnp.ndarray) -> bool:
    """Layout discriminator for a q4 (values, scales) pair: head-pair
    stores half as many head planes as there are scale heads."""
    return arr.ndim == sc.ndim and arr.shape[-3] * 2 == sc.shape[-3]


def dequantize(arr: jnp.ndarray, sc: jnp.ndarray) -> jnp.ndarray:
    """(values, scales) -> f32 [B, Hkv, S, D]."""
    scs = sc.transpose(0, 1, 3, 2)                      # [B, H, S, 1]
    if arr.dtype == jnp.uint8:
        if is_head_pair(arr, sc):
            return unpack_hp(arr).astype(jnp.float32) * scs
        return unpack4(arr).astype(jnp.float32) * scs
    return arr.astype(jnp.float32) * scs
