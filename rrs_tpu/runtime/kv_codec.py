"""Quantized KV-cache codecs (the -ctk/-ctv type family, common/arg.cpp:
390-400: here Q8_0-class int8 and Q4_0-class packed int4, both with
per-(head, slot) f32 scales).

Cache representation: a (values, scales) tuple per layer —
  q8: int8  [B, Hkv, S, D]    + f32 [B, Hkv, 1, S]
  q4: uint8 [B, Hkv, S, D/2]  + f32 [B, Hkv, 1, S]   (halves layout:
      byte d packs element d in the low nibble and d + D/2 in the high
      nibble, so appends write whole bytes and the kernel unpack is one
      lane-axis concat of two sign-extending shifts)
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


def dequantize(arr: jnp.ndarray, sc: jnp.ndarray) -> jnp.ndarray:
    """(values, scales) -> f32 [B, Hkv, S, D]."""
    scs = sc.transpose(0, 1, 3, 2)                      # [B, H, S, 1]
    if arr.dtype == jnp.uint8:
        return unpack4(arr).astype(jnp.float32) * scs
    return arr.astype(jnp.float32) * scs
