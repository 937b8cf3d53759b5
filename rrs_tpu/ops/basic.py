"""Elementwise / normalization / positional ops — plain jnp, fused by XLA.

These correspond to ggml ops RMS_NORM, ROPE, GLU/SWIGLU, SOFT_MAX, SCALE
(ggml/include/ggml.h:474-580). On TPU none of these warrant a hand-written
kernel: XLA fuses them into the surrounding matmuls.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm in f32 accumulation (matches build_norm, llama-graph.cpp)."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dt)


def layer_norm(x: jnp.ndarray, weight=None, bias=None,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm (GGML_OP_NORM / build_norm LLM_NORM path; RWKV uses this
    with bias, and ggml_norm without affine for the wkv group norm)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dt)


def swiglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up


def geglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(gate.dtype) * up


def softcap(x: jnp.ndarray, cap: float) -> jnp.ndarray:
    """Logit soft-capping (Gemma-style tanh cap; ggml GGML_OP_SOFTCAP path)."""
    return jnp.tanh(x / cap) * cap


# ---------------------------------------------------------------------------
# RoPE (GGML_OP_ROPE; ggml rope modes NORM / NEOX, plus llama3 & yarn scaling)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RopeParams:
    head_dim: int
    theta: float = 10000.0
    # rope scaling: none | linear | yarn | llama3
    scaling_type: str = "none"
    scale_factor: float = 1.0
    orig_context: int = 0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    neox: bool = True              # split-half (NEOX) vs interleaved pairs (NORM)
    rot_dim: int = 0               # 0 => full head_dim
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    attn_factor: float = 1.0


def rope_frequencies(p: RopeParams) -> jnp.ndarray:
    """Per-dimension inverse frequencies with scaling applied. [rot_dim//2] f32."""
    rot = p.rot_dim or p.head_dim
    exponents = jnp.arange(0, rot, 2, dtype=jnp.float32) / rot
    inv_freq = 1.0 / (p.theta ** exponents)
    if p.scaling_type == "linear":
        inv_freq = inv_freq / p.scale_factor
    elif p.scaling_type == "llama3":
        # llama 3.1 frequency-dependent NTK scaling (llama.cpp rope_freq_scale
        # llama3 path; HF Llama3RotaryEmbedding semantics)
        low_wavelen = p.orig_context / p.low_freq_factor
        high_wavelen = p.orig_context / p.high_freq_factor
        wavelen = 2.0 * math.pi / inv_freq
        smooth = (p.orig_context / wavelen - p.low_freq_factor) / (
            p.high_freq_factor - p.low_freq_factor
        )
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = jnp.where(
            wavelen > low_wavelen,
            inv_freq / p.scale_factor,
            jnp.where(
                wavelen < high_wavelen,
                inv_freq,
                (1.0 - smooth) * inv_freq / p.scale_factor + smooth * inv_freq,
            ),
        )
        inv_freq = scaled
    elif p.scaling_type == "yarn":
        # YaRN interpolation (ggml_rope_yarn semantics, simplified ramp)
        if p.scale_factor != 1.0 and p.orig_context > 0:
            rot_f = float(rot)
            def find_dim(n_rot_cycles):
                return rot_f * math.log(p.orig_context / (n_rot_cycles * 2 * math.pi)) / (
                    2 * math.log(p.theta))
            low = max(0.0, math.floor(find_dim(p.yarn_beta_fast)))
            high = min(rot_f - 1.0, math.ceil(find_dim(p.yarn_beta_slow)))
            dims = jnp.arange(0, rot, 2, dtype=jnp.float32)
            ramp = jnp.clip((dims / 2 - low) / max(high - low, 1e-3), 0.0, 1.0)
            inv_freq = inv_freq / p.scale_factor * ramp + inv_freq * (1.0 - ramp)
    return inv_freq


def apply_rope(
    x: jnp.ndarray,            # [..., T, n_heads, head_dim]
    positions: jnp.ndarray,    # broadcastable to [..., T]
    p: RopeParams,
    freq_factors=None,         # [rot_dim//2] per-dim divisors (longrope/phi3)
) -> jnp.ndarray:
    dt = x.dtype
    rot = p.rot_dim or p.head_dim
    inv_freq = rope_frequencies(p)
    # mscale for yarn attention scaling
    mscale = p.attn_factor
    if p.scaling_type == "yarn" and p.scale_factor != 1.0:
        mscale = p.attn_factor * (1.0 + 0.1 * math.log(p.scale_factor))
    if freq_factors is not None:
        # LongRoPE (phi3): per-dimension frequency divisors from the
        # rope_factors_{long,short} tensors; attention scaled by
        # sqrt(1 + ln(scale)/ln(orig_ctx)) (ggml_rope_ext freq_factors path)
        inv_freq = inv_freq / freq_factors.astype(jnp.float32)
        if p.orig_context > 0 and p.scale_factor > 1.0:
            mscale = mscale * math.sqrt(
                1.0 + math.log(p.scale_factor) / math.log(p.orig_context))

    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, rot//2]
    return _rotate(x, angles, mscale, rot, p.neox).astype(dt)


def _rotate(x, angles, mscale, rot: int, neox: bool):
    """Apply the rotation given per-(position, freq-dim) angles
    [..., T, rot//2]; x [..., T, H, D]. Returns f32."""
    cos = (jnp.cos(angles) * mscale)[..., None, :]                # [..., T, 1, rot//2]
    sin = (jnp.sin(angles) * mscale)[..., None, :]

    xr = x[..., :rot].astype(jnp.float32)
    if neox:
        x1 = xr[..., : rot // 2]
        x2 = xr[..., rot // 2 :]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    else:
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
    if rot < x.shape[-1]:
        out = jnp.concatenate([out, x[..., rot:].astype(jnp.float32)], axis=-1)
    return out


def apply_mrope(
    x: jnp.ndarray,            # [..., T, n_heads, head_dim]
    positions: jnp.ndarray,    # [..., T, C] int32 multi-channel (t, h, w[, e])
    p: RopeParams,
    sections: tuple,           # per-channel freq-dim counts over rot//2
) -> jnp.ndarray:
    """Multimodal rotary (GGML_ROPE_TYPE_MROPE, ggml_rope_multi; HF Qwen2-VL
    ``apply_multimodal_rotary_pos_emb``): frequency dim j < rot/2 takes its
    angle from the position channel whose section contains j —
    qwen2vl's sections (16, 24, 24) split head_dim 128's 64 freq dims
    into temporal/height/width bands (clip-impl.h QWEN2VL M-RoPE;
    {arch}.rope.dimension_sections). With all channels equal this equals
    apply_rope exactly."""
    dt = x.dtype
    rot = p.rot_dim or p.head_dim
    inv_freq = rope_frequencies(p)
    parts = []
    j = 0
    for c, s in enumerate(sections):
        if s <= 0:
            continue
        pc = positions[..., c].astype(jnp.float32)     # [..., T]
        parts.append(pc[..., None] * inv_freq[j:j + s])
        j += s
    if j != rot // 2:
        raise ValueError(f"rope sections {sections} sum to {j}, "
                         f"need rot/2 = {rot // 2}")
    angles = jnp.concatenate(parts, axis=-1)           # [..., T, rot//2]
    return _rotate(x, angles, p.attn_factor, rot, p.neox).astype(dt)
