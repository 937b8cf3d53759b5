"""Chain-composable samplers (the llama-sampling.cpp analog).

Each sampler is a pure transform on a logits row; chains compose left to
right like llama_sampler_chain (include/llama.h:1297-1454). All math is jnp
so sampling can run on device inside the jitted step (the reference's
"backend sampling" path, llama.h:1012-1035) or on host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplerParams:
    temperature: float = 1.0
    top_k: int = 0                  # 0 = disabled
    top_p: float = 1.0
    min_p: float = 0.0
    typical_p: float = 1.0
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    penalty_last_n: int = 64
    seed: int = 42

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def apply_penalties(
    logits: jnp.ndarray,            # [V]
    recent_counts: jnp.ndarray,     # [V] occurrence counts in the penalty window
    p: SamplerParams,
) -> jnp.ndarray:
    """Repetition/frequency/presence penalties (llama_sampler_penalties)."""
    if p.penalty_repeat == 1.0 and p.penalty_freq == 0.0 and p.penalty_present == 0.0:
        return logits
    present = recent_counts > 0
    if p.penalty_repeat != 1.0:
        pen = jnp.where(logits > 0, logits / p.penalty_repeat, logits * p.penalty_repeat)
        logits = jnp.where(present, pen, logits)
    logits = logits - recent_counts * p.penalty_freq
    logits = logits - present.astype(logits.dtype) * p.penalty_present
    return logits


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep the first)
    cutoff_mask = cum - probs < top_p
    threshold = jnp.min(
        jnp.where(cutoff_mask, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < threshold, NEG_INF, logits)


def apply_min_p(logits: jnp.ndarray, min_p: float) -> jnp.ndarray:
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = jnp.max(probs, axis=-1, keepdims=True) * min_p
    return jnp.where(probs < cutoff, NEG_INF, logits)


def apply_typical(logits: jnp.ndarray, typ_p: float) -> jnp.ndarray:
    """Locally-typical sampling (llama_sampler_typical)."""
    if typ_p >= 1.0:
        return logits
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    entropy = -jnp.sum(probs * log_probs, axis=-1, keepdims=True)
    shifted = jnp.abs(-log_probs - entropy)
    order = jnp.argsort(shifted, axis=-1)
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = cum - probs_sorted < typ_p
    keep = jnp.zeros_like(keep_sorted)
    keep = jnp.put_along_axis(keep, order, keep_sorted, axis=-1, inplace=False)
    return jnp.where(keep, logits, NEG_INF)


def sample(
    logits: jnp.ndarray,            # [B, V] f32
    key: jax.Array,
    p: SamplerParams,
    recent_counts: Optional[jnp.ndarray] = None,   # [B, V]
) -> jnp.ndarray:
    """Apply the sampler chain and draw one token per row. Returns [B] int32."""
    if recent_counts is not None:
        logits = jax.vmap(lambda l, c: apply_penalties(l, c, p))(logits, recent_counts)
    if p.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / max(p.temperature, 1e-6)
    logits = apply_top_k(logits, p.top_k)
    logits = apply_typical(logits, p.typical_p)
    logits = apply_top_p(logits, p.top_p)
    logits = apply_min_p(logits, p.min_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
