"""Adapters: LoRA + control vectors (llama-adapter.cpp analog).

LoRA is applied at runtime as a low-rank side path (the reference's
llm_build_lora_mm semantics): y = base(x) + scale * (x @ A) @ B, so it
composes with quantized base weights without requantization. Control vectors
add a per-layer steering vector to the residual stream
(llama_apply_adapter_cvec).

LoRA GGUF convention (convert_lora_to_gguf.py): tensors named
``blk.N.<name>.lora_a`` [r, K] and ``.lora_b`` [N, r], metadata
``adapter.lora.alpha``; effective scale = user_scale * alpha / r.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["base", "a", "b"],
    meta_fields=["scale"],
)
@dataclasses.dataclass
class LoraLinear:
    """base linear + low-rank delta. a: [K, r], b: [r, N]."""

    base: Any
    a: jnp.ndarray
    b: jnp.ndarray
    scale: float = 1.0

    @property
    def shape(self):
        return self.base.shape

    @property
    def bias(self):
        return None


def apply_lora_delta(layer, x2: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """y += scale * (x @ a) @ b (f32 accumulation)."""
    lo = jnp.dot(x2.astype(layer.a.dtype), layer.a,
                 preferred_element_type=jnp.float32)
    delta = jnp.dot(lo.astype(layer.b.dtype), layer.b,
                    preferred_element_type=jnp.float32)
    return y + layer.scale * delta


def load_lora_gguf(path: str | Path, scale: float = 1.0) -> tuple[dict, float]:
    """Read a LoRA adapter GGUF. Returns ({tensor_name: (a [K,r], b [r,N])}, scale)."""
    from rrs_tpu.gguf.reader import read_gguf

    out: dict[str, tuple] = {}
    with read_gguf(path) as g:
        alpha = float(g.metadata.get("adapter.lora.alpha", 0.0) or 0.0)
        names = set()
        for t in g.tensors:
            if t.endswith(".lora_a"):
                names.add(t[: -len(".lora_a")])
        for base_name in names:
            a = g.tensor(f"{base_name}.lora_a").astype(np.float32)  # [r, K]
            b = g.tensor(f"{base_name}.lora_b").astype(np.float32)  # [N, r]
            r = a.shape[0]
            eff = scale * (alpha / r if alpha > 0 else 1.0)
            out[base_name] = (
                jnp.asarray(a.T, jnp.bfloat16),       # [K, r]
                jnp.asarray(b.T, jnp.bfloat16),       # [r, N]
                eff,
            )
    return out, scale


_LORA_FIELD_MAP = {
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up",
    "ffn_down.weight": "w_down",
}


def attach_lora(weights, adapters: dict) -> None:
    """Wrap matching layer linears with LoraLinear (in place on the pytree
    container objects). Requires unfused weights (load_model(fuse=False))."""
    for name, (a, b, eff) in adapters.items():
        parts = name.split(".")
        if parts[0] != "blk":
            continue
        li = int(parts[1])
        field = _LORA_FIELD_MAP.get(".".join(parts[2:]))
        if field is None or li >= len(weights.layers):
            continue
        lw = weights.layers[li]
        base = getattr(lw, field)
        if base is None:
            raise ValueError(
                f"LoRA targets {name} but weights are fused; reload with fuse=False")
        setattr(lw, field, LoraLinear(base=base, a=a, b=b, scale=eff))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vectors"],
    meta_fields=["strength"],
)
@dataclasses.dataclass
class ControlVector:
    """Per-layer steering vectors added to the residual stream."""

    vectors: jnp.ndarray     # [n_layers, n_embd]
    strength: float = 1.0

    def apply(self, x: jnp.ndarray, li: int) -> jnp.ndarray:
        return x + (self.strength * self.vectors[li]).astype(x.dtype)
