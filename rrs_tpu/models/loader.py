"""GGUF -> device weights loader (llama_model_load_from_file analog).

Maps GGUF tensor names (the conventions of llama-arch.cpp tensor-name
templates, e.g. ``blk.{i}.attn_q.weight``) onto the ModelWeights pytree,
dequantizing or repacking per tensor:

  * F16/F32/BF16/Q*_K tensors -> bf16 DenseLinear (transposed to [K, N])
  * TCQ4_K32 tensors          -> TCQ4Linear in the K-major kernel layout,
                                 with per-tensor perms read from
                                 ``tcq4.{name}.perm`` KVs
                                 (src/llama-model.cpp:7129-7196 analog)
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from rrs_tpu.gguf.constants import GGMLType, KEY_TCQ4_REORDER_ENABLED, tcq4_perm_key
from rrs_tpu.gguf.reader import GGUFFile, read_gguf
from rrs_tpu.formats.tile_codec import decode_tcq4_gguf
from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.linear import DenseLinear, TCQ4Linear
from rrs_tpu.models.llama import LayerWeights, ModelWeights


def _norm(g: GGUFFile, name: str, dtype=jnp.bfloat16) -> jnp.ndarray:
    return jnp.asarray(g.tensor(name).astype(np.float32), dtype)


def _linear(
    g: GGUFFile,
    name: str,
    dtype=jnp.bfloat16,
    bias_name: Optional[str] = None,
):
    """Build a Linear from GGUF tensor ``name`` (logical [N, K])."""
    info = g.tensors[name]
    bias = None
    if bias_name and bias_name in g.tensors:
        bias = jnp.asarray(g.tensor(bias_name).astype(np.float32))
    if info.ggml_type == GGMLType.TCQ4_K32:
        perm = g.metadata.get(tcq4_perm_key(name))
        from rrs_tpu import native

        if native.available():
            # fast native tile decode straight to the device layout
            n, k = info.shape
            qs, eff = native.tcq4_decode_tiles(g.tensor_bytes(name), n, k)
            gather = None
            if perm is not None:
                gather = jnp.asarray(np.asarray(perm, np.int64) % 256, jnp.int32)
            return TCQ4Linear(
                qs=jnp.asarray(qs), eff=jnp.asarray(eff), gather=gather, bias=bias
            )
        t = decode_tcq4_gguf(g.tensor_bytes(name), info.shape)
        if perm is not None:
            t.perm = np.asarray(perm, np.int32)
        return TCQ4Linear.from_tensor(t, bias=bias)
    w = g.tensor(name).astype(np.float32)        # [N, K]
    return DenseLinear(w=jnp.asarray(w.T, dtype), bias=bias)


def load_model(path: str | Path, dtype=jnp.bfloat16):
    """Load a GGUF model. Returns (config, weights, metadata)."""
    g = read_gguf(path)
    cfg = ModelConfig.from_gguf(g.metadata)
    if cfg.vocab_size == 0:
        cfg = ModelConfig(**{**cfg.__dict__, "vocab_size": g.tensors["token_embd.weight"].shape[0]})

    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}"
        has_qn = f"{p}.attn_q_norm.weight" in g.tensors
        layers.append(LayerWeights(
            attn_norm=_norm(g, f"{p}.attn_norm.weight", dtype),
            wq=_linear(g, f"{p}.attn_q.weight", dtype, f"{p}.attn_q.bias"),
            wk=_linear(g, f"{p}.attn_k.weight", dtype, f"{p}.attn_k.bias"),
            wv=_linear(g, f"{p}.attn_v.weight", dtype, f"{p}.attn_v.bias"),
            wo=_linear(g, f"{p}.attn_output.weight", dtype),
            q_norm=_norm(g, f"{p}.attn_q_norm.weight", dtype) if has_qn else None,
            k_norm=_norm(g, f"{p}.attn_k_norm.weight", dtype) if has_qn else None,
            ffn_norm=_norm(g, f"{p}.ffn_norm.weight", dtype),
            w_gate=_linear(g, f"{p}.ffn_gate.weight", dtype),
            w_up=_linear(g, f"{p}.ffn_up.weight", dtype),
            w_down=_linear(g, f"{p}.ffn_down.weight", dtype),
        ))

    embed = jnp.asarray(g.tensor("token_embd.weight").astype(np.float32), dtype)
    if "output.weight" in g.tensors:
        lm_head = _linear(g, "output.weight", dtype)
    else:
        lm_head = DenseLinear(w=embed.T)  # tied embeddings

    weights = ModelWeights(
        embed=embed,
        layers=layers,
        final_norm=_norm(g, "output_norm.weight", dtype),
        lm_head=lm_head,
    )
    md = dict(g.metadata)
    g.close()
    return cfg, weights, md


def save_model(
    path: str | Path,
    cfg: ModelConfig,
    tensors: dict[str, tuple],    # name -> (ggml_type, shape, payload|ndarray)
    metadata: dict,
):
    """Write a GGUF model file (llama-model-saver analog); used by the quantizer."""
    from rrs_tpu.gguf.writer import GGUFWriter

    w = GGUFWriter(path)
    for k, v in metadata.items():
        w.add_kv(k, v)
    for name, (ttype, shape, payload) in tensors.items():
        w.add_tensor(name, payload, shape=shape, ggml_type=ttype)
    w.write()
