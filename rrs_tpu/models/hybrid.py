"""Hybrid (Jamba-style) architecture — llama-memory-hybrid.cpp +
src/models/jamba.cpp analog: each layer is norm -> {mamba block | attention
WITHOUT rope} -> residual -> norm -> {dense FFN | MoE} -> residual.

Attention layers use the KV cache; mamba layers use recurrent conv/ssm
state. Per-layer cache lists hold None for the other kind (pytree-friendly).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import llama as llama_model
from rrs_tpu.models import mamba as mamba_model
from rrs_tpu.ops.basic import rms_norm


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["attn", "ssm", "ffn_norm", "w_gate", "w_up", "w_down", "moe"],
    meta_fields=["kind"],
)
@dataclasses.dataclass
class HybridLayer:
    kind: str                      # "attn" | "ssm"
    attn: Any                      # llama_model.LayerWeights (ffn fields unused)
    ssm: Any                       # mamba_model.MambaLayer (w/o its own ffn)
    ffn_norm: jnp.ndarray
    w_gate: Any
    w_up: Any
    w_down: Any
    moe: Any = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["embed", "layers", "final_norm", "lm_head"],
    meta_fields=[],
)
@dataclasses.dataclass
class HybridWeights:
    embed: jnp.ndarray
    layers: list
    final_norm: jnp.ndarray
    lm_head: Any


def forward(
    cfg: ModelConfig,
    w: HybridWeights,
    tokens: jnp.ndarray,          # [B, T]
    positions: jnp.ndarray,       # [B, T]
    k_caches: list,               # per layer: [B,Hkv,S,D] or None
    v_caches: list,
    conv_states: list,            # per layer: [B,dc-1,di] or None
    ssm_states: list,             # per layer: [B,di,ds] or None
    mask_positions: jnp.ndarray,  # [B, T]
    cache_slots: jnp.ndarray,     # [B, T]
):
    from rrs_tpu.models.linear import linear_apply

    x = jnp.take(w.embed, jnp.maximum(tokens, 0), axis=0)
    active = mask_positions[:, 0] >= 0
    nk, nv, nc, ns = list(k_caches), list(v_caches), list(conv_states), list(ssm_states)
    for li, hl in enumerate(w.layers):
        if hl.kind == "attn":
            h = rms_norm(x, hl.attn.attn_norm, cfg.rms_eps)
            out, nk[li], nv[li] = llama_model.attention(
                cfg, hl.attn, h, positions, k_caches[li], v_caches[li],
                mask_positions, cache_slots, li=li)
        else:
            h = rms_norm(x, hl.ssm.norm, cfg.rms_eps)
            out, c_new, s_new = mamba_model.mamba_block(
                cfg, hl.ssm, h, conv_states[li], ssm_states[li])
            nc[li] = jnp.where(active[:, None, None], c_new, conv_states[li])
            ns[li] = jnp.where(active[:, None, None], s_new, ssm_states[li])
        x = x + out
        h = rms_norm(x, hl.ffn_norm, cfg.rms_eps)
        if hl.moe is not None:
            from rrs_tpu.models.moe import moe_ffn

            f = moe_ffn(cfg, hl.moe, h)
        else:
            gate = linear_apply(hl.w_gate, h)
            up = linear_apply(hl.w_up, h)
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
            f = linear_apply(hl.w_down, act)
        x = x + f
    x = rms_norm(x, w.final_norm, cfg.rms_eps)
    logits = linear_apply(w.lm_head, x)
    return logits.astype(jnp.float32), nk, nv, nc, ns


def random_weights(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16,
                   attn_every: int = 4) -> HybridWeights:
    """Random hybrid weights: layer li is attention iff li % attn_every ==
    attn_every - 1 (Jamba interleaves ~1 attn per 8; tests use denser)."""
    rng = np.random.default_rng(seed)
    from rrs_tpu.models.linear import DenseLinear

    e, f = cfg.n_embd, cfg.n_ff
    di, ds, dtr, dc = (cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_dt_rank,
                       cfg.ssm_d_conv)

    def lin(k, n, scale=0.02):
        return DenseLinear(w=jnp.asarray(rng.standard_normal((k, n)) * scale, dtype))

    layers = []
    for li in range(cfg.n_layers):
        is_attn = li % attn_every == attn_every - 1
        attn = ssm = None
        if is_attn:
            attn = llama_model.LayerWeights(
                attn_norm=jnp.ones((e,), dtype),
                wq=lin(e, cfg.n_q_dim), wk=lin(e, cfg.n_kv_dim),
                wv=lin(e, cfg.n_kv_dim), wo=lin(cfg.n_q_dim, e),
                q_norm=None, k_norm=None,
                ffn_norm=jnp.ones((e,), dtype),
                w_gate=None, w_up=None, w_down=None,
            )
        else:
            ssm = mamba_model.MambaLayer(
                norm=jnp.ones((e,), dtype),
                w_in=lin(e, 2 * di),
                conv_w=jnp.asarray(rng.standard_normal((dc, di)) * 0.2, jnp.float32),
                conv_b=jnp.zeros((di,), jnp.float32),
                w_x=lin(di, dtr + 2 * ds),
                w_dt=lin(dtr, di, scale=0.1),
                dt_bias=jnp.asarray(rng.standard_normal((di,)) * 0.1, jnp.float32),
                A=jnp.asarray(-np.exp(rng.standard_normal((di, ds)) * 0.5), jnp.float32),
                D=jnp.ones((di,), jnp.float32),
                w_out=lin(di, e),
                dt_norm=jnp.ones((dtr,), dtype),
                b_norm=jnp.ones((ds,), dtype),
                c_norm=jnp.ones((ds,), dtype),
            )
        layers.append(HybridLayer(
            kind="attn" if is_attn else "ssm",
            attn=attn, ssm=ssm,
            ffn_norm=jnp.ones((e,), dtype),
            w_gate=lin(e, f), w_up=lin(e, f), w_down=lin(f, e),
        ))
    embed = jnp.asarray(rng.standard_normal((cfg.vocab_size, e)) * 0.02, dtype)
    return HybridWeights(embed=embed, layers=layers,
                         final_norm=jnp.ones((e,), dtype),
                         lm_head=DenseLinear(w=embed.T))
