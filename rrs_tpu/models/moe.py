"""Mixture-of-Experts FFN (build_moe_ffn analog, llama-graph.cpp:999-1250).

Router semantics reproduced: logits = x @ gate -> probs (softmax pre-top-k,
or sigmoid with post-top-k norm for qwen3moe's norm_topk_prob) -> top-k
experts -> weighted sum of expert SwiGLU outputs (ggml_mul_mat_id analog).

TPU-native execution: two strategies selected by token count —
  * decode/small-T: gather the top-k experts' weights per token from HBM
    (traffic ~ topk/E of the full expert set, like the CUDA mmvq-id path)
  * prefill/large-T: dense einsum over all experts with a one-hot combine
    (MXU-friendly; avoids ragged dispatch)
Expert weights are stacked [E, K, N] bf16 (quantized experts arrive in
round 2).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from rrs_tpu.models.config import ModelConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["router", "gate", "up", "down", "shared_gate", "shared_up",
                 "shared_down"],
    meta_fields=[],
)
@dataclasses.dataclass
class MoEWeights:
    router: jnp.ndarray               # [E_dim_in, n_experts] (x @ router)
    gate: jnp.ndarray                 # [E, K, F]
    up: jnp.ndarray                   # [E, K, F]
    down: jnp.ndarray                 # [E, F, K]
    # optional shared expert (qwen2moe-style)
    shared_gate: Optional[jnp.ndarray] = None
    shared_up: Optional[jnp.ndarray] = None
    shared_down: Optional[jnp.ndarray] = None


def route(cfg: ModelConfig, mw: MoEWeights, x2: jnp.ndarray):
    """Router: returns (expert_idx [T, k] int32, weights [T, k] f32)."""
    logits = jnp.dot(x2.astype(jnp.float32), mw.router.astype(jnp.float32))
    if cfg.expert_gating_softmax:
        probs = jax.nn.softmax(logits, axis=-1)
    else:
        probs = jax.nn.sigmoid(logits)
    topv, topi = jax.lax.top_k(probs, cfg.n_experts_used)
    if cfg.norm_topk_prob:
        topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 1e-9)
    return topi.astype(jnp.int32), topv


def moe_ffn(cfg: ModelConfig, mw: MoEWeights, x: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, E] -> [B, T, E]."""
    b, t, e = x.shape
    x2 = x.reshape(b * t, e)
    topi, topv = route(cfg, mw, x2)
    n_tok = b * t

    if n_tok <= 16:
        # gather path: per-token expert weights from HBM
        wg = jnp.take(mw.gate, topi, axis=0)   # [T, k, K, F]
        wu = jnp.take(mw.up, topi, axis=0)
        wd = jnp.take(mw.down, topi, axis=0)   # [T, k, F, K]
        xe = x2[:, None, :]                     # [T, 1, K]
        g = jnp.einsum("tok,tekf->tef", xe, wg, preferred_element_type=jnp.float32)
        u = jnp.einsum("tok,tekf->tef", xe, wu, preferred_element_type=jnp.float32)
        act = jax.nn.silu(g) * u                # [T, k, F]
        out = jnp.einsum("tef,tefk->tek", act.astype(x.dtype), wd,
                         preferred_element_type=jnp.float32)
        out = (out * topv[..., None]).sum(1)
    else:
        # dense path: run all experts, combine with routing weights
        g = jnp.einsum("tk,ekf->tef", x2, mw.gate, preferred_element_type=jnp.float32)
        u = jnp.einsum("tk,ekf->tef", x2, mw.up, preferred_element_type=jnp.float32)
        act = jax.nn.silu(g) * u                # [T, E, F]
        y = jnp.einsum("tef,efk->tek", act.astype(x.dtype), mw.down,
                       preferred_element_type=jnp.float32)   # [T, E, K]
        combine = jnp.zeros((n_tok, cfg.n_experts), jnp.float32)
        combine = jnp.put_along_axis(combine, topi, topv, axis=-1, inplace=False)
        out = jnp.einsum("tek,te->tk", y, combine)

    if mw.shared_gate is not None:
        g = jnp.dot(x2, mw.shared_gate, preferred_element_type=jnp.float32)
        u = jnp.dot(x2, mw.shared_up, preferred_element_type=jnp.float32)
        out = out + jnp.dot(
            (jax.nn.silu(g) * u).astype(x.dtype), mw.shared_down,
            preferred_element_type=jnp.float32,
        )
    return out.reshape(b, t, e).astype(x.dtype)
