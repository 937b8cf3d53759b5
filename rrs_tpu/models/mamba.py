"""Mamba-1 architecture (src/models/mamba.cpp + graph-context-mamba.cpp
analog): token embedding -> N x {RMSNorm -> mamba block} -> RMSNorm -> head.

A mamba block (build_mamba_layer, graph-context-mamba.cpp:5-145):
    xz = in_proj(h); x, z = split(xz)
    x  = silu(depthwise_conv1d(x, conv_state))       # GGML_OP_SSM_CONV
    dt, B, C = split(x_proj(x))
    dt = dt_proj(dt) + dt_bias
    y, h' = selective_scan(ssm_state, x, dt, A, B, C)  # GGML_OP_SSM_SCAN
    y  = y + x * D
    out = out_proj(silu(z) * y)

The recurrent "memory" is (conv_state [d_conv-1, d_inner],
ssm_state [d_inner, d_state]) per layer per lane — the llama-memory-recurrent
analog lives in rrs_tpu.runtime.recurrent.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.linear import DenseLinear, linear_apply
from rrs_tpu.ops.basic import rms_norm
from rrs_tpu.ops.ssm import ssm_conv, ssm_scan


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["norm", "w_in", "conv_w", "conv_b", "w_x", "w_dt", "dt_bias",
                 "A", "D", "w_out", "dt_norm", "b_norm", "c_norm"],
    meta_fields=[],
)
@dataclasses.dataclass
class MambaLayer:
    norm: jnp.ndarray
    w_in: Any                       # E -> 2*d_inner
    conv_w: jnp.ndarray             # [d_conv, d_inner]
    conv_b: jnp.ndarray             # [d_inner]
    w_x: Any                        # d_inner -> dt_rank + 2*d_state
    w_dt: Any                       # dt_rank -> d_inner
    dt_bias: jnp.ndarray            # [d_inner]
    A: jnp.ndarray                  # [d_inner, d_state] (negative, from -exp(A_log))
    D: jnp.ndarray                  # [d_inner]
    w_out: Any                      # d_inner -> E
    dt_norm: Optional[jnp.ndarray] = None   # falcon-mamba/jamba RMS norms
    b_norm: Optional[jnp.ndarray] = None
    c_norm: Optional[jnp.ndarray] = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["embed", "layers", "final_norm", "lm_head"],
    meta_fields=[],
)
@dataclasses.dataclass
class MambaWeights:
    embed: jnp.ndarray
    layers: list
    final_norm: jnp.ndarray
    lm_head: Any


def mamba_block(
    cfg: ModelConfig,
    lw: MambaLayer,
    h: jnp.ndarray,              # [B, T, E] (already normed)
    conv_state: jnp.ndarray,     # [B, d_conv-1, d_inner]
    ssm_state: jnp.ndarray,      # [B, d_inner, d_state] f32
):
    di, ds, dtr = cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_dt_rank
    xz = linear_apply(lw.w_in, h)
    x, z = xz[..., :di], xz[..., di:]

    x_conv, new_conv = ssm_conv(x, conv_state, lw.conv_w, lw.conv_b)
    x = jax.nn.silu(x_conv).astype(h.dtype)                    # [B, T, di]

    x_db = linear_apply(lw.w_x, x)
    dt, Bc, Cc = (x_db[..., :dtr], x_db[..., dtr:dtr + ds],
                  x_db[..., dtr + ds:])
    if lw.dt_norm is not None:
        dt = rms_norm(dt, lw.dt_norm, cfg.rms_eps)
        Bc = rms_norm(Bc, lw.b_norm, cfg.rms_eps)
        Cc = rms_norm(Cc, lw.c_norm, cfg.rms_eps)
    dt = linear_apply(lw.w_dt, dt) + lw.dt_bias.astype(jnp.float32)

    y, new_ssm = ssm_scan(ssm_state, x, dt, lw.A, Bc, Cc)
    y = y + x.astype(jnp.float32) * lw.D[None, None, :].astype(jnp.float32)
    y = (jax.nn.silu(z.astype(jnp.float32)) * y).astype(h.dtype)
    out = linear_apply(lw.w_out, y)
    return out, new_conv, new_ssm


def forward(
    cfg: ModelConfig,
    w: MambaWeights,
    tokens: jnp.ndarray,         # [B, T] int32
    conv_states: list,           # L x [B, d_conv-1, d_inner]
    ssm_states: list,            # L x [B, d_inner, d_state] f32
    active: Optional[jnp.ndarray] = None,   # [B] bool; inactive lanes keep state
):
    x = jnp.take(w.embed, jnp.maximum(tokens, 0), axis=0)
    new_conv, new_ssm = [], []
    for li, lw in enumerate(w.layers):
        h = rms_norm(x, lw.norm, cfg.rms_eps)
        out, nc, ns = mamba_block(cfg, lw, h, conv_states[li], ssm_states[li])
        if active is not None:
            nc = jnp.where(active[:, None, None], nc, conv_states[li])
            ns = jnp.where(active[:, None, None], ns, ssm_states[li])
        new_conv.append(nc)
        new_ssm.append(ns)
        x = x + out
    x = rms_norm(x, w.final_norm, cfg.rms_eps)
    logits = linear_apply(w.lm_head, x)
    return logits.astype(jnp.float32), new_conv, new_ssm


def random_weights(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16) -> MambaWeights:
    rng = np.random.default_rng(seed)
    e, di, ds, dtr, dc = (cfg.n_embd, cfg.ssm_d_inner, cfg.ssm_d_state,
                          cfg.ssm_dt_rank, cfg.ssm_d_conv)

    def lin(k, n, scale=0.02):
        return DenseLinear(w=jnp.asarray(
            rng.standard_normal((k, n)) * scale, dtype))

    layers = []
    for _ in range(cfg.n_layers):
        layers.append(MambaLayer(
            norm=jnp.ones((e,), dtype),
            w_in=lin(e, 2 * di),
            conv_w=jnp.asarray(rng.standard_normal((dc, di)) * 0.2, jnp.float32),
            conv_b=jnp.zeros((di,), jnp.float32),
            w_x=lin(di, dtr + 2 * ds),
            w_dt=lin(dtr, di, scale=0.1),
            dt_bias=jnp.asarray(rng.standard_normal((di,)) * 0.1, jnp.float32),
            A=jnp.asarray(-np.exp(rng.standard_normal((di, ds)) * 0.5),
                          jnp.float32),
            D=jnp.ones((di,), jnp.float32),
            w_out=lin(di, e),
        ))
    embed = jnp.asarray(rng.standard_normal((cfg.vocab_size, e)) * 0.02, dtype)
    return MambaWeights(embed=embed, layers=layers,
                        final_norm=jnp.ones((e,), dtype),
                        lm_head=DenseLinear(w=embed.T))
