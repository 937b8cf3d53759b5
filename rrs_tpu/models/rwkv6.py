"""RWKV6 architecture (src/models/rwkv6.cpp + rwkv6-base.cpp analog).

Per layer (token_shift_count == 2):
  att_norm = LN(x); x_prev = [shift_attn, att_norm[:-1]]
  time-mix: 5-way low-rank lerp (w1/w2) -> xw/xk/xv/xr/xg; r/k/v/g
  projections; per-token decay td = exp(-exp(decay_lora(xw) + decay));
  wkv6 linear attention with bonus tf; per-head group norm (eps 64e-5) +
  time_mix_ln affine; * silu(g); output projection; residual.
  ffn_norm = LN(x); channel-mix: r = sigmoid(R(xr)), k = relu(K(xk))^2,
  out = r * V(k); residual. Optional x *= 0.5 every rescale_every layers.

Recurrent state per layer per lane: token shift [2, E] (last att_norm and
ffn_norm token) and the wkv state [H, D, D].
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
from rrs_tpu.ops.basic import layer_norm
from rrs_tpu.ops.rwkv import wkv6


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ln1_w", "ln1_b", "ln2_w", "ln2_b",
                 "tm_w1", "tm_w2", "tm_lerp_x", "tm_lerp_fused",
                 "tm_first", "tm_decay", "tm_decay_w1", "tm_decay_w2",
                 "w_key", "w_value", "w_recept", "w_gate", "w_out",
                 "tm_ln_w", "tm_ln_b",
                 "cm_lerp_k", "cm_lerp_r", "cm_key", "cm_value", "cm_recept"],
    meta_fields=[],
)
@dataclasses.dataclass
class Rwkv6Layer:
    ln1_w: jnp.ndarray
    ln1_b: jnp.ndarray
    ln2_w: jnp.ndarray
    ln2_b: jnp.ndarray
    tm_w1: jnp.ndarray            # [E, 5*extra]
    tm_w2: jnp.ndarray            # [5, extra, E]
    tm_lerp_x: jnp.ndarray        # [E]
    tm_lerp_fused: jnp.ndarray    # [5, E]
    tm_first: jnp.ndarray         # [H, D] (bonus "u")
    tm_decay: jnp.ndarray         # [E]
    tm_decay_w1: jnp.ndarray      # [E, dec_extra]
    tm_decay_w2: jnp.ndarray      # [dec_extra, E]
    w_key: Any
    w_value: Any
    w_recept: Any
    w_gate: Any
    w_out: Any
    tm_ln_w: jnp.ndarray          # [E]
    tm_ln_b: jnp.ndarray
    cm_lerp_k: jnp.ndarray        # [E]
    cm_lerp_r: jnp.ndarray
    cm_key: Any
    cm_value: Any
    cm_recept: Any


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["embed", "tok_norm_w", "tok_norm_b", "layers",
                 "final_norm_w", "final_norm_b", "lm_head"],
    meta_fields=[],
)
@dataclasses.dataclass
class Rwkv6Weights:
    embed: jnp.ndarray
    tok_norm_w: jnp.ndarray
    tok_norm_b: jnp.ndarray
    layers: list
    final_norm_w: jnp.ndarray
    final_norm_b: jnp.ndarray
    lm_head: Any


def _shifted(x_norm: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """x_prev: [shift, x_norm[:, :-1]] along T (the token-shift concat)."""
    return jnp.concatenate([shift[:, None, :], x_norm[:, :-1, :]], axis=1)


def time_mix(cfg: ModelConfig, lw: Rwkv6Layer, x_norm, x_prev, wkv_state):
    b, t, e = x_norm.shape
    d = cfg.rwkv_head_size
    h = e // d
    sx = (x_prev - x_norm).astype(jnp.float32)
    cur = x_norm.astype(jnp.float32)

    xxx = cur + sx * lw.tm_lerp_x.astype(jnp.float32)
    extra = lw.tm_w1.shape[1] // 5
    low = jnp.tanh(xxx @ lw.tm_w1.astype(jnp.float32))        # [B,T,5*extra]
    low = low.reshape(b, t, 5, extra)
    deltas = jnp.einsum("btfe,fex->btfx", low,
                        lw.tm_w2.astype(jnp.float32))         # [B,T,5,E]
    mixed = cur[:, :, None, :] + sx[:, :, None, :] * (
        deltas + lw.tm_lerp_fused.astype(jnp.float32)[None, None])
    xw, xk, xv, xr, xg = [mixed[:, :, i, :] for i in range(5)]

    r = linear_apply(lw.w_recept, xr).reshape(b, t, h, d)
    k = linear_apply(lw.w_key, xk).reshape(b, t, h, d)
    v = linear_apply(lw.w_value, xv).reshape(b, t, h, d)
    g = jax.nn.silu(linear_apply(lw.w_gate, xg).astype(jnp.float32))

    w = jnp.tanh(xw @ lw.tm_decay_w1.astype(jnp.float32)) \
        @ lw.tm_decay_w2.astype(jnp.float32)
    w = w + lw.tm_decay.astype(jnp.float32)
    td = jnp.exp(-jnp.exp(w)).reshape(b, t, h, d)

    out, new_state = wkv6(k, v, r, lw.tm_first, td, wkv_state)

    # per-head group norm, eps 64e-5 (ggml_norm over head_size), then affine
    out = layer_norm(out, eps=64e-5).reshape(b, t, e)
    out = out * lw.tm_ln_w.astype(jnp.float32) + lw.tm_ln_b.astype(jnp.float32)
    out = out * g
    return linear_apply(lw.w_out, out.astype(x_norm.dtype)), new_state


def channel_mix(lw: Rwkv6Layer, x_norm, x_prev):
    sx = (x_prev - x_norm).astype(jnp.float32)
    cur = x_norm.astype(jnp.float32)
    xk = (cur + sx * lw.cm_lerp_k.astype(jnp.float32)).astype(x_norm.dtype)
    xr = (cur + sx * lw.cm_lerp_r.astype(jnp.float32)).astype(x_norm.dtype)
    r = jax.nn.sigmoid(linear_apply(lw.cm_recept, xr).astype(jnp.float32))
    kk = jax.nn.relu(linear_apply(lw.cm_key, xk).astype(jnp.float32)) ** 2
    return (r * linear_apply(lw.cm_value, kk.astype(x_norm.dtype))
            .astype(jnp.float32)).astype(x_norm.dtype)


def forward(
    cfg: ModelConfig,
    w: Rwkv6Weights,
    tokens: jnp.ndarray,          # [B, T]
    shift_states: list,           # L x [B, 2, E]  (att, ffn last-token norms)
    wkv_states: list,             # L x [B, H, D, D] f32
    active: Optional[jnp.ndarray] = None,
):
    x = jnp.take(w.embed, jnp.maximum(tokens, 0), axis=0)
    x = layer_norm(x, w.tok_norm_w, w.tok_norm_b)
    new_shift, new_wkv = [], []
    for li, lw in enumerate(w.layers):
        att_norm = layer_norm(x, lw.ln1_w, lw.ln1_b)
        x_prev = _shifted(att_norm, shift_states[li][:, 0, :])
        att_out, wkv_new = time_mix(cfg, lw, att_norm, x_prev, wkv_states[li])
        x = x + att_out
        ffn_norm = layer_norm(x, lw.ln2_w, lw.ln2_b)
        x_prev = _shifted(ffn_norm, shift_states[li][:, 1, :])
        x = x + channel_mix(lw, ffn_norm, x_prev)
        shift_new = jnp.stack([att_norm[:, -1, :], ffn_norm[:, -1, :]], axis=1)
        if active is not None:
            shift_new = jnp.where(active[:, None, None], shift_new,
                                  shift_states[li])
            wkv_new = jnp.where(active[:, None, None, None], wkv_new,
                                wkv_states[li])
        new_shift.append(shift_new.astype(shift_states[li].dtype))
        new_wkv.append(wkv_new)
        if cfg.rwkv_rescale_every and (li + 1) % cfg.rwkv_rescale_every == 0:
            x = x * 0.5
    x = layer_norm(x, w.final_norm_w, w.final_norm_b)
    logits = linear_apply(w.lm_head, x)
    return logits.astype(jnp.float32), new_shift, new_wkv


def random_weights(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16) -> Rwkv6Weights:
    rng = np.random.default_rng(seed)
    e = cfg.n_embd
    d = cfg.rwkv_head_size
    h = e // d
    extra, dec_extra = cfg.rwkv_tm_extra, cfg.rwkv_decay_extra

    def lin(k, n, s=0.05):
        return DenseLinear(w=jnp.asarray(rng.standard_normal((k, n)) * s, dtype))

    def vec(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    layers = []
    for _ in range(cfg.n_layers):
        layers.append(Rwkv6Layer(
            ln1_w=jnp.ones((e,), jnp.float32), ln1_b=jnp.zeros((e,), jnp.float32),
            ln2_w=jnp.ones((e,), jnp.float32), ln2_b=jnp.zeros((e,), jnp.float32),
            tm_w1=vec(e, 5 * extra, s=0.02), tm_w2=vec(5, extra, e, s=0.02),
            tm_lerp_x=vec(e), tm_lerp_fused=vec(5, e),
            tm_first=vec(h, d), tm_decay=vec(e),
            tm_decay_w1=vec(e, dec_extra, s=0.02),
            tm_decay_w2=vec(dec_extra, e, s=0.02),
            w_key=lin(e, e), w_value=lin(e, e), w_recept=lin(e, e),
            w_gate=lin(e, e), w_out=lin(e, e),
            tm_ln_w=jnp.ones((e,), jnp.float32),
            tm_ln_b=jnp.zeros((e,), jnp.float32),
            cm_lerp_k=vec(e), cm_lerp_r=vec(e),
            cm_key=lin(e, cfg.n_ff or e), cm_value=lin(cfg.n_ff or e, e),
            cm_recept=lin(e, e),
        ))
    embed = jnp.asarray(rng.standard_normal((cfg.vocab_size, e)) * 0.02, dtype)
    return Rwkv6Weights(
        embed=embed,
        tok_norm_w=jnp.ones((e,), jnp.float32),
        tok_norm_b=jnp.zeros((e,), jnp.float32),
        layers=layers,
        final_norm_w=jnp.ones((e,), jnp.float32),
        final_norm_b=jnp.zeros((e,), jnp.float32),
        lm_head=DenseLinear(w=embed.T),
    )
