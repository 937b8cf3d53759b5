"""Pipeline (layer-split) parallelism over a "pp" mesh axis.

The reference's default multi-GPU mode assigns contiguous layer ranges to
devices and streams activations between them (--split-mode layer,
llama.cpp model splits + ggml_backend_sched graph splitting). The TPU
version is a GPipe-style SPMD schedule: every device holds a [L/pp, ...]
stack of its stage's layer weights, microbatches flow through stages via
``lax.ppermute`` over ICI, and a ``lax.scan`` over M + pp - 1 ticks keeps
all stages busy once the pipeline fills.

Scope: prefill/training-style forward (fresh per-call KV, causal within
the chunk). Pre-norm architectures (llama/qwen/mistral families, incl.
MoE layers); sandwich-norm models (gemma2/3) are rejected — their
per-layer extra norms stack fine but are not wired here yet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rrs_tpu.models import llama as llama_model
from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.linear import linear_apply
from rrs_tpu.models.llama import rms_norm


def make_pp_mesh(n_devices: int = 0, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("pp",))


def stack_layers(layers):
    """list[LayerWeights] -> one pytree with leaves stacked on axis 0.
    Requires homogeneous layers (same fields present, same shapes)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *layers)


def _one_layer(cfg: ModelConfig, lw, x, positions):
    """One pre-norm transformer layer (llama.forward's loop body minus
    sandwich norms / control vectors), with fresh zero KV for the chunk."""
    b, t, _ = x.shape
    kc = jnp.zeros((b, cfg.n_kv_heads, t, cfg.head_dim), jnp.bfloat16)
    vc = jnp.zeros((b, cfg.n_kv_heads, t, cfg.head_dim), jnp.bfloat16)
    h = rms_norm(x, lw.attn_norm, cfg.rms_eps)
    attn_out, _, _ = llama_model.attention(
        cfg, lw, h, positions, kc, vc, positions, positions)
    x = x + attn_out
    h = rms_norm(x, lw.ffn_norm, cfg.rms_eps)
    return x + llama_model.ffn(cfg, lw, h)


def pipeline_forward(cfg: ModelConfig, weights, tokens, positions,
                     mesh: Mesh, n_micro: int = 2):
    """Pipelined prefill forward: [B, T] tokens -> [B, T, V] f32 logits.
    One-shot convenience over :func:`make_pipeline_forward` (which callers
    with many batches should use directly — it compiles once)."""
    b, t = tokens.shape
    fn = make_pipeline_forward(cfg, weights, mesh, b, t, n_micro=n_micro)
    return fn(tokens, positions)


def make_pipeline_forward(cfg: ModelConfig, weights, mesh: Mesh,
                          b: int, t: int, n_micro: int = 2):
    """Build a jitted pipelined prefill step: [B, T] tokens -> [B, T, V]
    f32 logits, compiled once for the given shapes.

    B must divide into n_micro microbatches; cfg.n_layers must divide the
    pp axis. Schedule: M + pp - 1 ticks; at tick t stage s processes
    microbatch (t - s), activations ppermute to stage s+1, the last
    stage's outputs are psum-broadcast so every device returns the full
    logits (callers shard downstream as they wish).
    """
    pp = mesh.shape["pp"]
    n_l = cfg.n_layers
    assert n_l % pp == 0, (n_l, pp)
    for lw in weights.layers:
        assert lw.attn_post_norm is None and lw.ffn_post_norm is None, (
            "sandwich-norm models not supported by the pp schedule yet")
    assert b % n_micro == 0, (b, n_micro)
    bm = b // n_micro

    stacked = stack_layers(weights.layers)
    stacked_specs = jax.tree.map(
        lambda leaf: P("pp", *([None] * (leaf.ndim - 1))), stacked)

    def fwd(stacked_local, embed, final_norm, lm_head, rope_factors,
            tokens, positions):
        stage = jax.lax.axis_index("pp")
        x = llama_model.embed_rows(embed, tokens)
        if cfg.embd_scale != 1.0:
            x = (x.astype(jnp.float32) * cfg.embd_scale).astype(x.dtype)
        xm = x.reshape(n_micro, bm, t, x.shape[-1])
        pm = positions.reshape(n_micro, bm, t)

        def run_stage(h, pos):
            def body(hc, lw):
                return _one_layer(cfg, lw, hc, pos), None
            h, _ = jax.lax.scan(body, h, stacked_local)
            return h

        def tick(carry, ti):
            buf, outs = carry
            x_in = jnp.where(stage == 0, xm[jnp.clip(ti, 0, n_micro - 1)],
                             buf)
            midx = jnp.clip(ti - stage, 0, n_micro - 1)
            h = run_stage(x_in, pm[midx])
            done = ((stage == pp - 1) & (ti - stage >= 0)
                    & (ti - stage < n_micro))
            outs = outs.at[midx].set(jnp.where(done, h, outs[midx]))
            buf = jax.lax.ppermute(
                h, "pp", perm=[(i, (i + 1) % pp) for i in range(pp)])
            return (buf, outs), None

        buf0 = jnp.zeros_like(xm[0])
        outs0 = jnp.zeros_like(xm)
        (_, outs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(n_micro + pp - 1))
        # only the last stage holds real outputs: broadcast over the ring
        outs = jax.lax.psum(
            jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs)), "pp")
        h = rms_norm(outs.reshape(b, t, -1), final_norm, cfg.rms_eps)
        logits = linear_apply(lm_head, h).astype(jnp.float32)
        if cfg.final_softcap > 0:
            logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
        return logits

    rep = lambda leaf: P(*([None] * leaf.ndim))
    fn = shard_map(
        fwd, mesh=mesh,
        in_specs=(
            stacked_specs,
            ((P(None, None), P(None, None))                  # embed
             if isinstance(weights.embed, tuple) else P(None, None)),
            P(None),                                         # final_norm
            jax.tree.map(rep, weights.lm_head),
            None if weights.rope_factors is None else P(None),
            P(None, None),                                   # tokens
            P(None, None),                                   # positions
        ),
        out_specs=P(None, None, None),
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def run(tokens, positions):
        return jitted(stacked, weights.embed, weights.final_norm,
                      weights.lm_head, weights.rope_factors,
                      tokens, positions)

    return run
