"""Tensor/data-parallel sharding plan over a jax Mesh.

TPU-native replacement for the reference's parallelism stack (SURVEY.md §2.7):

  * split-row tensor parallelism (ggml_backend_cuda_split_buffer_type,
    ggml-cuda.cu:778-870)  ->  column/row-parallel weight shards over the
    "tp" mesh axis with explicit psum/all_gather collectives over ICI
  * ggml-rpc TCP transport  ->  jax.distributed + SPMD (no transport code)
  * scheduler batch splitting -> "dp" mesh axis over KV-cache lanes

The step runs under shard_map (Pallas kernels are custom calls, so the
partitioning must be explicit, not GSPMD-inferred). The TCQ4 256-block
structure makes row-parallel splits exact: FWHT blocks, activation-quant
blocks and weight superblocks are all K-block-local, so sharding K at
256-multiples commutes with the whole W4A4 pipeline, and the final psum
matches the reference's single-device epilogue arithmetic.

Plan (per layer):
  wq/wk/wv : column-parallel (shard N = heads)      -> no collective
  wo       : row-parallel   (shard K = heads)       -> psum
  gate/up  : column-parallel (shard N = ffn)        -> no collective
  down     : row-parallel   (shard K = ffn)         -> psum
  KV cache : heads on tp, lanes on dp
  embed    : replicated; lm_head column-parallel    -> all_gather(logits)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models import llama as llama_model
from rrs_tpu.models.linear import (
    DenseLinear, MXFP4Linear, Q8Linear, TCQ4Linear)


def make_mesh(n_devices: int = 0, dp: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    assert n % dp == 0, (n, dp)
    arr = np.asarray(devices).reshape(dp, n // dp)
    return Mesh(arr, ("dp", "tp"))


def _linear_spec(col: bool) -> object:
    """PartitionSpec pytree for a Linear: col-parallel shards N (axis 1 of the
    K-major arrays), row-parallel shards K (axis 0)."""

    def dense(d: DenseLinear):
        ws = P(None, "tp") if col else P("tp", None)
        bs = None if d.bias is None else (P("tp") if col else P(None))
        return DenseLinear(w=ws, bias=bs)

    def quant(q: TCQ4Linear):
        ws = P(None, "tp") if col else P("tp", None)
        return TCQ4Linear(
            qs=ws, eff=ws,
            gather=None if q.gather is None else P("tp"),
            bias=None if q.bias is None else (P("tp") if col else P(None)),
            i8p=None if q.i8p is None else (ws, ws, ws),
        )

    def q8(q: Q8Linear):
        # K-padded Q8 (k_logical set: zero rows appended at the GLOBAL end)
        # cannot row-shard: P("tp") splits the padded K evenly while the
        # activations shard by logical K, misaligning every shard but the
        # first — silent garbage after the psum. Column sharding is fine
        # (each shard pads its local activations identically).
        if not col:
            assert not q.k_logical, (
                "K-padded Q8Linear cannot be row-sharded (K "
                f"{q.k_logical} padded to {q.q.shape[0]}); use a model dim "
                "that is a multiple of 256, or keep this projection dense")
        ws = P(None, "tp") if col else P("tp", None)
        return Q8Linear(
            q=ws, scale=ws,
            bias=None if q.bias is None else (P("tp") if col else P(None)),
            n_logical=q.n_logical,   # meta must match the weight pytree
            k_logical=q.k_logical,
        )

    def mx(q: MXFP4Linear):
        # col shards N (axis 1), row shards K (axis 0). N-padded layers
        # cannot col-shard (pad columns would land mid-shard and the
        # per-shard n_logical slice would cut real outputs).
        if col:
            assert not q.n_logical or q.n_logical == q.qs.shape[1], (
                "N-padded MXFP4Linear cannot be column-sharded")
        ws = P(None, "tp") if col else P("tp", None)
        return MXFP4Linear(
            qs=ws, scale=ws,
            bias=None if q.bias is None else (P("tp") if col else P(None)),
            n_logical=q.n_logical,
        )

    return dense, quant, q8, mx


def _replicated_linear(lin):
    """Fully-replicated PartitionSpec pytree for a Linear (every device
    holds the whole projection)."""
    if lin is None:
        return None
    rep = P(None, None)
    if isinstance(lin, DenseLinear):
        return DenseLinear(w=rep, bias=None if lin.bias is None else P(None))
    if isinstance(lin, Q8Linear):
        return Q8Linear(q=rep, scale=rep,
                        bias=None if lin.bias is None else P(None),
                        n_logical=lin.n_logical, k_logical=lin.k_logical)
    if isinstance(lin, MXFP4Linear):
        return MXFP4Linear(qs=rep, scale=rep,
                           bias=None if lin.bias is None else P(None),
                           n_logical=lin.n_logical)
    return TCQ4Linear(
        qs=rep, eff=rep,
        gather=None if lin.gather is None else P(None),
        bias=None if lin.bias is None else P(None),
        i8p=None if lin.i8p is None else (rep, rep, rep),
    )


def _moe_pspecs(moe, ep_axis: Optional[str]):
    """PartitionSpec pytree for MoEWeights: expert stacks shard E over the
    ``ep_axis`` (None -> replicated experts), dense expert matmul dims follow
    the megatron col->row pairing over tp; packed TCQ4 expert stacks shard
    only E (their inner layout is kernel-owned)."""
    from rrs_tpu.models.moe import MoEWeights

    ep = ep_axis

    def stack3(val, col):           # dense [E, K_in, N] / down [E, F, K_out]
        if val is None:
            return None
        return P(ep, None, "tp") if col else P(ep, "tp", None)

    def qstack(val):
        return None if val is None else P(ep, None, None)

    return MoEWeights(
        quant_kind=moe.quant_kind,   # meta must match the weight pytree
        router=P(None, None),
        gate=stack3(moe.gate, col=True),
        up=stack3(moe.up, col=True),
        down=stack3(moe.down, col=False),
        shared_gate=None if moe.shared_gate is None else P(None, "tp"),
        shared_up=None if moe.shared_up is None else P(None, "tp"),
        shared_down=None if moe.shared_down is None else P("tp", None),
        gate_qs=qstack(moe.gate_qs), gate_eff=qstack(moe.gate_eff),
        up_qs=qstack(moe.up_qs), up_eff=qstack(moe.up_eff),
        down_qs=qstack(moe.down_qs), down_eff=qstack(moe.down_eff),
        probs_bias=None if moe.probs_bias is None else P(None),
        router_bias=None if moe.router_bias is None else P(None),
        # gate/up biases ride the F axis: sharded with the dense stacks'
        # column split, replicated alongside packed (kernel-owned) stacks;
        # down_b stays replicated — moe_ffn adds it AFTER the tp psum
        gate_b=None if moe.gate_b is None else (
            P(ep, "tp") if moe.gate is not None else P(ep, None)),
        up_b=None if moe.up_b is None else (
            P(ep, "tp") if moe.up is not None else P(ep, None)),
        down_b=None if moe.down_b is None else P(ep, None),
    )


def weight_pspecs(weights: llama_model.ModelWeights,
                  ep_axis: Optional[str] = None) -> llama_model.ModelWeights:
    """Build a pytree of PartitionSpecs mirroring the weights pytree."""

    def spec_linear(lin, col: bool):
        if lin is None:
            return None
        dense, quant, q8, mx = _linear_spec(col)
        if isinstance(lin, DenseLinear):
            return dense(lin)
        if isinstance(lin, Q8Linear):
            return q8(lin)
        if isinstance(lin, MXFP4Linear):
            return mx(lin)
        return quant(lin)

    layers = []
    for lw in weights.layers:
        assert lw.wqkv is None and lw.w_gateup is None, (
            "fused projections cannot be TP-sharded; load with fuse=False")
        # MLA (deepseek2): the shared latent projections (wq_a, wkv_a) and
        # their norms are replicated — their outputs feed full-vector RMS
        # norms and the ONE latent cache row every head attends. The
        # per-head pieces shard over tp: wq (=wq_b) column-parallel on
        # heads, wk_b/wv_b [H, ...] on their leading head axis, wo
        # row-parallel (K = H*v). The latent KV cache itself is replicated
        # (1 kv head — nothing to split; see _kv_pspec/make_sharded_step).
        mla = lw.wk_b is not None
        layers.append(llama_model.LayerWeights(
            attn_norm=P(None),
            wq=spec_linear(lw.wq, col=True),
            wk=spec_linear(lw.wk, col=True),
            wv=spec_linear(lw.wv, col=True),
            wo=spec_linear(lw.wo, col=False),
            q_norm=None if lw.q_norm is None else P(None),
            k_norm=None if lw.k_norm is None else P(None),
            ffn_norm=P(None),
            w_gate=spec_linear(lw.w_gate, col=True),
            w_up=spec_linear(lw.w_up, col=True),
            w_down=spec_linear(lw.w_down, col=False),
            moe=None if lw.moe is None else _moe_pspecs(lw.moe, ep_axis),
            attn_post_norm=None if lw.attn_post_norm is None else P(None),
            ffn_post_norm=None if lw.ffn_post_norm is None else P(None),
            attn_sinks=None if lw.attn_sinks is None else P("tp"),
            wq_a=_replicated_linear(lw.wq_a),
            wkv_a=_replicated_linear(lw.wkv_a),
            wk_b=P("tp", None, None) if mla else None,
            wv_b=P("tp", None, None) if mla else None,
        ))
    return llama_model.ModelWeights(
        embed=((P(None, None), P(None, None))
               if isinstance(weights.embed, tuple) else P(None, None)),
        layers=layers,
        final_norm=P(None),
        lm_head=spec_linear(weights.lm_head, col=True),
        rope_factors=None if weights.rope_factors is None else P(None),
    )


def shard_weights(weights, mesh: Mesh):
    """device_put every weight leaf according to the plan.

    A padded-vocab lm_head must not slice per-shard (local widths differ from
    the global logical width); the sharded step slices after the all_gather
    instead, so n_logical is cleared here."""
    if isinstance(weights.lm_head, Q8Linear) and weights.lm_head.n_logical:
        weights = dataclasses.replace(
            weights, lm_head=dataclasses.replace(weights.lm_head, n_logical=0)
        )
    specs = weight_pspecs(weights)
    return jax.tree.map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)),
        weights, specs,
    )


def _local_cfg(cfg: ModelConfig, tp: int) -> ModelConfig:
    assert cfg.n_heads % tp == 0, (
        f"heads {cfg.n_heads} not divisible by tp={tp}")
    assert cfg.n_ff % tp == 0
    if cfg.is_mla:
        # MLA: query heads shard over tp; the ONE latent kv row (and the
        # shared wq_a/wkv_a projections producing it) stays replicated —
        # every shard's heads attend the same [rope | c_kv] cache.
        return dataclasses.replace(
            cfg, n_heads=cfg.n_heads // tp, n_ff=cfg.n_ff // tp,
            tp_axis="tp",
        )
    assert cfg.n_kv_heads % tp == 0, (
        f"kv heads {cfg.n_kv_heads} not divisible by tp={tp}")
    return dataclasses.replace(
        cfg,
        n_heads=cfg.n_heads // tp,
        n_kv_heads=cfg.n_kv_heads // tp,
        n_ff=cfg.n_ff // tp,
        tp_axis="tp",   # row-parallel projections psum over this axis
    )


def make_sharded_step(cfg: ModelConfig, mesh: Mesh):
    """Build the jitted SPMD decode/prefill step over (dp, tp).

    Signature matches InferenceContext._step: (weights, tokens [B, T],
    start_pos [B], k_caches, v_caches) -> (logits, new_k, new_v); B is the
    global lane count (sharded over dp), heads/ffn sharded over tp.
    """
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, tp)

    wspecs = None  # filled per-call; weights structure known only at call time

    def step(weights, tokens, start_pos, k_caches, v_caches):
        b, t = tokens.shape
        s = k_caches[0].shape[2]
        pos = start_pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        slots = pos
        mask_pos = jnp.where(start_pos[:, None] < 0, -1, pos)
        safe_tokens = jnp.maximum(tokens, 0)
        safe_slots = jnp.where(start_pos[:, None] < 0, s - 1,
                               jnp.clip(slots, 0, s - 1))
        logits, nk, nv = llama_model.forward(
            lcfg, weights, safe_tokens, pos, k_caches, v_caches, mask_pos,
            safe_slots,
        )
        # lm_head is column-parallel: gather the vocab shards, then drop
        # any tile padding down to the logical vocab size
        logits = jax.lax.all_gather(logits, "tp", axis=-1, tiled=True)
        logits = logits[..., : cfg.vocab_size]
        return logits, nk, nv

    def make(weights):
        nonlocal wspecs
        wspecs = weight_pspecs(weights)
        # MLA: the single latent kv head is replicated over tp (every
        # shard's heads attend the same latent rows); GQA shards kv heads
        kv_spec = P("dp", None, None, None) if cfg.is_mla \
            else P("dp", "tp", None, None)
        fn = shard_map(
            step,
            mesh=mesh,
            in_specs=(
                wspecs,
                P("dp", None),          # tokens
                P("dp"),                # start_pos
                [kv_spec] * cfg.n_layers,
                [kv_spec] * cfg.n_layers,
            ),
            out_specs=(
                P("dp", None, None),    # logits (vocab gathered)
                [kv_spec] * cfg.n_layers,
                [kv_spec] * cfg.n_layers,
            ),
            check_vma=False,
        )
        return jax.jit(fn)

    return make


def make_sharded_scan(cfg: ModelConfig, mesh: Mesh, n_steps: int):
    """Build the jitted SPMD greedy-decode SCAN over (dp, tp).

    The multi-chip twin of llama_model.decode_scan (what bench.py times on
    one chip): n_steps device-side greedy steps per dispatch, so the
    measured number is the model + collectives, not host dispatch. Used by
    benchmarks/bench_scaling.py to measure scaling efficiency, and by the
    HLO-inspection test that pins the collective schedule (2 psums/layer +
    1 logits all_gather per step, nothing else).

    Returns make(weights) -> jitted (weights, first [B], pos0 [B], kc, vc)
    -> (tokens [B, n_steps], last [B]); B sharded over dp, heads/ffn over tp.
    """
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, tp)

    def scan_fn(weights, first, pos0, k_caches, v_caches):
        fixup = None
        if tp > 1:
            def fixup(logits):
                out = jax.lax.all_gather(logits, "tp", axis=-1, tiled=True)
                return out[..., : cfg.vocab_size]
        toks, last, _, _ = llama_model.decode_scan(
            lcfg, weights, first, pos0, k_caches, v_caches, n_steps,
            logits_fixup=fixup,
        )
        return toks, last

    def make(weights):
        wspecs = weight_pspecs(weights)
        kv_spec = P("dp", None, None, None) if cfg.is_mla \
            else P("dp", "tp", None, None)
        fn = shard_map(
            scan_fn,
            mesh=mesh,
            in_specs=(
                wspecs,
                P("dp"),                # first token
                P("dp"),                # start_pos
                [kv_spec] * cfg.n_layers,
                [kv_spec] * cfg.n_layers,
            ),
            out_specs=(P("dp", None), P("dp")),
            check_vma=False,
        )
        return jax.jit(fn)

    return make
