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
from rrs_tpu.ops.tcq4_matmul import _round_up


def _capacity_dispatch(nE: int, kk: int, n_tok: int, a, topi, topv,
                       run_experts, dense_fallback):
    """Capacity-based routed MoE dispatch (the GSPMD-era TPU MoE shape):
    sort token-slots by expert, pad each expert's group to a static
    capacity C, run ONE batched all-experts computation over [E, C, K],
    scatter-combine back. Computes only routed tokens (+pad) — ~top_k/E
    of a dense expert sweep. ``run_experts(buf [E, C, K]) -> [E, C, D]``.

    Exactness: if any expert draws more than C slots (data-dependent),
    lax.cond falls back to ``dense_fallback()`` — so skewed routing never
    drops tokens (the classic capacity-overflow failure mode is a
    TRAINING trade-off; an inference engine must be exact)."""
    n_sel = n_tok * kk
    cap = min(_round_up(n_tok, 8), max(64, _round_up(2 * n_sel // nE, 64)))
    ids_flat = topi.reshape(-1)                     # [S]
    counts = jnp.bincount(ids_flat, length=nE)
    order = jnp.argsort(ids_flat, stable=True)
    sorted_ids = ids_flat[order]
    first = jnp.cumsum(counts) - counts             # exclusive prefix
    pos_in_e = (jnp.arange(n_sel, dtype=jnp.int32)
                - jnp.take(first, sorted_ids).astype(jnp.int32))
    valid = pos_in_e < cap
    slot = jnp.where(valid, sorted_ids * cap + pos_in_e, nE * cap)
    tok_of = (order // kk).astype(jnp.int32)

    def capacity_path(_):
        buf = jnp.zeros((nE * cap, a.shape[-1]), a.dtype)
        buf = buf.at[slot].set(jnp.take(a, tok_of, axis=0), mode="drop")
        d = run_experts(buf.reshape(nE, cap, a.shape[-1]))  # [E, C, D]
        vals = jnp.take(d.reshape(nE * cap, d.shape[-1]),
                        jnp.clip(slot, 0, nE * cap - 1), axis=0)
        wts = topv.reshape(-1)[order] * valid
        return jnp.zeros((n_tok, d.shape[-1]), jnp.float32).at[tok_of].add(
            vals * wts[:, None])

    if cap >= n_tok:      # capacity covers the worst case: always exact
        return capacity_path(None)
    return jax.lax.cond(jnp.max(counts) > cap, dense_fallback,
                        capacity_path, None)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["router", "gate", "up", "down", "shared_gate", "shared_up",
                 "shared_down", "gate_qs", "gate_eff", "up_qs", "up_eff",
                 "down_qs", "down_eff", "probs_bias", "router_bias",
                 "gate_b", "up_b", "down_b"],
    meta_fields=["quant_kind"],
)
@dataclasses.dataclass
class MoEWeights:
    router: jnp.ndarray               # [E_dim_in, n_experts] (x @ router)
    gate: jnp.ndarray                 # [E, K, F] bf16 (None when quantized)
    up: jnp.ndarray                   # [E, K, F]
    down: jnp.ndarray                 # [E, F, K]
    # optional shared expert (qwen2moe-style)
    shared_gate: Optional[jnp.ndarray] = None
    shared_up: Optional[jnp.ndarray] = None
    shared_down: Optional[jnp.ndarray] = None
    # TCQ4-quantized experts (W4A4 with RRS rotation, 4.625 bpw): the
    # per-expert analog of TCQ4Linear; used when gate/up/down are None
    gate_qs: Optional[jnp.ndarray] = None     # uint8 [E, K//2, F]
    gate_eff: Optional[jnp.ndarray] = None    # bf16 [E, K//32, F]
    up_qs: Optional[jnp.ndarray] = None
    up_eff: Optional[jnp.ndarray] = None
    down_qs: Optional[jnp.ndarray] = None     # uint8 [E, F//2, K]
    down_eff: Optional[jnp.ndarray] = None
    # DeepSeek-V3 expert-selection bias [n_experts] (exp_probs_b): added to
    # the probs for TOP-K SELECTION only; weights use the unbiased probs
    probs_bias: Optional[jnp.ndarray] = None
    # gpt-oss per-expert biases (ffn_{gate,up,down}_exps_b + router bias,
    # llama-model.cpp:6536-6545; applied via ggml_add_id in build_moe_ffn)
    router_bias: Optional[jnp.ndarray] = None   # [E]
    gate_b: Optional[jnp.ndarray] = None        # [E, F]
    up_b: Optional[jnp.ndarray] = None          # [E, F]
    down_b: Optional[jnp.ndarray] = None        # [E, K]
    # packed-expert codec: "tcq4" (W4A4 + RRS rotation) or "mxfp4"
    # (gpt-oss native e2m1 + E8M0, weights-only — activations stay bf16).
    # For mxfp4 the *_qs/*_eff fields hold the mxfp4 (qs, scale) layout of
    # ops/mxfp4_matmul.py, possibly N-padded to a lane multiple.
    quant_kind: str = "tcq4"

    @property
    def quantized(self) -> bool:
        return self.gate_qs is not None


def quantize_experts(mw: MoEWeights) -> MoEWeights:
    """Quantize stacked bf16 experts to TCQ4 (load-time; the per-expert
    analog of TCQ4Linear.from_tensor). Requires K%256==0 and F%8==0 per the
    tile constraints; raises otherwise (caller falls back to bf16)."""
    import numpy as np

    from rrs_tpu.formats.tcq4 import effective_scales, quantize_tcq4

    def quant_stack(w):
        # w [E, K_in, N_out]; the quantizer takes logical [N, K] = w[e].T;
        # its K-major outputs (qs [K//2, N], eff [K//32, N]) stack to the
        # [E, K_in//2, N_out] layout _dequant_expert expects
        qs_l, eff_l = [], []
        for e in range(w.shape[0]):
            t = quantize_tcq4(np.asarray(w[e], np.float32).T)
            qs_l.append(np.asarray(t.qs))
            eff_l.append(np.asarray(effective_scales(t), np.float32))
        return (jnp.asarray(np.stack(qs_l)),
                jnp.asarray(np.stack(eff_l), jnp.bfloat16))

    gate_qs, gate_eff = quant_stack(mw.gate)
    up_qs, up_eff = quant_stack(mw.up)
    down_qs, down_eff = quant_stack(mw.down)
    return dataclasses.replace(
        mw, gate=None, up=None, down=None,
        gate_qs=gate_qs, gate_eff=gate_eff,
        up_qs=up_qs, up_eff=up_eff,
        down_qs=down_qs, down_eff=down_eff,
    )


def route(cfg: ModelConfig, mw: MoEWeights, x2: jnp.ndarray):
    """Router: returns (expert_idx [T, k] int32, weights [T, k] f32).

    Full build_moe_ffn semantics (llama-graph.cpp:999-1160): softmax or
    sigmoid gating; DeepSeek-V3 selection bias (exp_probs_b added to probs
    for top-k selection only — weights stay unbiased); V3 expert-group
    restriction (keep the top n_group_used groups scored by the sum of each
    group's top-2 selection probs, mask the rest to -inf); post-top-k
    weight normalization (norm_w, clamped denominator) and routed-weight
    scale (expert_weights_scale); gpt-oss SOFTMAX_WEIGHT mode (top-k on
    raw logits, softmax over the selected k only) + router bias."""
    logits = jnp.dot(x2.astype(jnp.float32), mw.router.astype(jnp.float32))
    if mw.router_bias is not None:
        logits = logits + mw.router_bias.astype(jnp.float32)
    if cfg.expert_softmax_weight:
        probs = logits
    elif cfg.expert_gating_softmax:
        probs = jax.nn.softmax(logits, axis=-1)
    else:
        probs = jax.nn.sigmoid(logits)

    sel = probs
    if mw.probs_bias is not None:
        sel = probs + mw.probs_bias.astype(jnp.float32)
    if cfg.n_expert_groups > 1:
        t, e = sel.shape
        ng = cfg.n_expert_groups
        grouped = sel.reshape(t, ng, e // ng)
        top2, _ = jax.lax.top_k(grouped, 2)              # [T, G, 2]
        gscore = top2.sum(-1)                            # [T, G]
        _, gidx = jax.lax.top_k(gscore, max(cfg.n_group_used, 1))
        gmask = jnp.zeros((t, ng), bool).at[
            jnp.arange(t)[:, None], gidx].set(True)
        sel = jnp.where(gmask[:, :, None], grouped,
                        -jnp.inf).reshape(t, e)

    _, topi = jax.lax.top_k(sel, cfg.n_experts_used)
    topv = jnp.take_along_axis(probs, topi, axis=-1)     # unbiased weights
    if cfg.expert_softmax_weight:
        topv = jax.nn.softmax(topv, axis=-1)
    elif cfg.norm_topk_prob or cfg.expert_weights_norm:
        # clamp matches the reference's f16-min floor (llama-graph.cpp:1134)
        topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 6.1035156e-5)
    if cfg.expert_weights_scale != 1.0:
        topv = topv * cfg.expert_weights_scale
    return topi.astype(jnp.int32), topv


def _dequant_expert(qs, eff):
    """[T, k, K//2, F] uint8 (+ eff [T, k, K//32, F]) -> [T, k, K, F] bf16:
    in-graph dequant of gathered TCQ4 expert tiles (the mul_mat_id analog —
    only the top-k experts' bytes are in flight). Within each 256-K
    superblock the low nibbles hold k in [0,128), high in [128,256)."""
    tt, kk, k2, f = qs.shape
    nsb = k2 // 128
    q = qs.astype(jnp.int32).reshape(tt, kk, nsb, 128, f)
    lo = (q << 28) >> 28
    hi = (q << 24) >> 28
    w_q = jnp.concatenate([lo, hi], axis=-2).reshape(
        tt, kk, nsb * 256, f).astype(jnp.float32)
    e32 = jnp.repeat(eff.astype(jnp.float32), 32, axis=-2)
    return (w_q * e32).astype(jnp.bfloat16)


def _moe_act(cfg: ModelConfig, g: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Expert activation. swiglu_oai (gpt-oss): clamp gate above at +limit,
    up to [-limit, limit], then x*sigmoid(alpha*x) * (y+1) with alpha=1.702,
    limit=7.0 (ggml_swiglu_oai, ggml-cpu/ops.cpp:3260-3266)."""
    if cfg.moe_act == "swiglu_oai":
        x = jnp.minimum(g, 7.0)
        y = jnp.clip(u, -7.0, 7.0)
        return x * jax.nn.sigmoid(1.702 * x) * (y + 1.0)
    return jax.nn.silu(g) * u


def _rotate_quant(x2: jnp.ndarray) -> jnp.ndarray:
    """RRS-rotate + int4 quant-dequant of activations (per 256-block)."""
    from rrs_tpu.formats.tcq4 import (dequantize_activations_rrs,
                                      quantize_activations_rrs)
    from rrs_tpu.models.linear import rotate_activations

    rot = rotate_activations(x2, None)
    a_q, a_s = quantize_activations_rrs(rot)
    return dequantize_activations_rrs(a_q, a_s).astype(jnp.bfloat16)


def moe_ffn(cfg: ModelConfig, mw: MoEWeights, x: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, E] -> [B, T, E].

    Under shard_map TP (cfg.tp_axis set), the DENSE expert stacks follow
    the megatron pairing (gate/up column-parallel on F, down row-parallel
    on F), so the routed output is a partial sum that must be psum'd over
    tp — mirroring linear_apply(reduce_axis=...) on the dense FFN path.
    PACKED (quantized) expert stacks are replicated over tp (their tile
    layout is kernel-owned), so every shard already holds the full routed
    output and only the shared-expert megatron pair needs the reduction.
    GSPMD callers (train_step) leave tp_axis unset and let XLA insert the
    collectives instead."""
    b, t, e = x.shape
    x2 = x.reshape(b * t, e)
    topi, topv = route(cfg, mw, x2)
    n_tok = b * t
    # the CPU oracle backend lacks the BF16xBF16=F32 dot thunk; upcast there
    if jax.default_backend() == "cpu" and x2.dtype == jnp.bfloat16:
        x2 = x2.astype(jnp.float32)
        mw = dataclasses.replace(
            mw, **{f: (getattr(mw, f).astype(jnp.float32)
                       if getattr(mw, f) is not None else None)
                   for f in ("gate", "up", "down", "shared_gate",
                             "shared_up", "shared_down")})

    if mw.quantized:
        mx = mw.quant_kind == "mxfp4"
        if mx:
            # MXFP4 is weights-only: bf16 activations, no RRS pipeline
            from rrs_tpu.ops.mxfp4_matmul import (
                dequant_mxfp4_jnp, mxfp4_matmul_experts_rows)

            rows_mm = mxfp4_matmul_experts_rows

            def prep(v):
                return v.astype(jnp.bfloat16)
        else:
            # W4A4 experts, same RRS activation pipeline as TCQ4Linear
            from rrs_tpu.ops.tcq4_matmul import tcq4_matmul_experts_rows

            rows_mm = tcq4_matmul_experts_rows
            prep = _rotate_quant
        fE = cfg.n_ff_exp
        a = prep(x2)                               # [T, K]
        kk = cfg.n_experts_used
        if n_tok <= 16:
            # decode: scalar-prefetch Pallas kernel streams ONLY the selected
            # experts' packed tiles from HBM (the CUDA mmvq-id analog) —
            # traffic ~ topk/E of the expert set, no dequantized weights in HBM
            from rrs_tpu.models.linear import _auto_interpret

            interp = _auto_interpret()
            ids = topi.reshape(-1)                          # [T*kk]
            ar = jnp.repeat(a, kk, axis=0)                  # [T*kk, K]
            g = rows_mm(ar, mw.gate_qs, mw.gate_eff, ids,
                        interpret=interp)[:, :fE]           # mxfp4: drop pad
            u = rows_mm(ar, mw.up_qs, mw.up_eff, ids,
                        interpret=interp)[:, :fE]
            if mw.gate_b is not None:
                g = g + jnp.take(mw.gate_b, ids, axis=0)
                u = u + jnp.take(mw.up_b, ids, axis=0)
            act = _moe_act(cfg, g, u)                       # [T*kk, F] f32
            a2 = prep(act)
            d = rows_mm(a2, mw.down_qs, mw.down_eff, ids,
                        interpret=interp)[:, :e]
            out = (d.reshape(n_tok, kk, e) * topv[..., None]).sum(1)
        elif mx and n_tok <= 64:
            # batched decode (e.g. 32 serving lanes): ONE all-experts
            # kernel per projection — every expert's packed tiles stream
            # exactly once with an (expert, N-block) grid. The rows kernel
            # would re-stream a tile per selected row (n_tok*kk > E rows);
            # the per-expert scan below runs tiny sequential grids.
            from rrs_tpu.models.linear import _auto_interpret
            from rrs_tpu.ops.mxfp4_matmul import mxfp4_matmul_all_experts

            interp = _auto_interpret()
            nE = mw.gate_qs.shape[0]
            combine = jnp.zeros((n_tok, nE), jnp.float32)
            combine = jnp.put_along_axis(combine, topi, topv, axis=-1,
                                         inplace=False)
            g = mxfp4_matmul_all_experts(
                a, mw.gate_qs, mw.gate_eff, interpret=interp)[..., :fE]
            u = mxfp4_matmul_all_experts(
                a, mw.up_qs, mw.up_eff, interpret=interp)[..., :fE]
            if mw.gate_b is not None:
                g = g + mw.gate_b[:, None, :]
                u = u + mw.up_b[:, None, :]
            a2 = prep(_moe_act(cfg, g, u))                  # [E, T, F]
            d = mxfp4_matmul_all_experts(
                a2, mw.down_qs, mw.down_eff, interpret=interp)[..., :e]
            out = jnp.einsum("etk,te->tk", d, combine,
                             preferred_element_type=jnp.float32)
        else:
            # prefill: capacity-based routed dispatch — see
            # _capacity_dispatch. run_experts uses ONE all-experts
            # packed-weight kernel per projection (dequant in VMEM; a jnp
            # dequant would write each 17 MB bf16 expert to HBM and read
            # it back). The exact-for-any-skew fallback is the dense
            # per-expert scan over all tokens.
            from rrs_tpu.models.linear import _auto_interpret
            from rrs_tpu.ops.mxfp4_matmul import (
                mxfp4_matmul, mxfp4_matmul_all_experts)
            from rrs_tpu.ops.tcq4_matmul import (
                tcq4_matmul_all_experts)

            interp = _auto_interpret()
            nE = mw.gate_qs.shape[0]
            gb = (mw.gate_b if mw.gate_b is not None
                  else jnp.zeros((nE, fE), jnp.float32))
            ub = (mw.up_b if mw.up_b is not None
                  else jnp.zeros((nE, fE), jnp.float32))
            all_mm = (mxfp4_matmul_all_experts if mx
                      else tcq4_matmul_all_experts)

            def run_experts(buf):                           # [E, C, K]
                g = all_mm(buf, mw.gate_qs, mw.gate_eff,
                           interpret=interp)[..., :fE] + gb[:, None, :]
                u = all_mm(buf, mw.up_qs, mw.up_eff,
                           interpret=interp)[..., :fE] + ub[:, None, :]
                act = _moe_act(cfg, g, u)                   # [E, C, F]
                nE_, c_ = act.shape[0], act.shape[1]
                a2 = prep(act.reshape(nE_ * c_, -1)).reshape(nE_, c_, -1)
                return all_mm(a2, mw.down_qs, mw.down_eff,
                              interpret=interp)[..., :e]

            def scan_fallback(_):
                combine = jnp.zeros((n_tok, nE), jnp.float32)
                combine = jnp.put_along_axis(combine, topi, topv, axis=-1,
                                             inplace=False)

                def mm(act, qsb, scb):
                    if mx:
                        if interp:
                            return jnp.dot(
                                act.astype(jnp.float32),
                                dequant_mxfp4_jnp(qsb, scb),
                                preferred_element_type=jnp.float32)
                        return mxfp4_matmul(act, qsb, scb)
                    w = _dequant_expert(qsb[None, None],
                                        scb[None, None])[0, 0]
                    return jnp.dot(act, w,
                                   preferred_element_type=jnp.float32)

                def body_sc(acc, ew):
                    gq, ge, uq, ue, dq, de_, cw, gb_e, ub_e = ew
                    g = mm(a, gq, ge)[:, :fE] + gb_e
                    u = mm(a, uq, ue)[:, :fE] + ub_e
                    a2 = prep(_moe_act(cfg, g, u))
                    y = mm(a2, dq, de_)[:, :e]
                    return acc + y * cw[:, None], None

                out, _ = jax.lax.scan(
                    body_sc, jnp.zeros((n_tok, e), jnp.float32),
                    (mw.gate_qs, mw.gate_eff, mw.up_qs, mw.up_eff,
                     mw.down_qs, mw.down_eff, combine.T, gb, ub))
                return out

            out = _capacity_dispatch(nE, kk, n_tok, a, topi, topv,
                                     run_experts, scan_fallback)
    elif n_tok <= 16:
        # gather path: per-token expert weights from HBM
        wg = jnp.take(mw.gate, topi, axis=0)   # [T, k, K, F]
        wu = jnp.take(mw.up, topi, axis=0)
        wd = jnp.take(mw.down, topi, axis=0)   # [T, k, F, K]
        xe = x2[:, None, :]                     # [T, 1, K]
        g = jnp.einsum("tok,tekf->tef", xe, wg, preferred_element_type=jnp.float32)
        u = jnp.einsum("tok,tekf->tef", xe, wu, preferred_element_type=jnp.float32)
        if mw.gate_b is not None:
            g = g + jnp.take(mw.gate_b, topi, axis=0)
            u = u + jnp.take(mw.up_b, topi, axis=0)
        act = _moe_act(cfg, g, u)               # [T, k, F]
        out = jnp.einsum("tef,tefk->tek", act.astype(x.dtype), wd,
                         preferred_element_type=jnp.float32)
        out = (out * topv[..., None]).sum(1)
    else:
        # batched/prefill dense experts: capacity-based routed dispatch
        # (see _capacity_dispatch) — batched per-expert matmuls over
        # [E, C, K] compute only routed tokens (+pad), ~top_k/E of the
        # all-experts einsum, which remains the exact overflow fallback.
        nE = mw.gate.shape[0]

        def run_experts(buf):                   # [E, C, K]
            g = jnp.einsum("eck,ekf->ecf", buf, mw.gate,
                           preferred_element_type=jnp.float32)
            u = jnp.einsum("eck,ekf->ecf", buf, mw.up,
                           preferred_element_type=jnp.float32)
            if mw.gate_b is not None:
                g = g + mw.gate_b[:, None, :]
                u = u + mw.up_b[:, None, :]
            act = _moe_act(cfg, g, u)           # [E, C, F]
            return jnp.einsum("ecf,efk->eck", act.astype(x.dtype), mw.down,
                              preferred_element_type=jnp.float32)

        def dense_fallback(_):
            g = jnp.einsum("tk,ekf->tef", x2, mw.gate,
                           preferred_element_type=jnp.float32)
            u = jnp.einsum("tk,ekf->tef", x2, mw.up,
                           preferred_element_type=jnp.float32)
            if mw.gate_b is not None:
                g = g + mw.gate_b[None]
                u = u + mw.up_b[None]
            act = _moe_act(cfg, g, u)           # [T, E, F]
            y = jnp.einsum("tef,efk->tek", act.astype(x.dtype), mw.down,
                           preferred_element_type=jnp.float32)
            combine = jnp.zeros((n_tok, cfg.n_experts), jnp.float32)
            combine = jnp.put_along_axis(combine, topi, topv, axis=-1,
                                         inplace=False)
            return jnp.einsum("tek,te->tk", y, combine)

        out = _capacity_dispatch(nE, cfg.n_experts_used, n_tok, x2,
                                 topi, topv, run_experts, dense_fallback)

    if cfg.tp_axis is not None and not mw.quantized:
        out = jax.lax.psum(out, cfg.tp_axis)

    if mw.down_b is not None:
        # per-expert down-projection bias (ggml_add_id after the down mm):
        # applied ONCE after the tp reduction — down_b is replicated while
        # the down stacks are row-parallel partial sums
        db = jnp.take(mw.down_b, topi, axis=0)          # [T, k, K]
        out = out + (db * topv[..., None]).sum(1)

    if mw.shared_gate is not None:
        g = jnp.dot(x2, mw.shared_gate, preferred_element_type=jnp.float32)
        u = jnp.dot(x2, mw.shared_up, preferred_element_type=jnp.float32)
        shared = jnp.dot(
            (jax.nn.silu(g) * u).astype(x.dtype), mw.shared_down,
            preferred_element_type=jnp.float32,
        )
        if cfg.tp_axis is not None:
            shared = jax.lax.psum(shared, cfg.tp_axis)
        out = out + shared
    return out.reshape(b, t, e).astype(x.dtype)
