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
from rrs_tpu.models.linear import DenseLinear, Q8Linear, TCQ4Linear
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
    if info.ggml_type == GGMLType.Q8_0 and len(info.shape) == 2 \
            and info.shape[1] % 32 == 0:
        # K only needs Q8_0-block (32) alignment: from_q8_gguf zero-pads K
        # to the kernel's 256-multiple (gpt-oss E=2880)
        return Q8Linear.from_q8_gguf(g.tensor_bytes(name), info.shape, bias=bias)
    if info.ggml_type == GGMLType.MXFP4 and len(info.shape) == 2 \
            and info.shape[1] % 64 == 0:
        # keep the packed 4.25-bpw payload on device; dequant happens in
        # VMEM inside the matmul kernel (gpt-oss-class models don't fit in
        # HBM dequantized)
        from rrs_tpu.models.linear import MXFP4Linear

        return MXFP4Linear.from_gguf(g.tensor_bytes(name), info.shape,
                                     bias=bias)
    w = g.tensor(name).astype(np.float32)        # [N, K]
    return DenseLinear(w=jnp.asarray(w.T, dtype), bias=bias)


def _load_moe(g: GGUFFile, p: str, dtype=jnp.bfloat16):
    """Build MoEWeights for layer prefix ``p``. Expert stacks arrive either
    dense ([E, N, K] f32/f16) or TCQ4_K32 (concatenated per-expert payloads,
    the mul_mat_id weights) — the latter load straight into the packed
    qs/eff kernel layout with no dequantized copy in host or device memory."""
    from rrs_tpu.models.moe import MoEWeights

    def _shexp(name):
        key = f"{p}.ffn_{name}_shexp.weight"
        if key not in g.tensors:
            return None
        return jnp.asarray(g.tensor(key).astype(np.float32).T, dtype)

    router = jnp.asarray(
        g.tensor(f"{p}.ffn_gate_inp.weight").astype(np.float32).T, dtype)
    shared = dict(shared_gate=_shexp("gate"), shared_up=_shexp("up"),
                  shared_down=_shexp("down"))
    if f"{p}.exp_probs_b.bias" in g.tensors:
        # DeepSeek-V3 expert-selection bias (LLM_TENSOR_FFN_EXP_PROBS_B)
        shared["probs_bias"] = jnp.asarray(
            g.tensor(f"{p}.exp_probs_b.bias").astype(np.float32))
    # gpt-oss per-expert + router biases (llama-model.cpp:6536-6545);
    # GGUF ne {N, E} arrives as numpy [E, N], matching MoEWeights [E, ·]
    if f"{p}.ffn_gate_inp.bias" in g.tensors:
        shared["router_bias"] = jnp.asarray(
            g.tensor(f"{p}.ffn_gate_inp.bias").astype(np.float32))
    for bname, field in (("gate", "gate_b"), ("up", "up_b"),
                         ("down", "down_b")):
        key = f"{p}.ffn_{bname}_exps.bias"
        if key in g.tensors:
            shared[field] = jnp.asarray(g.tensor(key).astype(np.float32))
    mx_ok = all(
        g.tensors[f"{p}.ffn_{n}_exps.weight"].shape[-1] % 64 == 0
        for n in ("gate", "up", "down"))
    if (g.tensors[f"{p}.ffn_gate_exps.weight"].ggml_type == GGMLType.MXFP4
            and mx_ok):
        # gpt-oss native expert format: keep the 4.25-bpw payload packed
        # (dequantized bf16 experts would need ~2x the chip HBM at 20B);
        # the MoE kernels dequantize in VMEM (ops/mxfp4_matmul.py)
        from rrs_tpu.ops.mxfp4_matmul import pack_mxfp4_device

        def mxstack(name):
            info = g.tensors[name]
            raw = g.tensor_bytes(name)
            per = raw.size // info.shape[0]
            qs_l, sc_l = [], []
            for ei in range(info.shape[0]):
                qs, sexp = pack_mxfp4_device(raw[ei * per:(ei + 1) * per],
                                             info.shape[1:])
                qs_l.append(qs)
                sc_l.append(sexp)
            return (jnp.asarray(np.stack(qs_l)),
                    jnp.asarray(np.stack(sc_l)))

        gate_qs, gate_eff = mxstack(f"{p}.ffn_gate_exps.weight")
        up_qs, up_eff = mxstack(f"{p}.ffn_up_exps.weight")
        down_qs, down_eff = mxstack(f"{p}.ffn_down_exps.weight")
        return MoEWeights(router=router, gate=None, up=None, down=None,
                          gate_qs=gate_qs, gate_eff=gate_eff,
                          up_qs=up_qs, up_eff=up_eff,
                          down_qs=down_qs, down_eff=down_eff,
                          quant_kind="mxfp4", **shared)
    if g.tensors[f"{p}.ffn_gate_exps.weight"].ggml_type == GGMLType.TCQ4_K32:
        from rrs_tpu.formats.tcq4 import effective_scales

        def qstack(name):
            info = g.tensors[name]
            raw = g.tensor_bytes(name)
            per = raw.size // info.shape[0]
            qs_l, eff_l = [], []
            for ei in range(info.shape[0]):
                t = decode_tcq4_gguf(raw[ei * per:(ei + 1) * per],
                                     info.shape[1:])
                qs_l.append(np.asarray(t.qs))
                eff_l.append(np.asarray(effective_scales(t), np.float32))
            return (jnp.asarray(np.stack(qs_l)),
                    jnp.asarray(np.stack(eff_l), jnp.bfloat16))

        gate_qs, gate_eff = qstack(f"{p}.ffn_gate_exps.weight")
        up_qs, up_eff = qstack(f"{p}.ffn_up_exps.weight")
        down_qs, down_eff = qstack(f"{p}.ffn_down_exps.weight")
        return MoEWeights(router=router, gate=None, up=None, down=None,
                          gate_qs=gate_qs, gate_eff=gate_eff,
                          up_qs=up_qs, up_eff=up_eff,
                          down_qs=down_qs, down_eff=down_eff, **shared)
    return MoEWeights(
        router=router,
        gate=jnp.asarray(g.tensor(f"{p}.ffn_gate_exps.weight")
                         .astype(np.float32).transpose(0, 2, 1), dtype),
        up=jnp.asarray(g.tensor(f"{p}.ffn_up_exps.weight")
                       .astype(np.float32).transpose(0, 2, 1), dtype),
        down=jnp.asarray(g.tensor(f"{p}.ffn_down_exps.weight")
                         .astype(np.float32).transpose(0, 2, 1), dtype),
        **shared)


def parse_kv_overrides(specs) -> dict:
    """Parse ``--override-kv KEY=TYPE:VALUE`` specs (llama_model_kv_override,
    llama.h:266-277; flag registered in common/arg.cpp). TYPE is one of
    int/float/bool/str; repeatable."""
    out: dict = {}
    for spec in specs or []:
        key, eq, tv = spec.partition("=")
        typ, _, val = tv.partition(":")
        if not key or not eq or typ not in ("int", "float", "bool", "str"):
            raise ValueError(
                f"bad --override-kv {spec!r}; want KEY=TYPE:VALUE with "
                f"TYPE in int/float/bool/str")
        if typ == "int":
            out[key] = int(val)
        elif typ == "float":
            out[key] = float(val)
        elif typ == "bool":
            out[key] = val.strip().lower() in ("1", "true", "yes", "on")
        else:
            out[key] = val
    return out


def load_model(path: str | Path, dtype=jnp.bfloat16, fuse: bool = True,
               overrides: dict | None = None):
    """Load a GGUF model (single file or -NNNNN-of-NNNNN shard set).
    Returns (config, weights, metadata).

    ``fuse=True`` concatenates q|k|v and gate|up projections into single
    kernels (fewer launches, wider tiles); use fuse=False when the weights
    will be tensor-parallel-sharded.

    ``overrides``: metadata KV overrides applied before hparam/vocab
    interpretation (the --override-kv mechanism, llama.h:266-277)."""
    from rrs_tpu.tools.gguf_split import SPLIT_RE, MultiGGUF

    if SPLIT_RE.match(Path(path).name):
        g = MultiGGUF(path)
    else:
        g = read_gguf(path)
    if overrides:
        g.metadata.update(overrides)
    cfg = ModelConfig.from_gguf(g.metadata)
    if cfg.vocab_size == 0:
        cfg = ModelConfig(**{**cfg.__dict__, "vocab_size": g.tensors["token_embd.weight"].shape[0]})

    if cfg.is_hybrid:
        return _load_hybrid(g, cfg, dtype)
    if cfg.rwkv_head_size > 0:
        return _load_rwkv6(g, cfg, dtype)
    if cfg.is_recurrent:
        return _load_mamba(g, cfg, dtype)

    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}"
        has_qn = f"{p}.attn_q_norm.weight" in g.tensors
        is_moe = f"{p}.ffn_gate_inp.weight" in g.tensors
        # GGUF expert tensors: gate/up [E, F, K], down [E, K, F]
        moe = _load_moe(g, p, dtype) if is_moe else None
        if f"{p}.attn_kv_a_mqa.weight" in g.tensors:
            # MLA (deepseek2; llama-model.cpp:4941-4999). q_norm/k_norm carry
            # attn_q_a_norm/attn_kv_a_norm; wq is wq_b (or the full wq for
            # lite models without the q LoRA)
            nope = cfg.qk_nope_dim
            if f"{p}.attn_k_b.weight" in g.tensors:
                # split factors: GGUF ne {nope,r,H} -> numpy [H,r,nope];
                # {r,v,H} -> [H,v,r]; einsum wants [H,nope,r] / [H,r,v]
                wk_b = g.tensor(f"{p}.attn_k_b.weight").astype(
                    np.float32).transpose(0, 2, 1)
                wv_b = g.tensor(f"{p}.attn_v_b.weight").astype(
                    np.float32).transpose(0, 2, 1)
            else:
                # legacy unsplit wkv_b {r, H*(nope+v)} -> [H*(nope+v), r]
                kvb = g.tensor(f"{p}.attn_kv_b.weight").astype(np.float32)
                kvb = kvb.reshape(cfg.n_heads, nope + cfg.v_head_dim, -1)
                wk_b = kvb[:, :nope, :]                       # [H, nope, r]
                wv_b = kvb[:, nope:, :].transpose(0, 2, 1)    # [H, r, v]
            is_lite = f"{p}.attn_q_a.weight" not in g.tensors
            layers.append(LayerWeights(
                attn_norm=_norm(g, f"{p}.attn_norm.weight", dtype),
                wq=_linear(g, f"{p}.attn_q.weight" if is_lite
                           else f"{p}.attn_q_b.weight", dtype),
                wq_a=None if is_lite
                     else _linear(g, f"{p}.attn_q_a.weight", dtype),
                q_norm=None if is_lite
                       else _norm(g, f"{p}.attn_q_a_norm.weight", dtype),
                wkv_a=_linear(g, f"{p}.attn_kv_a_mqa.weight", dtype),
                k_norm=_norm(g, f"{p}.attn_kv_a_norm.weight", dtype),
                wk_b=jnp.asarray(wk_b, dtype),
                wv_b=jnp.asarray(wv_b, dtype),
                wk=None, wv=None,
                wo=_linear(g, f"{p}.attn_output.weight", dtype),
                ffn_norm=_norm(g, f"{p}.ffn_norm.weight", dtype),
                w_gate=None if is_moe else _linear(
                    g, f"{p}.ffn_gate.weight", dtype),
                w_up=None if is_moe else _linear(
                    g, f"{p}.ffn_up.weight", dtype),
                w_down=None if is_moe else _linear(
                    g, f"{p}.ffn_down.weight", dtype),
                moe=moe,
            ))
            continue
        wq = wk = wv = w_gate = w_up = wqkv = w_gateup = None
        if f"{p}.attn_qkv.weight" in g.tensors:
            # phi3-style PRE-fused q|k|v (llama-model.cpp PHI3 wqkv,
            # {n_embd, n_embd + 2*n_embd_gqa}) — loads straight into the
            # fused slot the forward already splits
            wqkv = _linear(g, f"{p}.attn_qkv.weight", dtype,
                           f"{p}.attn_qkv.bias")
        else:
            wq = _linear(g, f"{p}.attn_q.weight", dtype, f"{p}.attn_q.bias")
            wk = _linear(g, f"{p}.attn_k.weight", dtype, f"{p}.attn_k.bias")
            wv = _linear(g, f"{p}.attn_v.weight", dtype, f"{p}.attn_v.bias")
        if not is_moe:
            if f"{p}.ffn_gate.weight" not in g.tensors \
                    and f"{p}.ffn_up.weight" in g.tensors:
                # phi3-style pre-fused gate|up in ffn_up ({n_embd, 2*n_ff},
                # consumed as LLM_FFN_SWIGLU: first half gate, second up)
                w_gateup = _linear(g, f"{p}.ffn_up.weight", dtype)
            else:
                w_gate = _linear(g, f"{p}.ffn_gate.weight", dtype)
                w_up = _linear(g, f"{p}.ffn_up.weight", dtype)
        if fuse:
            from rrs_tpu.models.linear import fuse_linears

            if wqkv is None and type(wq) is type(wk) is type(wv):
                wqkv = fuse_linears([wq, wk, wv])
            if wqkv is not None:
                wq = wk = wv = None
            if w_gateup is None and w_gate is not None \
                    and type(w_gate) is type(w_up):
                w_gateup = fuse_linears([w_gate, w_up])
            if w_gateup is not None:
                w_gate = w_up = None
        # gpt-oss has no ffn_norm tensor: its pre-FFN norm ships under the
        # post_attention_norm name (openai-moe-iswa.cpp applies
        # attn_post_norm at the standard pre-FFN position, not as a
        # gemma-style sandwich norm)
        ffn_norm_name = f"{p}.ffn_norm.weight"
        sandwich = cfg.arch != "gpt-oss"
        if not sandwich and ffn_norm_name not in g.tensors:
            ffn_norm_name = f"{p}.post_attention_norm.weight"
        # olmo2 ships NO pre-norm tensors (post-norm-only graph,
        # llama-arch.cpp LLM_ARCH_OLMO2) — unused ones() placeholders
        # keep the pytree uniform
        ones_e = jnp.ones((cfg.n_embd,), dtype)
        layers.append(LayerWeights(
            attn_norm=(_norm(g, f"{p}.attn_norm.weight", dtype)
                       if f"{p}.attn_norm.weight" in g.tensors else ones_e),
            wq=wq, wk=wk, wv=wv,
            wo=_linear(g, f"{p}.attn_output.weight", dtype,
                       f"{p}.attn_output.bias"),
            q_norm=_norm(g, f"{p}.attn_q_norm.weight", dtype) if has_qn else None,
            k_norm=_norm(g, f"{p}.attn_k_norm.weight", dtype) if has_qn else None,
            ffn_norm=(_norm(g, ffn_norm_name, dtype)
                      if ffn_norm_name in g.tensors else ones_e),
            w_gate=w_gate, w_up=w_up,
            w_down=None if is_moe else _linear(g, f"{p}.ffn_down.weight", dtype),
            moe=moe,
            wqkv=wqkv,
            w_gateup=w_gateup,
            # gemma2/3 sandwich norms (post_attention_norm / post_ffw_norm)
            attn_post_norm=(_norm(g, f"{p}.post_attention_norm.weight", dtype)
                            if sandwich and
                            f"{p}.post_attention_norm.weight" in g.tensors
                            else None),
            ffn_post_norm=(_norm(g, f"{p}.post_ffw_norm.weight", dtype)
                           if f"{p}.post_ffw_norm.weight" in g.tensors
                           else None),
            # per-head attention sinks (gpt-oss; soft_max_ext src[4])
            attn_sinks=(jnp.asarray(
                g.tensor(f"{p}.attn_sinks.weight").astype(np.float32))
                if f"{p}.attn_sinks.weight" in g.tensors else
                (jnp.asarray(g.tensor(f"{p}.attn_sinks").astype(np.float32))
                 if f"{p}.attn_sinks" in g.tensors else None)),
        ))

    emb_info = g.tensors["token_embd.weight"]
    if emb_info.ggml_type == GGMLType.Q8_0 and "output.weight" in g.tensors:
        # keep large Q8_0 embedding tables packed on device (halves their
        # HBM; rows are dequantized at lookup — ggml GET_ROWS-on-quant
        # analog). Tied-head models still dequantize (head needs a matmul).
        from rrs_tpu.formats.kquants import q8_blocks

        q, d = q8_blocks(
            np.ascontiguousarray(g.tensor_bytes("token_embd.weight")),
            emb_info.shape)
        embed = (jnp.asarray(np.ascontiguousarray(q)), jnp.asarray(d))
    else:
        embed = jnp.asarray(
            g.tensor("token_embd.weight").astype(np.float32), dtype)
    if "output.weight" in g.tensors:
        lm_head = _linear(g, "output.weight", dtype)
    else:
        lm_head = DenseLinear(w=embed.T)  # tied embeddings

    # LongRoPE (phi3): per-dim factor tensors; pick long vs short by trained
    # context vs original (the cparams n_ctx choice, made at load here)
    rope_factors = None
    if "rope_factors_long.weight" in g.tensors:
        orig = cfg.rope_orig_context or cfg.context_length
        name = ("rope_factors_long.weight"
                if cfg.context_length > orig else "rope_factors_short.weight")
        rope_factors = jnp.asarray(g.tensor(name).astype(np.float32))

    weights = ModelWeights(
        embed=embed,
        layers=layers,
        final_norm=_norm(g, "output_norm.weight", dtype),
        lm_head=lm_head,
        rope_factors=rope_factors,
    )
    md = dict(g.metadata)
    g.close()
    return cfg, weights, md


def _load_mamba(g, cfg: ModelConfig, dtype):
    """Mamba-family tensor mapping (src/models/mamba.cpp load_tensors names:
    blk.N.{ssm_in,ssm_conv1d,ssm_x,ssm_dt,ssm_a,ssm_d,ssm_out,attn_norm})."""
    from rrs_tpu.models.mamba import MambaLayer, MambaWeights

    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}"

        def t32(name):
            return g.tensor(f"{p}.{name}").astype(np.float32)

        conv_w = t32("ssm_conv1d.weight")          # [d_inner, d_conv]
        layers.append(MambaLayer(
            norm=_norm(g, f"{p}.attn_norm.weight", dtype),
            w_in=_linear(g, f"{p}.ssm_in.weight", dtype),
            conv_w=jnp.asarray(conv_w.T),          # -> [d_conv, d_inner]
            conv_b=jnp.asarray(t32("ssm_conv1d.bias")),
            w_x=_linear(g, f"{p}.ssm_x.weight", dtype),
            w_dt=_linear(g, f"{p}.ssm_dt.weight", dtype),
            dt_bias=jnp.asarray(t32("ssm_dt.bias")),
            A=jnp.asarray(t32("ssm_a.weight")
                          if f"{p}.ssm_a.weight" in g.tensors
                          else t32("ssm_a")),
            D=jnp.asarray(t32("ssm_d.weight")
                          if f"{p}.ssm_d.weight" in g.tensors
                          else t32("ssm_d")),
            w_out=_linear(g, f"{p}.ssm_out.weight", dtype),
            dt_norm=(_norm(g, f"{p}.ssm_dt_norm.weight", dtype)
                     if f"{p}.ssm_dt_norm.weight" in g.tensors else None),
            b_norm=(_norm(g, f"{p}.ssm_b_norm.weight", dtype)
                    if f"{p}.ssm_b_norm.weight" in g.tensors else None),
            c_norm=(_norm(g, f"{p}.ssm_c_norm.weight", dtype)
                    if f"{p}.ssm_c_norm.weight" in g.tensors else None),
        ))
    embed = jnp.asarray(g.tensor("token_embd.weight").astype(np.float32), dtype)
    if "output.weight" in g.tensors:
        lm_head = _linear(g, "output.weight", dtype)
    else:
        lm_head = DenseLinear(w=embed.T)
    weights = MambaWeights(
        embed=embed, layers=layers,
        final_norm=_norm(g, "output_norm.weight", dtype),
        lm_head=lm_head,
    )
    md = dict(g.metadata)
    g.close()
    return cfg, weights, md


def _load_rwkv6(g, cfg: ModelConfig, dtype):
    """RWKV6 tensor mapping (llama-model.cpp rwkv6 load_tensors; ggml ne
    order reversed into numpy shapes)."""
    from rrs_tpu.models.rwkv6 import Rwkv6Layer, Rwkv6Weights

    e = cfg.n_embd

    def t32(name):
        return g.tensor(name).astype(np.float32)

    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}"
        if f"{p}.time_mix_lerp_fused.weight" in g.tensors:
            fused = t32(f"{p}.time_mix_lerp_fused.weight").reshape(5, e)
        else:
            fused = np.stack([
                t32(f"{p}.time_mix_lerp_{n}.weight").reshape(e)
                for n in ("w", "k", "v", "r", "g")])
        layers.append(Rwkv6Layer(
            ln1_w=jnp.asarray(t32(f"{p}.attn_norm.weight")),
            ln1_b=jnp.asarray(t32(f"{p}.attn_norm.bias")),
            ln2_w=jnp.asarray(t32(f"{p}.attn_norm_2.weight")),
            ln2_b=jnp.asarray(t32(f"{p}.attn_norm_2.bias")),
            tm_w1=jnp.asarray(t32(f"{p}.time_mix_w1.weight").T),
            tm_w2=jnp.asarray(
                t32(f"{p}.time_mix_w2.weight").transpose(0, 2, 1)),
            tm_lerp_x=jnp.asarray(
                t32(f"{p}.time_mix_lerp_x.weight").reshape(e)),
            tm_lerp_fused=jnp.asarray(fused),
            tm_first=jnp.asarray(t32(f"{p}.time_mix_first.weight")),
            tm_decay=jnp.asarray(
                t32(f"{p}.time_mix_decay.weight").reshape(e)),
            tm_decay_w1=jnp.asarray(t32(f"{p}.time_mix_decay_w1.weight").T),
            tm_decay_w2=jnp.asarray(t32(f"{p}.time_mix_decay_w2.weight").T),
            w_key=_linear(g, f"{p}.time_mix_key.weight", dtype),
            w_value=_linear(g, f"{p}.time_mix_value.weight", dtype),
            w_recept=_linear(g, f"{p}.time_mix_receptance.weight", dtype),
            w_gate=_linear(g, f"{p}.time_mix_gate.weight", dtype),
            w_out=_linear(g, f"{p}.time_mix_output.weight", dtype),
            tm_ln_w=jnp.asarray(t32(f"{p}.time_mix_ln.weight")),
            tm_ln_b=jnp.asarray(t32(f"{p}.time_mix_ln.bias")),
            cm_lerp_k=jnp.asarray(
                t32(f"{p}.channel_mix_lerp_k.weight").reshape(e)),
            cm_lerp_r=jnp.asarray(
                t32(f"{p}.channel_mix_lerp_r.weight").reshape(e)),
            cm_key=_linear(g, f"{p}.channel_mix_key.weight", dtype),
            cm_value=_linear(g, f"{p}.channel_mix_value.weight", dtype),
            cm_recept=_linear(g, f"{p}.channel_mix_receptance.weight", dtype),
        ))
    embed = jnp.asarray(g.tensor("token_embd.weight").astype(np.float32), dtype)
    if "output.weight" in g.tensors:
        lm_head = _linear(g, "output.weight", dtype)
    else:
        lm_head = DenseLinear(w=embed.T)
    weights = Rwkv6Weights(
        embed=embed,
        tok_norm_w=jnp.asarray(t32("token_embd_norm.weight")),
        tok_norm_b=jnp.asarray(t32("token_embd_norm.bias")),
        layers=layers,
        final_norm_w=jnp.asarray(t32("output_norm.weight")),
        final_norm_b=jnp.asarray(t32("output_norm.bias")),
        lm_head=lm_head,
    )
    md = dict(g.metadata)
    g.close()
    return cfg, weights, md


def _load_hybrid(g, cfg: ModelConfig, dtype):
    """Jamba-style hybrid: per-layer kind detected by tensor presence
    (src/models/jamba.cpp loads ssm_* or wq/wk/wv per layer)."""
    from rrs_tpu.models.hybrid import HybridLayer, HybridWeights
    from rrs_tpu.models.llama import LayerWeights
    from rrs_tpu.models.mamba import MambaLayer

    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}"
        is_ssm = f"{p}.ssm_in.weight" in g.tensors

        def t32(name):
            return g.tensor(f"{p}.{name}").astype(np.float32)

        attn = ssm = None
        if is_ssm:
            conv_w = t32("ssm_conv1d.weight")
            ssm = MambaLayer(
                norm=_norm(g, f"{p}.attn_norm.weight", dtype),
                w_in=_linear(g, f"{p}.ssm_in.weight", dtype),
                conv_w=jnp.asarray(conv_w.T),
                conv_b=jnp.asarray(t32("ssm_conv1d.bias")),
                w_x=_linear(g, f"{p}.ssm_x.weight", dtype),
                w_dt=_linear(g, f"{p}.ssm_dt.weight", dtype),
                dt_bias=jnp.asarray(t32("ssm_dt.bias")),
                A=jnp.asarray(t32("ssm_a")),
                D=jnp.asarray(t32("ssm_d")),
                w_out=_linear(g, f"{p}.ssm_out.weight", dtype),
                dt_norm=(_norm(g, f"{p}.ssm_dt_norm.weight", dtype)
                         if f"{p}.ssm_dt_norm.weight" in g.tensors else None),
                b_norm=(_norm(g, f"{p}.ssm_b_norm.weight", dtype)
                        if f"{p}.ssm_b_norm.weight" in g.tensors else None),
                c_norm=(_norm(g, f"{p}.ssm_c_norm.weight", dtype)
                        if f"{p}.ssm_c_norm.weight" in g.tensors else None),
            )
        else:
            attn = LayerWeights(
                attn_norm=_norm(g, f"{p}.attn_norm.weight", dtype),
                wq=_linear(g, f"{p}.attn_q.weight", dtype),
                wk=_linear(g, f"{p}.attn_k.weight", dtype),
                wv=_linear(g, f"{p}.attn_v.weight", dtype),
                wo=_linear(g, f"{p}.attn_output.weight", dtype),
                q_norm=None, k_norm=None,
                ffn_norm=jnp.ones((cfg.n_embd,), dtype),
                w_gate=None, w_up=None, w_down=None,
            )
        is_moe = f"{p}.ffn_gate_inp.weight" in g.tensors
        moe = _load_moe(g, p, dtype) if is_moe else None
        layers.append(HybridLayer(
            kind="ssm" if is_ssm else "attn",
            attn=attn, ssm=ssm,
            ffn_norm=_norm(g, f"{p}.ffn_norm.weight", dtype),
            w_gate=None if is_moe else _linear(g, f"{p}.ffn_gate.weight", dtype),
            w_up=None if is_moe else _linear(g, f"{p}.ffn_up.weight", dtype),
            w_down=None if is_moe else _linear(g, f"{p}.ffn_down.weight", dtype),
            moe=moe,
        ))
    embed = jnp.asarray(g.tensor("token_embd.weight").astype(np.float32), dtype)
    if "output.weight" in g.tensors:
        lm_head = _linear(g, "output.weight", dtype)
    else:
        lm_head = DenseLinear(w=embed.T)
    weights = HybridWeights(
        embed=embed, layers=layers,
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
