"""Dense llama-family transformer forward (Llama-3, Qwen2.5, Qwen3).

The analog of the per-arch graph builders in src/models/*.cpp (llama.cpp,
qwen2.cpp, qwen3.cpp): RMSNorm -> QKV (+optional per-head q/k norm) -> RoPE ->
GQA attention over the KV cache -> output proj -> RMSNorm -> SwiGLU FFN.

Everything is a jitted pure function over a weights pytree; XLA replaces the
ggml graph builder + backend scheduler + allocator.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.linear import DenseLinear, Q8Linear, TCQ4Linear, linear_apply
from rrs_tpu.ops.basic import RopeParams, apply_rope, rms_norm


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["attn_norm", "wq", "wk", "wv", "wo", "q_norm", "k_norm",
                 "ffn_norm", "w_gate", "w_up", "w_down", "moe", "wqkv",
                 "w_gateup", "attn_post_norm", "ffn_post_norm",
                 "attn_sinks", "wq_a", "wkv_a", "wk_b", "wv_b"],
    meta_fields=[],
)
@dataclasses.dataclass
class LayerWeights:
    attn_norm: jnp.ndarray
    wq: Any                           # MLA non-lite: this is wq_b
    wk: Any
    wv: Any
    wo: Any
    q_norm: Optional[jnp.ndarray]     # MLA: attn_q_a_norm [q_lora_rank]
    k_norm: Optional[jnp.ndarray]     # MLA: attn_kv_a_norm [kv_lora_rank]
    ffn_norm: jnp.ndarray
    w_gate: Any
    w_up: Any
    w_down: Any
    moe: Any = None                   # MoEWeights for MoE layers
    wqkv: Any = None                  # fused q|k|v projection (optional)
    w_gateup: Any = None              # fused gate|up projection (optional)
    attn_post_norm: Any = None        # gemma2/3 sandwich norm after attn out
    ffn_post_norm: Any = None         # gemma2/3 sandwich norm after FFN
    attn_sinks: Any = None            # [H] per-head sink logits (gpt-oss)
    # MLA (deepseek2.cpp): low-rank q projection (wq_a), joint compressed
    # kv + rope-k projection (wkv_a_mqa), and the per-head absorption /
    # decompression factors (wk_b [H, nope, r] bf16, wv_b [H, r, v] bf16)
    wq_a: Any = None
    wkv_a: Any = None
    wk_b: Any = None
    wv_b: Any = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["embed", "layers", "final_norm", "lm_head", "rope_factors"],
    meta_fields=[],
)
@dataclasses.dataclass
class ModelWeights:
    # [vocab, n_embd] bf16, OR a Q8_0-packed (q int8 [V, E],
    # scale [V, E//32]) tuple — rows are gathered packed and dequantized
    # per token (halves the table's HBM; large-vocab models)
    embed: Any
    layers: list[LayerWeights]
    final_norm: jnp.ndarray
    lm_head: Any                  # DenseLinear (possibly tied to embed)
    rope_factors: Any = None      # [rot//2] longrope freq divisors (phi3)


def embed_rows(embed, tokens: jnp.ndarray) -> jnp.ndarray:
    """Token-embedding row gather; handles the Q8-packed table form
    (GET_ROWS-on-quantized analog, ggml-cpu/ops.cpp get_rows paths)."""
    if isinstance(embed, tuple):
        q, s = embed
        rows = jnp.take(q, tokens, axis=0).astype(jnp.bfloat16)   # [B,T,E]
        sc = jnp.take(s, tokens, axis=0).astype(jnp.bfloat16)     # [B,T,E/32]
        b, t, e = rows.shape
        return (rows.reshape(b, t, e // 32, 32)
                * sc[..., None]).reshape(b, t, e)
    return jnp.take(embed, tokens, axis=0)


def rope_params(cfg: ModelConfig, swa: bool = False) -> RopeParams:
    if swa and cfg.rope_theta_swa > 0:
        # SWA layers use their own freq base and no long-context scaling
        # (rope_freq_base_train_swa, gemma3: 10000; llama-model.cpp:1355)
        return RopeParams(
            head_dim=cfg.head_dim,
            theta=cfg.rope_theta_swa,
            neox=cfg.rope_neox,
            rot_dim=cfg.rope_rot_dim,
        )
    return RopeParams(
        head_dim=cfg.head_dim,
        theta=cfg.rope_theta,
        scaling_type=cfg.rope_scaling_type,
        scale_factor=cfg.rope_scale_factor,
        orig_context=cfg.rope_orig_context,
        neox=cfg.rope_neox,
        rot_dim=cfg.rope_rot_dim,
    )


def _capture(cap, li: int, name: str, x: jnp.ndarray):
    """Accumulate per-input-channel sum of squares for imatrix collection
    (IMatrixCollector::collect_imatrix analog, tools/imatrix/imatrix.cpp:219)."""
    if cap is not None:
        k = x.shape[-1]
        x32 = x.reshape(-1, k).astype(jnp.float32)
        cap[f"blk.{li}.{name}"] = (x32 * x32).sum(0)
        cap.setdefault("__counts__", {})[f"blk.{li}.{name}"] = x32.shape[0]


def _store_cache(cache, new, cache_slots, mask_positions, window: int = 0):
    """Write ``new`` [B, Hkv, T, D] into ``cache`` [B, Hkv, S, D] at
    ``cache_slots`` [B, T] (ggml_set_rows analog, llama-graph.cpp:1736-1737).

    Per-lane slots are always a CONTIGUOUS run (pos..pos+T), so the write is
    a per-lane dynamic_update_slice — XLA updates in place. A general
    scatter here costs ~0.25 ms per store on TPU (serialized) and was the
    dominant decode cost. Ring (SWA) caches can wrap mid-chunk during
    prefill; those use a one-hot rewrite instead (the ring is small,
    window + chunk). Caches may be quantized: an (int8/uint8 values, f32
    scales [B,Hkv,1,S]) tuple (cparams.type_k/v analog).

    Padded lanes (mask -1) park their write at the top of the cache: a
    sequence only attends slots it has itself written, and growth into the
    parked region rewrites each slot before the first attend (any
    read-modify-write here would force whole-cache copies instead of XLA's
    in-place dynamic-update-slice)."""
    b, _, t, _ = new.shape
    s_l = (cache[0] if isinstance(cache, tuple) else cache).shape[2]
    slot_mod = cache_slots % s_l                                    # [B, T]
    ring_wrap = window > 0 and t > 1
    active = mask_positions[:, 0] >= 0                              # [B]
    park = jnp.int32(s_l - t)
    start_slot = jnp.where(active, slot_mod[:, 0], park)            # [B]

    def store_arr(c, n):
        if ring_wrap:
            oh = jax.nn.one_hot(slot_mod, s_l, dtype=jnp.float32)   # [B,T,S]
            oh = oh * active[:, None, None].astype(jnp.float32)
            upd = jnp.einsum("bts,bhtx->bhsx", oh,
                             n.astype(jnp.float32)).astype(c.dtype)
            keep = (1.0 - oh.sum(1))[:, None, :, None].astype(c.dtype)
            return c * keep + upd
        n = n.astype(c.dtype)
        for lane in range(b):
            c = jax.lax.dynamic_update_slice(
                c, n[lane : lane + 1], (lane, 0, start_slot[lane], 0))
        return c

    if isinstance(cache, tuple):
        from rrs_tpu.runtime import kv_codec

        arr, sc = cache
        q, s_new = kv_codec.quantize_rows(new, kv_codec.kv_qmax(arr))
        if arr.dtype == jnp.uint8:                      # q4: packed nibbles
            q = kv_codec.pack_hp(q) if kv_codec.is_head_pair(arr, sc) \
                else kv_codec.pack4(q)
        arr = store_arr(arr, q)
        if t == 1 and not ring_wrap:
            # decode: one fused elementwise pass writes the scale into
            # its native [B, Hkv, 1, S] lane layout — the swapaxes ->
            # DUS -> swapaxes round trip cost ~145 us/step at S=8192
            # across 144 stores (benchmarks/profile_kvq4.py round 5)
            oh = (jnp.arange(s_l, dtype=jnp.int32)[None, None, None, :]
                  == start_slot[:, None, None, None]).astype(sc.dtype)
            sc = sc + (s_new[:, :, :1][..., None] - sc) * oh
        else:
            sc = store_arr(sc.swapaxes(2, 3),
                           s_new[..., None]).swapaxes(2, 3)
        return (arr, sc)
    return store_arr(cache, new)


def mla_rope_params(cfg: ModelConfig) -> RopeParams:
    """RoPE params for the MLA rope sub-dimension (q_pe/k_pe, deepseek2.cpp
    :101-107). DeepSeek YaRN does NOT scale cos/sin by the standard YaRN
    mscale — the magnitude correction moves into kq_scale instead
    (deepseek2.cpp:19-29) — so attn_factor cancels apply_rope's
    yarn mscale = attn_factor * (1 + 0.1 ln s)."""
    attn_factor = 1.0
    if cfg.rope_scaling_type == "yarn" and cfg.rope_scale_factor != 1.0:
        attn_factor = 1.0 / (1.0 + 0.1 * np.log(cfg.rope_scale_factor))
    return RopeParams(
        head_dim=cfg.qk_rope_dim,
        theta=cfg.rope_theta,
        scaling_type=cfg.rope_scaling_type,
        scale_factor=cfg.rope_scale_factor,
        orig_context=cfg.rope_orig_context,
        # DEEPSEEK2 is a LLAMA_ROPE_TYPE_NORM arch (llama-model.cpp:8330):
        # interleaved pairs, matching HF's view_as_complex application
        neox=False,
        attn_factor=attn_factor,
    )


def mla_kq_scale(cfg: ModelConfig) -> float:
    """Pre-scaled attention scale: mscale^2 / sqrt(n_embd_head_k) with
    mscale = 1 + 0.1 * rope_yarn_log_mul * ln(s) (deepseek2.cpp:19-29;
    head_dim here is the DECOMPRESSED qk head size, e.g. 192)."""
    mscale = 1.0
    if cfg.rope_scaling_type == "yarn" and cfg.rope_scale_factor != 1.0 \
            and cfg.rope_yarn_log_mul:
        mscale = 1.0 + 0.1 * cfg.rope_yarn_log_mul * np.log(
            cfg.rope_scale_factor)
    return float(mscale * mscale / np.sqrt(cfg.head_dim))


def mla_attention(
    cfg: ModelConfig,
    lw: LayerWeights,
    x: jnp.ndarray,              # [B, T, E]
    positions: jnp.ndarray,      # [B, T] int32
    k_cache,                     # [B, 1, S, rope+r]: [k_pe | c_kv] rows
    v_cache,                     # [B, 1, S, r]: c_kv
    mask_positions: jnp.ndarray,
    cache_slots: jnp.ndarray,
    cap=None,
    li: int = 0,
    rope_factors=None,
):
    """Multi-head latent attention, absorbed-MQA form (deepseek2.cpp:112-150).

    TPU design: instead of decompressing K/V to per-head tensors (MHA form —
    n_head x 192-dim keys in the cache), the per-head nope query is absorbed
    through wk_b into the kv_lora_rank latent space and attention runs as
    MQA over ONE cached [qk_rope | kv_lora_rank] row per position (the rope
    part is stored FIRST so context-shift re-rotation touches a static
    leading slice, mirroring the reference's "rope must go first" cache
    convention). The value readout decompresses AFTER the softmax-weighted
    sum via wv_b — per token that is H x r x v FLOPs on the MXU instead of
    an S-times-larger decompressed V cache in HBM. Attention itself is
    plain jnp (einsum + masked softmax): with a single KV head the score
    tensor is tiny and XLA fuses the chain; the Pallas flash kernel's
    128-lane head-dim tiling would pad 576 -> 640 for no bandwidth win."""
    b, t, _ = x.shape
    H = cfg.n_heads
    rope_d, nope, r = cfg.qk_rope_dim, cfg.qk_nope_dim, cfg.kv_lora_rank
    rp = mla_rope_params(cfg)

    if lw.wq_a is not None:
        _capture(cap, li, "attn_q_a.weight", x)
        ql = rms_norm(linear_apply(lw.wq_a, x), lw.q_norm, cfg.rms_eps)
        _capture(cap, li, "attn_q_b.weight", ql)
        q = linear_apply(lw.wq, ql)
    else:
        _capture(cap, li, "attn_q.weight", x)
        q = linear_apply(lw.wq, x)
    q = q.reshape(b, t, H, nope + rope_d)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    _capture(cap, li, "attn_kv_a_mqa.weight", x)
    kv = linear_apply(lw.wkv_a, x)                       # [B, T, r+rope]
    c_kv, k_pe = kv[..., :r], kv[..., r:]
    c_kv = rms_norm(c_kv, lw.k_norm, cfg.rms_eps)

    q_pe = apply_rope(q_pe, positions, rp)
    k_pe = apply_rope(k_pe[:, :, None, :], positions, rp)[:, :, 0, :]

    # absorb the nope query into latent space: [B,T,H,nope] x [H,nope,r].
    # bf16 operands ride the MXU with f32 accumulation; the CPU oracle
    # backend lacks the BF16xBF16=F32 dot thunk, so upcast there
    fdt = jnp.float32 if jax.default_backend() == "cpu" else x.dtype
    q_abs = jnp.einsum(
        "bthn,hnr->bthr", q_nope.astype(fdt), lw.wk_b.astype(fdt),
        preferred_element_type=jnp.float32).astype(x.dtype)
    q_full = jnp.concatenate([q_pe, q_abs], axis=-1)     # [B,T,H,rope+r]
    k_new = jnp.concatenate([k_pe, c_kv], axis=-1)       # [B,T,rope+r]

    store = partial(_store_cache, cache_slots=cache_slots,
                    mask_positions=mask_positions)
    k_cache = store(k_cache, k_new[:, None])             # [B,1,T,rope+r]
    v_cache = store(v_cache, c_kv[:, None])

    if isinstance(k_cache, tuple):
        from rrs_tpu.runtime import kv_codec

        kf = kv_codec.dequantize(*k_cache).astype(jnp.float32)
        vf = kv_codec.dequantize(*v_cache).astype(jnp.float32)
    else:
        kf = k_cache.astype(jnp.float32)
        vf = v_cache.astype(jnp.float32)
    s = kf.shape[2]

    from rrs_tpu.ops.flash_attention import NEG_INF

    scale = mla_kq_scale(cfg)
    scores = jnp.einsum("bthd,bzsd->bhts", q_full.astype(jnp.float32),
                        kf) * scale
    kv_pos = jnp.arange(s, dtype=jnp.int32)
    mask = kv_pos[None, None, :] <= mask_positions[:, :, None]  # [B, T, S]
    scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    m = scores.max(axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.maximum(e.sum(-1, keepdims=True), 1e-30)
    probs = jnp.where(jnp.any(mask[:, None, :, :], -1, keepdims=True),
                      probs, 0.0)
    ctx = jnp.einsum("bhts,bzsr->bthr", probs, vf)       # [B,T,H,r]

    # value decompression post-matmul: [B,T,H,r] x [H,r,v]
    out_v = jnp.einsum(
        "bthr,hrv->bthv", ctx.astype(fdt), lw.wv_b.astype(fdt),
        preferred_element_type=jnp.float32).astype(x.dtype)
    out_v = out_v.reshape(b, t, H * cfg.v_head_dim)
    _capture(cap, li, "attn_output.weight", out_v)
    out = linear_apply(lw.wo, out_v, reduce_axis=cfg.tp_axis)
    return out, k_cache, v_cache


def attention(
    cfg: ModelConfig,
    lw: LayerWeights,
    x: jnp.ndarray,              # [B, T, E]
    positions: jnp.ndarray,      # [B, T] int32 (rope); [B, T, C] for M-RoPE
    k_cache: jnp.ndarray,        # [B, Hkv, S, D]
    v_cache: jnp.ndarray,        # [B, Hkv, S, D]
    mask_positions: jnp.ndarray, # [B, T] int32; row attends slots <= value, -1 = none
    cache_slots: jnp.ndarray,    # [B, T] int32 cache positions to write
    cap=None,
    li: int = 0,
    rope_factors=None,
):
    b, t, _ = x.shape
    d = cfg.head_dim
    swa = cfg.is_swa(li)
    window = cfg.swa_window if swa else 0
    rp = rope_params(cfg, swa=swa)

    _capture(cap, li, "attn_q.weight", x)
    _capture(cap, li, "attn_k.weight", x)
    _capture(cap, li, "attn_v.weight", x)
    if lw.wqkv is not None:
        qkv = linear_apply(lw.wqkv, x)
        nq, nkv = cfg.n_q_dim, cfg.n_kv_dim
        qf = qkv[..., :nq]
        kf = qkv[..., nq : nq + nkv]
        vf = qkv[..., nq + nkv :]
    else:
        qf = linear_apply(lw.wq, x)
        kf = linear_apply(lw.wk, x)
        vf = linear_apply(lw.wv, x)
    if cfg.qk_norm_full:
        # olmo2: RMS over the whole projection BEFORE the head reshape
        # (models/olmo2.cpp:45-51)
        qf = rms_norm(qf, lw.q_norm, cfg.rms_eps)
        kf = rms_norm(kf, lw.k_norm, cfg.rms_eps)
    q = qf.reshape(b, t, cfg.n_heads, d)
    k = kf.reshape(b, t, cfg.n_kv_heads, d)
    v = vf.reshape(b, t, cfg.n_kv_heads, d)

    if cfg.qk_norm and not cfg.qk_norm_full:
        q = rms_norm(q, lw.q_norm, cfg.rms_eps)
        k = rms_norm(k, lw.k_norm, cfg.rms_eps)

    if not cfg.no_rope:
        if cfg.rope_sections and positions.ndim == 3:
            # M-RoPE (qwen2vl): positions carry (t, h, w[, e]) channels.
            # 2D positions fall through to apply_rope — identical math
            # when all channels are equal (pure-text qwen2vl).
            from rrs_tpu.ops.basic import apply_mrope

            q = apply_mrope(q, positions, rp, cfg.rope_sections)
            k = apply_mrope(k, positions, rp, cfg.rope_sections)
        else:
            q = apply_rope(q, positions, rp, freq_factors=rope_factors)
            k = apply_rope(k, positions, rp, freq_factors=rope_factors)

    # store new K/V into the kv-head-major cache (ggml_set_rows analog,
    # llama-graph.cpp:1736-1737); see _store_cache for the layout rules
    k_bh = k.transpose(0, 2, 1, 3)                                  # [B,Hkv,T,D]
    v_bh = v.transpose(0, 2, 1, 3)
    store = partial(_store_cache, cache_slots=cache_slots,
                    mask_positions=mask_positions, window=window)
    k_cache = store(k_cache, k_bh)
    v_cache = store(v_cache, v_bh)

    # fused attention (FLASH_ATTN_EXT analog); jnp oracle on CPU
    from rrs_tpu.ops import flash_attention as fa

    scale = cfg.attn_scale if cfg.attn_scale > 0 else 1.0 / np.sqrt(d)
    softcap = cfg.attn_softcap
    sinks = lw.attn_sinks
    alibi = cfg.f_max_alibi_bias     # llama-graph.cpp:1506,1566
    if isinstance(k_cache, tuple):
        if jax.default_backend() == "cpu" or cfg.ref_attention:
            from rrs_tpu.runtime import kv_codec

            kd = kv_codec.dequantize(*k_cache)
            vd = kv_codec.dequantize(*v_cache)
            ctx = fa.attention_ref(q, kd, vd, mask_positions, scale,
                                   softcap=softcap, window=window,
                                   sinks=sinks, alibi=alibi)
        elif k_cache[0].dtype == jnp.uint8:
            from rrs_tpu.runtime import kv_codec

            q4_kern = (fa.flash_attention_q4hp
                       if kv_codec.is_head_pair(*k_cache)
                       else fa.flash_attention_q4)
            ctx = q4_kern(
                q, k_cache[0], k_cache[1], v_cache[0], v_cache[1],
                mask_positions, scale, softcap=softcap, window=window,
                sinks=sinks, alibi=alibi,
            )
        else:
            ctx = fa.flash_attention_q8(
                q, k_cache[0], k_cache[1], v_cache[0], v_cache[1],
                mask_positions, scale, softcap=softcap, window=window,
                sinks=sinks, alibi=alibi,
            )
    elif jax.default_backend() == "cpu" or cfg.ref_attention:
        ctx = fa.attention_ref(q, k_cache, v_cache, mask_positions, scale,
                               softcap=softcap, window=window, sinks=sinks,
                               alibi=alibi)
    else:
        ctx = fa.flash_attention(q, k_cache, v_cache, mask_positions, scale,
                                 softcap=softcap, window=window, sinks=sinks,
                                 alibi=alibi)
    ctx = ctx.reshape(b, t, cfg.n_heads * d).astype(x.dtype)

    _capture(cap, li, "attn_output.weight", ctx)
    # row-parallel under TP: psum inside linear_apply, pre-cast (SURVEY §2.7)
    out = linear_apply(lw.wo, ctx, reduce_axis=cfg.tp_axis)
    return out, k_cache, v_cache


def ffn(cfg: ModelConfig, lw: LayerWeights, x: jnp.ndarray, cap=None, li: int = 0) -> jnp.ndarray:
    if lw.moe is not None:
        from rrs_tpu.models.moe import moe_ffn

        return moe_ffn(cfg, lw.moe, x)
    _capture(cap, li, "ffn_gate.weight", x)
    _capture(cap, li, "ffn_up.weight", x)
    if lw.w_gateup is not None:
        gu = linear_apply(lw.w_gateup, x)
        gate, up = gu[..., : cfg.n_ff], gu[..., cfg.n_ff :]
    else:
        gate = linear_apply(lw.w_gate, x)
        up = linear_apply(lw.w_up, x)
    if cfg.ffn_act == "gelu":
        # gemma-family GEGLU (LLM_FFN_GELU + LLM_FFN_PAR, gemma3.cpp)
        act = jax.nn.gelu(gate.astype(jnp.float32),
                          approximate=True).astype(x.dtype) * up
    else:
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    _capture(cap, li, "ffn_down.weight", act)
    return linear_apply(lw.w_down, act, reduce_axis=cfg.tp_axis)


def forward(
    cfg: ModelConfig,
    w: ModelWeights,
    tokens: jnp.ndarray,         # [B, T] int32
    positions: jnp.ndarray,      # [B, T] int32
    k_caches: list[jnp.ndarray],
    v_caches: list[jnp.ndarray],
    mask_positions: jnp.ndarray, # [B, T] int32 (-1 = padded row)
    cache_slots: jnp.ndarray,    # [B, T] int32
    cap=None,
    control_vector=None,         # models.adapter.ControlVector
    embeds=None,                 # [B, T, E]: raw input embeddings override
    last_idx=None,               # [B] int32: only this position's logits
):
    """One decode/prefill step. Returns (logits [B, T, V], new k/v caches).
    With ``last_idx``, the hidden state is gathered per lane BEFORE the
    lm_head (logits [B, 1, V]) — serving prefill needs one position per
    lane and the full chunk x vocab head matmul is pure waste."""
    # multimodal chunks arrive as raw embeddings (llama_batch.embd analog)
    x = embeds if embeds is not None else embed_rows(w.embed, tokens)
    if cfg.embd_scale != 1.0 and embeds is None:
        # gemma scales TOKEN embeddings by sqrt(n_embd), not raw/image
        # embedding inputs (gemma3.cpp: ubatch.token ? sqrtf(n_embd) : 1.0)
        x = (x.astype(jnp.float32) * cfg.embd_scale).astype(x.dtype)
    new_k, new_v = [], []
    attn_fn = mla_attention if cfg.is_mla else attention
    for li, lw in enumerate(w.layers):
        h = x if cfg.post_norm_only else rms_norm(x, lw.attn_norm,
                                                  cfg.rms_eps)
        attn_out, kc, vc = attn_fn(
            cfg, lw, h, positions, k_caches[li], v_caches[li], mask_positions,
            cache_slots, cap=cap, li=li, rope_factors=w.rope_factors,
        )
        new_k.append(kc)
        new_v.append(vc)
        if lw.attn_post_norm is not None:
            attn_out = rms_norm(attn_out, lw.attn_post_norm, cfg.rms_eps)
        if cfg.residual_scale != 1.0:      # granite/minicpm f_residual_scale
            attn_out = attn_out * cfg.residual_scale
        x = x + attn_out
        h = x if cfg.post_norm_only else rms_norm(x, lw.ffn_norm,
                                                  cfg.rms_eps)
        f = ffn(cfg, lw, h, cap=cap, li=li)
        if lw.ffn_post_norm is not None:
            f = rms_norm(f, lw.ffn_post_norm, cfg.rms_eps)
        if cfg.residual_scale != 1.0:
            f = f * cfg.residual_scale
        x = x + f
        if control_vector is not None:
            x = control_vector.apply(x, li)
        if cap is not None and "__hidden__" in cap:
            # per-layer mean hidden state (cvector-generator's activation
            # collection; tools/cvector-generator analog)
            cap["__hidden__"][li] = x.reshape(-1, x.shape[-1]).astype(
                jnp.float32).mean(0)
    if last_idx is not None:
        x = jnp.take_along_axis(
            x, jnp.clip(last_idx, 0)[:, None, None].astype(jnp.int32), axis=1)
    x = rms_norm(x, w.final_norm, cfg.rms_eps)
    logits = linear_apply(w.lm_head, x)
    logits = logits.astype(jnp.float32)
    if cfg.logits_divisor != 1.0:          # granite f_logit_scale
        logits = logits / cfg.logits_divisor
    if cfg.final_softcap > 0:
        # final logit soft-capping (gemma2; llama-model.cpp GEMMA2 graph)
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    return logits, new_k, new_v


def scratch_caches(cfg: ModelConfig, b: int, t: int, dtype=jnp.bfloat16):
    """Throwaway zero K/V caches sized for one forward of T tokens (tools
    that run a single stateless forward: imatrix, finetune, cvector,
    benches). Uses the cfg cache geometry, so MLA models (1 latent head,
    k-dim != v-dim) get correct shapes."""
    ks = [jnp.zeros((b, cfg.kv_cache_heads, t, cfg.kv_k_dim), dtype)
          for _ in range(cfg.n_layers)]
    vs = [jnp.zeros((b, cfg.kv_cache_heads, t, cfg.kv_v_dim), dtype)
          for _ in range(cfg.n_layers)]
    return ks, vs


# ---------------------------------------------------------------------------
# Device-side generation loop: runs N greedy decode steps inside one XLA
# program (lax.scan), eliminating per-token host round trips — the TPU analog
# of CUDA-graph decode capture (ggml-cuda.cu:2881-2930).
# ---------------------------------------------------------------------------

def decode_scan(
    cfg: ModelConfig,
    w: ModelWeights,
    first_token: jnp.ndarray,     # [B] int32
    start_pos: jnp.ndarray,       # [B] int32
    k_caches, v_caches,
    n_steps: int,
    logits_fixup=None,            # e.g. TP all_gather of vocab shards
):
    """Greedy-decode n_steps tokens on device. Returns (tokens [B, n_steps], caches)."""
    # slot clip must use the LARGEST cache: iSWA models mix small ring
    # caches (SWA layers, wrapped per-layer by _store_cache's % s_l) with
    # full-size caches, and clipping at a ring's length would truncate the
    # full layers' append positions
    s = max((c[0] if isinstance(c, tuple) else c).shape[2]
            for c in k_caches)

    def step(carry, _):
        token, pos, ks, vs = carry
        slots = jnp.clip(pos[:, None], 0, s - 1)
        logits, nk, nv = forward(
            cfg, w, token[:, None], pos[:, None], ks, vs, pos[:, None], slots
        )
        if logits_fixup is not None:
            logits = logits_fixup(logits)
        nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
        return (nxt, pos + 1, nk, nv), token

    (last, pos, ks, vs), toks = jax.lax.scan(
        step, (first_token, start_pos, k_caches, v_caches), None, length=n_steps
    )
    return jnp.moveaxis(toks, 0, 1), last, ks, vs


# ---------------------------------------------------------------------------
# Synthetic weight builders (tests/benchmarks on random weights)
# ---------------------------------------------------------------------------

def random_weights(
    cfg: ModelConfig,
    seed: int = 0,
    dtype=jnp.bfloat16,
    quantize: bool = False,
    scale: float = 0.02,
) -> ModelWeights:
    """Random-initialized weights, optionally TCQ4-quantized (host-side)."""
    from rrs_tpu.formats.tcq4 import quantize_tcq4

    rng = np.random.default_rng(seed)

    def dense(k, n):
        wm = (rng.standard_normal((k, n)) * scale).astype(np.float32)
        return DenseLinear(w=jnp.asarray(wm, dtype))

    def lin(k, n):
        if not quantize or k % 256 or n % 8:
            return dense(k, n)
        wm = (rng.standard_normal((n, k)) * scale).astype(np.float32)
        return TCQ4Linear.from_tensor(quantize_tcq4(wm))

    e, hq, hkv, d, f = cfg.n_embd, cfg.n_q_dim, cfg.n_kv_dim, cfg.head_dim, cfg.n_ff
    layers = []
    for _ in range(cfg.n_layers):
        moe = None
        if cfg.n_experts > 0:
            from rrs_tpu.models.moe import MoEWeights

            fe = cfg.n_ff_exp or f
            moe = MoEWeights(
                router=jnp.asarray(rng.standard_normal((e, cfg.n_experts)) * scale, dtype),
                gate=jnp.asarray(rng.standard_normal((cfg.n_experts, e, fe)) * scale, dtype),
                up=jnp.asarray(rng.standard_normal((cfg.n_experts, e, fe)) * scale, dtype),
                down=jnp.asarray(rng.standard_normal((cfg.n_experts, fe, e)) * scale, dtype),
            )
        layers.append(LayerWeights(
            attn_norm=jnp.ones((e,), dtype),
            wq=lin(e, hq), wk=lin(e, hkv), wv=lin(e, hkv), wo=lin(hq, e),
            q_norm=jnp.ones((d,), dtype) if cfg.qk_norm else None,
            k_norm=jnp.ones((d,), dtype) if cfg.qk_norm else None,
            ffn_norm=jnp.ones((e,), dtype),
            w_gate=lin(e, f) if moe is None else None,
            w_up=lin(e, f) if moe is None else None,
            w_down=lin(f, e) if moe is None else None,
            moe=moe,
            attn_post_norm=jnp.ones((e,), dtype) if cfg.sandwich_norm else None,
            ffn_post_norm=jnp.ones((e,), dtype) if cfg.sandwich_norm else None,
        ))
    embed = jnp.asarray(rng.standard_normal((cfg.vocab_size, e)) * scale, dtype)
    return ModelWeights(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((e,), dtype),
        lm_head=DenseLinear(w=embed.T),
    )


def fabricated_tcq4_weights(
    cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16, fuse: bool = True
) -> ModelWeights:
    """Structurally-valid random TCQ4 weights WITHOUT running the quantizer —
    qs/eff are drawn directly. For compile checks and throughput benchmarks
    where weight values are irrelevant (the compute cost is identical).

    Draws happen ON DEVICE (jax.random under jit): a host-side numpy build
    of the 4B-scale tensors is minutes of single-core CPU plus GBs through
    the transfer path, vs seconds device-side (same lesson as
    benchmarks/bench_gptoss.py::build_weights)."""
    import functools

    # 2 keys per qlin: fused layers use 4 qlins, non-fused 7; plus embed
    # (1) + lm_head (2). Size to the worst case so deep non-fused configs
    # (70B = 80 layers x 14 keys) never exhaust the iterator.
    key_it = iter(jax.random.split(jax.random.PRNGKey(seed),
                                   14 * cfg.n_layers + 3))

    @functools.partial(jax.jit, static_argnums=(1,))
    def _u8(key, shape):
        return jax.random.randint(key, shape, 0, 256, jnp.int32
                                  ).astype(jnp.uint8)

    @functools.partial(jax.jit, static_argnums=(1,))
    def _i8(key, shape):
        return jax.random.randint(key, shape, -127, 128, jnp.int32
                                  ).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=(1, 2, 3))
    def _unif(key, scl, off, shape):
        return jax.random.uniform(key, shape, jnp.float32) * scl + off

    import os

    from rrs_tpu.ops import tcq4_matmul as _mm

    want_i8p = os.environ.get("RRS_PREFILL_I8", "1") != "0"

    def qlin(k, n):
        qs = _u8(next(key_it), (k // 2, n))
        eff = _unif(next(key_it), 0.01, 0.001, (k // 32, n)
                    ).astype(jnp.bfloat16)
        return TCQ4Linear(
            qs=qs, eff=eff, gather=None, bias=None,
            i8p=tuple(_mm.pack_i8p(qs, eff)) if want_i8p else None,
        )

    e, hq, hkv, d, f = cfg.n_embd, cfg.n_q_dim, cfg.n_kv_dim, cfg.head_dim, cfg.n_ff
    layers = []
    for _ in range(cfg.n_layers):
        if fuse:
            layers.append(LayerWeights(
                attn_norm=jnp.ones((e,), dtype),
                wq=None, wk=None, wv=None, wo=qlin(hq, e),
                q_norm=jnp.ones((d,), dtype) if cfg.qk_norm else None,
                k_norm=jnp.ones((d,), dtype) if cfg.qk_norm else None,
                ffn_norm=jnp.ones((e,), dtype),
                w_gate=None, w_up=None, w_down=qlin(f, e),
                wqkv=qlin(e, hq + 2 * hkv),
                w_gateup=qlin(e, 2 * f),
            ))
            continue
        layers.append(LayerWeights(
            attn_norm=jnp.ones((e,), dtype),
            wq=qlin(e, hq), wk=qlin(e, hkv), wv=qlin(e, hkv), wo=qlin(hq, e),
            q_norm=jnp.ones((d,), dtype) if cfg.qk_norm else None,
            k_norm=jnp.ones((d,), dtype) if cfg.qk_norm else None,
            ffn_norm=jnp.ones((e,), dtype),
            w_gate=qlin(e, f), w_up=qlin(e, f), w_down=qlin(f, e),
        ))
    embed = (jax.random.normal(next(key_it), (cfg.vocab_size, e),
                               jnp.float32) * 0.02).astype(dtype)
    # lm_head at Q8_0 like the reference's output.weight policy
    # (llama-quant.cpp:260-262); fabricated codes, realistic traffic.
    # Pad with the SAME policy real loads use (linear.n_pad_width: big
    # vocab -> 2048-multiples) so benchmarks measure real-model tiling.
    from rrs_tpu.models.linear import n_pad_width

    n_pad = n_pad_width(cfg.vocab_size)
    lm_q = _i8(next(key_it), (e, n_pad))
    lm_s = _unif(next(key_it), 1e-3, 0.0, (e // 32, n_pad))
    return ModelWeights(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((e,), dtype),
        lm_head=Q8Linear(q=lm_q, scale=lm_s, n_logical=cfg.vocab_size),
    )
