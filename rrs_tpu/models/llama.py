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
                 "attn_sinks"],
    meta_fields=[],
)
@dataclasses.dataclass
class LayerWeights:
    attn_norm: jnp.ndarray
    wq: Any
    wk: Any
    wv: Any
    wo: Any
    q_norm: Optional[jnp.ndarray]
    k_norm: Optional[jnp.ndarray]
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


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["embed", "layers", "final_norm", "lm_head", "rope_factors"],
    meta_fields=[],
)
@dataclasses.dataclass
class ModelWeights:
    embed: jnp.ndarray            # [vocab, n_embd] bf16
    layers: list[LayerWeights]
    final_norm: jnp.ndarray
    lm_head: Any                  # DenseLinear (possibly tied to embed)
    rope_factors: Any = None      # [rot//2] longrope freq divisors (phi3)


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


def attention(
    cfg: ModelConfig,
    lw: LayerWeights,
    x: jnp.ndarray,              # [B, T, E]
    positions: jnp.ndarray,      # [B, T] int32 (rope)
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
        q = qkv[..., :nq].reshape(b, t, cfg.n_heads, d)
        k = qkv[..., nq : nq + nkv].reshape(b, t, cfg.n_kv_heads, d)
        v = qkv[..., nq + nkv :].reshape(b, t, cfg.n_kv_heads, d)
    else:
        q = linear_apply(lw.wq, x).reshape(b, t, cfg.n_heads, d)
        k = linear_apply(lw.wk, x).reshape(b, t, cfg.n_kv_heads, d)
        v = linear_apply(lw.wv, x).reshape(b, t, cfg.n_kv_heads, d)

    if cfg.qk_norm:
        q = rms_norm(q, lw.q_norm, cfg.rms_eps)
        k = rms_norm(k, lw.k_norm, cfg.rms_eps)

    if not cfg.no_rope:
        q = apply_rope(q, positions, rp, freq_factors=rope_factors)
        k = apply_rope(k, positions, rp, freq_factors=rope_factors)

    # store new K/V into the kv-head-major cache (ggml_set_rows analog,
    # llama-graph.cpp:1736-1737). Per-lane slots are always a CONTIGUOUS run
    # (pos..pos+T), so the write is a per-lane dynamic_update_slice — XLA
    # updates in place. A general scatter here costs ~0.25 ms per store on
    # TPU (serialized) and was the dominant decode cost. Ring (SWA) caches
    # can wrap mid-chunk during prefill; those use a one-hot rewrite instead
    # (the ring is small, window + chunk). Caches may be quantized: a
    # (int8 values, f32 scales [B,Hkv,1,S]) tuple (cparams.type_k/v analog).
    s_l = (k_cache[0] if isinstance(k_cache, tuple) else k_cache).shape[2]
    slot_mod = cache_slots % s_l                                    # [B, T]
    k_bh = k.transpose(0, 2, 1, 3)                                  # [B,Hkv,T,D]
    v_bh = v.transpose(0, 2, 1, 3)
    ring_wrap = window > 0 and t > 1
    # padded lanes (mask -1) park their write at the top of the cache: a
    # sequence only attends slots it has itself written, and growth into the
    # parked region rewrites each slot before the first attend (any
    # read-modify-write here would force whole-cache copies instead of
    # XLA's in-place dynamic-update-slice)
    active = mask_positions[:, 0] >= 0                              # [B]
    park = jnp.int32(s_l - t)
    start_slot = jnp.where(active, slot_mod[:, 0], park)            # [B]

    def store_arr(cache, new):
        """new [B, Hkv, T, *]; cache [B, Hkv, S, *]."""
        if ring_wrap:
            oh = jax.nn.one_hot(slot_mod, s_l, dtype=jnp.float32)   # [B,T,S]
            oh = oh * active[:, None, None].astype(jnp.float32)
            upd = jnp.einsum("bts,bhtx->bhsx", oh,
                             new.astype(jnp.float32)).astype(cache.dtype)
            keep = (1.0 - oh.sum(1))[:, None, :, None].astype(cache.dtype)
            return cache * keep + upd
        new = new.astype(cache.dtype)
        for lane in range(b):
            cache = jax.lax.dynamic_update_slice(
                cache, new[lane : lane + 1], (lane, 0, start_slot[lane], 0))
        return cache

    def store(cache, new):
        if isinstance(cache, tuple):
            from rrs_tpu.runtime import kv_codec

            arr, sc = cache
            q, s_new = kv_codec.quantize_rows(new, kv_codec.kv_qmax(arr))
            if arr.dtype == jnp.uint8:                  # q4: packed nibbles
                q = kv_codec.pack4(q)
            arr = store_arr(arr, q)
            sc = store_arr(sc.swapaxes(2, 3), s_new[..., None]).swapaxes(2, 3)
            return (arr, sc)
        return store_arr(cache, new)

    k_cache = store(k_cache, k_bh)
    v_cache = store(v_cache, v_bh)

    # fused attention (FLASH_ATTN_EXT analog); jnp oracle on CPU
    from rrs_tpu.ops import flash_attention as fa

    scale = cfg.attn_scale if cfg.attn_scale > 0 else 1.0 / np.sqrt(d)
    softcap = cfg.attn_softcap
    sinks = lw.attn_sinks
    if isinstance(k_cache, tuple):
        if jax.default_backend() == "cpu":
            from rrs_tpu.runtime import kv_codec

            kd = kv_codec.dequantize(*k_cache)
            vd = kv_codec.dequantize(*v_cache)
            ctx = fa.attention_ref(q, kd, vd, mask_positions, scale,
                                   softcap=softcap, window=window, sinks=sinks)
        elif k_cache[0].dtype == jnp.uint8:
            ctx = fa.flash_attention_q4(
                q, k_cache[0], k_cache[1], v_cache[0], v_cache[1],
                mask_positions, scale, softcap=softcap, window=window,
                sinks=sinks,
            )
        else:
            ctx = fa.flash_attention_q8(
                q, k_cache[0], k_cache[1], v_cache[0], v_cache[1],
                mask_positions, scale, softcap=softcap, window=window,
                sinks=sinks,
            )
    elif jax.default_backend() == "cpu":
        ctx = fa.attention_ref(q, k_cache, v_cache, mask_positions, scale,
                               softcap=softcap, window=window, sinks=sinks)
    else:
        ctx = fa.flash_attention(q, k_cache, v_cache, mask_positions, scale,
                                 softcap=softcap, window=window, sinks=sinks)
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
    x = embeds if embeds is not None else jnp.take(w.embed, tokens, axis=0)
    if cfg.embd_scale != 1.0 and embeds is None:
        # gemma scales TOKEN embeddings by sqrt(n_embd), not raw/image
        # embedding inputs (gemma3.cpp: ubatch.token ? sqrtf(n_embd) : 1.0)
        x = (x.astype(jnp.float32) * cfg.embd_scale).astype(x.dtype)
    new_k, new_v = [], []
    for li, lw in enumerate(w.layers):
        h = rms_norm(x, lw.attn_norm, cfg.rms_eps)
        attn_out, kc, vc = attention(
            cfg, lw, h, positions, k_caches[li], v_caches[li], mask_positions,
            cache_slots, cap=cap, li=li, rope_factors=w.rope_factors,
        )
        new_k.append(kc)
        new_v.append(vc)
        if lw.attn_post_norm is not None:
            attn_out = rms_norm(attn_out, lw.attn_post_norm, cfg.rms_eps)
        x = x + attn_out
        h = rms_norm(x, lw.ffn_norm, cfg.rms_eps)
        f = ffn(cfg, lw, h, cap=cap, li=li)
        if lw.ffn_post_norm is not None:
            f = rms_norm(f, lw.ffn_post_norm, cfg.rms_eps)
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
    if cfg.final_softcap > 0:
        # final logit soft-capping (gemma2; llama-model.cpp GEMMA2 graph)
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    return logits, new_k, new_v


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
    c0 = k_caches[0][0] if isinstance(k_caches[0], tuple) else k_caches[0]
    s = c0.shape[2]

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
    where weight values are irrelevant (the compute cost is identical)."""
    rng = np.random.default_rng(seed)

    def qlin(k, n):
        qs = rng.integers(0, 256, (k // 2, n), dtype=np.uint8)
        eff = (rng.random((k // 32, n), dtype=np.float32) * 0.01 + 0.001)
        return TCQ4Linear(
            qs=jnp.asarray(qs), eff=jnp.asarray(eff, jnp.bfloat16),
            gather=None, bias=None
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
    embed = jnp.asarray(
        rng.standard_normal((cfg.vocab_size, e)).astype(np.float32) * 0.02, dtype
    )
    # lm_head at Q8_0 like the reference's output.weight policy
    # (llama-quant.cpp:260-262); fabricated codes, realistic traffic
    from rrs_tpu.models.linear import _pad_n

    lm_q = jnp.asarray(_pad_n(
        rng.integers(-127, 128, (e, cfg.vocab_size), dtype=np.int8)))
    lm_s = jnp.asarray(_pad_n(
        rng.random((e // 32, cfg.vocab_size), dtype=np.float32) * 1e-3))
    return ModelWeights(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((e,), dtype),
        lm_head=Q8Linear(q=lm_q, scale=lm_s, n_logical=cfg.vocab_size),
    )
