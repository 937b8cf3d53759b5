"""Model hyperparameters parsed from GGUF metadata.

The analog of llama_hparams + load_hparams (src/llama-model.cpp:495); key
names follow the GGUF conventions written by convert_hf_to_gguf.py and read
by llama-arch.cpp KV templates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: str
    n_layers: int
    n_embd: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    n_ff: int
    vocab_size: int
    context_length: int
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling_type: str = "none"
    rope_scale_factor: float = 1.0
    rope_orig_context: int = 0
    rope_neox: bool = True
    qk_norm: bool = False            # qwen3-style per-head q/k RMSNorm
    attn_bias: bool = False          # qwen2-style qkv bias
    tie_embeddings: bool = False
    # MoE (0 => dense)
    n_experts: int = 0
    n_experts_used: int = 0
    n_ff_exp: int = 0
    expert_gating_softmax: bool = True
    norm_topk_prob: bool = False
    # DeepSeek-family MoE routing (build_moe_ffn, llama-graph.cpp:999-1160):
    # leading dense layers, routed-weight scale, post-top-k weight norm,
    # V3 expert-group restriction (top n_group_used groups by sum of each
    # group's top-2 selection probs)
    n_dense_lead: int = 0
    expert_weights_scale: float = 1.0
    expert_weights_norm: bool = False
    n_expert_groups: int = 0
    n_group_used: int = 0
    # gpt-oss MoE: top-k on RAW router logits, then softmax over the
    # selected k (LLAMA_EXPERT_GATING_FUNC_TYPE_SOFTMAX_WEIGHT,
    # llama-graph.cpp:1047-1049,1118-1123) + clamped swiglu activation
    # (ggml_swiglu_oai: alpha=1.702 limit=7.0, ggml-cpu/ops.cpp:3212-3268)
    expert_softmax_weight: bool = False
    moe_act: str = "silu"            # "silu" | "swiglu_oai"
    # MLA (deepseek2): low-rank q/kv projections. kv_lora_rank > 0 => MLA.
    # head_dim is the DECOMPRESSED qk head size (n_embd_head_k_mla, e.g.
    # 192 = 128 nope + 64 rope); v_head_dim the decompressed v size.
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    qk_rope_dim: int = 0
    v_head_dim: int = 0
    rope_yarn_log_mul: float = 0.0   # mscale_all_dim (kq_scale pre-mult)
    # sliding-window attention (llama_hparams.n_swa / swa_layers analog,
    # src/llama-hparams.cpp:8-18). swa_pattern semantics: 0 => no SWA;
    # 1 => every layer SWA; n>1 => layer il is SWA iff il % n < n-1
    # (every n-th layer is global: gemma2 n=2, gemma3 n=6).
    swa_window: int = 0
    swa_pattern: int = 0
    rope_theta_swa: float = 0.0      # 0 => same as rope_theta (gemma3: 10000)
    # gemma-family extras
    attn_softcap: float = 0.0        # attn logit softcapping (gemma2)
    final_softcap: float = 0.0       # final logit softcapping (gemma2)
    attn_scale: float = 0.0          # 0 => 1/sqrt(head_dim) (f_attention_scale)
    embd_scale: float = 1.0          # gemma: sqrt(n_embd) on token embeddings
    residual_scale: float = 1.0      # granite/minicpm f_residual_scale
    logits_divisor: float = 1.0      # granite f_logit_scale (logits /= it)
    qk_norm_full: bool = False       # olmo2: RMS over the WHOLE q/k
                                     # projection (pre-reshape), not per-head
    post_norm_only: bool = False     # olmo2: no pre-norms; attn/ffn outputs
                                     # are normed before the residual add
    sandwich_norm: bool = False      # gemma2/3 post-attn + post-ffn norms
    ffn_act: str = "silu"            # "silu" | "gelu"
    rope_rot_dim: int = 0            # partial rotary (phi3); 0 => head_dim
    # M-RoPE (qwen2vl): per-channel freq-dim counts over rot/2 (t, h, w[, e]);
    # () => standard rope ({arch}.rope.dimension_sections, ggml_rope_multi)
    rope_sections: tuple = ()
    # recurrent (Mamba) hparams (llama-hparams.h:133-136)
    ssm_d_conv: int = 0
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_dt_rank: int = 0
    ssm_dt_b_c_rms: bool = False     # falcon-mamba RMS on dt/B/C
    no_rope: bool = False            # jamba attention layers skip RoPE
    f_max_alibi_bias: float = 0.0    # ALiBi (MPT/BLOOM/jina); >0 enables
    # RWKV6 hparams (wkv_head_size etc., llama-hparams.h)
    rwkv_head_size: int = 0
    rwkv_tm_extra: int = 0           # time_mix_extra_dim
    rwkv_decay_extra: int = 0        # time_decay_extra_dim
    rwkv_rescale_every: int = 0
    # set only inside shard_map: mesh axis name for tensor parallelism; when
    # set, row-parallel projections (wo, ffn_down) psum over it
    tp_axis: "str | None" = None
    # force the jnp reference attention instead of the Pallas flash kernel.
    # Training sets this (train/finetune.py): custom Pallas kernels have no
    # VJP, so the differentiated forward must run the jnp path on TPU too
    ref_attention: bool = False

    @property
    def n_q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def n_kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim

    @property
    def is_mla(self) -> bool:
        """Multi-head latent attention (deepseek2.cpp): the cache holds the
        compressed kv_lora_rank + rope-dim vector per position (MQA form)."""
        return self.kv_lora_rank > 0

    @property
    def qk_nope_dim(self) -> int:
        return self.head_dim - self.qk_rope_dim

    # cache geometry: MLA caches ONE kv head of [rope | c_kv] for K and the
    # c_kv alone for V (absorbed-MQA form, deepseek2.cpp:147); everything
    # else caches per-kv-head [head_dim] K and V
    @property
    def kv_cache_heads(self) -> int:
        return 1 if self.is_mla else self.n_kv_heads

    @property
    def kv_k_dim(self) -> int:
        return (self.qk_rope_dim + self.kv_lora_rank) if self.is_mla \
            else self.head_dim

    @property
    def kv_v_dim(self) -> int:
        return self.kv_lora_rank if self.is_mla else self.head_dim

    @property
    def is_hybrid(self) -> bool:
        """Mixed attention + recurrent layers (Jamba; llama-memory-hybrid)."""
        return self.arch == "jamba"

    @property
    def is_recurrent(self) -> bool:
        return (self.ssm_d_inner > 0 or self.rwkv_head_size > 0) \
            and not self.is_hybrid

    def is_swa(self, li: int) -> bool:
        """Is layer ``li`` sliding-window? (llama_hparams::is_swa analog)."""
        if self.swa_window <= 0 or self.swa_pattern <= 0:
            return False
        if self.swa_pattern == 1:
            return True
        return li % self.swa_pattern < self.swa_pattern - 1

    @property
    def any_swa(self) -> bool:
        return self.swa_window > 0 and self.swa_pattern > 0

    @staticmethod
    def from_gguf(md: Mapping[str, Any]) -> "ModelConfig":
        arch = md["general.architecture"]

        def key(suffix, default=None):
            v = md.get(f"{arch}.{suffix}", default)
            return v

        n_embd = int(key("embedding_length"))
        n_heads = int(key("attention.head_count", 0) or 0)
        n_kv = int(key("attention.head_count_kv", n_heads) or 0)
        head_dim = int(key("attention.key_length",
                           n_embd // n_heads if n_heads else 0) or 0)

        scaling = str(key("rope.scaling.type", "none") or "none")
        vocab = md.get("tokenizer.ggml.tokens")
        vocab_size = int(key("vocab_size", len(vocab) if vocab is not None else 0))
        n_layers = int(key("block_count"))

        # arch-specific hparams (the load_hparams switch, llama-model.cpp)
        extra: dict = {}
        if arch == "gemma2":
            # llama-model.cpp:1321-1347: pattern 2, default window 4096,
            # softcaps, GELU, sqrt(E) embedding scale, sandwich norms
            extra.update(
                swa_window=int(key("attention.sliding_window", 4096) or 4096),
                swa_pattern=2,
                attn_softcap=float(key("attn_logit_softcapping", 50.0) or 0.0),
                final_softcap=float(key("final_logit_softcapping", 30.0) or 0.0),
                ffn_act="gelu",
                embd_scale=float(n_embd) ** 0.5,
                sandwich_norm=True,
                # 27B (46 layers) scales by sqrt(n_embd/n_head) instead
                attn_scale=(1.0 / (n_embd / n_heads) ** 0.5) if n_layers == 46
                           else (1.0 / head_dim ** 0.5),
            )
        elif arch == "gemma3":
            # llama-model.cpp:1348-1378: pattern 6, rope base 10k on SWA
            # layers, qk-norm, GELU, sandwich norms
            win = int(key("attention.sliding_window", 0) or 0)
            extra.update(
                swa_window=win,
                swa_pattern=6 if win > 0 else 0,
                rope_theta_swa=float(key("rope.freq_base_swa", 10000.0) or 10000.0),
                final_softcap=float(key("final_logit_softcapping", 0.0) or 0.0),
                ffn_act="gelu",
                embd_scale=float(n_embd) ** 0.5,
                sandwich_norm=True,
                attn_scale=(1.0 / (n_embd / n_heads) ** 0.5) if n_layers == 62
                           else (1.0 / head_dim ** 0.5),
            )
        elif arch == "qwen2vl":
            # LLM_ARCH_QWEN2VL (llama-model.cpp load_hparams + qwen2vl.cpp):
            # qwen2 body (qkv biases) + M-RoPE over 4 position sections
            sect = md.get(f"{arch}.rope.dimension_sections")
            if sect is not None:
                extra.update(rope_sections=tuple(int(s) for s in sect))
        elif arch == "granite":
            # LLM_ARCH_GRANITE (llama-model.cpp:776-778 + models/granite.cpp):
            # llama body with four scale hparams — embeddings x
            # embedding_scale, attn/ffn outputs x residual_scale, kq scale
            # = attention.scale, logits / logit_scale
            extra.update(
                embd_scale=float(key("embedding_scale", 1.0) or 1.0),
                residual_scale=float(key("residual_scale", 1.0) or 1.0),
                logits_divisor=float(key("logit_scale", 1.0) or 1.0),
                attn_scale=float(key("attention.scale", 0.0) or 0.0),
            )
        elif arch == "olmo2":
            # LLM_ARCH_OLMO2 (models/olmo2.cpp): no pre-norms — attention
            # and FFN read the raw residual stream and their OUTPUTS are
            # RMS-normed before the residual add; q/k are normed over the
            # full projection width before the head reshape; NEOX rope
            extra.update(qk_norm_full=True, post_norm_only=True)
        elif arch == "minicpm":
            # LLM_ARCH_MINICPM (llama-model.cpp:766-780): granite's scale
            # set with backward-compatible defaults for older GGUFs
            import math as _math

            extra.update(
                embd_scale=float(key("embedding_scale", 12.0) or 12.0),
                residual_scale=float(key("residual_scale",
                                         1.4 / _math.sqrt(n_layers))
                                     or (1.4 / _math.sqrt(n_layers))),
                logits_divisor=float(key("logit_scale", 256.0 / n_embd)
                                     or (256.0 / n_embd)),
            )
        elif arch in ("mistral", "llama", "phi3", "qwen2", "qwen3",
                      "qwen2moe", "qwen3moe"):
            # generic sliding window: all layers SWA when the KV is present
            # (mistral-v1/phi3 style)
            win = int(key("attention.sliding_window", 0) or 0)
            if win > 0:
                extra.update(swa_window=win, swa_pattern=1)
        if arch == "phi3":
            extra.update(rope_rot_dim=int(key("rope.dimension_count", 0) or 0))
        if arch == "deepseek2":
            # llama-model.cpp:1702-1743. head_dim = the decompressed MLA head
            # size when the *_mla keys are present (modern split-k_b/v_b
            # GGUFs write key_length=576/value_length=512 for the cache and
            # key_length_mla=192/value_length_mla=128 for the math); legacy
            # unsplit-wkv_b GGUFs have key_length=192 directly.
            k_mla = int(key("attention.key_length_mla", 0) or 0)
            v_mla = int(key("attention.value_length_mla", 0) or 0)
            if k_mla:
                head_dim = k_mla
            v_dim = v_mla or int(key("attention.value_length",
                                     head_dim) or head_dim)
            log_mul = float(key("rope.scaling.yarn_log_multiplier", 0.0) or 0.0)
            extra.update(
                q_lora_rank=int(key("attention.q_lora_rank", 0) or 0),
                kv_lora_rank=int(key("attention.kv_lora_rank", 0) or 0),
                qk_rope_dim=int(key("rope.dimension_count", 64) or 64),
                v_head_dim=v_dim,
                n_dense_lead=int(key("leading_dense_block_count", 0) or 0),
                expert_weights_scale=float(
                    key("expert_weights_scale", 1.0) or 1.0),
                expert_weights_norm=bool(key("expert_weights_norm", False)),
                # GGUF stores 0.1*mscale_all_dim; llama.cpp cancels the 0.1
                # ([TAG_DEEPSEEK2_YARN_LOG_MUL_FIX], llama-model.cpp:1725-1729)
                rope_yarn_log_mul=log_mul / 0.1 if log_mul else 0.0,
                n_expert_groups=int(key("expert_group_count", 0) or 0),
                n_group_used=int(key("expert_group_used_count", 0) or 0),
                # V2/V2.5 GGUFs predate the expert_gating_func key: softmax
                expert_gating_softmax=int(key("expert_gating_func", 1) or 1) == 1,
            )
        if arch == "gpt-oss":
            # llama-model.cpp:2256-2275 (LLM_ARCH_OPENAI_MOE): alternating
            # SWA (pattern 2, even layers sliding), per-head attention
            # sinks, qkv+output biases, MoE every layer with swiglu_oai and
            # post-top-k softmax weighting; SWA layers may carry their own
            # rope base (rope_freq_base_swa, defaults to the full-attn base)
            extra.update(
                swa_window=int(key("attention.sliding_window", 128) or 128),
                swa_pattern=2,
                rope_theta_swa=float(key("rope.freq_base_swa", 0.0) or 0.0),
                expert_softmax_weight=True,
                moe_act="swiglu_oai",
            )
        if arch == "jamba":
            extra.update(no_rope=True)
        if arch in ("rwkv6", "rwkv6qwen2"):
            extra.update(
                rwkv_head_size=int(key("wkv.head_size", 64) or 64),
                rwkv_tm_extra=int(key("time_mix_extra_dim", 32) or 32),
                rwkv_decay_extra=int(key("time_decay_extra_dim", 64) or 64),
                rwkv_rescale_every=int(key("rescale_every_n_layers", 0) or 0),
            )
        if arch in ("mamba", "mamba2", "falcon_mamba", "jamba"):
            extra.update(
                ssm_d_conv=int(key("ssm.conv_kernel", 4) or 4),
                ssm_d_inner=int(key("ssm.inner_size", 2 * n_embd) or 2 * n_embd),
                ssm_d_state=int(key("ssm.state_size", 16) or 16),
                ssm_dt_rank=int(key("ssm.time_step_rank",
                                    -(-n_embd // 16)) or -(-n_embd // 16)),
                ssm_dt_b_c_rms=bool(key("ssm.dt_b_c_rms", False)),
            )

        return ModelConfig(
            **extra,
            arch=arch,
            n_layers=n_layers,
            n_embd=n_embd,
            n_heads=n_heads,
            n_kv_heads=n_kv,
            head_dim=head_dim,
            n_ff=int(key("feed_forward_length", 0) or 0),
            vocab_size=vocab_size,
            context_length=int(key("context_length", 4096)),
            rms_eps=float(key("attention.layer_norm_rms_epsilon", 1e-6)),
            rope_theta=float(key("rope.freq_base", 10000.0)),
            rope_scaling_type=scaling,
            rope_scale_factor=float(key("rope.scaling.factor", 1.0) or 1.0),
            rope_orig_context=int(key("rope.scaling.original_context_length", 0) or 0),
            # llama arch weights are pre-permuted by convert_hf_to_gguf for
            # interleaved (NORM) rope; qwen/neox-style archs use split-half.
            rope_neox=arch not in ("llama", "granite"),
            qk_norm=arch in ("qwen3", "qwen3moe", "gemma3", "olmo2"),
            attn_bias=arch in ("qwen2", "qwen2vl", "qwen2moe", "gpt-oss"),
            tie_embeddings=bool(md.get(f"{arch}.tie_word_embeddings", False)),
            n_experts=int(key("expert_count", 0) or 0),
            n_experts_used=int(key("expert_used_count", 0) or 0),
            n_ff_exp=int(key("expert_feed_forward_length", 0) or 0),
            norm_topk_prob=bool(key("norm_topk_prob", False)),
        )


# Ready-made shapes for tests/benchmarks (BASELINE.json configs).
PRESETS: dict[str, ModelConfig] = {
    "qwen3-0.6b": ModelConfig(
        arch="qwen3", n_layers=28, n_embd=1024, n_heads=16, n_kv_heads=8,
        head_dim=128, n_ff=3072, vocab_size=151936, context_length=40960,
        rope_theta=1e6, qk_norm=True, tie_embeddings=True,
    ),
    "qwen3-4b": ModelConfig(
        arch="qwen3", n_layers=36, n_embd=2560, n_heads=32, n_kv_heads=8,
        head_dim=128, n_ff=9728, vocab_size=151936, context_length=40960,
        rope_theta=1e6, qk_norm=True, tie_embeddings=True,
    ),
    "llama-3-8b": ModelConfig(
        arch="llama", n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8,
        head_dim=128, n_ff=14336, vocab_size=128256, context_length=8192,
        rope_theta=500000.0, rope_neox=False,
    ),
    "llama-3-70b": ModelConfig(
        arch="llama", n_layers=80, n_embd=8192, n_heads=64, n_kv_heads=8,
        head_dim=128, n_ff=28672, vocab_size=128256, context_length=8192,
        rope_theta=500000.0, rope_neox=False,
    ),
    "qwen2.5-32b": ModelConfig(
        arch="qwen2", n_layers=64, n_embd=5120, n_heads=40, n_kv_heads=8,
        head_dim=128, n_ff=27648, vocab_size=152064, context_length=32768,
        rope_theta=1e6, attn_bias=True,
    ),
    "gemma3-4b": ModelConfig(
        arch="gemma3", n_layers=34, n_embd=2560, n_heads=8, n_kv_heads=4,
        head_dim=256, n_ff=10240, vocab_size=262208, context_length=131072,
        rope_theta=1e6, rope_scaling_type="linear", rope_scale_factor=8.0,
        qk_norm=True, tie_embeddings=True,
        swa_window=1024, swa_pattern=6, rope_theta_swa=10000.0,
        ffn_act="gelu", embd_scale=2560.0 ** 0.5, sandwich_norm=True,
        attn_scale=1.0 / 256.0 ** 0.5,
    ),
    "gemma2-9b": ModelConfig(
        arch="gemma2", n_layers=42, n_embd=3584, n_heads=16, n_kv_heads=8,
        head_dim=256, n_ff=14336, vocab_size=256000, context_length=8192,
        rope_theta=10000.0, tie_embeddings=True,
        swa_window=4096, swa_pattern=2, attn_softcap=50.0, final_softcap=30.0,
        ffn_act="gelu", embd_scale=3584.0 ** 0.5, sandwich_norm=True,
        attn_scale=1.0 / 256.0 ** 0.5,
    ),
    "mistral-7b": ModelConfig(
        arch="llama", n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8,
        head_dim=128, n_ff=14336, vocab_size=32000, context_length=32768,
        rope_theta=10000.0, rope_neox=False,
        swa_window=4096, swa_pattern=1,
    ),
    "deepseek-v2-lite": ModelConfig(
        arch="deepseek2", n_layers=27, n_embd=2048, n_heads=16,
        n_kv_heads=1, head_dim=192, n_ff=10944, vocab_size=102400,
        context_length=163840, rope_theta=10000.0,
        rope_scaling_type="yarn", rope_scale_factor=40.0,
        rope_orig_context=4096, rope_yarn_log_mul=0.707,
        kv_lora_rank=512, qk_rope_dim=64, v_head_dim=128,
        n_dense_lead=1, n_experts=64, n_experts_used=6, n_ff_exp=1408,
    ),
    # tiny MLA debug model (absorbed-MQA attention + V3-style sigmoid
    # gating with selection bias and expert groups)
    "tiny-mla": ModelConfig(
        arch="deepseek2", n_layers=3, n_embd=128, n_heads=4, n_kv_heads=1,
        head_dim=48, n_ff=256, vocab_size=512, context_length=1024,
        kv_lora_rank=64, q_lora_rank=48, qk_rope_dim=16, v_head_dim=32,
        n_dense_lead=1, n_experts=8, n_experts_used=2, n_ff_exp=64,
        expert_gating_softmax=False, expert_weights_norm=True,
        expert_weights_scale=2.5, n_expert_groups=4, n_group_used=2,
    ),
    # gpt-oss-20b (LLM_TYPE_20B, llama-model.cpp:2269): all-MoE with
    # alternating SWA + sinks, swiglu_oai experts, post-top-k softmax
    "gpt-oss-20b": ModelConfig(
        arch="gpt-oss", n_layers=24, n_embd=2880, n_heads=64, n_kv_heads=8,
        head_dim=64, n_ff=2880, vocab_size=201088, context_length=131072,
        rope_theta=150000.0, rope_scaling_type="yarn",
        rope_scale_factor=32.0, rope_orig_context=4096,
        n_experts=32, n_experts_used=4, n_ff_exp=2880,
        swa_window=128, swa_pattern=2, attn_bias=True,
        expert_softmax_weight=True, moe_act="swiglu_oai",
    ),
    # tiny gpt-oss debug model
    "tiny-oss": ModelConfig(
        arch="gpt-oss", n_layers=3, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=32, n_ff=256, vocab_size=512, context_length=1024,
        n_experts=4, n_experts_used=2, n_ff_exp=64,
        swa_window=8, swa_pattern=2, attn_bias=True,
        expert_softmax_weight=True, moe_act="swiglu_oai",
    ),
    # tiny debug model
    "tiny": ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=512, vocab_size=512, context_length=1024,
        qk_norm=True, tie_embeddings=True,
    ),
}
