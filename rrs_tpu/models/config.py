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
    # set only inside shard_map: mesh axis name for tensor parallelism; when
    # set, row-parallel projections (wo, ffn_down) psum over it
    tp_axis: "str | None" = None

    @property
    def n_q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def n_kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim

    @staticmethod
    def from_gguf(md: Mapping[str, Any]) -> "ModelConfig":
        arch = md["general.architecture"]

        def key(suffix, default=None):
            v = md.get(f"{arch}.{suffix}", default)
            return v

        n_embd = int(key("embedding_length"))
        n_heads = int(key("attention.head_count"))
        n_kv = int(key("attention.head_count_kv", n_heads))
        head_dim = int(key("attention.key_length", n_embd // n_heads))

        scaling = str(key("rope.scaling.type", "none") or "none")
        vocab = md.get("tokenizer.ggml.tokens")
        vocab_size = int(key("vocab_size", len(vocab) if vocab is not None else 0))

        return ModelConfig(
            arch=arch,
            n_layers=int(key("block_count")),
            n_embd=n_embd,
            n_heads=n_heads,
            n_kv_heads=n_kv,
            head_dim=head_dim,
            n_ff=int(key("feed_forward_length")),
            vocab_size=vocab_size,
            context_length=int(key("context_length", 4096)),
            rms_eps=float(key("attention.layer_norm_rms_epsilon", 1e-6)),
            rope_theta=float(key("rope.freq_base", 10000.0)),
            rope_scaling_type=scaling,
            rope_scale_factor=float(key("rope.scaling.factor", 1.0) or 1.0),
            rope_orig_context=int(key("rope.scaling.original_context_length", 0) or 0),
            # llama arch weights are pre-permuted by convert_hf_to_gguf for
            # interleaved (NORM) rope; qwen/neox-style archs use split-half.
            rope_neox=arch not in ("llama",),
            qk_norm=arch in ("qwen3", "qwen3moe"),
            attn_bias=arch in ("qwen2", "qwen2moe"),
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
    # tiny debug model
    "tiny": ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=512, vocab_size=512, context_length=1024,
        qk_norm=True, tie_embeddings=True,
    ),
}
