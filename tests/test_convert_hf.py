"""HF -> GGUF converter parity tests: fabricate tiny HF checkpoints with
transformers, convert, load with our loader, and compare logits against the
HF forward (the strongest cross-implementation oracle available offline)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rrs_tpu.models.loader import load_model
from rrs_tpu.tools.convert_hf import convert_hf_to_gguf


def _save_tiny(tmp_path, config, cls):
    torch.manual_seed(0)
    model = cls(config)
    model.eval()
    d = tmp_path / "hf"
    model.save_pretrained(str(d), safe_serialization=True)
    config.save_pretrained(str(d))
    return d, model


def _compare_logits(model, cfg, weights, toks, atol=2e-2):
    import jax.numpy as jnp

    from rrs_tpu.models import llama as lm

    with torch.no_grad():
        hf = model(torch.tensor([toks])).logits[0].float().numpy()

    t = len(toks)
    ks, vs = lm.scratch_caches(cfg, 1, 32, dtype=jnp.float32)
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    logits, _, _ = lm.forward(
        cfg, weights, jnp.asarray([toks], jnp.int32), pos, ks, vs, pos, pos)
    got = np.asarray(logits[0])
    # compare softmax-normalized logits (absolute offsets don't matter)
    hf_n = hf - hf.max(-1, keepdims=True)
    got_n = got - got.max(-1, keepdims=True)
    np.testing.assert_allclose(got_n, hf_n, atol=atol, rtol=0.05)


def test_convert_llama(tmp_path):
    config = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, tie_word_embeddings=False,
    )
    d, model = _save_tiny(tmp_path, config, transformers.LlamaForCausalLM)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32, fuse=False)
    assert cfg.arch == "llama" and cfg.n_layers == 2
    assert not cfg.rope_neox      # permuted for interleaved rope
    _compare_logits(model, cfg, weights, [3, 17, 42, 5])


def test_convert_qwen3(tmp_path):
    config = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=True,
    )
    d, model = _save_tiny(tmp_path, config, transformers.Qwen3ForCausalLM)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32, fuse=False)
    assert cfg.arch == "qwen3" and cfg.qk_norm
    _compare_logits(model, cfg, weights, [7, 9, 100])


def test_convert_mamba(tmp_path):
    config = transformers.MambaConfig(
        vocab_size=128, hidden_size=64, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4, use_cache=False,
        tie_word_embeddings=True,
    )
    d, model = _save_tiny(tmp_path, config, transformers.MambaForCausalLM)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32)
    assert cfg.is_recurrent and cfg.ssm_d_inner == 128

    import jax.numpy as jnp

    from rrs_tpu.models import mamba as mm

    toks = [3, 17, 42, 5]
    with torch.no_grad():
        hf = model(torch.tensor([toks])).logits[0].float().numpy()
    conv = [jnp.zeros((1, cfg.ssm_d_conv - 1, cfg.ssm_d_inner), jnp.float32)
            for _ in range(cfg.n_layers)]
    ssm = [jnp.zeros((1, cfg.ssm_d_inner, cfg.ssm_d_state), jnp.float32)
           for _ in range(cfg.n_layers)]
    logits, _, _ = mm.forward(cfg, weights, jnp.asarray([toks], jnp.int32),
                              conv, ssm)
    got = np.asarray(logits[0])
    hf_n = hf - hf.max(-1, keepdims=True)
    got_n = got - got.max(-1, keepdims=True)
    np.testing.assert_allclose(got_n, hf_n, atol=3e-2, rtol=0.05)


def test_convert_tokenizer_export(tmp_path):
    d = tmp_path / "hf"
    d.mkdir()
    # minimal BPE tokenizer.json
    (d / "tokenizer.json").write_text(json.dumps({
        "model": {"type": "BPE",
                  "vocab": {"a": 0, "b": 1, "ab": 2, "<eos>": 3},
                  "merges": ["a b"]},
        "added_tokens": [{"id": 3, "content": "<eos>"}],
    }))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "eos_token": "<eos>", "chat_template": "x{{messages}}",
    }))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["LlamaForCausalLM"],
        "num_hidden_layers": 0, "hidden_size": 8, "intermediate_size": 16,
        "num_attention_heads": 2, "vocab_size": 4,
    }))
    import numpy as np2
    from safetensors.numpy import save_file

    save_file({"model.embed_tokens.weight": np2.zeros((4, 8), np2.float32),
               "model.norm.weight": np2.ones((8,), np2.float32)},
              str(d / "model.safetensors"))
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    from rrs_tpu.gguf.reader import read_gguf

    with read_gguf(out) as g:
        md = g.metadata
        assert list(md["tokenizer.ggml.tokens"]) == ["a", "b", "ab", "<eos>"]
        assert md["tokenizer.ggml.merges"] == ["a b"]
        assert md["tokenizer.ggml.eos_token_id"] == 3
        assert md["tokenizer.chat_template"] == "x{{messages}}"


def test_convert_gemma2(tmp_path):
    """Gemma2: softcaps + sandwich norms + alternating SWA + +1 norms must
    match the HF forward."""
    if not hasattr(transformers, "Gemma2ForCausalLM"):
        pytest.skip("transformers lacks Gemma2")
    config = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        query_pre_attn_scalar=16, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        tie_word_embeddings=True, attn_implementation="eager",
    )
    d, model = _save_tiny(tmp_path, config, transformers.Gemma2ForCausalLM)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32, fuse=False)
    assert cfg.arch == "gemma2"
    assert cfg.swa_window == 8 and cfg.swa_pattern == 2
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    assert cfg.sandwich_norm and cfg.ffn_act == "gelu"
    assert abs(cfg.embd_scale - 8.0) < 1e-6          # sqrt(64)
    # 12-token prompt exceeds the window: SWA masking is exercised
    _compare_logits(model, cfg, weights, list(range(3, 15)), atol=5e-2)


def test_convert_deepseek_v2_dense(tmp_path):
    """DeepSeek-V2 MLA (lite, all-dense FFN): converted + loaded logits
    must match the HF eager forward — validates the absorbed-MQA
    attention against HF's decompressed-MHA computation."""
    config = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=24, head_dim=16,
        first_k_dense_replace=2, n_routed_experts=4, n_shared_experts=1,
        num_experts_per_tok=2, moe_intermediate_size=48,
        topk_method="greedy", n_group=None, topk_group=None,
        max_position_embeddings=128, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    d, model = _save_tiny(tmp_path, config, transformers.DeepseekV2ForCausalLM)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32, fuse=False)
    assert cfg.arch == "deepseek2" and cfg.is_mla
    assert cfg.kv_lora_rank == 32 and cfg.qk_rope_dim == 16
    assert cfg.head_dim == 48 and cfg.v_head_dim == 24
    _compare_logits(model, cfg, weights, [3, 17, 42, 5, 99])


def test_convert_deepseek_v2_moe(tmp_path):
    """DeepSeek-V2 with q LoRA + routed/shared experts + group-limited
    routing: logits must match HF eager."""
    config = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=24, head_dim=16,
        first_k_dense_replace=1, n_routed_experts=8, n_shared_experts=2,
        num_experts_per_tok=2, moe_intermediate_size=48,
        topk_method="greedy", n_group=None, topk_group=None,
        norm_topk_prob=False, routed_scaling_factor=1.0,
        max_position_embeddings=128, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    d, model = _save_tiny(tmp_path, config, transformers.DeepseekV2ForCausalLM)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32, fuse=False)
    assert cfg.arch == "deepseek2" and cfg.q_lora_rank == 24
    assert cfg.n_dense_lead == 1 and cfg.n_experts == 8
    _compare_logits(model, cfg, weights, [7, 9, 100, 2], atol=4e-2)


def test_convert_gptoss(tmp_path):
    """gpt-oss: fused-interleaved expert de-interleave, sinks, alternating
    SWA, post-top-k softmax routing — vs the HF eager forward."""
    config = transformers.GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=4, max_position_embeddings=128,
        rope_scaling=None, tie_word_embeddings=False,
    )
    d, model = _save_tiny(tmp_path, config, transformers.GptOssForCausalLM)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32, fuse=False)
    assert cfg.arch == "gpt-oss" and cfg.swa_pattern == 2
    assert cfg.expert_softmax_weight and cfg.moe_act == "swiglu_oai"
    assert weights.layers[0].attn_sinks is not None
    # 6 tokens: with window 4 the sliding layer actually masks history
    _compare_logits(model, cfg, weights, [3, 17, 42, 5, 99, 8])


def test_convert_phi3(tmp_path):
    """phi3: PRE-fused qkv_proj/gate_up_proj pass straight through into the
    GGUF attn_qkv/ffn_up layouts the forward splits natively."""
    config = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, tie_word_embeddings=False, sliding_window=None,
    )
    d, model = _save_tiny(tmp_path, config, transformers.Phi3ForCausalLM)
    out = convert_hf_to_gguf(d, tmp_path / "m.gguf")
    cfg, weights, md = load_model(out, dtype=np.float32)
    assert cfg.arch == "phi3"
    assert weights.layers[0].wqkv is not None
    assert weights.layers[0].w_gateup is not None
    _compare_logits(model, cfg, weights, [3, 17, 42, 5])
