"""LoRA + control vector tests (llama-adapter.cpp semantics)."""

import numpy as np
import jax.numpy as jnp

from rrs_tpu.gguf.writer import GGUFWriter
from rrs_tpu.models.adapter import (
    ControlVector,
    LoraLinear,
    attach_lora,
    load_lora_gguf,
)
from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.linear import DenseLinear, linear_apply
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext


def test_lora_delta_math():
    rng = np.random.default_rng(0)
    k, n, r, m = 64, 32, 4, 3
    w = rng.standard_normal((k, n)).astype(np.float32)
    a = rng.standard_normal((k, r)).astype(np.float32)
    b = rng.standard_normal((r, n)).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    base = DenseLinear(w=jnp.asarray(w))
    lora = LoraLinear(base=base, a=jnp.asarray(a), b=jnp.asarray(b), scale=0.5)
    got = np.asarray(linear_apply(lora, jnp.asarray(x)))
    ref = x @ w + 0.5 * (x @ a @ b)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_lora_gguf_roundtrip_and_attach(tmp_path):
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    rng = np.random.default_rng(1)
    r = 4
    path = tmp_path / "adapter.gguf"
    gw = GGUFWriter(path)
    gw.add_string("general.architecture", cfg.arch)
    gw.add_float32("adapter.lora.alpha", 8.0)
    a = (rng.standard_normal((r, cfg.n_embd)) * 0.3).astype(np.float32)  # [r, K]
    b = (rng.standard_normal((cfg.n_q_dim, r)) * 0.3).astype(np.float32)  # [N, r]
    gw.add_tensor("blk.0.attn_q.weight.lora_a", a)
    gw.add_tensor("blk.0.attn_q.weight.lora_b", b)
    gw.write()

    adapters, _ = load_lora_gguf(path)
    assert "blk.0.attn_q.weight" in adapters
    la, lb, eff = adapters["blk.0.attn_q.weight"]
    assert la.shape == (cfg.n_embd, r) and lb.shape == (r, cfg.n_q_dim)
    assert abs(eff - 8.0 / r) < 1e-6

    ctx_ref = InferenceContext(cfg, w, n_lanes=1, max_seq=32)
    s = ctx_ref.new_sequence()
    base_logits = ctx_ref.prefill(s, [1, 2, 3])

    w2 = random_weights(cfg, seed=0)
    attach_lora(w2, adapters)
    ctx2 = InferenceContext(cfg, w2, n_lanes=1, max_seq=32)
    s2 = ctx2.new_sequence()
    lora_logits = ctx2.prefill(s2, [1, 2, 3])
    assert not np.allclose(base_logits, lora_logits)


def test_control_vector_shifts_activations():
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    cv = ControlVector(
        vectors=jnp.ones((cfg.n_layers, cfg.n_embd), jnp.float32) * 0.5,
        strength=1.0,
    )
    import jax
    from rrs_tpu.models import llama as llama_model

    tokens = jnp.asarray([[1, 2]], jnp.int32)
    pos = jnp.asarray([[0, 1]], jnp.int32)
    shape = (1, cfg.n_kv_heads, 8, cfg.head_dim)
    kc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    vc = [jnp.zeros(shape, jnp.bfloat16) for _ in range(cfg.n_layers)]
    base, _, _ = llama_model.forward(cfg, w, tokens, pos, kc, vc, pos, pos)
    steered, _, _ = llama_model.forward(
        cfg, w, tokens, pos, kc, vc, pos, pos, control_vector=cv
    )
    assert not np.allclose(np.asarray(base), np.asarray(steered))
