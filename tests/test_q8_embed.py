"""Q8-packed embedding tables (GET_ROWS-on-quantized analog,
ggml-cpu/ops.cpp get_rows; the reference keeps large vocab tables
quantized and dequantizes looked-up rows). Here the packed table stays on
device as (q int8 [V,E], scale [V, E//32]) and embed_rows dequantizes the
gathered rows — halves table HBM for 200k-vocab models (gpt-oss)."""

import numpy as np
import jax.numpy as jnp

from rrs_tpu.formats.kquants import dequantize_q8_0, quantize_q8_0
from rrs_tpu.models.llama import embed_rows


def _packed_table(rng, v, e):
    w = (rng.standard_normal((v, e)) * 0.05).astype(np.float32)
    raw = quantize_q8_0(w)
    wd = dequantize_q8_0(raw, v * e).reshape(v, e)
    blocks = np.frombuffer(raw.tobytes(), np.uint8).reshape(v, e // 32, 34)
    d = blocks[:, :, :2].copy().view(np.float16)[:, :, 0].astype(np.float32)
    q = blocks[:, :, 2:].view(np.int8).reshape(v, e)
    return (jnp.asarray(q.copy()), jnp.asarray(d)), wd


def test_embed_rows_q8_matches_dequant():
    rng = np.random.default_rng(0)
    packed, wd = _packed_table(rng, v=64, e=128)
    toks = jnp.asarray([[3, 0, 63], [7, 7, 12]], jnp.int32)
    got = np.asarray(embed_rows(packed, toks), np.float32)
    want = wd[np.asarray(toks)]
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)  # bf16 mul
    # dense path unchanged
    dense = jnp.asarray(wd, jnp.float32)
    got2 = np.asarray(embed_rows(dense, toks))
    np.testing.assert_array_equal(got2, want)


def test_loader_keeps_q8_embed_packed(tmp_path):
    from rrs_tpu.gguf.constants import GGMLType
    from rrs_tpu.gguf.reader import GGUFFile
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models.export import export_random_gguf
    from rrs_tpu.models.loader import load_model
    from rrs_tpu.quantize.quantizer import quantize_model
    from rrs_tpu.runtime.context import InferenceContext

    cfg0 = ModelConfig(
        arch="qwen3", n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
        head_dim=64, n_ff=512, vocab_size=96, context_length=128,
        qk_norm=True)
    f32 = tmp_path / "f32.gguf"
    export_random_gguf(cfg0, f32, seed=5)
    q8 = tmp_path / "q8emb.gguf"
    quantize_model(str(f32), str(q8), verbose=False)  # embed policy: Q8_0
    g = GGUFFile(str(q8))
    assert g.tensors["token_embd.weight"].ggml_type == GGMLType.Q8_0
    g.close()

    cfg, w, _ = load_model(q8)
    assert isinstance(w.embed, tuple) and w.embed[0].dtype == jnp.int8

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    seq = ctx.new_sequence()
    logits = ctx.prefill(seq, [1, 2, 3])
    assert np.isfinite(np.asarray(logits)).all()
