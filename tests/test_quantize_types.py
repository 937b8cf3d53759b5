"""`quantize --type` output formats (the llama-quantize ftype menu analog,
reference tools/quantize/quantize.cpp type table): each non-default type
must produce a loadable GGUF whose logits track the f32 original."""

import numpy as np
import jax.numpy as jnp
import pytest

from rrs_tpu.gguf.constants import GGMLType
from rrs_tpu.gguf.reader import GGUFFile
from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.export import export_random_gguf
from rrs_tpu.models.loader import load_model
from rrs_tpu.quantize.quantizer import quantize_model
from rrs_tpu.runtime.context import InferenceContext

CFG = ModelConfig(
    arch="qwen3", n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
    head_dim=64, n_ff=512, vocab_size=96, context_length=128, qk_norm=True)


def _greedy(path):
    cfg, w, _ = load_model(path)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    seq = ctx.new_sequence()
    logits = np.asarray(ctx.prefill(seq, [1, 2, 3, 4]))
    assert np.isfinite(logits).all()
    return logits[-1]


@pytest.mark.parametrize("out_type,want_gt", [
    ("q4_k", GGMLType.Q4_K),
    ("q8_0", GGMLType.Q8_0),
    ("mxfp4", GGMLType.MXFP4),
    ("f16", GGMLType.F16),
])
def test_quantize_type_roundtrip(tmp_path, out_type, want_gt):
    f32 = tmp_path / "f32.gguf"
    export_random_gguf(CFG, f32, seed=9)
    dst = tmp_path / f"{out_type}.gguf"
    stats = quantize_model(str(f32), str(dst), out_type=out_type,
                           verbose=False)
    assert stats["converted"] > 0

    g = GGUFFile(str(dst))
    assert g.tensors["blk.0.attn_q.weight"].ggml_type == want_gt
    assert g.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    g.close()

    base = _greedy(f32)
    got = _greedy(dst)
    # 4-bit formats drift but top-1 on a 2-layer random model must agree
    # with the f32 original for the 8-bit/16-bit types; for 4-bit just
    # demand a high logit correlation
    corr = np.corrcoef(base, got)[0, 1]
    # e2m1 + power-of-two shared scales (mxfp4) is coarser than q4_k's
    # searched asymmetric scales — byte-level codec correctness is pinned
    # separately (test_kquants/test_mxfp4); this is an end-to-end sanity
    # bound, not a quality spec
    assert corr > (0.90 if out_type == "mxfp4" else 0.95), (out_type, corr)
    if out_type in ("q8_0", "f16"):
        assert int(base.argmax()) == int(got.argmax())
