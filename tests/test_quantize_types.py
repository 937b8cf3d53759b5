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


@pytest.mark.parametrize("out_type,want_gt,corr_min", [
    ("q2_k", GGMLType.Q2_K, 0.55),
    ("q3_k_s", GGMLType.Q3_K, 0.85),
    ("q3_k_m", GGMLType.Q3_K, 0.85),
    ("q4_k_m", GGMLType.Q4_K, 0.95),
    ("q5_k_m", GGMLType.Q5_K, 0.97),
    ("q6_k", GGMLType.Q6_K, 0.99),
    ("iq4_nl", GGMLType.IQ4_NL, 0.95),
    ("iq4_xs", GGMLType.IQ4_XS, 0.95),
    ("q4_0", GGMLType.Q4_0, 0.90),
    ("q5_1", GGMLType.Q5_1, 0.95),
])
def test_kquant_ftype_menu(tmp_path, out_type, want_gt, corr_min):
    """Round-3 ftype menu: every K-quant/IQ4/legacy ftype produces a
    loadable GGUF with finite, f32-correlated logits."""
    f32 = tmp_path / "f32.gguf"
    export_random_gguf(CFG, f32, seed=9)
    dst = tmp_path / f"{out_type}.gguf"
    stats = quantize_model(str(f32), str(dst), out_type=out_type,
                           verbose=False)
    assert stats["converted"] > 0

    g = GGUFFile(str(dst))
    # attn_q is never upgraded by the mix policy: it shows the base type
    assert g.tensors["blk.0.attn_q.weight"].ggml_type == want_gt
    assert g.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    g.close()

    base = _greedy(f32)
    got = _greedy(dst)
    corr = np.corrcoef(base, got)[0, 1]
    assert corr > corr_min, (out_type, corr)


def test_mix_policy_tensor_table(tmp_path):
    """The per-tensor mix must match llama_tensor_get_type's table
    (llama-quant.cpp:265-530) on a non-GQA 2-layer model: Q4_K_M puts
    Q6_K on attn_v/ffn_down of use_more_bits layers and the output head;
    Q3_K_M upgrades attn_output to Q4_K and layer-0/1 attn_v to Q5_K."""
    f32 = tmp_path / "f32.gguf"
    export_random_gguf(CFG, f32, seed=9)

    dst = tmp_path / "q4km.gguf"
    quantize_model(str(f32), str(dst), out_type="q4_k_m", verbose=False)
    g = GGUFFile(str(dst))
    # n_layers=2: use_more_bits(0,2)=False (0 < 2//8=0 is False,
    # 0 >= 7*2//8=1 False, (0-0)%3==2 False); umb(1,2)=True (1 >= 1)
    assert g.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.Q4_K
    assert g.tensors["blk.1.attn_v.weight"].ggml_type == GGMLType.Q6_K
    assert g.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q4_K
    assert g.tensors["blk.1.ffn_down.weight"].ggml_type == GGMLType.Q6_K
    assert g.tensors["output.weight"].ggml_type == GGMLType.Q6_K \
        or "output.weight" not in g.tensors
    g.close()

    dst = tmp_path / "q3km.gguf"
    quantize_model(str(f32), str(dst), out_type="q3_k_m", verbose=False)
    g = GGUFFile(str(dst))
    assert g.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.Q5_K
    assert g.tensors["blk.0.attn_output.weight"].ggml_type == GGMLType.Q4_K
    assert g.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q4_K
    g.close()


def test_imatrix_weighted_quantize(tmp_path):
    """--imatrix routes channel second moments into the weighted encoders
    for K-quant ftypes (qw plumbing end to end)."""
    f32 = tmp_path / "f32.gguf"
    export_random_gguf(CFG, f32, seed=9)
    im = {"blk.0.attn_q.weight": np.linspace(0.1, 3.0, CFG.n_embd
                                             ).astype(np.float32)}
    dst = tmp_path / "q6k_im.gguf"
    stats = quantize_model(str(f32), str(dst), out_type="q6_k",
                           verbose=False, imatrix=im)
    assert stats["converted"] > 0
    base = _greedy(f32)
    got = _greedy(dst)
    assert np.corrcoef(base, got)[0, 1] > 0.99
