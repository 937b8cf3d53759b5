"""End-to-end pipeline: export GGUF -> imatrix -> quantize (+reorder) -> load -> run.

This is the Qwen3-0.6B-style minimum slice of SURVEY §7 phase 2/4, on a tiny
random model: verifies the full tool chain and that TCQ4 quantization keeps
the model's function close to the f32 original.
"""

import numpy as np
import pytest

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.export import export_random_gguf
from rrs_tpu.models.loader import load_model
from rrs_tpu.quantize.imatrix import (
    collect_imatrix,
    derive_tcq4_perms,
    load_imatrix,
    save_imatrix,
)
from rrs_tpu.quantize.quantizer import quantize_model
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.tools.perplexity import compute_perplexity

CFG = ModelConfig(
    arch="qwen3", n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
    head_dim=64, n_ff=512, vocab_size=256, context_length=512, qk_norm=True,
)


@pytest.fixture(scope="module")
def model_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    src = d / "f32.gguf"
    export_random_gguf(CFG, src, seed=0)
    return d, src


def test_load_exported(model_files):
    d, src = model_files
    cfg, weights, md = load_model(src)
    assert cfg.n_layers == CFG.n_layers
    assert cfg.vocab_size == CFG.vocab_size
    ctx = InferenceContext(cfg, weights, n_lanes=1, max_seq=64)
    out = ctx.generate([1, 2, 3], 4)
    assert len(out) == 4


def test_quantize_load_run_and_ppl_delta(model_files):
    d, src = model_files
    # 1) imatrix collection on random token chunks
    cfg, weights, md = load_model(src)
    rng = np.random.default_rng(0)
    chunks = [list(rng.integers(0, CFG.vocab_size, 64)) for _ in range(2)]
    acc = collect_imatrix(cfg, weights, chunks, chunk_len=64)
    assert any(k.endswith("ffn_up.weight") for k in acc)
    im_path = d / "imatrix.gguf"
    save_imatrix(im_path, acc)
    im = load_imatrix(im_path)
    perms = derive_tcq4_perms(im)
    assert all(np.sort(p[:256]).tolist() == list(range(256)) for p in perms.values())

    # 2) quantize with reorder
    dst = d / "tcq4.gguf"
    stats = quantize_model(src, dst, perms=perms, verbose=False)
    assert stats["tcq4"] > 0
    assert stats["bytes_out"] < stats["bytes_in"]

    # 3) load + run; compare PPL vs f32 on the same stream
    cfg_q, weights_q, md_q = load_model(dst)
    assert md_q.get("tcq4.reorder.enabled") is True
    toks = list(rng.integers(0, CFG.vocab_size, 128))

    ctx_f = InferenceContext(cfg, weights, n_lanes=1, max_seq=64)
    ctx_q = InferenceContext(cfg_q, weights_q, n_lanes=1, max_seq=64)
    ppl_f = compute_perplexity(ctx_f, toks, n_ctx=64).ppl
    ppl_q = compute_perplexity(ctx_q, toks, n_ctx=64).ppl
    # random model on random tokens: ppl ~ vocab_size; quant must stay close
    assert abs(np.log(ppl_q) - np.log(ppl_f)) < 0.15, (ppl_f, ppl_q)


def test_multiple_choice_and_kl(model_files):
    """hellaswag/MMLU-style choice scoring + KL divergence evaluators."""
    import numpy as np

    from rrs_tpu.models.loader import load_model
    from rrs_tpu.runtime.context import InferenceContext
    from rrs_tpu.tools.perplexity import kl_divergence, multiple_choice_score

    d, src = model_files
    cfg, weights, md = load_model(src)
    ctx = InferenceContext(cfg, weights, n_lanes=1, max_seq=128)

    class CharVocab:
        def encode(self, text, add_special=False):
            return [ord(c) % cfg.vocab_size for c in text]

    vocab = CharVocab()
    tasks = [{"prompt": "ab", "choices": ["cd", "ef"], "answer": 0},
             {"prompt": "gh", "choices": ["ij", "kl", "mn"], "answer": 2}]
    acc, picks = multiple_choice_score(ctx, vocab, tasks)
    assert 0.0 <= acc <= 1.0 and len(picks) == 2
    assert all(p in (0, 1, 2) for p in picks)

    toks = vocab.encode("abcdefgh")
    seq = ctx.new_sequence()
    base = ctx.prefill(seq, toks)
    ctx.kv.seq_rm(seq)
    r = kl_divergence(ctx, base, toks)
    # same model vs itself: KL ~ 0, top tokens identical
    assert r["mean_kl"] < 1e-4 and r["same_top_rate"] == 1.0


def test_perplexity_pp_matches_single_device(model_files):
    """--pp product surface: pipeline-parallel perplexity equals the
    single-device InferenceContext protocol on the same chunks."""
    from rrs_tpu.parallel.pipeline import make_pp_mesh
    from rrs_tpu.tools.perplexity import compute_perplexity_pp

    d, src = model_files
    cfg, weights, md = load_model(src)
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, CFG.vocab_size, 3 * 48).tolist()

    ctx = InferenceContext(cfg, weights, n_lanes=1, max_seq=64)
    base = compute_perplexity(ctx, tokens, n_ctx=48)

    cfgu, weightsu, _ = load_model(src)         # unfused not required: same file
    mesh = make_pp_mesh(2)
    res = compute_perplexity_pp(cfgu, weightsu, tokens, mesh,
                                n_ctx=48, n_micro=2)
    assert res.n_tokens == base.n_tokens
    assert abs(res.ppl - base.ppl) / base.ppl < 0.02, (res.ppl, base.ppl)
