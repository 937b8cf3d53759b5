"""Prompt-lookup decoding tests (common/ngram-cache.cpp analog)."""

import numpy as np

from rrs_tpu.models.config import ModelConfig
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime.lookup import NGramCache, generate_lookup


def _cfg():
    return ModelConfig(
        arch="qwen3", n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2,
        head_dim=32, n_ff=256, vocab_size=64, context_length=256,
        qk_norm=True)


def test_ngram_cache_draft():
    c = NGramCache(n_min=1, n_max=3)
    c.update([1, 2, 3, 4, 1, 2, 3, 5, 1, 2, 3])
    # tail [.., 1, 2, 3]: 3-gram (1,2,3) -> 4 and 5 seen; most common is tie
    d = c.draft(1)
    assert d and d[0] in (4, 5)
    c2 = NGramCache()
    c2.update([7, 8, 7, 8, 7])
    d2 = c2.draft(3)
    assert d2[:2] == [8, 7]


def test_ngram_cache_save_load(tmp_path):
    c = NGramCache()
    c.update([1, 2, 3, 1, 2, 3, 1, 2])
    p = tmp_path / "ngrams.json"
    c.save(p)
    c2 = NGramCache.load(p)
    c2._history = list(c._history)
    assert c2.draft(1) == c.draft(1)


def test_generate_lookup_matches_greedy():
    """Lookup decoding must produce EXACTLY the plain greedy output
    (speculation changes speed, never results)."""
    cfg = _cfg()
    w = random_weights(cfg, seed=3)
    # repetitive prompt so ngram drafting actually fires
    prompt = [5, 6, 7, 8, 5, 6, 7, 8, 5, 6, 7, 8]

    ctx1 = InferenceContext(cfg, w, n_lanes=1, max_seq=128)
    plain = ctx1.generate(prompt, max_new_tokens=12)

    ctx2 = InferenceContext(cfg, w, n_lanes=1, max_seq=128)
    out, stats = generate_lookup(ctx2, prompt, max_new_tokens=12)
    # generate() stops at stop tokens only; both greedy
    assert out[: len(plain)] == plain
    assert stats.n_drafted >= 0
