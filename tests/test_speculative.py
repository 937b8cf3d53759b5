"""Speculative decoding tests (common/speculative.cpp behavior)."""

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime.sampler import SamplerParams
from rrs_tpu.runtime.speculative import generate_speculative


def test_self_draft_matches_greedy_and_accepts_everything():
    """With draft == target, speculation must reproduce plain greedy output
    and accept every drafted token."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    prompt = [1, 2, 3]
    n_new = 10

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    ref = ctx.generate(prompt, n_new, SamplerParams(temperature=0.0))

    target = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    draft = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    got, stats = generate_speculative(target, draft, prompt, n_new, n_draft=3)

    assert got == ref, (got, ref)
    assert stats.acceptance_rate == 1.0, stats


def test_different_draft_still_correct():
    """A mismatched draft must not change the target's greedy output."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    w_draft = random_weights(cfg, seed=99)
    prompt = [5, 6]
    n_new = 8

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    ref = ctx.generate(prompt, n_new, SamplerParams(temperature=0.0))

    target = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    draft = InferenceContext(cfg, w_draft, n_lanes=1, max_seq=64)
    got, stats = generate_speculative(target, draft, prompt, n_new, n_draft=3)

    assert got == ref, (got, ref)
    assert 0.0 <= stats.acceptance_rate <= 1.0


def _byte_vocab(n_extra=0, special_suffix=""):
    """Byte-level SPM-style vocab: token i = chr(i) for the 256 bytes
    (ids 3..258), plus specials and optional tail padding tokens."""
    from rrs_tpu.models.vocab import Vocab

    tokens = ["<unk>", "<s>", "</s>"] + [chr(i) for i in range(256)]
    tokens += [f"<extra{i}{special_suffix}>" for i in range(n_extra)]
    return Vocab(model="llama", tokens=tokens,
                 scores=[0.0] * len(tokens), token_types=None, merges=None,
                 bos_id=1, eos_id=2, unk_id=0, add_bos=False,
                 add_space_prefix=False)


def test_vocab_compatibility_gate():
    """speculative_are_compatible (common/speculative.cpp:89-148):
    identical and tail-extended vocabs pass; diverging token text,
    oversized diffs and special-token mismatches fail."""
    import dataclasses as dc

    from rrs_tpu.runtime.speculative import (
        SPEC_VOCAB_MAX_SIZE_DIFFERENCE, speculative_are_compatible)

    a = _byte_vocab()
    assert speculative_are_compatible(a, _byte_vocab())
    assert speculative_are_compatible(a, _byte_vocab(n_extra=4))
    assert not speculative_are_compatible(
        a, _byte_vocab(n_extra=SPEC_VOCAB_MAX_SIZE_DIFFERENCE + 1))
    b = _byte_vocab()
    b.tokens[40] = "DIFFERENT"
    assert not speculative_are_compatible(a, b)
    assert not speculative_are_compatible(a, dc.replace(a, eos_id=0))
    assert not speculative_are_compatible(a, dc.replace(a, add_bos=True))


def test_translated_draft_matches_greedy():
    """A draft with a DIFFERENT vocab (retokenization path) must still
    reproduce the target's greedy output exactly — proposals only ever
    gate speed, never content (speculative.cpp:204-262 semantics)."""
    import dataclasses as dc

    from rrs_tpu.runtime.speculative import (VocabTranslator,
                                             speculative_are_compatible)

    cfg = PRESETS["tiny"]          # vocab_size 512 >= byte vocab
    v_tgt = _byte_vocab(n_extra=2)
    v_dft = _byte_vocab(n_extra=2, special_suffix="_dft")
    assert not speculative_are_compatible(v_tgt, v_dft)

    w = random_weights(cfg, seed=0)
    w_draft = random_weights(dc.replace(cfg, vocab_size=300), seed=7)
    # greedy over byte tokens only: prompt in byte-token id space
    prompt = [ord(c) + 3 for c in "hello"]
    n_new = 8

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    ref = ctx.generate(prompt, n_new, SamplerParams(temperature=0.0))

    target = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    draft = InferenceContext(dc.replace(cfg, vocab_size=300), w_draft,
                             n_lanes=1, max_seq=64)
    tr = VocabTranslator(v_tgt, v_dft)
    got, stats = generate_speculative(target, draft, prompt, n_new,
                                      n_draft=3, translator=tr)
    assert got == ref, (got, ref)
    assert 0.0 <= stats.acceptance_rate <= 1.0
