"""Benchmark-task dataset loaders + scorers (perplexity.cpp hellaswag/
winogrande/multiple-choice formats) and the chat REPL command."""

import struct
import subprocess
import sys

import numpy as np
import pytest

from rrs_tpu.tools.perplexity import (
    hellaswag_score, load_hellaswag, load_multiple_choice_bin,
    load_winogrande, winogrande_score)


def test_load_hellaswag_format():
    text = "\n".join([
        "Cooking: she takes the pan", "2",
        "and throws it away.", "and eats it raw.",
        "and puts it on the stove.", "and sings to it.",
        "Sports: he grabs the ball", "0",
        "and runs.", "and sleeps.", "and flies.", "and melts.",
    ]) + "\n"
    tasks = load_hellaswag(text)
    assert len(tasks) == 2
    assert tasks[0]["answer"] == 2
    assert tasks[0]["choices"][2] == " and puts it on the stove."
    assert tasks[1]["prompt"].startswith("Sports:")
    with pytest.raises(ValueError):
        load_hellaswag("only\nfive\nlines\nin\nthis\n")


def test_load_winogrande_csv():
    csv = ('1,"The trophy doesn\'t fit in the suitcase because _ is too '
           'large.",trophy,suitcase,1\n'
           "2,Ann asked Mary what time _ should come over.,Ann,Mary,2\n")
    tasks = load_winogrande(csv)
    assert len(tasks) == 2
    assert tasks[0]["choices"] == ["trophy", "suitcase"]
    assert tasks[0]["answer"] == 1
    assert "_" in tasks[1]["sentence"]


def test_load_multiple_choice_bin():
    def ser_s(t):
        b = t.encode()
        return struct.pack("<I", len(b)) + b

    def ser_mc(answers, labels):
        out = struct.pack("<I", len(answers))
        out += b"".join(ser_s(a) for a in answers)
        out += struct.pack(f"<{len(labels)}i", *labels)
        return out

    task = ser_s("What is 2+2?") \
        + ser_mc(["3", "4", "5"], [0, 1, 0]) \
        + ser_mc([], [])
    blob = struct.pack("<I", 1) + struct.pack("<I", 0) + task
    tasks = load_multiple_choice_bin(blob)
    assert len(tasks) == 1
    assert tasks[0]["answer"] == 1
    assert tasks[0]["choices"] == [" 3", " 4", " 5"]


def _tiny_ctx():
    from rrs_tpu.models.config import ModelConfig
    from rrs_tpu.models import llama as lm
    from rrs_tpu.runtime.context import InferenceContext

    cfg = ModelConfig(arch="qwen3", n_layers=2, n_embd=128, n_heads=4,
                      n_kv_heads=2, head_dim=32, n_ff=256, vocab_size=256,
                      context_length=256, qk_norm=True)
    w = lm.random_weights(cfg, seed=0)
    return InferenceContext(cfg, w, n_lanes=1, max_seq=128)


class _ByteVocab:
    eos_id = -1

    def encode(self, text, add_special=False):
        return [b % 256 for b in text.encode()][:48] or [1]

    def decode(self, ids):
        return "".join(chr(33 + (i % 90)) for i in ids)


def test_scorers_run_end_to_end():
    ctx = _tiny_ctx()
    vocab = _ByteVocab()
    hs = load_hellaswag("\n".join([
        "ctx a", "1", "e0", "e1", "e2", "e3"]) + "\n")
    acc = hellaswag_score(ctx, vocab, hs)
    assert 0.0 <= acc <= 1.0
    wg = load_winogrande("1,a _ b.,x,y,2\n")
    acc2 = winogrande_score(ctx, vocab, wg)
    assert 0.0 <= acc2 <= 1.0
