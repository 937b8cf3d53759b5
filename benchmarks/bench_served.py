"""Served-decode throughput through the Engine (the server-context hot
loop) on Qwen3-4B TCQ4 fabricated weights — the PERF.md served table.

Paths measured (single stream, real chip):
  plain     — pipelined device micro-runs (the round-2 fast path)
  penalties — repetition/frequency penalties ON DEVICE (round 3)
  grammar   — optimistic fast path + host-PDA validation (round 3);
              vocab fabricated ~90% lowercase word pieces, grammar
              [a-z ]+ (a realistic acceptance profile: real tokenizers
              are mostly word pieces and schema-prompted models emit
              mostly-legal tokens)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_served.py
"""
import string
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models import llama as lm
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime.grammar import Grammar
from rrs_tpu.runtime.sampler import SamplerParams
from rrs_tpu.serving.engine import Engine, GenRequest


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_case(eng, label, n_tokens=256, pieces=None, **kw):
    out, done = [], {}

    def on_token(tok, piece, finished, reason):
        if finished:
            done["r"] = reason
        elif tok is not None:
            out.append(tok)

    grammar = None
    trie = None
    if kw.pop("grammar_gbnf", None):
        from rrs_tpu.runtime.grammar import build_token_trie

        grammar = Grammar("root ::= [a-z ]+")
        trie = build_token_trie(pieces)    # the vocab.token_trie analog:
        # without it every rejection masks 151k pieces through the PDA
    n_probs = kw.pop("n_probs", 0)
    req = GenRequest(
        prompt_tokens=[5, 6, 7, 8], max_tokens=n_tokens,
        params=SamplerParams(temperature=0.8, top_k=40, **kw),
        n_probs=n_probs,
        on_probs=(lambda tok, lp, top: None) if n_probs else None,
        grammar=grammar, token_pieces=pieces, token_trie=trie,
        decode_fn=(lambda ids: "".join(
            pieces[t] if t < len(pieces) else "" for t in ids))
        if pieces else None,
        on_token=on_token)
    eng.submit(req)
    # warm compile happens inside the first iterations; time from the
    # 17th token (first micro-run flushed) to completion
    t_first = None
    t0 = time.time()
    while not done and time.time() - t0 < 1800:
        eng._iterate()
        if t_first is None and len(out) >= 17:
            t_first = (time.time(), len(out))
    assert done, f"{label} did not finish"
    dt = time.time() - t_first[0]
    n = len(out) - t_first[1]
    log(f"{label}: {n / dt:.1f} tok/s ({n} tokens in {dt:.1f}s, "
        f"finish={done['r']})")
    return n / dt


def main():
    cfg = PRESETS["qwen3-4b"]
    w = lm.fabricated_tcq4_weights(cfg)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=1024)
    eng = Engine(ctx)

    rng = np.random.default_rng(0)
    words = ["".join(rng.choice(list(string.ascii_lowercase),
                                rng.integers(2, 6))) + " "
             for _ in range(cfg.vocab_size)]
    pieces = [w if rng.random() < 0.9 else "<|x|>" for w in words]

    r_plain = run_case(eng, "plain fast path")
    r_pen = run_case(eng, "device penalties", penalty_repeat=1.2,
                     penalty_freq=0.1)
    r_gram = run_case(eng, "grammar optimistic", pieces=pieces,
                      grammar_gbnf=True)
    # steady state: the async token-DFA compile (engine._dfa_compile_async)
    # has finished after the first grammar request; subsequent requests
    # with the same grammar are enforced ON DEVICE (round 5)
    import time as _time

    from rrs_tpu.serving import engine as eng_mod

    for _ in range(1200):
        with eng_mod._DFA_LOCK:
            if any(k[0].startswith("root ::=") for k in eng_mod._DFA_CACHE):
                break
        _time.sleep(0.1)
    r_gram_dfa = run_case(eng, "grammar token-DFA (device)", pieces=pieces,
                          grammar_gbnf=True)
    r_miro = run_case(eng, "mirostat v2 (device)", mirostat=2,
                      mirostat_tau=5.0, mirostat_eta=0.1)
    r_xtc = run_case(eng, "xtc (device)", xtc_probability=0.5,
                     xtc_threshold=0.1)
    # round-5 fast-path extensions (previously host-chain collapses)
    r_dry = run_case(eng, "dry (device)", dry_multiplier=0.8)
    r_typ = run_case(eng, "typical (device)", typical_p=0.9)
    r_sig = run_case(eng, "top-n-sigma (device)", top_n_sigma=2.0)
    r_lp = run_case(eng, "logprobs (candidates)", n_probs=5)
    import json
    print(json.dumps({"metric": "served_decode_1stream",
                      "plain": round(r_plain, 1),
                      "penalties": round(r_pen, 1),
                      "grammar": round(r_gram, 1),
                      "grammar_dfa": round(r_gram_dfa, 1),
                      "mirostat": round(r_miro, 1),
                      "xtc": round(r_xtc, 1),
                      "dry": round(r_dry, 1),
                      "typical": round(r_typ, 1),
                      "top_n_sigma": round(r_sig, 1),
                      "logprobs": round(r_lp, 1)}))


if __name__ == "__main__":
    main()
