"""Prompt-cache reuse correctness (server-context.cpp prompt reuse analog).

Regression for the off-by-one where cache_tokens included the final
generated token (sampled but never fed to the KV cache), letting n_common
exceed the lane's stored length and silently shifting every later KV
position in multi-turn chat.
"""

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime.sampler import SamplerParams
from rrs_tpu.serving.engine import Engine, GenRequest


def _run(eng: Engine, prompt, max_tokens=3):
    out = []
    done = {}

    def on_token(tok, piece, finished, reason):
        if finished:
            done["r"] = reason
        elif tok is not None:
            out.append(tok)

    eng.submit(GenRequest(prompt_tokens=list(prompt), max_tokens=max_tokens,
                          params=SamplerParams(temperature=0.0),
                          on_token=on_token))
    for _ in range(200):
        eng._iterate()
        if done:
            break
    assert done, "request did not finish"
    return out


def test_multi_turn_reuse_matches_fresh():
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)

    # engine A: turn 1 populates the prompt cache, turn 2 reuses it
    ctx_a = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    eng_a = Engine(ctx_a)                       # driven manually, no thread
    turn1 = [5, 6, 7, 8, 9]
    gen1 = _run(eng_a, turn1, max_tokens=3)

    slot = eng_a.slots[0]
    stored = ctx_a.kv.lengths[ctx_a.kv.lane_of(slot.retained_seq)]
    # premise of the bug: the cache token list holds one more token than the
    # KV lane (the final sampled token is never fed)
    assert len(slot.cache_tokens) == stored + 1

    turn2 = turn1 + gen1 + [11, 12]             # multi-turn continuation
    gen2 = _run(eng_a, turn2, max_tokens=3)
    assert slot.n_reused > 0                    # reuse actually happened
    assert slot.n_reused <= stored              # ...but never past the lane

    # engine B: same second turn with no cache -> must match exactly
    ctx_b = InferenceContext(cfg, w, n_lanes=1, max_seq=64)
    eng_b = Engine(ctx_b)
    gen2_fresh = _run(eng_b, turn2, max_tokens=3)
    assert gen2 == gen2_fresh


def test_batched_prompt_matches_sequential():
    """Cross-slot prompt batching (prefill_multi packs several slots'
    chunks into one dispatch) must produce the same greedy generations as
    running each request alone."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=3)

    # sequential baseline: one slot each
    ref = {}
    eng1 = Engine(InferenceContext(cfg, w, n_lanes=1, max_seq=96))
    prompts = {0: [5, 6, 7, 8], 1: [9, 10], 2: [11, 12, 13, 14, 15, 16, 17]}
    for rid, p in prompts.items():
        ref[rid] = _run(eng1, p, max_tokens=4)

    # concurrent: all three submitted before any iterate -> batched prefill
    eng = Engine(InferenceContext(cfg, w, n_lanes=4, max_seq=96))
    outs = {rid: [] for rid in prompts}
    done = {}

    def mk(rid):
        def on_token(tok, piece, finished, reason):
            if finished:
                done[rid] = reason
            elif tok is not None:
                outs[rid].append(tok)
        return on_token

    for rid, p in prompts.items():
        eng.submit(GenRequest(prompt_tokens=list(p), max_tokens=4,
                              params=SamplerParams(temperature=0.0),
                              on_token=mk(rid)))
    for _ in range(400):
        eng._iterate()
        if len(done) == len(prompts):
            break
    assert len(done) == len(prompts), done
    for rid in prompts:
        assert outs[rid] == ref[rid], (rid, outs[rid], ref[rid])
