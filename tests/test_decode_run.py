"""Device-side multi-token decode (serving fast path): one dispatch samples
DECODE_RUN_STEPS tokens with on-device top-k/top-p sampling; the engine
rewinds overshoot past stop conditions. Greedy results must match the
per-token host path exactly."""

import numpy as np

from rrs_tpu.models.config import PRESETS
from rrs_tpu.models.llama import random_weights
from rrs_tpu.runtime.context import InferenceContext
from rrs_tpu.runtime.sampler import SamplerParams
from rrs_tpu.serving.engine import Engine, GenRequest


def _run(eng, prompt, max_tokens, temperature=0.0, stop_tokens=(),
         **params):
    out, done = [], {}

    def on_token(tok, piece, finished, reason):
        if finished:
            done["r"] = reason
        elif tok is not None:
            out.append(tok)

    eng.submit(GenRequest(prompt_tokens=list(prompt), max_tokens=max_tokens,
                          params=SamplerParams(temperature=temperature,
                                               **params),
                          stop_tokens=stop_tokens, on_token=on_token))
    for _ in range(300):
        eng._iterate()
        if done:
            break
    assert done, "request did not finish"
    return out, done["r"]


def test_fast_path_greedy_matches_host():
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)

    ctx_fast = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng_fast = Engine(ctx_fast)
    out_fast, r = _run(eng_fast, [5, 6, 7], 20)
    assert len(out_fast) == 20 and r == "length"

    ctx_host = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng_host = Engine(ctx_host)
    eng_host._fast_eligible = lambda s: False     # force per-token host path
    out_host, _ = _run(eng_host, [5, 6, 7], 20)
    assert out_fast == out_host


def test_fast_path_stop_token_rewind():
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng = Engine(ctx)
    # find what greedy generates, then stop on the first token whose value
    # doesn't also occur earlier in the stream (greedy may repeat tokens)
    ref, _ = _run(eng, [5, 6, 7], 12)
    j = next((i for i in range(1, len(ref)) if ref[i] not in ref[:i]), 0)
    stop = ref[j]
    out, r = _run(eng, [5, 6, 7], 12, stop_tokens=(stop,))
    assert r == "stop" and out == ref[:j]
    # lane rewound to fed tokens only: cache_tokens = prompt + gen (incl the
    # stop token), lane length one less
    s = eng.slots[0]
    lane = ctx.kv.lane_of(s.retained_seq)
    assert ctx.kv.lengths[lane] == len(s.cache_tokens) - 1


def test_fast_path_sampling_respects_top_k1():
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=96)
    eng = Engine(ctx)
    greedy, _ = _run(eng, [9, 8], 10)
    # top_k=1 at any temperature must equal greedy
    topk1, _ = _run(eng, [9, 8], 10, temperature=0.9, top_k=1)
    assert topk1 == greedy


def test_fast_path_multi_slot():
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=2, max_seq=96)
    eng = Engine(ctx)
    results = {}

    def make_cb(tag):
        results[tag] = ([], {})

        def cb(tok, piece, finished, reason):
            if finished:
                results[tag][1]["r"] = reason
            elif tok is not None:
                results[tag][0].append(tok)
        return cb

    eng.submit(GenRequest(prompt_tokens=[1, 2, 3], max_tokens=12,
                          params=SamplerParams(temperature=0.0),
                          on_token=make_cb("a")))
    eng.submit(GenRequest(prompt_tokens=[4, 5], max_tokens=9,
                          params=SamplerParams(temperature=0.0),
                          on_token=make_cb("b")))
    for _ in range(300):
        eng._iterate()
        if len(results) == 2 and all("r" in v[1] for v in results.values()):
            break
    assert len(results["a"][0]) == 12
    assert len(results["b"][0]) == 9

    # singles agree with the batched run
    ctx2 = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng2 = Engine(ctx2)
    a2, _ = _run(eng2, [1, 2, 3], 12)
    b2, _ = _run(eng2, [4, 5], 9)
    assert results["a"][0] == a2 and results["b"][0] == b2


def test_fast_path_penalties_match_host():
    """Repetition/frequency/presence penalties run ON DEVICE in the fast
    path (llama_sampler_penalties analog); greedy results must match the
    per-token host chain exactly, including the sliding last-n window."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    kw = dict(penalty_repeat=1.4, penalty_freq=0.15, penalty_present=0.2,
              penalty_last_n=48)

    ctx_fast = InferenceContext(cfg, w, n_lanes=1, max_seq=192)
    eng_fast = Engine(ctx_fast)
    out_fast, r = _run(eng_fast, [5, 6, 7], 40, **kw)
    assert len(out_fast) == 40 and r == "length"

    ctx_host = InferenceContext(cfg, w, n_lanes=1, max_seq=192)
    eng_host = Engine(ctx_host)
    eng_host._fast_eligible = lambda s: False
    out_host, _ = _run(eng_host, [5, 6, 7], 40, **kw)
    assert out_fast == out_host
    # and penalties actually changed the stream vs plain greedy
    ctx_p = InferenceContext(cfg, w, n_lanes=1, max_seq=192)
    plain, _ = _run(Engine(ctx_p), [5, 6, 7], 40)
    assert out_fast != plain


def test_fast_path_small_last_n_falls_back_to_host():
    """penalty_last_n < 2*DECODE_RUN_STEPS cannot schedule window
    evictions for chained runs; the engine must route such slots to the
    host chain (and still produce the host stream)."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=192)
    eng = Engine(ctx)
    kw = dict(penalty_repeat=1.4, penalty_last_n=8)
    out, _ = _run(eng, [5, 6, 7], 24, **kw)

    ctx_h = InferenceContext(cfg, w, n_lanes=1, max_seq=192)
    eng_h = Engine(ctx_h)
    eng_h._fast_eligible = lambda s: False
    out_h, _ = _run(eng_h, [5, 6, 7], 24, **kw)
    assert out == out_h


def test_fast_path_logit_bias_on_device():
    """Dense logit bias rides the device run: a +100 bias forces greedy
    onto the biased token; a -inf-ish bias bans one."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng = Engine(ctx)
    out, _ = _run(eng, [5, 6, 7], 8, logit_bias=((42, 100.0),))
    assert out == [42] * 8

    plain, _ = _run(eng, [9, 8], 10)
    banned = plain[0]
    out2, _ = _run(eng, [9, 8], 10, logit_bias=((banned, -1e9),))
    assert banned not in out2


def test_fast_path_grammar_optimistic():
    """Grammar slots ride the device fast path with host PDA validation
    at flush (violations rewound + resampled); greedy output must equal
    the pure host masked path."""
    from rrs_tpu.runtime.grammar import Grammar

    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    # pieces: printable single chars for every token id
    pieces = [chr(33 + (i % 90)) for i in range(cfg.vocab_size)]
    gbnf = 'root ::= [a-z]+'

    def run(eng):
        out, done = [], {}

        def on_token(tok, piece, finished, reason):
            if finished:
                done["r"] = reason
            elif tok is not None:
                out.append(tok)

        eng.submit(GenRequest(
            prompt_tokens=[5, 6, 7], max_tokens=12,
            params=SamplerParams(temperature=0.0),
            grammar=Grammar(gbnf), token_pieces=pieces,
            on_token=on_token))
        for _ in range(400):
            eng._iterate()
            if done:
                break
        assert done, "request did not finish"
        return out

    ctx_fast = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    out_fast = run(Engine(ctx_fast))
    assert all(pieces[t].islower() for t in out_fast), \
        [pieces[t] for t in out_fast]

    ctx_host = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng_host = Engine(ctx_host)
    eng_host._fast_eligible = lambda s: False
    out_host = run(eng_host)
    assert out_fast == out_host


def test_grammar_violation_resamples_from_candidates():
    """A grammar violation must be fixed from the run's captured top-128
    candidate row — zero device round trips (no ctx.decode recovery
    call) — and still produce only grammar-legal output."""
    from rrs_tpu.runtime.grammar import Grammar

    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    pieces = [chr(33 + (i % 90)) for i in range(cfg.vocab_size)]
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=128)
    eng = Engine(ctx)
    n_host = {"n": 0}
    orig = ctx.decode

    def counted(*a, **k):
        n_host["n"] += 1
        return orig(*a, **k)

    ctx.decode = counted
    out, done = [], {}
    eng.submit(GenRequest(
        prompt_tokens=[5, 6, 7], max_tokens=24,
        params=SamplerParams(temperature=0.9, top_k=64),
        grammar=Grammar("root ::= [a-z]+"), token_pieces=pieces,
        on_token=lambda tok, piece, fin, reason:
            done.update(r=reason) if fin else out.append(tok)))
    for _ in range(600):
        eng._iterate()
        if done:
            break
    ctx.decode = orig
    assert done and len(out) == 24
    assert all(pieces[t].islower() for t in out), [pieces[t] for t in out]
    # single-char [a-z]+ over a mostly-illegal printable vocab at
    # temp 0.9 guarantees violations occurred; every one must have been
    # fixed from the captured candidates, never via the ctx.decode
    # recovery dispatch (deterministic under the fixed seeds)
    assert n_host["n"] == 0, n_host


def test_fast_path_mirostat_and_xtc_on_device():
    """Mirostat v2 and XTC ride the device fast path (round 4): requests
    with those params must decode via decode_run (not collapse to the
    per-token host path), produce valid tokens, and keep the slot's
    running mu updated from the device."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng = Engine(ctx)
    calls = {"fast": 0}
    orig = eng._dispatch_fast

    def counting(gen, chain=None):
        calls["fast"] += 1
        return orig(gen, chain)

    eng._dispatch_fast = counting
    out, r = _run(eng, [5, 6, 7], 20, temperature=0.8,
                  mirostat=2, mirostat_tau=4.0, mirostat_eta=0.2)
    assert len(out) == 20 and r == "length"
    assert calls["fast"] >= 1, "mirostat request fell off the fast path"
    assert all(0 <= t < cfg.vocab_size for t in out)
    # the device variant key must include the mirostat flag
    assert any(k[2] for k in ctx._run_fns), ctx._run_fns.keys()

    out2, r2 = _run(eng, [5, 6, 7], 20, temperature=0.8,
                    xtc_probability=0.7, xtc_threshold=0.05)
    assert len(out2) == 20 and r2 == "length"
    assert any(k[1] for k in ctx._run_fns), ctx._run_fns.keys()


def test_device_mirostat_mu_tracks_host_semantics():
    """device_mirostat's mu update must follow the v2 rule:
    mu' = mu - eta * (surprise(token) - tau), with the sampled token's
    surprise <= mu (or the argmax when nothing qualifies)."""
    import jax
    import jax.numpy as jnp
    from rrs_tpu.runtime.sampler import device_mirostat

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((2, 64)) * 3.0, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    temp = jnp.asarray([1.0, 0.7])
    mu = jnp.asarray([6.0, 1e-4])      # lane 1: nothing qualifies -> argmax
    eta = jnp.asarray([0.1, 0.1])
    tau = jnp.asarray([5.0, 5.0])
    tok, mu2 = device_mirostat(logits, keys, temp, mu, eta, tau)
    lp = np.asarray(jax.nn.log_softmax(np.asarray(logits) /
                                       np.asarray(temp)[:, None], axis=-1))
    surprise = -lp / np.log(2.0)
    t0, t1 = int(tok[0]), int(tok[1])
    assert surprise[0, t0] <= float(mu[0]) + 1e-4
    assert t1 == int(np.argmax(lp[1]))          # forced argmax lane
    exp_mu0 = float(mu[0]) - 0.1 * (surprise[0, t0] - 5.0)
    exp_mu1 = float(mu[1]) - 0.1 * (surprise[1, t1] - 5.0)
    np.testing.assert_allclose(np.asarray(mu2), [exp_mu0, exp_mu1],
                               rtol=1e-5)


def _count_fast(eng):
    calls = {"fast": 0}
    orig = eng._dispatch_fast

    def counting(gen, chain=None):
        calls["fast"] += 1
        return orig(gen, chain)

    eng._dispatch_fast = counting
    return calls


def test_fast_path_dry_matches_host():
    """DRY rides the device fast path (round 5): greedy + dry decodes via
    decode_run and matches the per-token host chain token-for-token (the
    device ring window mirrors dry_penalties exactly for histories
    <= DRY_WINDOW)."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=160)
    eng = Engine(ctx)
    calls = _count_fast(eng)
    out_fast, r = _run(eng, [5, 6, 7], 40, dry_multiplier=2.5,
                       dry_base=1.75, dry_allowed_length=2)
    assert len(out_fast) == 40 and r == "length"
    assert calls["fast"] >= 1, "dry request fell off the fast path"
    assert any(k[5] for k in ctx._run_fns), ctx._run_fns.keys()

    ctx_h = InferenceContext(cfg, w, n_lanes=1, max_seq=160)
    eng_h = Engine(ctx_h)
    eng_h._fast_eligible = lambda s: False
    out_host, _ = _run(eng_h, [5, 6, 7], 40, dry_multiplier=2.5,
                       dry_base=1.75, dry_allowed_length=2)
    assert out_fast == out_host


def test_fast_path_top_n_sigma_on_device():
    """top-n-sigma rides the fast path; a near-zero sigma leaves only the
    argmax alive, so sampled output must equal greedy (host semantics)."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng = Engine(ctx)
    greedy, _ = _run(eng, [9, 8], 16)
    calls = _count_fast(eng)
    out, r = _run(eng, [9, 8], 16, temperature=0.9, top_n_sigma=0.01)
    assert calls["fast"] >= 1, "top-n-sigma fell off the fast path"
    assert any(k[4] for k in ctx._run_fns), ctx._run_fns.keys()
    assert out == greedy


def test_fast_path_typical_on_device():
    """typical-p rides the fast path (static trace variant) and samples
    valid tokens; typ_p=1.0 lanes in the same trace behave as before."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng = Engine(ctx)
    calls = _count_fast(eng)
    out, r = _run(eng, [5, 6, 7], 20, temperature=0.8, typical_p=0.7)
    assert len(out) == 20 and r == "length"
    assert calls["fast"] >= 1, "typical request fell off the fast path"
    assert any(k[3] for k in ctx._run_fns), ctx._run_fns.keys()
    assert all(0 <= t < cfg.vocab_size for t in out)


def test_device_sample_typical_filter_semantics():
    """device_sample's typical arm only ever samples tokens the host
    apply_typical keeps (exact when candidates cover the vocab)."""
    import jax
    import jax.numpy as jnp
    from rrs_tpu.runtime.sampler import apply_typical, device_sample

    rng = np.random.default_rng(7)
    v = 64
    logits = jnp.asarray(rng.standard_normal((1, v)) * 2.0, jnp.float32)
    temp, typ_p = 0.9, 0.5
    kept = np.asarray(apply_typical(np.asarray(logits) / temp, typ_p))[0]
    keep_set = set(np.nonzero(kept > -1e30)[0].tolist())
    assert 0 < len(keep_set) < v

    cands = jax.lax.top_k(logits, v)
    keys = jax.random.split(jax.random.PRNGKey(0), 400)
    toks = set()
    for i in range(0, 400, 50):
        out = jax.vmap(lambda k: device_sample(
            logits, k[None], jnp.asarray([temp]), jnp.asarray([v]),
            jnp.asarray([1.0]), jnp.asarray([0.0]), k_max=v, cands=cands,
            typ_p=jnp.asarray([typ_p])))(keys[i:i + 50])
        toks.update(np.asarray(out).ravel().tolist())
    assert toks <= keep_set, toks - keep_set
    assert len(toks) > 1                  # it still samples, not argmax


def test_fast_path_logprobs_from_candidates():
    """n_probs requests stay on the device fast path (round 5): logprobs
    come from the captured top-128 candidate rows, sorted descending,
    with the sampled token's logprob consistent with its top entry."""
    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=96)
    eng = Engine(ctx)
    calls = _count_fast(eng)
    probs = []

    done = {}
    out = []

    def on_token(tok, piece, finished, reason):
        if finished:
            done["r"] = reason
        elif tok is not None:
            out.append(tok)

    def on_probs(token, lp, top):
        probs.append((token, lp, top))

    from rrs_tpu.runtime.sampler import SamplerParams
    eng.submit(GenRequest(prompt_tokens=[5, 6, 7], max_tokens=12,
                          params=SamplerParams(temperature=0.0),
                          n_probs=5, on_token=on_token, on_probs=on_probs))
    for _ in range(300):
        eng._iterate()
        if done:
            break
    assert done and len(out) == 12
    assert calls["fast"] >= 1, "n_probs request fell off the fast path"
    assert len(probs) == 12
    for token, lp, top in probs:
        assert len(top) == 5
        lps = [x[1] for x in top]
        assert lps == sorted(lps, reverse=True)
        assert all(x <= 1e-9 for x in lps)
        # greedy: sampled token is the top candidate
        assert token == top[0][0] and abs(lp - top[0][1]) < 1e-9


def test_grammar_token_dfa_on_device():
    """Grammars that close into a small token-DFA are enforced INSIDE the
    device decode scan (round 5): zero violations, chaining stays on, and
    greedy output matches the host-validated path token-for-token."""
    import time as _time

    from rrs_tpu.runtime.grammar import Grammar, build_token_trie
    from rrs_tpu.serving import engine as eng_mod

    cfg = PRESETS["tiny"]
    w = random_weights(cfg, seed=0)
    # vocab pieces: mostly lowercase words, some illegal symbol pieces
    rng = np.random.default_rng(0)
    import string as _string

    pieces = ["".join(rng.choice(list(_string.ascii_lowercase),
                                 rng.integers(2, 5))) + " "
              if rng.random() < 0.8 else "<|x|>"
              for _ in range(cfg.vocab_size)]
    trie = build_token_trie(pieces)
    gbnf = "root ::= [a-z ]+"

    def make_req(on_token, grammar):
        return GenRequest(
            prompt_tokens=[5, 6, 7], max_tokens=30,
            params=SamplerParams(temperature=0.0),
            grammar=grammar, token_pieces=pieces, token_trie=trie,
            on_token=on_token)

    def run(eng):
        out, done = [], {}

        def on_token(tok, piece, finished, reason):
            if finished:
                done["r"] = reason
            elif tok is not None:
                out.append(tok)

        eng.submit(make_req(on_token, Grammar(gbnf)))
        for _ in range(500):
            eng._iterate()
            if done:
                break
        assert done, "did not finish"
        return out

    ctx = InferenceContext(cfg, w, n_lanes=1, max_seq=128)
    eng = Engine(ctx)
    first = run(eng)                      # kicks the async DFA compile
    key = (gbnf, len(pieces))
    for _ in range(200):
        with eng_mod._DFA_LOCK:
            if key in eng_mod._DFA_CACHE:
                break
        _time.sleep(0.05)
    with eng_mod._DFA_LOCK:
        dfa = eng_mod._DFA_CACHE.get(key)
    assert dfa is not None, "DFA compile failed for [a-z ]+"
    assert dfa.masks.shape[0] <= 4

    chains = {"n": 0}
    orig = eng._dispatch_fast

    def counting(gen, chain=None):
        if chain is not None:
            chains["n"] += 1
        return orig(gen, chain)

    eng._dispatch_fast = counting
    out = run(eng)                        # steady state: DFA enforced
    assert len(out) == 30
    assert all(pieces[t] != "<|x|>" for t in out)
    assert chains["n"] > 0, "DFA grammar run did not chain"
    # the dfa variant key must appear in the compiled run cache
    assert any(k[6] for k in ctx._run_fns), ctx._run_fns.keys()

    # token-for-token parity with the host-validated chain (greedy)
    ctx_h = InferenceContext(cfg, w, n_lanes=1, max_seq=128)
    eng_h = Engine(ctx_h)
    eng_h._fast_eligible = lambda s: False
    want = run(eng_h)
    assert out == want
